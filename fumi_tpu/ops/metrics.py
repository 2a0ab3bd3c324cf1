"""Jitted classification metrics, numerically matched to sklearn.

The reference flattens the whole meta-batch and calls
``sklearn.metrics.accuracy_score`` + ``precision_recall_fscore_support
(average="macro")`` on host (ref: fumi/utils/utils.py:319-326). That is a
per-step host sync; here the same quantities are computed on device from a
confusion matrix (one one-hot matmul) and only scalar results ever leave.

sklearn macro semantics reproduced:
- the label set is the sorted union of labels present in ``y_true`` or
  ``y_pred``; in episodic eval the query targets always cover all N classes,
  so the union is always ``{0..N-1}`` — we macro-average over all N classes.
- zero-division cells (no predicted / no true samples for a class) contribute
  0 to the average (sklearn's default ``zero_division="warn"`` → 0).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def confusion_matrix(targets: jnp.ndarray, preds: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """(N, N) confusion matrix; rows = true class, cols = predicted class.

    Inputs may be any shape; they are flattened, matching the reference's
    flattening of the meta-batch (ref: utils.py:321-322).
    """
    t = jax.nn.one_hot(targets.reshape(-1), num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(preds.reshape(-1), num_classes, dtype=jnp.float32)
    return jnp.matmul(t.T, p, preferred_element_type=jnp.float32)


def accuracy(targets: jnp.ndarray, preds: jnp.ndarray) -> jnp.ndarray:
    """Flat accuracy, == sklearn.accuracy_score (ref: utils.py:323)."""
    t = targets.reshape(-1)
    p = preds.reshape(-1)
    return jnp.mean((t == p).astype(jnp.float32))


def _safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)


def macro_prf1(conf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray]:
    """Macro precision/recall/F1 from a confusion matrix.

    Matches ``precision_recall_fscore_support(average="macro")``
    (ref: utils.py:324-326) given that all classes appear in y_true
    (always true for episodic query sets).
    """
    tp = jnp.diagonal(conf)
    pred_count = jnp.sum(conf, axis=0)  # TP + FP per class
    true_count = jnp.sum(conf, axis=1)  # TP + FN per class
    prec = _safe_div(tp, pred_count)
    rec = _safe_div(tp, true_count)
    f1 = _safe_div(2.0 * prec * rec, prec + rec)
    return jnp.mean(prec), jnp.mean(rec), jnp.mean(f1)


def episode_metrics(targets: jnp.ndarray, preds: jnp.ndarray,
                    num_classes: int) -> Dict[str, jnp.ndarray]:
    """acc / macro prec / rec / f1 over a flattened meta-batch.

    Mirrors the tuple returned by ref ``utils.get_preds``
    (ref: utils.py:302-328) minus the raw preds (returned separately).
    """
    conf = confusion_matrix(targets, preds, num_classes)
    prec, rec, f1 = macro_prf1(conf)
    return {
        "acc": accuracy(targets, preds),
        "prec": prec,
        "rec": rec,
        "f1": f1,
    }
