"""``--tpu_watch``: per-parameter distribution telemetry.

The reference calls ``wandb.watch(model, log="all")`` (ref:
fumi/utils/utils.py:272), which uploads per-parameter value AND gradient
histograms — the tool for spotting distribution shifts and dead units.
The rebuild's always-on equivalent is per-component gradient *norms*
(train/steps.py:per_layer_grad_norms); this module adds the opt-in
histogram telemetry itself:

- **Fixed bins**, shared by every component and every step: signed
  log-magnitude buckets (zero | ±[1e-10, 1e2) in half-decade steps).
  Fixed binning makes the counts SUM-REDUCIBLE — across devices (like
  the ``conf`` confusion matrix), across steps, and across runs —
  where wandb's per-tensor dynamic bins are not.
- Computed **on device** in one jitted pass per component (a bincount
  over bucket indices), so watching costs one small program dispatch
  per eval boundary, not a host round-trip per parameter.
- Written through :class:`~fumi_tpu.train.logging.MetricWriter` as
  ``watch/{params|grads}/<component>`` rows in the run's JSONL (one
  count vector per eval boundary) and as ``wandb.Histogram`` objects
  when a live wandb run is attached.

Cadence matches the reference's effective behavior: wandb.watch logs
every ``log_freq`` (default 1000) steps; here histograms are recorded at
every ``--eval_freq`` boundary, on the current params and on the
meta-gradient of one freshly sampled meta-batch (a point sample of the
gradient distribution — the chunked drivers never materialize per-step
gradients on the host).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Bucket layout: index 0 counts exact zeros; buckets 1..2*_N_MAG count
# finite |x| in [1e-10, 1e2) by half-decades, negatives first then
# positives (finite values below 1e-10 fold into the smallest bucket,
# above 1e2 into the largest — out-of-span mass stays visible at the
# edges); the LAST bucket counts nonfinite values (NaN/±Inf) — the
# pathology this telemetry exists to expose must never be miscounted
# into a benign finite bin.
_LOG_LO, _LOG_HI, _PER_DECADE = -10.0, 2.0, 2
_N_MAG = int((_LOG_HI - _LOG_LO) * _PER_DECADE)  # magnitude buckets/sign
NUM_BUCKETS = 2 + 2 * _N_MAG  # zero + negative + positive + nonfinite


def bucket_labels():
    """Human-readable bucket edges for the JSONL consumer (stable order:
    ``zero``, then negatives from most-negative magnitude down, then
    positives up, then ``nonfinite``)."""
    mags = [f"1e{_LOG_LO + i / _PER_DECADE:+.1f}" for i in range(_N_MAG)]
    return (["zero"]
            + [f"-{m}" for m in reversed(mags)]
            + [f"+{m}" for m in mags]
            + ["nonfinite"])


def _bucketize(x: jnp.ndarray) -> jnp.ndarray:
    """(NUM_BUCKETS,) int32 counts of ``x``'s values in the fixed bins."""
    x = x.reshape(-1)
    ax = jnp.where(jnp.isfinite(x), jnp.abs(x), 1.0)  # keep log10 finite
    mag = jnp.clip(
        jnp.floor((jnp.log10(jnp.maximum(ax, 1e-30)) - _LOG_LO)
                  * _PER_DECADE),
        0, _N_MAG - 1).astype(jnp.int32)
    # negatives: bucket 1.._N_MAG with LARGE magnitudes first (so the
    # full axis reads monotonically from -1e2 to +1e2)
    idx = jnp.where(x < 0, _N_MAG - mag, 1 + _N_MAG + mag)
    idx = jnp.where(x == 0, 0, idx)
    idx = jnp.where(jnp.isfinite(x), idx, NUM_BUCKETS - 1)
    return jnp.zeros(NUM_BUCKETS, jnp.int32).at[idx].add(1)


def _components(tree) -> Dict[str, object]:
    """Top-level component partition — the SHARED naming of
    train/steps.py (grad_norm/<k> scalars), so norms and histograms
    line up by construction."""
    from fumi_tpu.train.steps import component_partition
    return component_partition(tree)


@functools.partial(jax.jit, static_argnames=("names",))
def _histograms_jit(leaves_by_comp, names):
    return {n: _bucketize(jnp.concatenate(
        [l.reshape(-1) for l in leaves_by_comp[i]]))
        for i, n in enumerate(names)}


def component_histograms(tree) -> Dict[str, np.ndarray]:
    """{component: (NUM_BUCKETS,) int counts} for a param/grad pytree.

    One jitted program per tree STRUCTURE (names are static); counts are
    fetched to host numpy for the writer."""
    comps = _components(tree)
    names = tuple(comps)
    leaves = tuple(tuple(jax.tree_util.tree_leaves(comps[n]))
                   for n in names)
    out = _histograms_jit(leaves, names)
    return {n: np.asarray(v) for n, v in out.items()}


def watch_record(params, grads=None) -> Dict[str, np.ndarray]:
    """The full ``--tpu_watch`` record for one boundary: param histograms
    always, grad histograms when a gradient pytree is supplied."""
    rec = {f"watch/params/{k}": v
           for k, v in component_histograms(params).items()}
    if grads is not None:
        rec.update({f"watch/grads/{k}": v
                    for k, v in component_histograms(grads).items()})
    return rec


def log_watch(writer, rec: Dict[str, np.ndarray],
              step: Optional[int] = None) -> None:
    """Write histogram counts through the MetricWriter: JSONL rows with
    the count vectors, plus the bucket labels ONCE per writer (they are
    constants; re-emitting them every boundary would bloat the JSONL),
    and ``wandb.Histogram`` objects on a live wandb run."""
    if not getattr(writer, "_watch_buckets_logged", False):
        rec = dict(rec, **{"watch/buckets": bucket_labels()})
        writer._watch_buckets_logged = True
    writer.log_arrays(rec, step=step)
