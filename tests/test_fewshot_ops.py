"""Numeric-fidelity tests for the episodic math vs a torch re-statement of the
reference semantics (fumi/utils/utils.py:302-402) and vs sklearn metrics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp
from sklearn.metrics import accuracy_score, precision_recall_fscore_support

from fumi_tpu.ops import (accuracy, episode_metrics, get_num_samples,
                          get_prototypes, macro_prf1, confusion_matrix,
                          pairwise_sqdist, predict_classes, prototype_logits,
                          prototypical_loss)


def torch_prototypes(im_emb, text_emb, lamdas, targets, num_classes):
    """Reference get_prototypes semantics (ref: utils.py:331-376), written
    independently in torch for cross-checking."""
    b, nk, d = im_emb.shape
    ones = torch.ones(b, nk)
    counts = torch.zeros(b, num_classes).scatter_add_(1, targets, ones)
    counts = torch.clamp(counts, min=1.0).unsqueeze(-1)
    idx = targets.unsqueeze(-1).expand_as(im_emb)
    im_p = torch.zeros(b, num_classes, d).scatter_add_(1, idx, im_emb) / counts
    tx_p = torch.zeros(b, num_classes, d).scatter_add_(1, idx, text_emb) / counts
    lam = torch.zeros(b, num_classes, 1).scatter_add_(
        1, targets.unsqueeze(-1), lamdas) / counts
    return lam * im_p + (1 - lam) * tx_p


@pytest.fixture
def episode_arrays(rng_np):
    B, N, K, D = 3, 5, 4, 32
    im = rng_np.randn(B, N * K, D).astype(np.float32)
    tx = rng_np.randn(B, N * K, D).astype(np.float32)
    lam = rng_np.rand(B, N * K, 1).astype(np.float32)
    tgt = np.tile(np.repeat(np.arange(N), K)[None], (B, 1)).astype(np.int64)
    # shuffle target order within tasks to exercise the segment means
    for b in range(B):
        rng_np.shuffle(tgt[b])
    return im, tx, lam, tgt, N


def test_num_samples(episode_arrays):
    im, tx, lam, tgt, N = episode_arrays
    got = np.asarray(get_num_samples(jnp.asarray(tgt), N))
    want = np.stack([np.bincount(t, minlength=N) for t in tgt])
    np.testing.assert_allclose(got, want)


def test_prototypes_match_torch(episode_arrays):
    im, tx, lam, tgt, N = episode_arrays
    got = np.asarray(get_prototypes(jnp.asarray(im), jnp.asarray(tx),
                                    jnp.asarray(lam), jnp.asarray(tgt), N))
    want = torch_prototypes(torch.tensor(im), torch.tensor(tx),
                            torch.tensor(lam), torch.tensor(tgt), N).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prototypes_missing_class_guard(rng_np):
    # a task where class 3 has no support samples: max(count,1) guard
    B, N, K, D = 1, 4, 2, 8
    im = rng_np.randn(B, N * K, D).astype(np.float32)
    tx = rng_np.randn(B, N * K, D).astype(np.float32)
    lam = rng_np.rand(B, N * K, 1).astype(np.float32)
    tgt = np.array([[0, 0, 1, 1, 2, 2, 0, 1]], dtype=np.int64)  # no class 3
    got = np.asarray(get_prototypes(jnp.asarray(im), jnp.asarray(tx),
                                    jnp.asarray(lam), jnp.asarray(tgt), N))
    want = torch_prototypes(torch.tensor(im), torch.tensor(tx),
                            torch.tensor(lam), torch.tensor(tgt), N).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[0, 3], np.zeros(D), atol=1e-6)


def test_prototypical_loss_matches_torch(episode_arrays, rng_np):
    im, tx, lam, tgt, N = episode_arrays
    protos = np.asarray(get_prototypes(jnp.asarray(im), jnp.asarray(tx),
                                       jnp.asarray(lam), jnp.asarray(tgt), N))
    B, M, D = im.shape[0], 20, im.shape[-1]
    q = rng_np.randn(B, M, D).astype(np.float32)
    q_tgt = rng_np.randint(0, N, size=(B, M)).astype(np.int64)

    got = float(prototypical_loss(jnp.asarray(protos), jnp.asarray(q),
                                  jnp.asarray(q_tgt)))
    # torch reference: CE over negative squared distances (utils.py:390-402)
    tp, tq = torch.tensor(protos), torch.tensor(q)
    sq = torch.sum((tp.unsqueeze(2) - tq.unsqueeze(1)) ** 2, dim=-1)
    want = float(F.cross_entropy(-sq, torch.tensor(q_tgt)))
    assert abs(got - want) < 1e-4


def test_logits_equal_neg_sqdist_up_to_query_constant(episode_arrays, rng_np):
    im, tx, lam, tgt, N = episode_arrays
    protos = get_prototypes(jnp.asarray(im), jnp.asarray(tx),
                            jnp.asarray(lam), jnp.asarray(tgt), N)
    q = jnp.asarray(rng_np.randn(im.shape[0], 16, im.shape[-1])
                    .astype(np.float32))
    logits = np.asarray(prototype_logits(protos, q))
    sq = np.asarray(pairwise_sqdist(protos, q))
    # logits + sqdist should be constant across classes for each query
    s = logits + sq
    np.testing.assert_allclose(s - s[..., :1], 0.0, atol=2e-3)


def test_predictions_match_argmin_sqdist(episode_arrays, rng_np):
    im, tx, lam, tgt, N = episode_arrays
    protos = get_prototypes(jnp.asarray(im), jnp.asarray(tx),
                            jnp.asarray(lam), jnp.asarray(tgt), N)
    q = jnp.asarray(rng_np.randn(im.shape[0], 50, im.shape[-1])
                    .astype(np.float32))
    preds = np.asarray(predict_classes(protos, q))
    want = np.asarray(jnp.argmin(pairwise_sqdist(protos, q), axis=-1))
    np.testing.assert_array_equal(preds, want)


def test_metrics_match_sklearn(rng_np):
    N = 5
    tgt = rng_np.randint(0, N, size=(4, 40))
    prd = rng_np.randint(0, N, size=(4, 40))
    m = episode_metrics(jnp.asarray(tgt), jnp.asarray(prd), N)
    flat_t, flat_p = tgt.reshape(-1), prd.reshape(-1)
    assert abs(float(m["acc"]) - accuracy_score(flat_t, flat_p)) < 1e-6
    prec, rec, f1, _ = precision_recall_fscore_support(
        flat_t, flat_p, average="macro", zero_division=0)
    assert abs(float(m["prec"]) - prec) < 1e-6
    assert abs(float(m["rec"]) - rec) < 1e-6
    assert abs(float(m["f1"]) - f1) < 1e-6


def test_metrics_zero_division(rng_np):
    # a class never predicted -> precision contribution 0 (sklearn default)
    N = 4
    tgt = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    prd = np.array([0, 1, 2, 0, 0, 1, 2, 1])  # class 3 never predicted
    m = episode_metrics(jnp.asarray(tgt), jnp.asarray(prd), N)
    prec, rec, f1, _ = precision_recall_fscore_support(
        tgt, prd, average="macro", zero_division=0)
    assert abs(float(m["prec"]) - prec) < 1e-6
    assert abs(float(m["rec"]) - rec) < 1e-6
    assert abs(float(m["f1"]) - f1) < 1e-6
