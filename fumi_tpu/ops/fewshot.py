"""Shared episodic math as pure jitted functions — the numeric heart.

TPU-native re-design of the reference's prototype/loss/prediction math
(ref: fumi/utils/utils.py:302-402):

- The reference builds class prototypes with ``scatter_add_`` per-class means
  (ref: utils.py:331-376). Scatters map poorly onto the MXU; here the segment
  mean is a **one-hot matmul** — ``onehot(targets)ᵀ @ embeddings`` — which XLA
  tiles onto the systolic array and fuses with the λ convex combination.
- The reference computes query→prototype squared distances by materializing
  the broadcasted difference tensor (ref: utils.py:315-317,400-401). Here the
  distance logits use the matmul expansion ``‖p‖² − 2·e·p`` (the ``‖e‖²``
  term is constant per query, so it cancels in both the softmax cross-entropy
  and the argmin — dropping it saves bandwidth with no numeric effect on
  loss or predictions).

All functions are batched over the task axis ``B`` and fully shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot_f(targets: jnp.ndarray, num_classes: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """(..., NK) int -> (..., NK, N) float one-hot."""
    return jax.nn.one_hot(targets, num_classes, dtype=dtype)


def get_num_samples(targets: jnp.ndarray, num_classes: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Per-class sample counts (b, N). Matches ref utils.py:379-387."""
    onehot = _one_hot_f(targets, num_classes, dtype)
    return jnp.sum(onehot, axis=-2)


def get_prototypes(im_embeddings: jnp.ndarray,
                   text_embeddings: jnp.ndarray,
                   lamdas: jnp.ndarray,
                   targets: jnp.ndarray,
                   num_classes: int) -> jnp.ndarray:
    """λ-fused class prototypes.

    Per-class mean of support image AND text embeddings, per-class mean λ,
    then the convex fusion ``proto = λ·im_proto + (1−λ)·text_proto``, with the
    zero-division guard ``max(count, 1)`` (ref: fumi/utils/utils.py:331-376).

    Args:
      im_embeddings:   (b, NK, D) support image embeddings.
      text_embeddings: (b, NK, D) support text embeddings (prototype space).
      lamdas:          (b, NK, 1) per-sample image weight in [0, 1].
      targets:         (b, NK) int class ids in [0, num_classes).
      num_classes:     N.

    Returns:
      (b, N, D) prototypes.
    """
    dtype = im_embeddings.dtype
    onehot = _one_hot_f(targets, num_classes, dtype)  # (b, NK, N)
    counts = jnp.sum(onehot, axis=-2)[..., None]  # (b, N, 1)
    counts = jnp.maximum(counts, jnp.ones_like(counts))  # ref guard

    # Segment sums as MXU matmuls: (b, N, NK) @ (b, NK, D) -> (b, N, D).
    onehot_t = jnp.swapaxes(onehot, -1, -2)
    im_protos = jnp.matmul(onehot_t, im_embeddings,
                           preferred_element_type=dtype) / counts
    text_protos = jnp.matmul(onehot_t, text_embeddings,
                             preferred_element_type=dtype) / counts
    lam_per_class = jnp.matmul(onehot_t, lamdas.astype(dtype),
                               preferred_element_type=dtype) / counts

    return lam_per_class * im_protos + (1.0 - lam_per_class) * text_protos


def prototype_logits(prototypes: jnp.ndarray,
                     embeddings: jnp.ndarray) -> jnp.ndarray:
    """Negative-squared-distance logits, matmul form.

    ``logit[b, q, n] = −‖e_q − p_n‖² + ‖e_q‖²  =  2·e_q·p_n − ‖p_n‖²``.

    The per-query constant ``‖e‖²`` is dropped: softmax cross-entropy and
    per-query argmax are invariant to it. The surviving term is one batched
    matmul (MXU) plus a rank-1 correction.

    Args:
      prototypes: (b, N, D).
      embeddings: (b, M, D) query embeddings.

    Returns:
      (b, M, N) logits (higher = closer).
    """
    dots = jnp.matmul(embeddings, jnp.swapaxes(prototypes, -1, -2),
                      preferred_element_type=embeddings.dtype)  # (b, M, N)
    p_sq = jnp.sum(prototypes * prototypes, axis=-1)  # (b, N)
    return 2.0 * dots - p_sq[..., None, :]


def pairwise_sqdist(prototypes: jnp.ndarray,
                    embeddings: jnp.ndarray) -> jnp.ndarray:
    """Exact squared Euclidean distances (b, M, N).

    Direct difference form, matching the reference computation bit-for-bit
    up to reduction order (ref: utils.py:315-317). Used by parity tests;
    the hot path uses :func:`prototype_logits` instead.
    """
    diff = embeddings[..., :, None, :] - prototypes[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def prototypical_loss(prototypes: jnp.ndarray,
                      embeddings: jnp.ndarray,
                      targets: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy over negative squared-distance logits.

    Matches ref utils.py:390-402 (``F.cross_entropy(−sq_dist, targets)``,
    mean reduction over all b·M query points).
    """
    logits = prototype_logits(prototypes, embeddings)  # (b, M, N)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def predict_classes(prototypes: jnp.ndarray,
                    embeddings: jnp.ndarray) -> jnp.ndarray:
    """Per-query nearest-prototype class (b, M) int32.

    Matches ``torch.min(sq_distances, dim=-1)`` (ref: utils.py:315-317):
    argmin over classes; first index wins ties, same as ``jnp.argmax`` of the
    negated distances with identical tie pattern in the matmul form.
    """
    return jnp.argmax(prototype_logits(prototypes, embeddings),
                      axis=-1).astype(jnp.int32)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  axis: int = -1) -> jnp.ndarray:
    """Mean softmax cross-entropy (torch ``F.cross_entropy`` semantics)."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=axis)
    return jnp.mean(nll)


def matching_probs(support_emb: jnp.ndarray, support_y: jnp.ndarray,
                   query_emb: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Matching-Networks class probabilities (Vinyals et al. 2016).

    Each query attends over the SUPPORT SAMPLES with softmaxed cosine
    similarity and sums their one-hot labels — sample-level attention
    instead of class prototypes. Both stages are MXU matmuls:
    ``(B, NQ, P) @ (B, P, NK)`` attention then ``(B, NQ, NK) @ (B, NK, N)``
    label mixing.

    Args:
      support_emb: (B, NK, P); support_y: (B, NK) int in [0, N);
      query_emb: (B, NQ, P).
    Returns:
      (B, NQ, N) probabilities (rows sum to 1).
    """
    eps = 1e-8
    s = support_emb / (jnp.linalg.norm(support_emb, axis=-1,
                                       keepdims=True) + eps)
    q = query_emb / (jnp.linalg.norm(query_emb, axis=-1,
                                     keepdims=True) + eps)
    cos = jnp.einsum("bqp,bkp->bqk", q, s)  # (B, NQ, NK)
    attn = jax.nn.softmax(cos, axis=-1)
    onehot = _one_hot_f(support_y, num_classes, s.dtype)  # (B, NK, N)
    return jnp.einsum("bqk,bkn->bqn", attn, onehot)
