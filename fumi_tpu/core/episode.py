"""The Episode pytree — the wire format of the framework.

The reference's de-facto wire format is
``batch = {'train': (inputs, targets), 'test': (inputs, targets)}`` with
``inputs = (image_ids, text[, attention_mask], image_embeddings)``, each leaf
shaped ``(B, N*K, ...)`` (ref: fumi/models/am3.py:160-171,
fumi/dataset/data.py:571-581,632-643). Support = ``'train'``,
query = ``'test'``.

Here that becomes a single static-shaped NamedTuple pytree that flows through
jit: a whole meta-batch of ``B`` tasks, ``N`` ways, ``K`` support shots and
``Q`` query shots per class. Text rides with the *support* set only — query
forward passes are image-only in every model family (ref: am3.py:170-171,
fumi.py:178, maml.py:148-153 uses images only).

All shapes are static so XLA compiles one program per (B, N, K, Q,
feature-dims) signature.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp


class Episode(NamedTuple):
    """A meta-batch of few-shot episodes.

    Leaves (B = tasks per meta-batch, N = ways, K = support shots/class,
    Q = query shots/class):

    - ``support_im``:   (B, N*K, D) float — image embeddings.
    - ``support_text``: (B, N*K, E) float precomputed text embeddings, or
                        (B, N*K, T) int32 token ids, depending on encoder.
    - ``support_text_mask``: always None on the production samplers (every
                        encoder derives token validity from PAD ids, so the
                        mask would be dead HBM traffic); the slot exists for
                        custom pipelines whose padding is not PAD-coded.
    - ``support_ids``:  (B, N*K) int32 — raw image ids (for artifacts).
    - ``support_y``:    (B, N*K) int32 — targets remapped to 0..N-1
                        (the torchmeta ``Categorical`` transform,
                        ref: data.py:318-319).
    - ``query_im``:     (B, N*Q, D) float.
    - ``query_ids``:    (B, N*Q) int32.
    - ``query_y``:      (B, N*Q) int32.
    """

    support_im: jnp.ndarray
    support_text: jnp.ndarray
    support_text_mask: Optional[jnp.ndarray]
    support_ids: jnp.ndarray
    support_y: jnp.ndarray
    query_im: jnp.ndarray
    query_ids: jnp.ndarray
    query_y: jnp.ndarray

    @property
    def num_tasks(self) -> int:
        return self.support_im.shape[0]


@dataclasses.dataclass(frozen=True)
class EpisodeSpec:
    """Static episode geometry; hashable, usable as a jit static arg."""

    batch_size: int  # B — tasks per meta-batch
    num_ways: int  # N
    num_shots: int  # K — support shots per class
    num_query: int  # Q — query shots per class
    im_dim: int  # D
    text_dim: int  # E (embedding) or T (max token length)
    text_is_tokens: bool = False

    @property
    def support_len(self) -> int:
        return self.num_ways * self.num_shots

    @property
    def query_len(self) -> int:
        return self.num_ways * self.num_query

    def zeros(self) -> Episode:
        """An all-zeros episode with this geometry (compile-checking aid)."""
        B, NK, NQ = self.batch_size, self.support_len, self.query_len
        text_dtype = jnp.int32 if self.text_is_tokens else jnp.float32
        return Episode(
            support_im=jnp.zeros((B, NK, self.im_dim), jnp.float32),
            support_text=jnp.zeros((B, NK, self.text_dim), text_dtype),
            support_text_mask=None,
            support_ids=jnp.zeros((B, NK), jnp.int32),
            support_y=jnp.tile(
                jnp.repeat(jnp.arange(self.num_ways, dtype=jnp.int32),
                           self.num_shots)[None, :], (B, 1)),
            query_im=jnp.zeros((B, NQ, self.im_dim), jnp.float32),
            query_ids=jnp.zeros((B, NQ), jnp.int32),
            query_y=jnp.tile(
                jnp.repeat(jnp.arange(self.num_ways, dtype=jnp.int32),
                           self.num_query)[None, :], (B, 1)),
        )
