"""Episodic N-way K-shot samplers.

The reference samples episodes on the host through torchmeta
(CombinationMetaDataset → ClassSplitter → BatchMetaDataLoader, ref:
fumi/dataset/data.py:73-84,146-184, SURVEY §3.5), slicing HDF5 per episode
and shipping full tensors to the device every step (ref: fumi.py:130-140).

Two TPU-native replacements:

- :class:`DeviceEpisodeSampler` — the fast path. All tables live in HBM;
  ``sample(key)`` is a pure jitted function: Gumbel-top-k picks N distinct
  classes per task and K+Q distinct images per class (masked uniform noise +
  ``top_k`` — sampling without replacement as one vectorized op), then
  gathers embeddings. It fuses with the train step into a single XLA
  program, so the host ships nothing per step.
- :class:`HostEpisodeSampler` — the parity path. numpy RNG, the reference's
  sampling *policy* (uniform class combinations, per-class shuffled
  support/query split, ref: torchmeta ClassSplitter(shuffle=True).seed(0))
  with a documented, reproducible seeding scheme.

Both emit the same :class:`fumi_tpu.core.episode.Episode` layout with
support/query grouped class-major (targets ``[0]*K + [1]*K + ...``), matching
torchmeta's per-class concatenation order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.core.episode import Episode, EpisodeSpec
from fumi_tpu.data.class_set import ClassSet


class DeviceEpisodeSampler:
    """Fused on-device episodic sampler.

    Args:
      image_table: (num_images, D) — all image embeddings, device-resident.
      image_ids:   (num_images,) int32 — row → raw image id. For iNat-Anim
                   rows ARE image ids (ref: data.py:429-430 keys h5 by id),
                   but synthetic sets may differ.
      class_set:   the split's ClassSet.
      spec:        episode geometry.
    """

    def __init__(self, image_table: jnp.ndarray, image_ids: jnp.ndarray,
                 class_set: ClassSet, spec: EpisodeSpec):
        self.spec = spec
        self.image_table = jnp.asarray(image_table)
        self.image_ids = jnp.asarray(image_ids, dtype=jnp.int32)
        self.class_rows = jnp.asarray(class_set.class_image_rows,
                                      dtype=jnp.int32)
        self.class_counts = jnp.asarray(class_set.class_counts,
                                        dtype=jnp.int32)
        self.text_features = jnp.asarray(class_set.text_features)
        self.text_mask = (jnp.asarray(class_set.text_mask)
                          if class_set.text_mask is not None else None)
        self.num_classes = class_set.num_classes

    def sample(self, key: jax.Array) -> Episode:
        """Draw one meta-batch. Pure; jit/fusion friendly."""
        spec = self.spec
        B, N, K, Q = (spec.batch_size, spec.num_ways, spec.num_shots,
                      spec.num_query)
        KQ = K + Q
        max_count = self.class_rows.shape[1]
        k_cls, k_img = jax.random.split(key)

        # N distinct classes per task: top-N of uniform noise over C.
        cls_noise = jax.random.uniform(k_cls, (B, self.num_classes))
        _, class_idx = jax.lax.top_k(cls_noise, N)  # (B, N)

        counts = self.class_counts[class_idx]  # (B, N)
        # K+Q distinct images per class: a per-class random permutation of
        # the valid prefix (argsort of masked uniform noise puts the class's
        # `count` valid positions first, shuffled), indexed modulo `count` —
        # distinct while count >= K+Q, with-replacement wrap otherwise
        # (host sampler / validate_episode reject such classes; the wrap is
        # a safety net for permissive callers).
        img_noise = jax.random.uniform(k_img, (B, N, max_count))
        slot = jnp.arange(max_count)[None, None, :]
        img_noise = jnp.where(slot < counts[..., None], img_noise, -1.0)
        order = jnp.argsort(-img_noise, axis=-1)  # (B, N, max_count)
        j = jnp.arange(KQ)[None, None, :]
        take = j % jnp.maximum(counts[..., None], 1)
        sel = jnp.take_along_axis(order, take, axis=-1)  # (B, N, K+Q)

        rows = jnp.take_along_axis(
            self.class_rows[class_idx], sel, axis=-1)  # (B, N, K+Q)
        s_rows = rows[..., :K].reshape(B, N * K)
        q_rows = rows[..., K:].reshape(B, N * Q)

        support_im = self.image_table[s_rows]  # (B, N*K, D)
        query_im = self.image_table[q_rows]  # (B, N*Q, D)

        # per-class text repeated per shot, class-major like the targets
        text_cls = self.text_features[class_idx]  # (B, N, E|T)
        support_text = jnp.repeat(text_cls, K, axis=1)  # (B, N*K, E|T)
        mask = (jnp.repeat(self.text_mask[class_idx], K, axis=1)
                if self.text_mask is not None else None)

        s_y = jnp.tile(jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)[None],
                       (B, 1))
        q_y = jnp.tile(jnp.repeat(jnp.arange(N, dtype=jnp.int32), Q)[None],
                       (B, 1))
        return Episode(
            support_im=support_im,
            support_text=support_text,
            support_text_mask=mask,
            support_ids=self.image_ids[s_rows],
            support_y=s_y,
            query_im=query_im,
            query_ids=self.image_ids[q_rows],
            query_y=q_y,
        )


class HostEpisodeSampler:
    """Reference-policy host sampler (numpy).

    Sampling policy of torchmeta's CombinationMetaDataset + ClassSplitter
    (shuffle=True): uniform N-class combination, per-class permutation,
    first K → support, next Q → query. Deterministic under ``seed``.
    """

    def __init__(self, image_table: np.ndarray, image_ids: np.ndarray,
                 class_set: ClassSet, spec: EpisodeSpec, seed: int = 0):
        class_set.validate_episode(spec.num_shots, spec.num_query)
        self.spec = spec
        self.image_table = np.asarray(image_table)
        self.image_ids = np.asarray(image_ids, dtype=np.int32)
        self.class_set = class_set
        self.rng = np.random.RandomState(seed)

    def sample(self) -> Episode:
        spec = self.spec
        cs = self.class_set
        B, N, K, Q = (spec.batch_size, spec.num_ways, spec.num_shots,
                      spec.num_query)
        s_rows = np.empty((B, N * K), dtype=np.int64)
        q_rows = np.empty((B, N * Q), dtype=np.int64)
        text_idx = np.empty((B, N), dtype=np.int64)
        for b in range(B):
            chosen = self.rng.choice(cs.num_classes, size=N, replace=False)
            text_idx[b] = chosen
            for i, c in enumerate(chosen):
                cnt = int(cs.class_counts[c])
                perm = self.rng.permutation(cnt)[:K + Q]
                rows = cs.class_image_rows[c, perm]
                s_rows[b, i * K:(i + 1) * K] = rows[:K]
                q_rows[b, i * Q:(i + 1) * Q] = rows[K:]

        text_cls = cs.text_features[text_idx]  # (B, N, E|T)
        support_text = np.repeat(text_cls, K, axis=1)
        mask = (np.repeat(cs.text_mask[text_idx], K, axis=1)
                if cs.text_mask is not None else None)
        s_y = np.tile(np.repeat(np.arange(N, dtype=np.int32), K)[None],
                      (B, 1))
        q_y = np.tile(np.repeat(np.arange(N, dtype=np.int32), Q)[None],
                      (B, 1))
        return Episode(
            support_im=jnp.asarray(self.image_table[s_rows]),
            support_text=jnp.asarray(support_text),
            support_text_mask=(jnp.asarray(mask) if mask is not None
                               else None),
            support_ids=jnp.asarray(self.image_ids[s_rows]),
            support_y=jnp.asarray(s_y),
            query_im=jnp.asarray(self.image_table[q_rows]),
            query_ids=jnp.asarray(self.image_ids[q_rows]),
            query_y=jnp.asarray(q_y),
        )

    def __iter__(self):
        while True:
            yield self.sample()
