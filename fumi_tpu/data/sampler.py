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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.core.mesh import largest_divisor_leq
from fumi_tpu.core.episode import Episode, EpisodeSpec
from fumi_tpu.data.class_set import ClassSet


class SamplerTables(NamedTuple):
    """Device-resident episodic tables — a pytree passed through jit
    boundaries as an ARGUMENT, never closed over (a closed-over multi-GB
    table becomes an XLA constant, which stalls compilation and bloats the
    executable; as an argument it is a zero-copy parameter)."""
    image_table: jnp.ndarray  # (num_images, D)
    image_ids: jnp.ndarray  # (num_images,) int32
    class_rows: jnp.ndarray  # (C, max_count) int32
    class_counts: jnp.ndarray  # (C,) int32
    text_features: jnp.ndarray  # (C, E|T)


def table_storage(table: jnp.ndarray, compute_dtype: str) -> jnp.ndarray:
    """HBM storage dtype of the episodic image table under
    ``--tpu_compute_dtype``: ``bfloat16`` halves table memory and gather
    bandwidth; episodes are cast back to fp32 at gather time (the
    production pairing used by the CLI and bench).

    Integer tables (uint8 raw-pixel images, e.g. the Zenodo
    ``low-res-images.hdf5``) are left untouched — uint8 is already half
    of bf16, and the [0,1] normalization happens at gather time."""
    if compute_dtype == "bfloat16" and \
            jnp.issubdtype(table.dtype, jnp.floating):
        return table.astype(jnp.bfloat16)
    return table


def pixels_to_float(im: jnp.ndarray) -> jnp.ndarray:
    """Gather-time dtype policy for episode image leaves: integer tables
    are raw pixels → fp32 in [0,1]; non-fp32 floats (bf16-stored
    embedding tables) → fp32; fp32 passes through. Works on jnp and np
    arrays (the multiprocess loader assembles episodes in numpy)."""
    if jnp.issubdtype(im.dtype, jnp.integer):
        return im.astype(jnp.float32) * (1.0 / 255.0)
    if im.dtype != jnp.float32:
        return im.astype(jnp.float32)
    return im


def augment_raw_images(key: jax.Array, images: jnp.ndarray,
                       pad: int = 4) -> jnp.ndarray:
    """Random horizontal flip + pad-``pad``-and-random-crop, per image.

    The classic raw-image few-shot training augmentation, as pure
    vectorized device ops (`where` for flips, vmapped ``dynamic_slice``
    for crops) so it fuses into the episode-sampling program. Edge padding
    (zeros would bias the batch-stat norms of the conv backbones).
    """
    M, H, W, C = images.shape
    k_flip, k_y, k_x = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k_flip, 0.5, (M,))
    images = jnp.where(flip[:, None, None, None],
                       images[:, :, ::-1, :], images)
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
    oy = jax.random.randint(k_y, (M,), 0, 2 * pad + 1)
    ox = jax.random.randint(k_x, (M,), 0, 2 * pad + 1)

    def crop(img, oy_, ox_):
        return jax.lax.dynamic_slice(img, (oy_, ox_, 0), (H, W, C))

    return jax.vmap(crop)(padded, oy, ox)


def sample_episode(tables: SamplerTables, spec: EpisodeSpec,
                   key: jax.Array,
                   use_pallas_gather: bool = False,
                   augment_scale: float = 0.0) -> Episode:
    """Draw one meta-batch from device tables. Pure; jit/fusion friendly.

    ``augment_scale > 0`` applies multiplicative uniform jitter to the
    SUPPORT embeddings (train-time augmentation; the TPU-native meaning of
    the reference's otherwise-unused ``--augment`` flag, ref:
    utils.py:92-94). Queries stay clean.
    """
    B, N, K, Q = (spec.batch_size, spec.num_ways, spec.num_shots,
                  spec.num_query)
    KQ = K + Q
    num_classes = tables.class_rows.shape[0]
    max_count = tables.class_rows.shape[1]
    k_cls, k_img, k_aug = jax.random.split(key, 3)

    # N distinct classes per task: top-N of uniform noise over C.
    cls_noise = jax.random.uniform(k_cls, (B, num_classes))
    _, class_idx = jax.lax.top_k(cls_noise, N)  # (B, N)

    counts = tables.class_counts[class_idx]  # (B, N)
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
        tables.class_rows[class_idx], sel, axis=-1)  # (B, N, K+Q)
    s_rows = rows[..., :K].reshape(B, N * K)
    q_rows = rows[..., K:].reshape(B, N * Q)

    if use_pallas_gather:
        from fumi_tpu.ops.pallas_kernels import (gather_rows,
                                                 gather_rows_supported)
        # compiled pallas gather only supports tile-aligned row widths on
        # flat 2-D embedding tables; raw NHWC image tables and other
        # widths fall back to the XLA gather
        if tables.image_table.ndim != 2 or \
                not gather_rows_supported(int(tables.image_table.shape[-1])):
            use_pallas_gather = False

    if use_pallas_gather:
        def _gather(r):
            M = r.shape[0] * r.shape[1]
            br = largest_divisor_leq(M, 64)
            flat = gather_rows(tables.image_table, r.reshape(M), br)
            return flat.reshape(r.shape[0], r.shape[1], -1)
        support_im = _gather(s_rows)
        query_im = _gather(q_rows)
    else:
        support_im = tables.image_table[s_rows]  # (B, N*K, D)
        query_im = tables.image_table[q_rows]  # (B, N*Q, D)

    # tables may be stored bf16 (halved HBM + gather bandwidth) or uint8
    # (raw pixels, normalized to [0,1] here); episodic math stays fp32
    # (params and inner-loop numerics are unaffected)
    support_im = pixels_to_float(support_im)
    query_im = pixels_to_float(query_im)

    if augment_scale > 0.0:
        if support_im.ndim == 5:
            # raw images (B, NK, H, W, C): the standard few-shot raw-image
            # augmentation — random horizontal flip + pad-and-random-crop
            # — as vectorized device ops (queries stay clean)
            shape = support_im.shape
            flat = support_im.reshape((B * N * K,) + shape[2:])
            flat = augment_raw_images(k_aug, flat)
            support_im = flat.reshape(shape)
        else:
            from fumi_tpu.ops.pallas_kernels import \
                augment_embeddings_reference
            flat = support_im.reshape(B * N * K, -1)
            flat = augment_embeddings_reference(flat, k_aug, augment_scale)
            support_im = flat.reshape(B, N * K, -1)

    # per-class text repeated per shot, class-major like the targets
    text_cls = tables.text_features[class_idx]  # (B, N, E|T)
    support_text = jnp.repeat(text_cls, K, axis=1)  # (B, N*K, E|T)

    s_y = jnp.tile(jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)[None],
                   (B, 1))
    q_y = jnp.tile(jnp.repeat(jnp.arange(N, dtype=jnp.int32), Q)[None],
                   (B, 1))
    return Episode(
        support_im=support_im,
        support_text=support_text,
        # validity is recoverable from PAD tokens — every encoder derives
        # its own mask (text_encoders.py), so carrying a (B, NK, T) mask
        # per episode is wasted HBM traffic in the hot path
        support_text_mask=None,
        support_ids=tables.image_ids[s_rows],
        support_y=s_y,
        query_im=query_im,
        query_ids=tables.image_ids[q_rows],
        query_y=q_y,
    )


class DeviceEpisodeSampler:
    """Fused on-device episodic sampler.

    Holds a :class:`SamplerTables` pytree + an :class:`EpisodeSpec`.
    Fast-path consumers (the chunked drivers in fumi_tpu/train/steps.py)
    call :func:`sample_episode` with ``self.tables`` as a jit ARGUMENT;
    ``self.sample(key)`` is the convenience closure form for small tables.

    Args:
      image_table: (num_images, D) — all image embeddings, device-resident.
      image_ids:   (num_images,) int32 — row → raw image id. For iNat-Anim
                   rows ARE image ids (ref: data.py:429-430 keys h5 by id),
                   but synthetic sets may differ.
      class_set:   the split's ClassSet.
      spec:        episode geometry.
      allow_replacement: opt IN to with-replacement sampling for classes
                   with fewer than K+Q images (the ``j % count`` wrap in
                   :func:`sample_episode`). Default False: construction
                   fails fast via ``class_set.validate_episode`` — the
                   wrap silently duplicates support/query images, which
                   inflates accuracy on thin real-data classes, whereas
                   torchmeta's ClassSplitter raises loudly (ref:
                   fumi/dataset/data.py:146-184).
    """

    def __init__(self, image_table: jnp.ndarray, image_ids: jnp.ndarray,
                 class_set: ClassSet, spec: EpisodeSpec,
                 use_pallas_gather: bool = False,
                 augment_scale: float = 0.0,
                 allow_replacement: bool = False):
        if not allow_replacement:
            class_set.validate_episode(spec.num_shots, spec.num_query)
        elif np.any(np.asarray(class_set.class_counts) < 1):
            # even with replacement there is nothing to draw from an empty
            # class — the wrap would silently emit padding rows
            raise ValueError("split contains classes with zero images")
        self.spec = spec
        self.tables = SamplerTables(
            image_table=jnp.asarray(image_table),
            image_ids=jnp.asarray(image_ids, dtype=jnp.int32),
            class_rows=jnp.asarray(class_set.class_image_rows,
                                   dtype=jnp.int32),
            class_counts=jnp.asarray(class_set.class_counts,
                                     dtype=jnp.int32),
            text_features=jnp.asarray(class_set.text_features),
        )
        if class_set.num_classes < spec.num_ways:
            raise ValueError(
                f"split has {class_set.num_classes} classes but episodes "
                f"need num_ways={spec.num_ways}")
        self.num_classes = class_set.num_classes
        # Pallas DMA gather for episode assembly (fumi_tpu/ops/pallas_kernels)
        self.use_pallas_gather = use_pallas_gather
        self.augment_scale = augment_scale

    def sample(self, key: jax.Array, tables: Optional[SamplerTables] = None
               ) -> Episode:
        return sample_episode(tables if tables is not None else self.tables,
                              self.spec, key,
                              use_pallas_gather=self.use_pallas_gather,
                              augment_scale=self.augment_scale)


class HostEpisodeSampler:
    """Reference-policy host sampler.

    Sampling policy of torchmeta's CombinationMetaDataset + ClassSplitter
    (shuffle=True): uniform N-class combination, per-class permutation,
    first K → support, next Q → query. Deterministic under ``seed``.

    Index generation runs through the native C++ sampler
    (fumi_tpu/native/episodic_sampler.cpp) when available — same policy,
    xoshiro256** streams, no per-episode Python object traffic — with a
    numpy fallback. ``backend="numpy"`` forces the fallback.

    ``allow_replacement=True`` opts into with-replacement sampling for
    classes thinner than K+Q (index wrap modulo count, mirroring the
    device sampler's permissive mode); such configs force the numpy
    backend. Default False fails fast like torchmeta's ClassSplitter.

    ``augment_scale > 0`` applies the same train-time support-set
    augmentation as the device path (embedding jitter, or flip+crop for
    raw images) after episode assembly.
    """

    def __init__(self, image_table: np.ndarray, image_ids: np.ndarray,
                 class_set: ClassSet, spec: EpisodeSpec, seed: int = 0,
                 backend: str = "auto", allow_replacement: bool = False,
                 augment_scale: float = 0.0):
        if not allow_replacement:
            class_set.validate_episode(spec.num_shots, spec.num_query)
        elif np.any(np.asarray(class_set.class_counts) < 1):
            # rng.permutation(0) is empty — indexing it would IndexError
            # mid-training; reject empty classes up front
            raise ValueError("split contains classes with zero images")
        need = spec.num_shots + spec.num_query
        self._wraps = bool(np.any(class_set.class_counts < need))
        self.allow_replacement = allow_replacement
        self._backend_arg = backend
        self.spec = spec
        self.image_table = np.asarray(image_table)
        self.image_ids = np.asarray(image_ids, dtype=np.int32)
        self.class_set = class_set
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.augment_scale = augment_scale
        self._counter = 0
        self._native = None
        if backend in ("auto", "native") and not self._wraps:
            # the C++ sampler assumes count >= K+Q; wrap mode stays numpy
            from fumi_tpu import native
            self._native = native.load()
            if backend == "native" and self._native is None:
                raise RuntimeError("native sampler unavailable (no g++?)")
        elif backend == "native" and self._wraps:
            raise RuntimeError(
                "--tpu_sampler_backend native cannot serve classes thinner "
                "than K+Q (the with-replacement wrap is numpy-only)")

    def __getstate__(self):
        """Picklable state for spawn-context loader workers: the ctypes
        handle can't cross process boundaries; it is re-loaded in
        ``__setstate__`` (the compiled .so is mtime-cached, so the child
        pays a dlopen, not a rebuild)."""
        state = self.__dict__.copy()
        state["_native"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self._backend_arg in ("auto", "native") and not self._wraps:
            from fumi_tpu import native
            self._native = native.load()
            if self._backend_arg == "native" and self._native is None:
                raise RuntimeError(
                    "native sampler unavailable after unpickling")

    @property
    def backend_name(self) -> str:
        """The index backend actually in use. ``native`` (xoshiro256**)
        and ``numpy`` (RandomState) draw from the same POLICY but emit
        DIFFERENT episode streams for the same seed — comparisons across
        machines must pin ``--tpu_sampler_backend`` (auto resolves per-box
        by whether the shared library could be built)."""
        return "numpy" if self._native is None else "native"

    def _draw_indices(self, B, N, K, Q):
        """(class_idx (B,N), sel (B,N,K+Q)) by native or numpy backend."""
        cs = self.class_set
        if self._native is not None:
            from fumi_tpu import native
            class_idx, sel = native.sample_episodes_native(
                self._native, self.seed, self._counter,
                cs.class_counts, B, N, K + Q)
            self._counter += 1
            return class_idx, sel
        class_idx = np.empty((B, N), dtype=np.int64)
        sel = np.empty((B, N, K + Q), dtype=np.int64)
        for b in range(B):
            class_idx[b] = self.rng.choice(cs.num_classes, size=N,
                                           replace=False)
            for i, c in enumerate(class_idx[b]):
                cnt = int(cs.class_counts[c])
                # modulo wrap = with-replacement for thin classes; a no-op
                # when cnt >= K+Q (allow_replacement gates construction)
                sel[b, i] = self.rng.permutation(cnt)[
                    np.arange(K + Q) % max(cnt, 1)]
        return class_idx, sel

    def _indices_at(self, counter: int):
        """Stateless native draw at an explicit episode counter — the
        contract the multiprocess loader relies on: episode ``counter``'s
        indices depend only on ``(seed, counter)``, so any worker can
        compute any episode. Native backend only (the numpy backend is a
        sequential RandomState stream)."""
        if self._native is None:
            raise RuntimeError("counter-addressed sampling needs the "
                               "native backend")
        from fumi_tpu import native
        spec = self.spec
        return native.sample_episodes_native(
            self._native, self.seed, counter, self.class_set.class_counts,
            spec.batch_size, spec.num_ways,
            spec.num_shots + spec.num_query)

    def _assemble_numpy(self, class_idx, sel) -> dict:
        """Pure-numpy episode assembly from drawn indices (no jax, no
        device transfers) — runs in loader worker PROCESSES, where touching
        the jax runtime is unsafe after fork."""
        spec = self.spec
        cs = self.class_set
        B, N, K, Q = (spec.batch_size, spec.num_ways, spec.num_shots,
                      spec.num_query)
        rows = np.take_along_axis(
            cs.class_image_rows[class_idx], sel, axis=-1)  # (B, N, K+Q)
        s_rows = rows[..., :K].reshape(B, N * K)
        q_rows = rows[..., K:].reshape(B, N * Q)
        text_cls = cs.text_features[class_idx]  # (B, N, E|T)
        support_text = np.repeat(text_cls, K, axis=1)
        s_y = np.tile(np.repeat(np.arange(N, dtype=np.int32), K)[None],
                      (B, 1))
        q_y = np.tile(np.repeat(np.arange(N, dtype=np.int32), Q)[None],
                      (B, 1))
        return dict(support_im=self.image_table[s_rows],
                    support_text=support_text,
                    support_ids=self.image_ids[s_rows], support_y=s_y,
                    query_im=self.image_table[q_rows],
                    query_ids=self.image_ids[q_rows], query_y=q_y)

    def _finish(self, parts: dict) -> Episode:
        """Device transfer + augmentation of an assembled numpy episode
        (main process: augmentation keys come from this sampler's
        sequential seeded stream)."""
        spec = self.spec
        B, N, K = spec.batch_size, spec.num_ways, spec.num_shots
        # same gather-time dtype policy as the device path: uint8 pixel
        # tables → fp32 [0,1], bf16 embedding tables → fp32
        support_im = pixels_to_float(jnp.asarray(parts["support_im"]))
        query_im = pixels_to_float(jnp.asarray(parts["query_im"]))
        if self.augment_scale > 0.0:
            # same transforms as the device path (sample_episode), with a
            # key drawn from this sampler's seeded numpy stream so host
            # runs stay deterministic under `seed`
            k_aug = jax.random.PRNGKey(int(self.rng.randint(0, 2 ** 31)))
            if support_im.ndim == 5:
                shape = support_im.shape
                flat = support_im.reshape((B * N * K,) + shape[2:])
                support_im = augment_raw_images(k_aug, flat).reshape(shape)
            else:
                from fumi_tpu.ops.pallas_kernels import \
                    augment_embeddings_reference
                flat = support_im.reshape(B * N * K, -1)
                flat = augment_embeddings_reference(
                    flat, k_aug, self.augment_scale)
                support_im = flat.reshape(B, N * K, -1)
        return Episode(
            support_im=support_im,
            support_text=jnp.asarray(parts["support_text"]),
            # encoders re-derive the padding mask from PAD tokens
            support_text_mask=None,
            support_ids=jnp.asarray(parts["support_ids"]),
            support_y=jnp.asarray(parts["support_y"]),
            query_im=query_im,
            query_ids=jnp.asarray(parts["query_ids"]),
            query_y=jnp.asarray(parts["query_y"]),
        )

    def sample(self) -> Episode:
        spec = self.spec
        class_idx, sel = self._draw_indices(
            spec.batch_size, spec.num_ways, spec.num_shots, spec.num_query)
        return self._finish(self._assemble_numpy(class_idx, sel))

    def watch_clone(self) -> "HostEpisodeSampler":
        """An INDEPENDENT sampler over the same tables with a derived
        seed — consumers that need side-channel episodes (``--tpu_watch``
        gradient samples) draw from this instead of the training stream,
        which must stay bit-identical whether telemetry is on or off."""
        return HostEpisodeSampler(
            self.image_table, self.image_ids, self.class_set, self.spec,
            seed=self.seed + 0x5EED, backend=self._backend_arg,
            allow_replacement=self.allow_replacement,
            augment_scale=self.augment_scale)

    def __iter__(self):
        while True:
            yield self.sample()


class _WorkerError:
    """Queue envelope carrying a prefetch-worker exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchingSampler:
    """Background-thread episode prefetcher for host samplers.

    The reference's only concurrency is torch DataLoader worker processes
    (``--num_workers``, ref: utils.py:95-98). Host-side sampling here is
    cheap (native index sampler + table gathers) but still overlaps with
    device compute when wrapped: ``depth`` episodes are staged ahead by a
    daemon thread. Device-sampler runs don't need this (sampling happens
    inside the XLA program).

    Failure semantics: an exception raised by the wrapped sampler inside
    the worker thread is captured and re-raised — with its original
    traceback — by the next ``sample()`` call, matching torch DataLoader
    workers (which propagate worker exceptions to the iterating process)
    rather than deadlocking the training loop on an empty queue.
    """

    def __init__(self, sampler: "HostEpisodeSampler", depth: int = 2):
        import queue
        import threading
        self.sampler = sampler
        self.spec = sampler.spec
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = self.sampler.sample()
            except BaseException as e:  # noqa: BLE001 — relayed, not hidden
                item = _WorkerError(e)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except Exception:
                    continue
            if isinstance(item, _WorkerError):
                return  # the stream is broken; don't keep drawing past it

    def sample(self) -> Episode:
        if getattr(self, "_failed", None) is not None:
            raise self._failed  # the worker is dead; don't block forever
        item = self._q.get()
        if isinstance(item, _WorkerError):
            self._failed = item.exc
            raise item.exc
        return item

    def __iter__(self):
        while True:
            yield self.sample()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


def _mp_worker(sampler: "HostEpisodeSampler", w: int, num_workers: int,
               base: int, q, stop) -> None:
    """Loader worker process ``w``: computes episodes at counters
    ``base+w, base+w+num_workers, ...`` (counter-addressed native draws +
    pure-numpy assembly — NO jax calls: the forked child inherits the
    parent's jax runtime, which is not fork-safe) and streams the numpy
    parts to the consumer. Exceptions ride the queue like the thread
    prefetcher's; un-picklable ones are re-wrapped with their traceback."""
    import pickle
    import traceback

    c = base + w
    while not stop.is_set():
        try:
            class_idx, sel = sampler._indices_at(c)
            item = (c, sampler._assemble_numpy(class_idx, sel))
        except BaseException as e:  # noqa: BLE001 — relayed, not hidden
            try:
                pickle.dumps(e)
            except Exception:
                e = RuntimeError(
                    f"loader worker {w} died:\n"
                    + "".join(traceback.format_exception(
                        type(e), e, e.__traceback__)))
            item = _WorkerError(e)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                break
            except Exception:
                continue
        if stop.is_set():
            # shutdown: nobody drains the queue anymore — drop buffered
            # data instead of blocking process exit on the feeder flush
            q.cancel_join_thread()
            return
        if isinstance(item, _WorkerError):
            return  # the stream is broken; don't keep drawing past it
        c += num_workers


class MultiprocessSampler:
    """Multi-process episode loader — the reference's ``--num_workers``
    as worker PROCESSES (torch DataLoader semantics, ref: utils.py:95-98),
    not a thread.

    Exploits the native backend's counter-addressed determinism: episode
    ``c``'s indices depend only on ``(seed, c)``, so worker ``w`` computes
    counters ``w, w+W, w+2W, ...`` independently and the consumer
    round-robins the per-worker queues — the episode STREAM is exactly the
    single-process native stream (pinned by test), with assembly
    parallelized and overlapped with device compute. Workers are forked
    (the episode tables are shared copy-on-write, never pickled) and do
    numpy-only work; device transfer happens in the consumer.

    Constraints (explicit, not silent): needs the native backend (the
    numpy backend is a sequential stream only its owner can advance) and
    no host-side augmentation (augment keys come from the sampler's
    sequential stream). The CLI falls back to the prefetch thread for
    those configs.

    Start method (``mp_context``): ``fork`` (default) shares the episode
    tables copy-on-write and inherits the loaded ctypes lib — zero-copy,
    but forking a process whose JAX/TPU runtime threads hold locks is
    formally unsafe (mitigated here by workers doing numpy-only work and
    never touching jax; the hazard window is the fork instant itself).
    ``spawn`` sidesteps fork-after-threads entirely at the cost of
    pickling the sampler (tables copied once per worker) and a fresh
    interpreter+import per worker. Both produce the identical episode
    stream (indices are pure functions of ``(seed, counter)``).

    Failure semantics: a worker exception re-raises in ``sample()`` with
    the episodes before it intact (counter order preserved); a worker
    killed outright (no envelope) raises instead of hanging — including
    a worker killed MID-WRITE: the consumer never blocks on a pipe read
    directly (a partial multi-part message would block ``recv`` past any
    ``Queue.get`` timeout); per-worker reader THREADS do the blocking
    reads and forward complete items to bounded thread queues, so
    ``sample()``'s timeout is end-to-end and the dead-worker check always
    runs.
    """

    def __init__(self, sampler: "HostEpisodeSampler", num_workers: int,
                 depth: int = 2, mp_context: str = "fork"):
        import multiprocessing as mp
        import queue as _tq
        import threading
        if sampler._native is None:
            raise ValueError(
                "MultiprocessSampler needs the native (counter-addressed) "
                "sampler backend; the numpy backend is a sequential stream")
        if sampler.augment_scale > 0.0:
            raise ValueError(
                "MultiprocessSampler does not support host-side "
                "augmentation (sequential key stream); use the prefetch "
                "thread or the device sampler")
        if num_workers < 1:
            raise ValueError("num_workers must be >= 1")
        if mp_context not in ("fork", "spawn"):
            raise ValueError(f"mp_context must be fork|spawn, got "
                             f"{mp_context!r}")
        self.sampler = sampler
        self.spec = sampler.spec
        self.num_workers = num_workers
        ctx = mp.get_context(mp_context)
        self._stop = ctx.Event()
        self._tstop = threading.Event()
        self._base = sampler._counter
        self._next = self._base
        self._queues = [ctx.Queue(maxsize=max(1, depth))
                        for _ in range(num_workers)]
        # Reader-thread bridges: the only place that blocks on the mp
        # queues' pipe reads. Bounded at 1 so backpressure still reaches
        # the workers through the mp queues' maxsize.
        self._out = [_tq.Queue(maxsize=1) for _ in range(num_workers)]
        self._failed: Optional[BaseException] = None
        self._procs = [
            ctx.Process(target=_mp_worker,
                        args=(sampler, w, num_workers, self._base,
                              self._queues[w], self._stop),
                        daemon=True)
            for w in range(num_workers)]
        for p in self._procs:
            p.start()
        self._readers = [
            threading.Thread(target=self._reader_loop, args=(w,),
                             daemon=True)
            for w in range(num_workers)]
        for t in self._readers:
            t.start()

    def _reader_loop(self, w: int) -> None:
        import queue as _tq
        while not self._tstop.is_set():
            try:
                item = self._queues[w].get(timeout=0.2)
            except _tq.Empty:
                continue
            except (EOFError, OSError) as e:
                item = _WorkerError(RuntimeError(
                    f"loader worker {w} queue broke: {e!r}"))
            while not self._tstop.is_set():
                try:
                    self._out[w].put(item, timeout=0.2)
                    break
                except _tq.Full:
                    continue
            if isinstance(item, _WorkerError):
                return

    def sample(self) -> Episode:
        import queue as _tq
        if self._failed is not None:
            raise self._failed  # the stream is broken; keep raising
        w = (self._next - self._base) % self.num_workers
        while True:
            try:
                item = self._out[w].get(timeout=1.0)
                break
            except _tq.Empty:
                if not self._procs[w].is_alive():
                    # one grace read: the reader may still be forwarding
                    # an item the worker completed before dying
                    try:
                        item = self._out[w].get(timeout=0.5)
                        break
                    except _tq.Empty:
                        pass
                    self._failed = RuntimeError(
                        f"loader worker {w} died without reporting "
                        f"(exit code {self._procs[w].exitcode})")
                    raise self._failed
        if isinstance(item, _WorkerError):
            self._failed = item.exc
            raise item.exc
        c, parts = item
        assert c == self._next, (c, self._next)
        # keep the wrapped sampler's counter in step with consumption:
        # code that later unwraps (loop.py's getattr(..., "sampler")
        # pattern) and calls .sample() directly must draw counter N,
        # not replay 0..N-1. Interleaved direct draws from the base
        # sampler while this wrapper is live would be silently REWOUND
        # by that sync (the directly-drawn episode delivered again by
        # the mp stream) — fail loudly instead: direct draws are valid
        # only after the wrapper is closed/drained.
        if self.sampler._counter != self._next:
            raise RuntimeError(
                f"base sampler drawn directly while MultiprocessSampler "
                f"is live (base counter {self.sampler._counter}, stream "
                f"at {self._next}) — unwrap only after close()")
        self._next += 1
        self.sampler._counter = self._next
        return self.sampler._finish(parts)

    def __iter__(self):
        while True:
            yield self.sample()

    def close(self):
        # Never drain the mp queues from this thread: get_nowait() on a
        # partially-written message blocks in recv past any timeout. The
        # workers exit via the stop event (their put() loop polls it),
        # and cancel_join_thread() lets queues drop buffered data.
        self._stop.set()
        self._tstop.set()
        for p in self._procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
        for q in self._queues:
            try:
                q.cancel_join_thread()
                q.close()
            except Exception:
                pass
