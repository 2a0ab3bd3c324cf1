"""Few-shot serving: adapt once, classify many.

The reference is a research harness with no inference story — after
training you get wandb metrics and a CSV. Production serving of a few-shot
model is a different shape: **adapt once on a support set, then classify a
stream of queries** against the frozen adapted state. This module provides
that surface for every family:

- MAML / FuMI: run the test-time adaptation once (the expensive 100-step
  scan), keep the adapted parameters, serve queries with a single forward.
- AM3: compute the λ-fused class prototypes once, serve queries with one
  distance matmul.

Usage::

    clf = FewShotClassifier.from_checkpoint(run_dir, cfg, dictionary)
    clf.adapt(support_images, support_text, support_labels)
    labels = clf.classify(query_images)        # (M,) int labels
    probs = clf.classify(query_images, return_probs=True)

``classify`` is a cached jit; per-call cost is one small forward pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.core.config import Config, TOKEN_TEXT_ENCODERS
from fumi_tpu.metalearn.inner_loop import sgd_inner_update
from fumi_tpu.ops import fewshot
from fumi_tpu.train.steps import build_family


def _stack_keys(keys):
    """Stack PRNG keys into a (R,) key batch (typed and raw uint32 alike)."""
    return jnp.stack(keys)


def _np_softmax(logits: np.ndarray) -> np.ndarray:
    """Stable host-side softmax — request post-processing stays numpy
    (the logits are already fetched, and eager jnp post-ops would
    compile once per query-count shape). One definition for both
    classifier classes and the HTTP renderer."""
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _bucket_queries(query_im, axis: int, enabled: bool = True):
    """Pad the per-episode QUERY axis M up to the next power of two by
    repeating the last query; callers slice the logits back to M.

    Exact for embedding-input families (adaptation reads only the
    support set; query classification is per-query independent), and
    the query-count analogue of the R bucketing below: production
    traffic with variable query counts hits ~log2 compiled programs
    instead of retracing per distinct M — a retrace costs seconds on a
    tunneled runtime vs the <2x padded forward math (queries are the
    cheap half of a request).

    ``enabled=False`` skips the padding (still validating M): raw-image
    backbones (conv4/resnet12) normalize with CURRENT-BATCH statistics
    over the query batch — transductive batch norm, the model's
    semantics — so padded duplicate queries would shift every real
    query's logits. Those models compile one program per distinct M
    instead (matching their engine-eval predictions exactly).

    HOST-side numpy on purpose: eager jnp pad ops would themselves
    compile per distinct M (seconds each on a tunneled runtime), which
    is exactly what bucketing exists to avoid. Callers pad BEFORE any
    device placement. Returns ``(M, padded_query_im)``."""
    query_im = np.asarray(query_im)
    M = query_im.shape[axis]
    if M == 0:
        raise RequestError("request has no queries (query_im is empty "
                           "along the query axis)")
    if not enabled:
        return M, query_im
    m_pad = 1 << (M - 1).bit_length()
    if m_pad != M:
        idx = [slice(None)] * query_im.ndim
        idx[axis] = slice(M - 1, M)
        last = query_im[tuple(idx)]
        query_im = np.concatenate(
            [query_im, np.repeat(last, m_pad - M, axis=axis)], axis=axis)
    return M, query_im


def _pad_episodes(r_pad, *arrays):
    """Pad every array's leading (episode) axis from R up to ``r_pad`` by
    repeating the last episode — the shared request-bucketing transform
    (variable-size batches hit a handful of compiled programs instead of
    retracing per distinct R; see episode_logits_batch). Host-side numpy
    like ``_bucket_queries``: eager jnp pads would compile per distinct
    true R inside a bucket."""
    arrays = tuple(np.asarray(x) for x in arrays)
    R = arrays[0].shape[0]
    if r_pad == R:
        return arrays
    pad = r_pad - R
    tile = lambda x: np.concatenate(
        [x, np.repeat(x[-1:], pad, axis=0)], axis=0)
    return tuple(tile(x) for x in arrays)


def _prep_batched_request(cfg, prep_text, support_im, support_y, query_im,
                          support_text, rng, dp: int = 1,
                          bucket_m: bool = True):
    """THE batched-request policy, shared by FewShotClassifier and
    SeedEnsemble ``episode_logits_batch``: array coercion, per-episode
    key derivation (episode r uses ``split(rng, n)[r]``, independent of
    n — see the bucket-size split note below), power-of-two
    R bucketing via ``_pad_episodes`` (rounded up to a dp multiple when
    the batch will shard over a mesh), and power-of-two query-axis
    bucketing via ``_bucket_queries``. One definition so a policy change
    cannot silently reach only one front-end. Returns
    ``(R, M, support_im, support_y, support_text, query_im, keys)`` with
    the arrays padded to the bucket sizes and ``R``/``M`` the true
    request counts (callers slice outputs back with ``[:R, :M]``)."""
    _check_support_y(cfg, support_y)
    support_im = np.asarray(support_im, dtype=np.float32)
    support_y = np.asarray(support_y, dtype=np.int32)
    R = support_im.shape[0]
    if R == 0:
        # the M=0 analogue (_bucket_queries): without this guard an
        # empty batch reaches the jitted vmap as 0-row episode arrays
        # against (r_pad,) keys — an opaque ValueError the HTTP layer
        # would map to a 500 for what is a malformed request
        raise RequestError("request has no episodes (support_im is "
                           "empty along the episode axis)")
    support_text = prep_text(support_text, R, support_im.shape[1])
    M, query_im = _bucket_queries(query_im, axis=1, enabled=bucket_m)
    r_pad = max(1, 1 << (R - 1).bit_length())  # next power of two
    if dp > 1:
        r_pad = ((r_pad + dp - 1) // dp) * dp
    # split at the BUCKET size: split(rng, n)[r] is counter-based and
    # independent of n, so episode r's key is unchanged, the padding
    # episodes' keys come for free, and there is no per-distinct-R eager
    # split/pad to compile. The n-independence holds for rbg and for
    # threefry under jax_threefry_partitionable (this jax version's
    # default) but NOT under legacy threefry — _check_split_n_invariance
    # asserts it once per process rather than trusting the default.
    _check_split_n_invariance()
    keys = jax.random.split(rng, r_pad)
    return (R, M) + _pad_episodes(r_pad, support_im, support_y,
                                  support_text, query_im) + (keys,)


def _check_support_y(cfg: Config, support_y) -> None:
    """Reject out-of-range support labels loudly. Labels must be
    episode-local class ids in [0, num_ways) (the adapt/episode
    docstrings' contract): an out-of-range id — typically a client
    sending raw DATASET class ids instead of remapping per episode —
    would otherwise be dropped silently by XLA's out-of-bounds scatter
    semantics (that support sample simply stops contributing), returning
    confidently wrong answers instead of an error. Host-side, O(NK)."""
    y = np.asarray(support_y)
    if y.size and (y.min() < 0 or y.max() >= cfg.num_ways):
        raise RequestError(
            f"support_y must be episode-local class ids in "
            f"[0, {cfg.num_ways}) for this {cfg.num_ways}-way model "
            f"(got range [{y.min()}, {y.max()}]); remap dataset class "
            "ids to 0..N-1 per episode")


@functools.lru_cache(maxsize=None)
def _check_split_n_invariance() -> None:
    """Assert ``split(k, n)[r]`` does not depend on ``n`` — the invariant
    the bucket-size key split above relies on for reproducibility (the
    same request must get the same episode keys whatever padding bucket
    it lands in). True for rbg, and for threefry only under
    ``jax_threefry_partitionable`` (the default here, but a config flip
    or an old jax would silently change per-request randomness)."""
    k = jax.random.PRNGKey(0)
    a = jax.random.key_data(jax.random.split(k, 2))[0]
    b = jax.random.key_data(jax.random.split(k, 4))[0]
    if not np.array_equal(np.asarray(a), np.asarray(b)):
        raise RuntimeError(
            "jax.random.split(k, n) prefix depends on n under the active "
            "PRNG config — serving's padding-bucket key policy needs "
            "jax_threefry_partitionable=True (or --tpu_prng_impl rbg)")


class RequestError(ValueError):
    """A request-content problem detected past the parse layer (e.g.
    missing support_text on a token-encoder model). The HTTP front-end
    maps this to 400; other exceptions stay 500 (server-side)."""


def serving_dictionary(cfg: Config, run_dir: Optional[str] = None):
    """Token dictionary for serving a glove/w2v/RNN/RNNhid model.

    Preference order: the ``vocab.json`` artifact the trainer ships with
    every token-encoder run (cheap; the trained embedding matrix lives in
    the checkpoint params, so only token→id is needed), else the dataset
    pipeline's dictionary (``--data_dir`` must be reachable). Returns
    ``None`` for non-token encoders.
    """
    if cfg.text_encoder not in TOKEN_TEXT_ENCODERS:
        return None
    if run_dir is not None:
        import json
        import os
        path = os.path.join(run_dir, "vocab.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    from fumi_tpu.cli.main import _load_data
    return _load_data(cfg)[3]


class FewShotClassifier:
    """Adapt-once / classify-many wrapper over a trained model.

    ``mesh`` (optional, a ``jax.sharding.Mesh`` with a ``dp`` axis)
    shards the BATCHED request path's leading episode axis across
    devices: R independent episodes in one dispatch adapt in parallel on
    R/dp chips each (XLA partitions the vmapped program from the input
    shardings; replicated params, no code changes to the per-episode
    math). Single-episode and stateful paths stay single-device. With a
    mesh the fused Pallas adaptation kernels are bypassed (a
    ``pallas_call`` does not partition) in favor of the vmap engine.
    """

    def __init__(self, cfg: Config, params, dictionary=None, mesh=None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.mesh = mesh
        self.family = build_family(cfg, jax.random.PRNGKey(cfg.seed),
                                   dictionary)
        # PAD id for token-length bucketing (same resolution as the
        # encoder factory, models/text_encoders.py:make_text_encoder)
        from fumi_tpu.models.text_encoders import PAD_WORD
        d = dictionary or {}
        self._pad_id = int(d.get(PAD_WORD, d.get("PAD", 0)))
        # request-shape bucketing is only applied where it is EXACT:
        # - query axis M: not for raw-image backbones (transductive
        #   batch-stat norm couples the query batch — _bucket_queries)
        # - token axis T: biLSTMs mask PAD via the frozen-carry scan;
        #   pooled word embeddings only under mean pooling with a frozen
        #   (zero) PAD row — unmasked max pooling sees appended zero
        #   rows, and a fine-tuned PAD row is no longer zero under the
        #   reference's unmasked sum (text_encoders.py:83-85)
        from fumi_tpu.models import RAW_IMAGE_ENCODERS
        self._bucket_m = cfg.im_encoder not in RAW_IMAGE_ENCODERS
        te = cfg.text_encoder
        self._bucket_t = te in ("RNN", "RNNhid") or (
            te in ("glove", "w2v") and cfg.pooling_strat == "mean"
            and not cfg.fine_tune)
        self.params = params if params is not None else self.family.params
        self._state = None  # adapted params / prototypes
        self._classify_fn = None
        self._episode_fn = None  # shared per-request program (episode_logits[_batch])
        self._adapt_fn = None  # cached jitted adaptation program
        self._serve_fn = None  # cached jitted classify program

    @classmethod
    def from_checkpoint(cls, run_dir: str, cfg: Config, dictionary=None,
                        best: bool = True) -> "FewShotClassifier":
        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.loop import eval_view
        from fumi_tpu.train.steps import make_opt
        if dictionary is None:
            # token-encoder models need the vocabulary to rebuild the
            # encoder; the trainer ships vocab.json with every such run
            dictionary = serving_dictionary(cfg, run_dir)
        self = cls(cfg, None, dictionary)
        opt = make_opt(cfg)
        params, opt_state, _ = ckpt_lib.load_checkpoint(
            run_dir, self.params, opt.init(self.params), best=best)
        # --tpu_ema checkpoints were validated/selected on the SMOOTHED
        # weights (carried in the optimizer state) — serve those, not the
        # raw params, so production matches every reported number
        self.params = eval_view(cfg, params, opt_state)
        return self

    # ------------------------------------------------------------------
    # Adaptation / classification programs are built ONCE per classifier
    # and take the support set as ARGUMENTS: re-jitting a fresh closure per
    # adapt() call would retrace+recompile on every request AND bake the
    # support arrays into the executable as constants (both documented
    # hazards of the tunneled TPU runtime — see docs/PERFORMANCE.md).

    def _build_adapt_fns(self):
        from fumi_tpu.train.steps import compute_dtype_of
        cfg = self.cfg
        n_steps, step = cfg.num_test_adapt_steps, cfg.step_size
        # --tpu_compute_dtype applies to the serving programs too: fumi/am3
        # inherit it through family.model, but maml/protonet/matchingnet
        # build their own apply/embed here and must thread it explicitly
        # (served logits match the bf16 eval engine's)
        cd = compute_dtype_of(cfg)

        if cfg.model == "maml":
            from fumi_tpu.models import RAW_IMAGE_ENCODERS, raw_image_net
            if cfg.im_encoder in RAW_IMAGE_ENCODERS:
                net = raw_image_net(cfg.im_encoder)
            else:
                from fumi_tpu.models import mlp as net

            def apply_fn(p, x, _net_apply=net.apply):
                return _net_apply(p, x, cd)

            if cfg.meta_grad == "imaml":
                # serve with the SAME adaptation semantics the model was
                # trained/evaluated under: iMAML's proximal inner solve
                from fumi_tpu.metalearn.implicit import proximal_adapt

                @jax.jit
                def adapt_fn(p, s_im, s_text, s_y, rng):
                    return proximal_adapt(
                        apply_fn, p, s_im, s_y, n_steps=n_steps,
                        step_size=step, lam=cfg.imaml_lambda)
            else:
                # ANIL (--tpu_adapt_params head): same masked updates as
                # the train/eval engines, not full fine-tuning
                mask = None
                if cfg.adapt_params == "head":
                    from fumi_tpu.metalearn.inner_loop import head_only_mask
                    mask = head_only_mask(self.params)

                @jax.jit
                def adapt_fn(p, s_im, s_text, s_y, rng):
                    def inner(p_, _):
                        g = jax.grad(lambda q: fewshot.cross_entropy(
                            apply_fn(q, s_im), s_y))(p_)
                        return sgd_inner_update(p_, g, step, mask), None
                    p_T, _ = jax.lax.scan(inner, p, None, length=n_steps)
                    return p_T

            classify = jax.jit(lambda p, state, q: apply_fn(state, q))
            return adapt_fn, classify

        if cfg.model == "fumi":
            model = self.family.model

            if cfg.meta_grad == "imaml":
                # engine-faithful: the SAME proximal joint solve the
                # iMAML-FuMI engine trains/evals with
                from fumi_tpu.metalearn.implicit import fumi_proximal_adapt
                lam = cfg.imaml_lambda

                @jax.jit
                def adapt_fn(p, s_im, s_text, s_y, rng):
                    hyper0 = model.get_hyper_params(p, s_text, s_y, rng=rng)
                    z0 = (p["im_net"], hyper0)
                    return fumi_proximal_adapt(
                        model, z0, s_im, s_y, rng, n_steps=n_steps,
                        step_size=step, lam=lam)

                classify = jax.jit(
                    lambda p, state, q: model.im_forward(
                        state[0], state[1], q, rng=jax.random.PRNGKey(0),
                        train=False))
                return adapt_fn, classify

            @jax.jit
            def adapt_fn(p, s_im, s_text, s_y, rng):
                hyper0 = model.get_hyper_params(p, s_text, s_y, rng=rng)
                im0 = p["im_net"]

                def inner(carry, _):
                    im_p, hyp = carry
                    g_im, g_h = jax.grad(
                        lambda a, b: fewshot.cross_entropy(
                            model.im_forward(a, b, s_im, rng=rng,
                                             train=False), s_y),
                        argnums=(0, 1))(im_p, hyp)
                    return (sgd_inner_update(im_p, g_im, step),
                            hyp - step * g_h), None

                (im_T, hyp_T), _ = jax.lax.scan(inner, (im0, hyper0), None,
                                                length=n_steps)
                return im_T, hyp_T

            @jax.jit
            def classify(p, state, q):
                im_T, hyp_T = state
                return model.im_forward(im_T, hyp_T, q,
                                        rng=jax.random.PRNGKey(0),
                                        train=False)
            return adapt_fn, classify

        if cfg.model == "am3":
            model = self.family.model

            @jax.jit
            def adapt_fn(p, s_im, s_text, s_y, rng):
                im_e, tx_e, lam = model.forward(
                    p, s_text[None], s_im[None], rng=rng, train=False)
                if model.lamda_fixed == 0:
                    lam = jnp.zeros_like(lam)
                elif model.lamda_fixed == 1:
                    lam = jnp.ones_like(lam)
                return fewshot.get_prototypes(
                    im_e, tx_e, lam, s_y[None], cfg.num_ways)[0]

            @jax.jit
            def classify(p, protos, q):
                # params enter as an argument — baking self.params into the
                # closure would silently pin query encoding to the params at
                # build time even after a hot-swap of clf.params
                emb = model.encode_image(p, q[None])[0]
                return fewshot.prototype_logits(protos[None], emb[None])[0]
            return adapt_fn, classify

        if cfg.model == "matchingnet":
            from fumi_tpu.models import RAW_IMAGE_ENCODERS, raw_image_net
            from fumi_tpu.models import layers

            if cfg.im_encoder in RAW_IMAGE_ENCODERS:
                net = raw_image_net(cfg.im_encoder)

                def embed(p, x):
                    return layers.linear(p["head"],
                                         net.backbone(p, x, cd), cd)
            else:
                def embed(p, x):
                    return layers.linear(p, x, cd)

            num_ways = cfg.num_ways

            @jax.jit
            def adapt_fn(p, s_im, s_text, s_y, rng):
                # "adaptation" = the embedded support set + its labels
                return embed(p, s_im), s_y

            @jax.jit
            def classify(p, state, q):
                s_emb, s_y = state
                probs = fewshot.matching_probs(
                    s_emb[None], s_y[None], embed(p, q)[None], num_ways)[0]
                # log-probs as the serving "logits": softmax(log p) = p,
                # so every return mode renders correctly
                return jnp.log(probs + 1e-8)
            return adapt_fn, classify

        if cfg.model == "protonet":
            from fumi_tpu.models import RAW_IMAGE_ENCODERS, raw_image_net
            from fumi_tpu.models import layers

            if cfg.im_encoder in RAW_IMAGE_ENCODERS:
                net = raw_image_net(cfg.im_encoder)

                def embed(p, x):
                    return layers.linear(p["head"],
                                         net.backbone(p, x, cd), cd)
            else:
                def embed(p, x):
                    return layers.linear(p, x, cd)

            @jax.jit
            def adapt_fn(p, s_im, s_text, s_y, rng):
                # "adaptation" = the class prototypes of the support set
                emb = embed(p, s_im)[None]  # (1, NK, P)
                lam = jnp.ones(emb.shape[:2] + (1,), emb.dtype)
                return fewshot.get_prototypes(emb, emb, lam, s_y[None],
                                              cfg.num_ways)[0]

            @jax.jit
            def classify(p, protos, q):
                emb = embed(p, q)
                return fewshot.prototype_logits(protos[None], emb[None])[0]
            return adapt_fn, classify

        if self.family.serve is not None:
            # registered-family serving hook (train/steps.py:Family.serve)
            adapt_fn, classify = self.family.serve(cfg, self.family)
            return jax.jit(adapt_fn), jax.jit(classify)

        raise NotImplementedError(
            f"episodic serving for model {cfg.model!r} (CLIP serves via "
            "fumi_tpu.serve.ClipRetrieval: index/retrieve/similarity; "
            "registered families can provide a Family.serve hook)")

    def reload(self, run_dir: str, best: bool = True) -> None:
        """Hot-swap weights from a checkpoint without restarting.

        The compiled adapt/classify/episode programs take params as an
        ARGUMENT, so a reload costs one checkpoint read — zero
        recompilation. Any adapted state is invalidated (it was derived
        under the old weights); ``classify`` returns the 409-path error
        until ``adapt`` runs again.
        """
        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.loop import eval_view
        from fumi_tpu.train.steps import make_opt
        opt = make_opt(self.cfg)
        params, opt_state, _ = ckpt_lib.load_checkpoint(
            run_dir, self.params, opt.init(self.params), best=best)
        self.params = eval_view(self.cfg, params, opt_state)
        self._state = None
        self._classify_fn = None

    @property
    def text_is_tokens(self) -> bool:
        """True when the wire format of ``support_text`` is int token ids
        (glove/w2v/RNN/RNNhid) rather than float embeddings."""
        return self.cfg.text_encoder in TOKEN_TEXT_ENCODERS

    def _prep_text(self, support_text, *fill_shape: int):
        """Normalize the support_text argument; token models require it
        (a silent zero-fill would feed all-PAD text to the encoder).

        Token sequences are length-bucketed to the next power of two
        with trailing PAD ids (host-side, like ``_bucket_queries``)
        WHERE exact — see the ``_bucket_t`` gating in ``__init__``
        (biLSTMs always; pooled embeddings only for mean pooling with a
        frozen PAD row). Requests with variable description lengths then
        hit ~log2 compiled programs instead of retracing per distinct
        T; the ungated configs compile per distinct T instead of
        silently changing predictions."""
        if support_text is None:
            if self.text_is_tokens and self.cfg.model in ("am3", "fumi"):
                raise RequestError(
                    f"--text_encoder {self.cfg.text_encoder} models need "
                    "support_text (int token ids)")
            return np.zeros(fill_shape + (1,), np.float32)
        if self.text_is_tokens:
            t = np.asarray(support_text, dtype=np.int32)
            T = t.shape[-1]
            t_pad = max(1, 1 << (max(T, 1) - 1).bit_length())
            if self._bucket_t and t_pad != T:
                fill = np.full(t.shape[:-1] + (t_pad - T,), self._pad_id,
                               np.int32)
                t = np.concatenate([t, fill], axis=-1)
            return t
        return np.asarray(support_text, dtype=np.float32)

    def adapt(self, support_im, support_text=None, support_y=None,
              rng: Optional[jax.Array] = None) -> None:
        """Run the one-time adaptation for this support set.

        support_im: (N*K, D) or (N*K, H, W, C); support_y: (N*K,) int in
        [0, num_ways); support_text: (N*K, E) / (N*K, T) for text models.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _check_support_y(self.cfg, support_y)
        support_im = jnp.asarray(support_im)
        support_y = jnp.asarray(support_y, dtype=jnp.int32)
        support_text = self._prep_text(support_text, support_im.shape[0])

        if getattr(self, "_adapt_fn", None) is None:
            self._adapt_fn, self._serve_fn = self._build_adapt_fns()
        state = self._adapt_fn(self.params, support_im, support_text,
                               support_y, rng)
        self._state = (self.cfg.model, state)
        serve_fn, params = self._serve_fn, self.params
        self._classify_fn = lambda q: serve_fn(params, state, q)

    # ------------------------------------------------------------------
    # Per-request episode path: adapt on a request's own support set AND
    # classify its queries in one dispatch (few-shot-as-a-service).
    # One shared program serves both the single-episode and the batched
    # form: it takes the episode batch with a LEADING request axis plus
    # per-episode PRNG keys as an argument, so the single call is exactly
    # the R=1 view and the two paths cannot drift apart.

    def _build_episode_fn(self, force_vmap: bool = False):
        """jitted fn(p, s_im (R,NK,D), s_y (R,NK), q_im (R,M,D),
        s_text (R,NK,E|T), keys (R,)) -> (R, M, N) logits.

        ``force_vmap`` bypasses the fused Pallas kernels even where
        applicable — callers that vmap the returned program over an extra
        leading axis need it (a pallas_call has no batching rule over the
        stacked params axis; see SeedEnsemble)."""
        cfg = self.cfg
        from fumi_tpu.ops.pallas_kernels import (fused_adapt_applicable,
                                                 fused_fumi_adapt,
                                                 fused_maml_adapt)
        from fumi_tpu.train.steps import plain_full_gd_adaptation
        # the fused kernels implement plain full-parameter GD — iMAML/ANIL
        # configs must serve through the engine-faithful fallback; a
        # request mesh also forces the vmap engine (pallas_call is not
        # partitionable across the episode axis)
        fused_ok = (not force_vmap
                    and self.mesh is None
                    # the fused kernels compute fp32 only — a bf16 config
                    # must serve through the vmap engine so served logits
                    # keep matching the bf16 eval engine's
                    and cfg.compute_dtype == "float32"
                    and plain_full_gd_adaptation(cfg)
                    and fused_adapt_applicable(
                        cfg.model, cfg.im_encoder, cfg.im_hid_dim,
                        cfg.num_test_adapt_steps))
        n_steps, step = cfg.num_test_adapt_steps, cfg.step_size

        if cfg.model == "maml" and fused_ok:
            def fn(p, s_im, s_y, q_im, s_text, keys):
                return fused_maml_adapt(p, s_im, s_y, q_im, n_steps, step)
        elif cfg.model == "fumi" and fused_ok:
            model = self.family.model

            def fn(p, s_im, s_y, q_im, s_text, keys):
                hyper0 = jax.vmap(
                    lambda t, y, k: model.get_hyper_params(p, t, y, rng=k)
                )(s_text, s_y, keys)
                return fused_fumi_adapt(p["im_net"], hyper0, s_im, s_y,
                                        q_im, n_steps, step)
        else:
            # fallback (AM3, conv4, short horizons, non-TPU): vmap the
            # cached adapt/classify programs over the request axis
            if getattr(self, "_adapt_fn", None) is None:
                self._adapt_fn, self._serve_fn = self._build_adapt_fns()
            adapt_fn, serve_fn = self._adapt_fn, self._serve_fn

            def fn(p, s_im, s_y, q_im, s_text, keys):
                states = jax.vmap(
                    adapt_fn, in_axes=(None, 0, 0, 0, 0))(
                        p, s_im, s_text, s_y, keys)
                return jax.vmap(serve_fn, in_axes=(None, 0, 0))(
                    p, states, q_im)
        return jax.jit(fn)

    def _episode_request(self, s_im, s_y, q_im, s_text, keys):
        if self._episode_fn is None:
            self._episode_fn = self._build_episode_fn()
        return self._episode_fn(self.params, s_im, s_y, q_im, s_text, keys)

    def episode_logits(self, support_im, support_y, query_im,
                       support_text=None,
                       rng: Optional[jax.Array] = None) -> np.ndarray:
        """One-call request path: adapt on this support set AND classify
        these queries in a single dispatch. Returns host numpy (the
        request result is fetched and unpadded host-side).

        Latency-bound, so MAML/FuMI use the fused Pallas adaptation kernel
        where supported — the whole n-step inner loop in one grid program,
        1.8x lower latency than the scan engine at the 100-step protocol
        (1.41 vs 2.58 ms; docs/PERFORMANCE.md). Returns (M, N) logits.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _check_support_y(self.cfg, support_y)
        # host numpy like _prep_batched_request: the jit cache keys on
        # host-vs-device input kind, so the R=1 single-call view only
        # shares the batch path's compiled program if both feed numpy
        support_im = np.asarray(support_im, dtype=np.float32)
        support_y = np.asarray(support_y, dtype=np.int32)
        support_text = self._prep_text(support_text, support_im.shape[0])
        M, query_im = _bucket_queries(query_im, axis=0,
                                      enabled=self._bucket_m)
        # the R=1 view of the shared program; this episode's key is rng
        # itself (batched requests draw split(rng, ...) instead)
        out = self._episode_request(
            support_im[None], support_y[None], query_im[None],
            np.asarray(support_text)[None], _stack_keys([rng]))
        # host-side unpad: an eager device slice would itself compile per
        # distinct M (the retrace bucketing exists to avoid); the logits
        # are request-sized and leave the device anyway
        return np.asarray(out)[0, :M]

    def episode_logits_batch(self, support_im, support_y, query_im,
                             support_text=None,
                             rng: Optional[jax.Array] = None) -> np.ndarray:
        """Batched request path: R independent episodes adapted AND
        classified in one dispatch — support_im (R, NK, D), support_y
        (R, NK), query_im (R, M, D) -> (R, M, N) logits (host numpy; the
        request result is fetched). Amortizes the per-dispatch RPC cost
        across the whole request batch (measured 2.6x the single-call
        throughput at R=16; docs/PERFORMANCE.md). Episode r uses PRNG
        key ``split(rng, n)[r]`` — counter-based and independent of n.

        R is padded up to the next power of two internally (repeating the
        last episode) so variable-size request batches hit a handful of
        compiled programs instead of retracing per distinct R — a retrace
        costs seconds on a tunneled runtime vs ~ms steady-state. The
        query axis M is bucketed the same way (``_bucket_queries``), so
        variable query counts are also retrace-free.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dp = 1
        if self.mesh is not None:
            # sharded requests: the leading axis must split evenly over dp
            from fumi_tpu.core.mesh import DP_AXIS
            dp = int(self.mesh.shape.get(DP_AXIS, 1))
        R, M, support_im, support_y, support_text, query_im, keys = \
            _prep_batched_request(self.cfg, self._prep_text, support_im,
                                  support_y, query_im, support_text, rng,
                                  dp=dp, bucket_m=self._bucket_m)
        if self.mesh is not None:
            # R episodes sharded over the dp axis; params stay replicated.
            # XLA partitions the vmapped request program from these input
            # shardings alone.
            from fumi_tpu.core.mesh import episode_sharding
            sh = episode_sharding(self.mesh)
            put = lambda x: jax.device_put(x, sh)
            support_im, support_y = put(support_im), put(support_y)
            support_text, query_im = put(support_text), put(query_im)
            keys = put(keys)
        out = self._episode_request(support_im, support_y, query_im,
                                    support_text, keys)
        return np.asarray(out)[:R, :M]  # host-side unpad (see episode_logits)

    def logits(self, query_im) -> np.ndarray:
        if self._classify_fn is None:
            raise RuntimeError("call adapt(...) before classify/logits")
        M, query_im = _bucket_queries(query_im, axis=0,
                                      enabled=self._bucket_m)
        return np.asarray(self._classify_fn(jnp.asarray(query_im)))[:M]

    def classify(self, query_im, return_probs: bool = False):
        """(M, ...) query images → (M,) int labels (or (M, N) probs).

        Post-processing is host-side numpy: logits are already fetched
        (see ``logits``) and eager jnp ops would compile per query-count.
        """
        logits = self.logits(query_im)
        if return_probs:
            return _np_softmax(logits)
        return np.argmax(logits, axis=-1).astype(np.int32)


def find_seed_exports(run_dir: str):
    """Per-seed export dirs under a sweep run: strictly-named
    ``run_dir/seed<k>/`` (``re.fullmatch(r"seed(\\d+)")``) that contain a
    ``best/`` checkpoint, sorted by seed number. This ONE definition is
    shared by the HTTP front-end's sweep autodetection and
    ``SeedEnsemble._load_stacked`` so detection can never match an entry
    the loader would reject (e.g. a stray ``seed0_backup/`` or
    ``seed_notes.txt`` next to a standalone run's own ``best/``)."""
    import glob
    import os
    import re

    def seed_no(d):
        m = re.fullmatch(r"seed(\d+)", os.path.basename(d))
        return int(m.group(1)) if m and os.path.isdir(d) else None

    # filter (isdir + exact seed<k> name + has best/) BEFORE sorting: a
    # stray run-dir entry must not crash the sort key
    return sorted(
        (d for d in glob.glob(os.path.join(run_dir, "seed*"))
         if seed_no(d) is not None
         and os.path.isdir(os.path.join(d, "best"))),
        key=seed_no)


class SeedEnsemble:
    """Seed-ensemble serving: S replicas of the same config (typically a
    ``--tpu_seed_sweep`` run's per-seed exports) adapt VMAPPED in one
    program and classify by averaging the replicas' per-class
    probabilities — the standard cheap accuracy boost for few-shot
    models, TPU-native because the seed axis batches every matmul of the
    adaptation exactly like training's sweep does.

    Same service surface as :class:`FewShotClassifier` (adapt/classify/
    logits/episode_logits[_batch]/reload), so the HTTP front-end serves
    an ensemble transparently. Returned "logits" are
    ``log(mean_s softmax(logits_s))`` — softmax of that IS the ensemble
    distribution, so every downstream return mode renders correctly.

    ``params`` is the stacked (S, ...) pytree; replicas never exchange
    information, so on a multi-device platform the same zero-collective
    seed sharding as training applies (pass the stacked params already
    placed).
    """

    def __init__(self, cfg: Config, params, dictionary=None, _base=None):
        cfg = cfg.replace(seed_sweep=0)  # per-replica config
        # _base: an already-built per-replica classifier (from_sweep_run
        # passes the one whose family.params served as the load template,
        # avoiding a second model init at startup)
        self._base = (_base if _base is not None
                      else FewShotClassifier(cfg, None, dictionary))
        self.cfg = self._base.cfg
        if params is None:
            raise ValueError("SeedEnsemble needs stacked (S, ...) params "
                             "(e.g. SeedEnsemble.from_sweep_run)")
        self.params = params
        self.num_seeds = jax.tree.leaves(params)[0].shape[0]
        self._state = None
        self._classify_fn = None
        self._vadapt = None
        self._vepisode = None

    # ------------------------------------------------------------------
    @classmethod
    def from_sweep_run(cls, run_dir: str, cfg: Optional[Config] = None,
                       best: bool = True) -> "SeedEnsemble":
        """Build from a sweep run dir's per-seed exports
        (``run_dir/seed<k>/`` — train/sweep.py export_seed_runs)."""
        import os

        if cfg is None:
            from fumi_tpu.core.config import config_from_json
            path = os.path.join(run_dir, "config.json")
            cfg = config_from_json(path).replace(seed_sweep=0)
        dictionary = serving_dictionary(cfg, run_dir)
        # build the per-replica classifier ONCE; its freshly-initialized
        # family params double as the checkpoint-load template
        base = FewShotClassifier(cfg.replace(seed_sweep=0), None,
                                 dictionary)
        params = cls._load_stacked(run_dir, base.cfg,
                                   base.family.params, best)
        self = cls(cfg, params, dictionary, _base=base)
        self._run_dir = run_dir
        return self

    @staticmethod
    def _load_stacked(run_dir: str, cfg: Config, template, best: bool):
        """Load ``run_dir/seed<k>/`` exports into one stacked (S, ...)
        pytree of serving views (EMA-aware, like from_checkpoint)."""
        seed_dirs = find_seed_exports(run_dir)
        if not seed_dirs:
            raise FileNotFoundError(
                f"no seed*/ exports under {run_dir} (a --tpu_seed_sweep "
                "run writes them at the end of training)")

        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.loop import eval_view
        from fumi_tpu.train.steps import make_opt
        opt_template = make_opt(cfg).init(template)
        views = []
        for d in seed_dirs:
            p, s, _ = ckpt_lib.load_checkpoint(d, template, opt_template,
                                               best=best)
            views.append(eval_view(cfg, p, s))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *views)

    # ------------------------------------------------------------------
    @property
    def text_is_tokens(self) -> bool:
        return self._base.text_is_tokens

    def _ensure_fns(self):
        if self._vadapt is None:
            adapt_fn, serve_fn = self._base._build_adapt_fns()
            self._vadapt = jax.jit(jax.vmap(
                adapt_fn, in_axes=(0, None, None, None, 0)))
            self._vserve = jax.jit(jax.vmap(
                serve_fn, in_axes=(0, 0, None)))

    @staticmethod
    def _reduce(logits_s, axis=0):
        """(S, ..., N) per-seed logits -> ensemble log-probs."""
        probs = jax.nn.softmax(logits_s, axis=-1).mean(axis=axis)
        return jnp.log(probs + 1e-9)

    def adapt(self, support_im, support_text=None, support_y=None,
              rng: Optional[jax.Array] = None) -> None:
        """Adapt ALL replicas on this support set in one vmapped program
        (replica i uses key fold_in(rng, i) — the same per-seed key
        derivation as the one-call episode paths, so a single replica's
        behavior is reproducible with ``solo.adapt(..., rng=fold_in(rng,
        i))`` regardless of which ensemble entry point served it)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _check_support_y(self.cfg, support_y)
        support_im = jnp.asarray(support_im)
        support_y = jnp.asarray(support_y, dtype=jnp.int32)
        support_text = self._base._prep_text(support_text,
                                             support_im.shape[0])
        self._ensure_fns()
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(self.num_seeds))
        state = self._vadapt(self.params, support_im, support_text,
                             support_y, keys)
        self._state = state
        vserve, params = self._vserve, self.params
        self._classify_fn = lambda q: self._reduce(vserve(params, state, q))

    def logits(self, query_im) -> np.ndarray:
        if self._classify_fn is None:
            raise RuntimeError("call adapt(...) before classify/logits")
        M, query_im = _bucket_queries(query_im, axis=0,
                                      enabled=self._base._bucket_m)
        return np.asarray(self._classify_fn(jnp.asarray(query_im)))[:M]

    def classify(self, query_im, return_probs: bool = False):
        # host-side post-processing, like FewShotClassifier.classify
        logits = self.logits(query_im)
        if return_probs:
            return _np_softmax(logits)
        return np.argmax(logits, axis=-1).astype(np.int32)

    # one-call episode paths: per-seed keys fold the request key
    def _episode_request(self, s_im, s_y, q_im, s_text, keys):
        if self._vepisode is None:
            # force the vmap engine: the fused Pallas adaptation kernels
            # have no batching rule over the stacked params axis
            fn = self._base._build_episode_fn(force_vmap=True)
            self._vepisode = jax.jit(jax.vmap(
                fn, in_axes=(0, None, None, None, None, 0)))
        S = self.num_seeds
        seed_keys = jax.vmap(
            lambda i: jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
        )(jnp.arange(S))  # (S, R) keys
        out = self._vepisode(self.params, s_im, s_y, q_im, s_text,
                             seed_keys)  # (S, R, M, N)
        return self._reduce(out)

    def episode_logits(self, support_im, support_y, query_im,
                       support_text=None,
                       rng: Optional[jax.Array] = None) -> np.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _check_support_y(self.cfg, support_y)
        # host numpy throughout, matching _prep_batched_request (the jit
        # cache keys on host-vs-device input kind — see episode_logits)
        support_im = np.asarray(support_im, dtype=np.float32)
        support_y = np.asarray(support_y, dtype=np.int32)
        support_text = self._base._prep_text(support_text,
                                             support_im.shape[0])
        M, query_im = _bucket_queries(query_im, axis=0,
                                      enabled=self._base._bucket_m)
        out = self._episode_request(
            support_im[None], support_y[None], query_im[None],
            np.asarray(support_text)[None], _stack_keys([rng]))
        return np.asarray(out)[0, :M]  # host-side unpad

    def episode_logits_batch(self, support_im, support_y, query_im,
                             support_text=None,
                             rng: Optional[jax.Array] = None) -> np.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        R, M, support_im, support_y, support_text, query_im, keys = \
            _prep_batched_request(self.cfg, self._base._prep_text,
                                  support_im, support_y, query_im,
                                  support_text, rng,
                                  bucket_m=self._base._bucket_m)
        out = self._episode_request(support_im, support_y, query_im,
                                    support_text, keys)
        return np.asarray(out)[:R, :M]  # host-side unpad

    def reload(self, run_dir: Optional[str] = None,
               best: bool = True) -> None:
        """Hot-swap ALL replicas from a sweep run dir's seed exports.

        Like FewShotClassifier.reload, this loads into the EXISTING
        templates (the compiled programs take params as arguments): no
        model re-init, no dictionary re-resolution, zero recompilation —
        a reload costs S checkpoint reads. The new run must share this
        ensemble's model structure (a mismatch errors at load)."""
        run_dir = run_dir or getattr(self, "_run_dir", None)
        if run_dir is None:
            raise ValueError("reload needs a sweep run dir")
        params = self._load_stacked(run_dir, self.cfg,
                                    self._base.family.params, best)
        self.params = params
        self.num_seeds = jax.tree.leaves(params)[0].shape[0]
        self._run_dir = run_dir
        self._state = None
        self._classify_fn = None


class ClipRetrieval:
    """CLIP serving: index a gallery once, rank many queries against it.

    The dual-encoder analog of adapt-once/classify-many: ``index(images)``
    projects + L2-normalizes the gallery through the image head ONCE and
    keeps it device-resident; ``retrieve(text, top_k)`` projects the query
    texts and ranks the whole gallery with one matmul. ``similarity(text,
    images)`` is the stateless one-shot form (the reference's
    ``CLIP.forward`` cosine matrix, ref: clip.py:26-40 — the reference has
    no inference surface at all).
    """

    def __init__(self, cfg: Config, params=None):
        from fumi_tpu.models.clip import CLIP
        cfg = cfg.validate()
        self.cfg = cfg
        self.model = CLIP(text_input_dim=cfg.text_emb_dim,
                          image_input_dim=cfg.im_emb_dim,
                          latent_dim=cfg.clip_latent_dim)
        self.params = (params if params is not None
                       else self.model.init_params(
                           jax.random.PRNGKey(cfg.seed)))
        self._gallery = None  # (G, latent) normalized image embeddings

        # the MODEL's own encoders (models/clip.py) — serving must share
        # the training forward's math, not restate it
        self._embed_images = jax.jit(self.model.encode_image)
        self._embed_text = jax.jit(self.model.encode_text)
        # normalized embeddings -> cosine scores is one matmul
        self._scores = jax.jit(
            lambda t, g: jnp.matmul(t, g.T,
                                    preferred_element_type=t.dtype))
        self._sim = jax.jit(self.model.forward)

    @classmethod
    def from_checkpoint(cls, run_dir: str, cfg: Config,
                        best: bool = True) -> "ClipRetrieval":
        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.optim import init_optim
        self = cls(cfg, None)
        # mirror the CLI's CLIP restore path (same optimizer transform ->
        # same checkpoint state structure)
        opt = init_optim(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum)
        params, _, _ = ckpt_lib.load_checkpoint(
            run_dir, self.params, opt.init(self.params), best=best)
        self.params = params
        return self

    def reload(self, run_dir: str, best: bool = True) -> None:
        """Hot-swap weights from a checkpoint (no recompilation). The
        indexed gallery is invalidated — it was embedded under the old
        weights — so ``index`` must run again before ``retrieve``."""
        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.optim import init_optim
        cfg = self.cfg
        opt = init_optim(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum)
        params, _, _ = ckpt_lib.load_checkpoint(
            run_dir, self.params, opt.init(self.params), best=best)
        self.params = params
        self._gallery = None

    def index(self, images) -> int:
        """Project + normalize a gallery of (G, im_emb_dim) image
        embeddings; returns the gallery size."""
        images = jnp.asarray(images)
        self._gallery = self._embed_images(self.params, images)
        return int(self._gallery.shape[0])

    def retrieve(self, text, top_k: int = 5):
        """(M, text_emb_dim) texts -> (indices (M, k), scores (M, k))
        against the indexed gallery, cosine-ranked."""
        if self._gallery is None:
            raise RuntimeError("call index(images) before retrieve")
        text = jnp.asarray(text)
        scores = self._scores(self._embed_text(self.params, text),
                              self._gallery)
        k = min(int(top_k), int(scores.shape[-1]))
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return top_idx, top_scores

    def similarity(self, text, images) -> jnp.ndarray:
        """Stateless (Nt, Ni) cosine-similarity matrix (ref: clip.py:26-40)."""
        return self._sim(self.params, jnp.asarray(text),
                         jnp.asarray(images))


def warmup(clf, r_buckets=(1,), num_queries=16,
           text_len: int = 8) -> None:
    """Pre-compile the serving programs before traffic arrives.

    A cold server pays the first compile on a live request — minutes on
    a tunneled runtime (docs/PERFORMANCE.md platform caveats). This runs
    synthetic requests through the hot paths at deploy time instead:
    the stateful adapt+classify pair, and the one-dispatch episode path
    at each requested R bucket — at the M bucket(s) covering
    ``num_queries`` (an int or an iterable of ints, one compile per
    (R, M-bucket) pair). With R and M both power-of-two bucketed, any
    later request whose R/M land in the warmed buckets is retrace-free.

    Works for :class:`FewShotClassifier` and :class:`SeedEnsemble`
    (same surface); no-op with a notice for :class:`ClipRetrieval`
    (its gallery shapes are data-dependent). The dummy adapted state is
    cleared afterwards — clients still get the 409 before their own
    ``adapt``; the compiled programs stay cached.
    """
    import time

    if isinstance(clf, ClipRetrieval):
        print("warmup: skipped (CLIP gallery shapes are data-dependent)")
        return
    from fumi_tpu.models import RAW_IMAGE_ENCODERS
    cfg = clf.cfg
    NK = cfg.num_ways * cfg.num_shots
    im_tail = ((cfg.im_size, cfg.im_size, cfg.im_channels)
               if cfg.im_encoder in RAW_IMAGE_ENCODERS
               else (cfg.im_emb_dim,))
    rng = np.random.RandomState(0)
    s_im = rng.randn(NK, *im_tail).astype(np.float32)
    if isinstance(num_queries, int):
        num_queries = (num_queries,)
    q_ims = [rng.randn(m, *im_tail).astype(np.float32)
             for m in num_queries]
    s_y = np.repeat(np.arange(cfg.num_ways),
                    cfg.num_shots).astype(np.int32)
    if clf.text_is_tokens:
        # token id 1, not PAD (0): with mean pooling an all-PAD row has
        # masked length 0, so the pooled embedding is 0/0 = NaN — warmup
        # would still compile, but the dummy forward must stay finite
        s_text = np.full((NK, text_len), 1, np.int32)
    elif cfg.model in ("am3", "fumi"):
        s_text = rng.randn(NK, cfg.text_emb_dim).astype(np.float32)
    else:
        s_text = None

    # a re-warm on a live classifier (e.g. after a config change) must
    # not drop an existing adapted state — stash and restore it around
    # the dummy adapt instead of resetting to None
    saved = (clf._state, clf._classify_fn)
    t0 = time.perf_counter()
    try:
        clf.adapt(s_im, s_text, s_y)
        for q_im in q_ims:
            np.asarray(clf.classify(q_im))  # fetch = compile+run completed
    finally:
        # restore even on a failed warmup: the dummy state must never
        # survive (it would mask the 409-before-adapt on a fresh server
        # and silently replace a live adapted state on a re-warm)
        clf._state, clf._classify_fn = saved
    print(f"warmup: adapt+classify in {time.perf_counter() - t0:.1f}s")

    for R in r_buckets:
        t0 = time.perf_counter()
        for q_im in q_ims:
            if R <= 1:
                np.asarray(clf.episode_logits(s_im, s_y, q_im,
                                              support_text=s_text))
            else:
                tile = lambda x: np.repeat(x[None], R, axis=0)
                np.asarray(clf.episode_logits_batch(
                    tile(s_im), tile(s_y), tile(q_im),
                    support_text=None if s_text is None else tile(s_text)))
        # report the buckets actually compiled, not the raw requested
        # counts (raw-image backbones skip M bucketing — transductive
        # batch norm — so there the raw counts ARE the buckets)
        if cfg.im_encoder in RAW_IMAGE_ENCODERS:
            m_buckets = sorted(set(num_queries))
        else:
            m_buckets = sorted({1 << (m - 1).bit_length()
                                for m in num_queries})
        print(f"warmup: episode path R={R} "
              f"(M buckets {m_buckets}) "
              f"in {time.perf_counter() - t0:.1f}s")
