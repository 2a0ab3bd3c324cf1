"""Per-model-family episode losses and jitted train/eval steps.

Each family is built once as a :class:`Family` — the pure episode-level
functions (the JAX equivalent of the reference's ``model.evaluate`` episode
methods, ref: am3.py:128-212, maml.py:134-193, fumi.py:115-196):

- ``train_loss(params, episode, rng) -> (loss, aux)`` — differentiable.
- ``eval_raw(params, episode, rng) -> dict`` — raw per-batch quantities with
  declared cross-shard reductions (``EVAL_REDUCE``: mean for losses/accs,
  sum for confusion matrices) so the SAME functions serve the single-device
  jit steps here and the shard_map episode-parallel engine
  (fumi_tpu/parallel/engine.py).
- ``eval_finalize(dict) -> metrics`` — turns reduced raw quantities into the
  reference's metric set.

``make_steps`` wraps a Family into single-device jitted steps; with the
device sampler the episode is drawn inside the same XLA program
(:func:`fuse_sampler`), so one compiled program covers sampling, adaptation,
outer grads, and the optimizer update.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from fumi_tpu.core.config import Config
from fumi_tpu.metalearn.inner_loop import (fumi_episode_loss,
                                           maml_episode_loss)
from fumi_tpu.models import am3 as am3_mod
from fumi_tpu.models import fumi as fumi_mod
from fumi_tpu.models import mlp
from fumi_tpu.models import text_encoders
from fumi_tpu.ops import fewshot
from fumi_tpu.ops import metrics as metrics_ops


class Family(NamedTuple):
    """A model family's pure episode-level functions."""
    name: str
    params: Any
    train_loss: Callable  # (params, episode, rng) -> (loss, aux)
    eval_raw: Callable  # (params, episode, rng) -> raw dict
    eval_finalize: Callable  # raw dict -> metrics dict
    eval_reduce: Dict[str, str]  # raw key -> "mean" | "sum" | "concat"
    model: Any = None
    # optional serving hook so REGISTERED families plug into
    # FewShotClassifier without editing serve.py:
    # (cfg, family) -> (adapt_fn(p, s_im, s_text, s_y, rng) -> state,
    #                   classify_fn(p, state, q_im) -> (M, N) logits)
    serve: Optional[Callable] = None
    # optional TRAIN-aux combining declaration for --tpu_grad_accum
    # (accum_value_and_grad): aux key -> "mean" | "sum" | "concat".
    # Undeclared array leaves fall back to the shape heuristic there,
    # which cannot distinguish a per-task leaf from e.g. a per-class
    # one when num_ways happens to equal the micro-batch size — declare
    # such leaves explicitly.
    train_aux_reduce: Optional[Dict[str, str]] = None


class FamilySteps(NamedTuple):
    """Jitted steps + params for one model family."""
    params: Any
    opt: optax.GradientTransformation
    train_step: Callable  # (params, opt_state, episode, rng) -> (p, s, m)
    eval_step: Callable  # (params, episode, rng) -> metrics
    family: Optional[Family] = None
    mesh: Any = None  # set by the parallel engine; None = single device

    @property
    def model(self):
        return self.family.model if self.family else None


def _make_text_encoder(cfg: Config, key, dictionary):
    return text_encoders.make_text_encoder(
        cfg.text_encoder, key, cfg.text_emb_dim, dictionary=dictionary,
        pooling_strat=cfg.pooling_strat, fine_tune=cfg.fine_tune)


def compute_dtype_of(cfg: Config):
    """``--tpu_compute_dtype`` as a matmul operand dtype (None = fp32).

    bfloat16 = the mixed-precision policy of models/layers.py:linear —
    bf16 MXU dots with fp32 accumulation; params, MLP inter-layer
    activations, losses, and inner-loop SGD updates stay fp32 (conv
    backbones store block-to-block activations bf16 — conv4.conv_block).
    It also stores the device sampler's HBM table in bf16
    (cli/main.py:_samplers)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def remat_of(cfg: Config):
    """``--tpu_remat`` as the inner-loop ``remat`` argument.

    "auto" (None downstream) keeps inner_loop's horizon threshold for the
    embedding MLPs and conv4 — storing beats recompute at short horizons
    (~13% measured on MLPs; conv4's 5-step second-order graph fits at
    default geometry) — but forces remat at EVERY horizon for resnet12:
    its 13-conv second-order step graph holds 18.6G of activations at
    84x84 B=4 and OOMs a 16G chip without it, even at bf16 storage.
    resnet12's remat is the "save_convs" flavor — whole-step checkpoint
    keeping the NAMED conv outputs (layers.conv2d_f32acc "conv_out"), so
    the meta-backward recomputes only the elementwise chains: measured
    4.6 vs 4.4 eps/s and 526 vs 541 GB/step over plain whole-step.
    Stage-selective checkpointing was measured as a middle ground and
    LOST (resnet12.STAGE_REMAT_OVERRIDE — 4.0 vs 4.4 eps/s, numbers in
    docs/PERFORMANCE.md). "on" forces plain whole-step remat everywhere —
    the escape hatch when bigger batches/images push conv4 over the edge,
    and the A/B partner for save_convs."""
    if cfg.remat == "on":
        return True
    if cfg.remat == "off":
        return False
    if cfg.im_encoder == "resnet12":
        from fumi_tpu.models import resnet12
        # the experiment switch replaces step remat with its own pattern
        if resnet12.STAGE_REMAT_OVERRIDE is not None:
            return None
        # auto = save_convs: whole-step checkpoint that KEEPS the named
        # conv outputs (measured 4.6 vs 4.4 eps/s over plain whole-step;
        # falls back to whole-step at long horizons inside _maybe_remat).
        # `--tpu_remat on` above forces plain whole-step everywhere.
        return "save_convs"
    return None


def resnet12_stage_remat(cfg: Config):
    """Per-stage checkpoint pattern for the resnet12 backbone — the
    measured-negative experiment switch (resnet12.STAGE_REMAT_OVERRIDE,
    set by scripts/exp_conv_bench.py --stage_remat); None in
    production."""
    if cfg.im_encoder != "resnet12" or cfg.remat != "auto":
        return None
    from fumi_tpu.models import resnet12
    return resnet12.STAGE_REMAT_OVERRIDE


def plain_full_gd_adaptation(cfg: Config) -> bool:
    """True when TEST-TIME adaptation is the plain full-parameter GD
    program the fused Pallas kernels implement. iMAML's proximal objective
    and ANIL's head-only updates are different programs; Reptile's
    eval-time adaptation IS plain GD (only its meta-update differs)."""
    return (cfg.meta_grad in ("explicit", "reptile")
            and cfg.adapt_params == "all")


def _use_fused_eval(cfg: Config) -> bool:
    """Gate for the fused Pallas eval-adaptation kernel in the eval
    harness: opt-in (--tpu_pallas_fused_eval) AND covered by the kernel
    (fused_adapt_applicable; numbers in docs/PERFORMANCE.md). Like
    serve.py's fused_ok: the fused kernels compute fp32 only, so a bf16
    config evaluates through the engine — otherwise best-checkpoint
    selection and test metrics would run numerics that match neither
    training nor the bf16 serving engine."""
    from fumi_tpu.ops.pallas_kernels import fused_adapt_applicable
    return (cfg.pallas_fused_eval and plain_full_gd_adaptation(cfg)
            and cfg.compute_dtype == "float32"
            and fused_adapt_applicable(
                cfg.model, cfg.im_encoder, cfg.im_hid_dim,
                cfg.num_test_adapt_steps))


def _eval_raw_from_logits(logits, episode):
    """Eval-raw dict from post-adaptation query logits (fused kernels)."""
    loss = fewshot.cross_entropy(logits, episode.query_y)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    acc = jnp.mean((preds == episode.query_y).astype(jnp.float32))
    return {"loss": loss, "acc": acc, "preds": preds,
            "targets": episode.query_y}


# ---------------------------------------------------------------------------
# Family builders
# ---------------------------------------------------------------------------

def build_maml_family(cfg: Config, key: jax.Array) -> Family:
    """PureImageNetwork + MAML engine (ref: maml.py:15-33,134-193).

    ``--im_encoder conv4|resnet12`` swaps the embedding MLP for a raw-image
    backbone (fumi_tpu/models/{conv4,resnet12}.py) — the capability the
    reference leaves as a TODO (am3.py:44-46); the same inner-loop engine
    adapts either.
    """
    from fumi_tpu.models import RAW_IMAGE_ENCODERS, raw_image_net
    if cfg.im_encoder in RAW_IMAGE_ENCODERS:
        net = raw_image_net(cfg.im_encoder)
        kw = ({"channels": cfg.resnet12_channels}
              if cfg.im_encoder == "resnet12" else {})
        params = net.init(key, cfg.im_size, cfg.im_channels,
                          n_way=cfg.num_ways, **kw)
        apply_kw = {}
        if cfg.im_encoder == "resnet12":
            apply_kw["stage_remat"] = resnet12_stage_remat(cfg)
        apply_fn = functools.partial(net.apply,
                                     compute_dtype=compute_dtype_of(cfg),
                                     **apply_kw)
    else:
        params = mlp.init(key, cfg.im_emb_dim, cfg.num_ways, cfg.im_hid_dim)
        apply_fn = functools.partial(mlp.apply,
                                     compute_dtype=compute_dtype_of(cfg))

    adapt_mask = None
    if cfg.adapt_params == "head":  # ANIL: only the head adapts
        from fumi_tpu.metalearn.inner_loop import head_only_mask
        adapt_mask = head_only_mask(params)

    def loss_for(n_steps):
        if cfg.meta_grad == "imaml":
            from fumi_tpu.metalearn.implicit import imaml_episode_loss

            def loss_fn(p, episode, rng):
                return imaml_episode_loss(
                    apply_fn, p, episode, n_steps=n_steps,
                    step_size=cfg.step_size, lam=cfg.imaml_lambda,
                    cg_iters=cfg.imaml_cg_iters)
            return loss_fn

        if cfg.meta_grad == "reptile":
            from fumi_tpu.metalearn.reptile import reptile_episode_loss

            def loss_fn(p, episode, rng):
                return reptile_episode_loss(
                    apply_fn, p, episode, n_steps=n_steps,
                    step_size=cfg.step_size)
            return loss_fn

        def loss_fn(p, episode, rng):
            return maml_episode_loss(
                apply_fn, p, episode, n_steps=n_steps,
                step_size=cfg.step_size, first_order=cfg.first_order,
                adapt_mask=adapt_mask, remat=remat_of(cfg))
        return loss_fn

    eval_loss = loss_for(cfg.num_test_adapt_steps)

    def eval_raw(p, episode, rng):
        loss, aux = eval_loss(p, episode, rng)
        return {"loss": loss, "acc": aux["acc"], "preds": aux["preds"],
                "targets": episode.query_y}

    if _use_fused_eval(cfg):
        from fumi_tpu.ops.pallas_kernels import fused_maml_adapt

        def eval_raw(p, episode, rng):  # noqa: F811 — fused fast path
            logits = fused_maml_adapt(
                p, episode.support_im, episode.support_y, episode.query_im,
                cfg.num_test_adapt_steps, cfg.step_size)
            return _eval_raw_from_logits(logits, episode)

    return Family(
        name="maml", params=params,
        train_loss=loss_for(cfg.num_train_adapt_steps),
        eval_raw=eval_raw,
        eval_finalize=lambda raw: raw,
        eval_reduce={"loss": "mean", "acc": "mean", "preds": "concat",
                     "targets": "concat"},
        train_aux_reduce={"acc": "mean", "preds": "concat"},
    )


def build_fumi_family(cfg: Config, key: jax.Array,
                      dictionary=None) -> Family:
    """FUMI hypernet + dual-update engine (ref: fumi.py:18-218)."""
    k_enc, k_par = jax.random.split(key)
    enc = _make_text_encoder(cfg, k_enc, dictionary)
    model = fumi_mod.FUMI(
        n_way=cfg.num_ways, im_emb_dim=cfg.im_emb_dim,
        im_hid_dim=tuple(cfg.im_hid_dim), text_encoder=enc,
        text_emb_dim=enc.out_dim, text_hid_dim=cfg.text_hid_dim,
        dropout_rate=cfg.dropout, norm_hypernet=cfg.norm_hypernet,
        fine_tune=cfg.fine_tune, init_bias=cfg.hypernet_bias_init,
        init_all_layers=cfg.init_all_layers,
        im_encoder_kind=(cfg.im_encoder
                         if cfg.im_encoder in ("conv4", "resnet12")
                         else "mlp"),
        im_size=cfg.im_size, im_channels=cfg.im_channels,
        resnet12_channels=cfg.resnet12_channels,
        compute_dtype=compute_dtype_of(cfg),
        stage_remat=resnet12_stage_remat(cfg))
    params = model.init_params(k_par)

    def loss_for(n_steps, train):
        if cfg.meta_grad == "imaml":
            from fumi_tpu.metalearn.implicit import imaml_fumi_episode_loss

            def loss_fn(p, episode, rng):
                return imaml_fumi_episode_loss(
                    model, p, episode, n_steps=n_steps,
                    step_size=cfg.step_size, rng=rng,
                    lam=cfg.imaml_lambda, cg_iters=cfg.imaml_cg_iters)
            return loss_fn

        def loss_fn(p, episode, rng):
            return fumi_episode_loss(
                model, p, episode, n_steps=n_steps,
                step_size=cfg.step_size, rng=rng, train=train,
                remat=remat_of(cfg))
        return loss_fn

    eval_loss = loss_for(cfg.num_test_adapt_steps, False)

    def eval_raw(p, episode, rng):
        loss, aux = eval_loss(p, episode, rng)
        return {"loss": loss, "acc": aux["acc"], "preds": aux["preds"],
                "targets": episode.query_y}

    if _use_fused_eval(cfg):
        from fumi_tpu.ops.pallas_kernels import fused_fumi_adapt

        def eval_raw(p, episode, rng):  # noqa: F811 — fused fast path
            # per-task hypernet head, same rng stream as the scan engine
            # (task_rng -> split(3)[0] is k_hyper, metalearn/inner_loop.py)
            B = episode.support_im.shape[0]
            task_rngs = jax.random.split(rng, B)
            k_hyper = jax.vmap(lambda k: jax.random.split(k, 3)[0])(
                task_rngs)
            hyper0 = jax.vmap(
                lambda t, y, k: model.get_hyper_params(p, t, y, rng=k)
            )(episode.support_text, episode.support_y, k_hyper)
            logits = fused_fumi_adapt(
                p["im_net"], hyper0, episode.support_im, episode.support_y,
                episode.query_im, cfg.num_test_adapt_steps, cfg.step_size)
            return _eval_raw_from_logits(logits, episode)

    return Family(
        name="fumi", params=params,
        train_loss=loss_for(cfg.num_train_adapt_steps, True),
        eval_raw=eval_raw,
        eval_finalize=lambda raw: raw,
        eval_reduce={"loss": "mean", "acc": "mean", "preds": "concat",
                     "targets": "concat"},
        model=model,
        train_aux_reduce={"acc": "mean", "preds": "concat"},
    )


def build_am3_family(cfg: Config, key: jax.Array,
                     dictionary=None) -> Family:
    """AM3 prototypical episode (ref: am3.py:16-212).

    The whole per-step flow — support fwd, query fwd, λ override, prototypes,
    prototypical CE, metrics — is one fused XLA program. Metrics come from a
    device-side confusion matrix (``sum``-reducible across shards), from
    which accuracy and sklearn-macro P/R/F1 are derived
    (replacing the per-step host sklearn call, ref: utils.py:319-326).
    """
    k_enc, k_par = jax.random.split(key)
    enc = _make_text_encoder(cfg, k_enc, dictionary)
    model = am3_mod.AM3(
        im_emb_dim=cfg.im_emb_dim, prototype_dim=cfg.prototype_dim,
        text_encoder=enc, text_emb_dim=enc.out_dim,
        text_hid_dim=cfg.text_hid_dim, dropout=cfg.dropout,
        fine_tune=cfg.fine_tune, lamda_fixed=cfg.lamda_fixed,
        im_encoder_kind=(cfg.im_encoder
                         if cfg.im_encoder in ("conv4", "resnet12")
                         else "linear"),
        im_size=cfg.im_size, im_channels=cfg.im_channels,
        resnet12_channels=cfg.resnet12_channels,
        compute_dtype=compute_dtype_of(cfg))
    params = model.init_params(k_par)

    def train_loss(p, episode, rng):
        loss, aux = model.episode_loss(p, episode, cfg.num_ways,
                                       rng=rng, train=True)
        preds = fewshot.predict_classes(
            jax.lax.stop_gradient(aux["prototypes"]),
            jax.lax.stop_gradient(aux["query_emb"]))
        conf = metrics_ops.confusion_matrix(episode.query_y, preds,
                                            cfg.num_ways)
        return loss, {"conf": conf, "avg_lamda": aux["avg_lamda"],
                      "preds": preds}

    def eval_raw(p, episode, rng):
        loss, aux = model.episode_loss(p, episode, cfg.num_ways,
                                       rng=rng, train=False)
        preds = fewshot.predict_classes(aux["prototypes"], aux["query_emb"])
        conf = metrics_ops.confusion_matrix(episode.query_y, preds,
                                            cfg.num_ways)
        return {"loss": loss, "conf": conf, "avg_lamda": aux["avg_lamda"],
                "preds": preds, "targets": episode.query_y,
                "lamda": aux["lamda"][..., 0]}

    def eval_finalize(raw):
        conf = raw["conf"]
        prec, rec, f1 = metrics_ops.macro_prf1(conf)
        acc = jnp.diagonal(conf).sum() / jnp.maximum(conf.sum(), 1.0)
        out = {"loss": raw["loss"], "acc": acc, "prec": prec, "rec": rec,
               "f1": f1, "avg_lamda": raw["avg_lamda"]}
        for k in ("preds", "targets", "lamda"):
            if k in raw:
                out[k] = raw[k]
        return out

    return Family(
        name="am3", params=params, train_loss=train_loss,
        eval_raw=eval_raw, eval_finalize=eval_finalize,
        eval_reduce={"loss": "mean", "conf": "sum", "avg_lamda": "mean",
                     "preds": "concat", "targets": "concat",
                     "lamda": "concat"},
        model=model,
        train_aux_reduce={"conf": "sum", "avg_lamda": "mean",
                          "preds": "concat"},
    )


def build_protonet_family(cfg: Config, key: jax.Array,
                          dictionary=None) -> Family:
    """Prototypical Networks (Snell et al. 2017) — image-only prototype
    baseline, here as the canonical EXTENSION family: ~60 lines registered
    via the family registry inherit the chunked drivers, both parallel
    engines, the harness, serving-free eval, and the CLI. (No reference
    counterpart; AM3 with λ≡1 reduces to the same prototype math but drags
    the text machinery along, ref: am3.py:174-179.)"""
    from fumi_tpu.models import (RAW_IMAGE_ENCODERS, headless_backbone_init,
                                 raw_image_net)
    from fumi_tpu.models import layers

    if cfg.im_encoder in RAW_IMAGE_ENCODERS:
        net = raw_image_net(cfg.im_encoder)
        k_bb, k_head = jax.random.split(key)
        bb, fdim = headless_backbone_init(
            cfg.im_encoder, k_bb, cfg.im_size, cfg.im_channels,
            cfg.resnet12_channels)
        params = {**bb, "head": layers.linear_init(k_head, fdim,
                                                   cfg.prototype_dim)}

        def embed(p, x, cd=compute_dtype_of(cfg)):
            B, M = x.shape[:2]
            feats = net.backbone(p, x.reshape((B * M,) + x.shape[2:]), cd)
            return layers.linear(p["head"], feats, cd).reshape(B, M, -1)
    else:
        params = layers.linear_init(key, cfg.im_emb_dim, cfg.prototype_dim)

        def embed(p, x, cd=compute_dtype_of(cfg)):
            return layers.linear(p, x, cd)

    N = cfg.num_ways

    def _raw(p, episode):
        s_e = embed(p, episode.support_im)  # (B, NK, P)
        q_e = embed(p, episode.query_im)  # (B, NQ, P)
        lam = jnp.ones(s_e.shape[:2] + (1,), s_e.dtype)  # image-only
        protos = fewshot.get_prototypes(s_e, s_e, lam, episode.support_y, N)
        loss = fewshot.prototypical_loss(protos, q_e, episode.query_y)
        preds = fewshot.predict_classes(protos, q_e)
        acc = jnp.mean((preds == episode.query_y).astype(jnp.float32))
        return loss, preds, acc

    def train_loss(p, episode, rng):
        loss, preds, acc = _raw(p, episode)
        return loss, {"acc": acc, "preds": preds}

    def eval_raw(p, episode, rng):
        loss, preds, acc = _raw(p, episode)
        return {"loss": loss, "acc": acc, "preds": preds,
                "targets": episode.query_y}

    return Family(
        name="protonet", params=params, train_loss=train_loss,
        eval_raw=eval_raw, eval_finalize=lambda raw: raw,
        eval_reduce={"loss": "mean", "acc": "mean", "preds": "concat",
                     "targets": "concat"},
    )


def build_matchingnet_family(cfg: Config, key: jax.Array,
                             dictionary=None) -> Family:
    """Matching Networks (Vinyals et al. 2016, non-FCE variant) — the
    second registered extension family: queries attend over SUPPORT
    SAMPLES with softmaxed cosine similarity and sum their one-hot labels,
    instead of collapsing each class to a prototype. One (B, NQ, NK)
    attention matmul per episode; no inner loop. (No reference
    counterpart; shares the embedding-head shape with protonet.)"""
    from fumi_tpu.models import (RAW_IMAGE_ENCODERS, headless_backbone_init,
                                 raw_image_net)
    from fumi_tpu.models import layers

    if cfg.im_encoder in RAW_IMAGE_ENCODERS:
        net = raw_image_net(cfg.im_encoder)
        k_bb, k_head = jax.random.split(key)
        bb, fdim = headless_backbone_init(
            cfg.im_encoder, k_bb, cfg.im_size, cfg.im_channels,
            cfg.resnet12_channels)
        params = {**bb, "head": layers.linear_init(k_head, fdim,
                                                   cfg.prototype_dim)}

        def embed(p, x, cd=compute_dtype_of(cfg)):
            B, M = x.shape[:2]
            feats = net.backbone(p, x.reshape((B * M,) + x.shape[2:]), cd)
            return layers.linear(p["head"], feats, cd).reshape(B, M, -1)
    else:
        params = layers.linear_init(key, cfg.im_emb_dim, cfg.prototype_dim)

        def embed(p, x, cd=compute_dtype_of(cfg)):
            return layers.linear(p, x, cd)

    N = cfg.num_ways

    def _raw(p, episode):
        s_e = embed(p, episode.support_im)  # (B, NK, P)
        q_e = embed(p, episode.query_im)  # (B, NQ, P)
        probs = fewshot.matching_probs(s_e, episode.support_y, q_e, N)
        loss = -jnp.mean(jnp.log(jnp.take_along_axis(
            probs, episode.query_y[..., None], axis=-1)[..., 0] + 1e-8))
        preds = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        acc = jnp.mean((preds == episode.query_y).astype(jnp.float32))
        return loss, preds, acc

    def train_loss(p, episode, rng):
        loss, preds, acc = _raw(p, episode)
        return loss, {"acc": acc, "preds": preds}

    def eval_raw(p, episode, rng):
        loss, preds, acc = _raw(p, episode)
        return {"loss": loss, "acc": acc, "preds": preds,
                "targets": episode.query_y}

    return Family(
        name="matchingnet", params=params, train_loss=train_loss,
        eval_raw=eval_raw, eval_finalize=lambda raw: raw,
        eval_reduce={"loss": "mean", "acc": "mean", "preds": "concat",
                     "targets": "concat"},
    )


# ---------------------------------------------------------------------------
# Family registry
# ---------------------------------------------------------------------------
# The reference has no plugin system — adding a model means editing
# main.py's dispatch and utils.init_model (SURVEY §1). Here new episodic
# families register themselves and inherit the whole stack (chunked
# drivers, parallel engines, harness, CLI) for free.

FAMILY_REGISTRY: Dict[str, Callable] = {}


def register_family(name: str):
    """Decorator: register a ``(cfg, key, dictionary) -> Family`` builder."""
    def deco(fn):
        FAMILY_REGISTRY[name] = fn
        return fn
    return deco


register_family("maml")(lambda cfg, key, d=None: build_maml_family(cfg, key))
register_family("fumi")(build_fumi_family)
register_family("am3")(build_am3_family)
register_family("protonet")(build_protonet_family)
register_family("matchingnet")(build_matchingnet_family)


def build_family(cfg: Config, key: jax.Array, dictionary=None) -> Family:
    """Model factory dispatch (ref: utils.py:232-274 init_model)."""
    builder = FAMILY_REGISTRY.get(cfg.model)
    if builder is None:
        raise NotImplementedError(
            f"model {cfg.model!r} not registered "
            f"(have {sorted(FAMILY_REGISTRY)}; CLIP uses "
            "fumi_tpu.train.clip_loop)")
    return builder(cfg, key, dictionary)


# ---------------------------------------------------------------------------
# Single-device jitted steps
# ---------------------------------------------------------------------------

def frozen_text_encoder(cfg: Config) -> bool:
    """True when the model's ``text_encoder`` params subtree can never
    receive a gradient: ``--fine_tune`` off for token encoders (ref:
    am3.py:74-77, fumi.py:65-67), or the ``rand`` encoder whose Linear is
    created but never used (ref: am3.py:68-69, fumi.py:56-57)."""
    from fumi_tpu.core.config import TOKEN_TEXT_ENCODERS
    if cfg.model not in ("am3", "fumi"):
        return False
    if cfg.text_encoder == "rand":
        return True
    return cfg.text_encoder in TOKEN_TEXT_ENCODERS and not cfg.fine_tune


def make_opt(cfg: Config) -> optax.GradientTransformation:
    # scheduler quirk: only AM3 steps the lr schedule (ref: am3.py:195-196;
    # fumi.py:230-235 unpacks but never steps it)
    from fumi_tpu.train.optim import (init_optim, params_ema,
                                      zero_updates_for_key)
    opt = init_optim(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum,
                     cfg.num_warmup_steps, cfg.epochs,
                     schedule_active=(cfg.model == "am3"))
    if frozen_text_encoder(cfg):
        # torch parity: frozen encoders (and rand's unused Linear) have
        # grad=None in torch and are SKIPPED — coupled-L2 weight decay
        # must not drift them. State-transparent wrapper: the optimizer
        # state structure (and thus checkpoint compatibility) is unchanged
        opt = zero_updates_for_key(opt, "text_encoder")
    if cfg.ema > 0:
        # EMA rides in the optimizer state, so it flows through the
        # chunked scan drivers, the parallel engines, and checkpoints
        # without extra plumbing; chained INSIDE any apply_if_finite wrap
        # (a skipped non-finite update must not move the EMA either)
        opt = optax.chain(opt, params_ema(cfg.ema))
    if cfg.skip_nonfinite > 0:
        # production guard: a non-finite meta-gradient (dead episode, fp
        # blow-up in a long second-order chain) skips the update instead
        # of poisoning the params; aborts after N consecutive bad steps.
        # Opt-in — the reference has no equivalent (it would silently
        # write NaNs into the model, SURVEY §5.2).
        opt = optax.apply_if_finite(opt, cfg.skip_nonfinite)
    return opt


def steps_from_family(family: Family, opt: optax.GradientTransformation
                      ) -> FamilySteps:
    """Wrap a Family into single-device jitted train/eval steps."""

    @jax.jit  # no donation: donated-buffer chains hang the axon TPU tunnel
    def train_step(p, opt_state, episode, rng):
        (loss, aux), grads = jax.value_and_grad(
            family.train_loss, has_aux=True)(p, episode, rng)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        m = _train_metrics(family, loss, aux, episode, grads)
        return p, opt_state, m

    @jax.jit
    def eval_step(p, episode, rng):
        raw = family.eval_raw(p, episode, rng)
        return family.eval_finalize(raw)

    return FamilySteps(params=family.params, opt=opt, train_step=train_step,
                       eval_step=eval_step, family=family)


def component_partition(tree) -> Dict[str, object]:
    """Top-level component partition of a params/grads pytree — THE
    naming contract shared by ``grad_norm/<k>`` scalars (below) and
    ``watch/{params,grads}/<k>`` histograms (train/watch.py): dashboards
    join the two streams on the component name, so both must partition
    identically. A tree that is neither dict nor list/tuple is a single
    ``params`` component; empty subtrees are dropped."""
    if isinstance(tree, dict):
        items = list(tree.items())
    elif isinstance(tree, (list, tuple)):
        items = [(f"layer{i}", g) for i, g in enumerate(tree)]
    else:
        items = [("params", tree)]
    return {k: v for k, v in items if jax.tree_util.tree_leaves(v)}


def per_layer_grad_norms(grads) -> Dict[str, jnp.ndarray]:
    """Per-top-level-component gradient norms — the observability role of
    the reference's ``wandb.watch(model, log="all")`` per-parameter
    histograms (ref: utils.py:272). Scalars, so they stack through the
    chunked drivers' ``lax.scan`` like every other per-step metric."""
    if not isinstance(grads, (dict, list, tuple)):
        return {}
    return {f"grad_norm/{k}": optax.global_norm(g)
            for k, g in component_partition(grads).items()}


def _train_metrics(family: Family, loss, aux, episode,
                   grads=None) -> Dict:
    """Per-train-step metric dict matching the reference's logs
    (ref: am3.py:247-257, maml.py:61-67, fumi.py:248-254), plus global and
    per-layer gradient norms when grads are supplied (the observability
    role of ``wandb.watch``, ref: utils.py:272)."""
    extra = {}
    if grads is not None:
        per_layer = per_layer_grad_norms(grads)
        if per_layer:
            # components partition the grad tree, so the global norm is
            # free given the per-component norms (one tree pass, not two)
            extra["grad_norm"] = jnp.sqrt(
                sum(v * v for v in per_layer.values()))
            extra.update(per_layer)
        else:
            extra["grad_norm"] = optax.global_norm(grads)
    if family.name == "am3":
        conf = aux["conf"]
        prec, rec, f1 = metrics_ops.macro_prf1(conf)
        acc = jnp.diagonal(conf).sum() / jnp.maximum(conf.sum(), 1.0)
        return {"loss": loss, "acc": acc, "prec": prec, "rec": rec,
                "f1": f1, "avg_lamda": aux["avg_lamda"], **extra}
    return {"loss": loss, "acc": aux["acc"], **extra}


def make_steps(cfg: Config, key: jax.Array, dictionary=None) -> FamilySteps:
    family = build_family(cfg, key, dictionary)
    return steps_from_family(family, make_opt(cfg))


# ---------------------------------------------------------------------------
# Sampler fusion
# ---------------------------------------------------------------------------

def fuse_sampler(step_fn: Callable, sampler) -> Callable:
    """Fuse device-side episode sampling into a step function.

    ``fused(params, ..., key)`` draws the episode from ``sampler.sample``
    INSIDE the same jit — sampling, gathers, adaptation, and the optimizer
    update compile to one XLA program with zero per-step host transfers
    (the reference pays a host→device copy of every episode leaf per step,
    ref: fumi.py:130-140).
    """
    @jax.jit
    def fused(tables, *args):
        *head, key = args
        k_sample, k_step = jax.random.split(key)
        episode = sampler.sample(k_sample, tables)
        return step_fn(*head, episode, k_step)

    # tables enter as a jit ARGUMENT (a closed-over multi-GB table would be
    # baked into the executable as a constant and stall compilation)
    return lambda *args: fused(sampler.tables, *args)


# ---------------------------------------------------------------------------
# Chunked (scan) drivers — amortize dispatch to ~zero
# ---------------------------------------------------------------------------
#
# One host→device dispatch costs milliseconds on a tunneled/remote TPU —
# more than the entire FuMI meta-step's compute (~0.4 ms). The chunked
# drivers move the training loop itself onto the device: ``lax.scan`` over
# `chunk` fused sample+step iterations per dispatch, with the PRNG key
# carried in the loop state (never an eager per-step host-side ``fold_in``).
# Per-step metrics come back stacked, so the reference's per-step logging
# granularity is preserved (ref: am3.py:247-257) at 1/chunk the sync cost.

# Outer-scan unroll for the chunked TRAIN drivers: the per-step program is
# tiny (~0.2 ms), so the scan's per-iteration sequencing overhead is
# visible; unroll=4 measured +3.7% train throughput on hardware (19.1k ->
# 19.8k eps/s interleaved best-of-8; unroll=8 regressed to 19.7k). Eval
# scans stay unroll=1 — their 100-step adaptation bodies dwarf loop
# overhead and XLA already overlaps independent episodes across iterations.
# Short chunks skip it: unrolling multiplies the compiled graph for a
# once-executed program (heavy bodies like a second-order ResNet-12 take
# minutes to compile 4x), while the per-iteration overhead it saves only
# matters over production-length chunks.
TRAIN_SCAN_UNROLL = 4


def accum_value_and_grad(family: Family, accum: int) -> Callable:
    """Meta-batch gradient in ``accum`` sequential micro-batches
    (``--tpu_grad_accum``): same signature as
    ``jax.value_and_grad(family.train_loss, has_aux=True)`` but the B
    tasks are processed as ``accum`` scans of B/accum tasks each, so the
    SECOND-ORDER working set (the inner loop's batched activations — the
    measured B=64 cliff in docs/PERFORMANCE.md) scales with B/accum while
    the meta-update stays the exact full-batch gradient: every family's
    outer loss is a mean over tasks, so the mean of equal-size micro-batch
    gradients IS the batch gradient (up to fp reassociation).

    Aux combining contract (holds for every built-in family and is the
    documented requirement for registered ones): scalar aux leaves are
    per-batch MEANS (micro-averaged), ``conf`` is a count matrix (summed),
    any other array leaf is per-task (concatenated back along the task
    axis). Micro-batch i draws forward-time noise from
    ``fold_in(rng, i)`` — stochastic forwards (dropout, ``rand`` text
    encoder) are statistically equivalent, not bitwise-equal, to the
    unaccumulated batch."""
    vg = jax.value_and_grad(family.train_loss, has_aux=True)
    if accum <= 1:
        return vg

    def run(p, episode, rng):
        micro_size = episode.support_im.shape[0] // accum
        micro = jax.tree.map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
            episode)

        def body(i, ep_i):
            (loss, aux), g = vg(p, ep_i, jax.random.fold_in(rng, i))
            return i + 1, ((loss, aux), g)

        _, ((losses, auxs), grads) = jax.lax.scan(body, 0, micro)
        loss = losses.mean()
        grads = jax.tree.map(lambda g: g.mean(0), grads)

        declared = family.train_aux_reduce or {}

        def combine(k, v):
            # v: (accum,) + per-micro-batch aux shape. Shapes are static,
            # so contract violations raise at trace time, not silently
            # mis-aggregate (a registered family with e.g. a per-class
            # vector aux would otherwise be scrambled across micro
            # batches whenever --tpu_grad_accum > 1).
            how = declared.get(k)
            if how == "mean":
                return v.mean(0)
            if how == "sum":
                return v.sum(0)
            if how == "concat":
                return v.reshape((-1,) + v.shape[2:])
            if how is not None:
                raise ValueError(
                    f"train_aux_reduce[{k!r}] = {how!r} "
                    "(mean|sum|concat)")
            # undeclared: the shape heuristic. NOTE it cannot tell a
            # per-task leaf from another leaf whose leading dim happens
            # to equal the micro-batch size (e.g. per-class with
            # num_ways == batch_size/accum) — families with such aux
            # must declare it via Family.train_aux_reduce.
            if k == "conf":
                return v.sum(0)
            if v.ndim <= 1:  # scalar per micro-batch -> batch mean
                return v.mean(0)
            if v.shape[1] != micro_size:
                raise ValueError(
                    f"--tpu_grad_accum cannot combine aux leaf {k!r}: "
                    f"per-micro-batch shape {v.shape[1:]} is neither "
                    f"scalar, 'conf' (summed counts), nor per-task "
                    f"(leading dim {micro_size}) — declare it via "
                    "Family.train_aux_reduce")
            return v.reshape((-1,) + v.shape[2:])  # per-task -> concat

        aux = {k: combine(k, v) for k, v in auxs.items()}
        return (loss, aux), grads

    return run


def train_scan_unroll(n_steps: int, override: int = 0) -> int:
    """``override`` > 0 (--tpu_train_unroll, autotune output) wins; else
    the measured default."""
    if override > 0:
        return override
    return TRAIN_SCAN_UNROLL if n_steps >= 64 else 1


def make_chunked_train(family: Family, opt: optax.GradientTransformation,
                       sampler, chunk: int, unroll: int = 0,
                       accum: int = 1, watch: bool = False) -> Callable:
    """jitted (params, opt_state, key) -> (params, opt_state, key, metrics)
    running ``chunk`` fused train steps; metrics leaves are (chunk,).
    ``accum`` > 1 computes each step's meta-gradient in micro-batches
    (``--tpu_grad_accum``; the episode key stream is unchanged — the SAME
    B episodes are sampled, then split). ``watch`` adds per-component
    gradient-histogram counts (``watch_counts/<k>``, (chunk, NUM_BUCKETS))
    to the metrics — EVERY training step's meta-gradient bucketized on
    device, so ``--tpu_watch`` histograms describe the actual training
    stream (train/watch.py:grad_histogram_metrics)."""
    grad_fn = accum_value_and_grad(family, accum)

    def _step(p, s, k, tables):
        k, k_s, k_step = jax.random.split(k, 3)
        episode = sampler.sample(k_s, tables)
        (loss, aux), grads = grad_fn(p, episode, k_step)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        m = _train_metrics(family, loss, aux, episode, grads)
        return p, s, k, grads, m

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(params, opt_state, key, tables, n_steps):
        def body(carry, _):
            p, s, k = carry
            p, s, k, _, m = _step(p, s, k, tables)
            return (p, s, k), m

        (params, opt_state, key), ms = jax.lax.scan(
            body, (params, opt_state, key), None, length=n_steps,
            unroll=train_scan_unroll(n_steps, unroll))
        return params, opt_state, key, ms

    @functools.partial(jax.jit, static_argnums=(4,))
    def run_watch(params, opt_state, key, tables, n_steps):
        # --tpu_watch stream histograms WITHOUT touching the step body
        # (the shared block-sampling harness; measured cost ladder in
        # docs/PERFORMANCE.md — shipped form ~2.4%)
        from fumi_tpu.train.watch import scan_with_watch
        carry, ms = scan_with_watch(
            lambda p, s, k: _step(p, s, k, tables),
            (params, opt_state, key), n_steps,
            train_scan_unroll(n_steps, unroll))
        params, opt_state, key = carry
        return params, opt_state, key, ms

    runner = run_watch if watch else run
    fn = lambda p, s, k, n=chunk: runner(p, s, k, sampler.tables, n)
    # expose the raw jit + tables for AOT tooling (scripts/mfu.py lowers
    # the program to read XLA's FLOPs cost analysis)
    fn.jitted = runner
    fn.tables = sampler.tables
    return fn


def make_chunked_eval(family: Family, sampler, collect: bool = False
                      ) -> Callable:
    """jitted (params, key, n) -> (key, per-step raw metrics stacked).

    Scans ``n`` eval episodes per dispatch. With ``collect``, per-query
    predictions/targets/ids (and λ for AM3) ride along for the CSV artifact
    (ref: main.py:128-136)."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(params, key, tables, n_steps):
        def body(k, _):
            k, k_s, k_step = jax.random.split(k, 3)
            episode = sampler.sample(k_s, tables)
            out = family.eval_finalize(family.eval_raw(params, episode,
                                                       k_step))
            scalars = {kk: v for kk, v in out.items()
                       if getattr(v, "ndim", 1) == 0}
            if collect:
                scalars = dict(scalars)
                for kk in ("preds", "targets", "lamda"):
                    if kk in out:
                        scalars[kk] = out[kk]
                scalars["query_idx"] = episode.query_ids
                scalars["support_idx"] = episode.support_ids
            return k, scalars

        key, ms = jax.lax.scan(body, key, None, length=n_steps)
        return key, ms

    return lambda params, key, n: run(params, key, sampler.tables, n)
