"""The inner-loop meta-gradient engine.

The reference adapts each task in a sequential Python loop, building a
second-order autograd graph through every inner step
(ref: fumi/models/maml.py:158-177, fumi/models/fumi.py:148-176, using
torchmeta's ``gradient_update_parameters``). Here the whole meta-batch
compiles to ONE XLA program:

- one inner SGD step = ``jax.grad`` + pytree update,
- ``lax.scan`` over the (static) number of adaptation steps,
- ``vmap`` over the tasks of the meta-batch,
- outer ``jax.grad`` differentiates through the scan (2nd order);
  ``--first_order`` applies ``stop_gradient`` to the inner grads, exactly
  torch's ``first_order=True`` detach (torchmeta gradient_based.py).

Inner steps are wrapped in ``jax.checkpoint`` when the adaptation horizon is
long (``n_steps >= REMAT_THRESHOLD``), so reverse-mode through the scan
rematerialises step activations instead of storing them — the TPU
replacement for torch's retained ``create_graph`` graph. Short horizons (the
default 5 train steps) skip remat: storing beats recompute there (~13%
measured). Evaluation (e.g. the 100-step test-time adaptation,
ref: utils.py:176-179) runs the same scan without an outer grad, so no
reverse carries are kept at all.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fumi_tpu.core.episode import Episode
from fumi_tpu.ops.fewshot import cross_entropy

# adaptation horizons at or above this rematerialise their inner steps
REMAT_THRESHOLD = 16
# short horizons fully unroll: XLA schedules the whole adaptation chain as
# one graph (+10% measured at the default 5 train steps); long horizons
# keep the rolled scan (compile time, remat)
UNROLL_MAX = 8


# What the save_convs policy keeps: the conv outputs
# (layers.conv2d_f32acc "conv_out"). Saving the per-channel norm
# statistics too (conv4.batch_stat_norm "norm_stat") looked like a free
# win — C floats each, and keeping them should let the backward's
# recompute of each normalize chain skip the reduction pass over the
# full conv output — but MEASURED NEGATIVE on the chip (resnet12 bf16
# 84x84 B=4: 4.5 vs 4.6 eps/s, XLA-counted traffic UP 549 vs 526
# GB/step): pinning the tiny stat tensors as checkpoint outputs fences
# the fusion of the stats pass into the surrounding chain, the same
# boundary-materialization failure mode as stage-selective remat
# (docs/PERFORMANCE.md "Raw-image conv path"). A/B via
# scripts/exp_conv_bench.py --save_names conv_out,norm_stat.
SAVE_CONVS_NAMES = ("conv_out",)


def _maybe_remat(fn, n_steps, remat):
    if remat == "save_convs":
        # checkpoint the step but KEEP the named conv outputs + norm
        # stats (SAVE_CONVS_NAMES): the meta-backward recomputes only
        # the elementwise norm/relu/pool chains, not the convs and not
        # the statistics reductions — measured on resnet12 vs plain
        # whole-step remat (docs/PERFORMANCE.md "Raw-image conv path").
        # Stored bytes scale with n_steps (one set of conv outputs per
        # inner step), so long horizons fall back to whole-step remat —
        # the same memory character the threshold below encodes.
        if n_steps >= REMAT_THRESHOLD:
            return jax.checkpoint(fn)
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                *SAVE_CONVS_NAMES))
    if remat is None:
        remat = n_steps >= REMAT_THRESHOLD
    return jax.checkpoint(fn) if remat else fn


def _unroll(n_steps: int) -> int:
    if n_steps <= UNROLL_MAX:
        return n_steps
    # partial unroll for long horizons: fewer loop iterations, better op
    # scheduling (+21% measured on the 100-step eval adaptation)
    for d in (4, 2):
        if n_steps % d == 0:
            return d
    return 1


def sgd_inner_update(params, grads, step_size: float, mask=None):
    """θ' = θ − α·∇ℓ, the torchmeta ``gradient_update_parameters`` update.

    ``mask`` (optional bool pytree) restricts the update to marked leaves —
    the ANIL variant (Raghu et al.: only the head adapts in the inner
    loop). Unmasked leaves keep their pre-update value, and XLA dead-code-
    eliminates their unused inner gradients."""
    if mask is None:
        return jax.tree_util.tree_map(lambda p, g: p - step_size * g,
                                      params, grads)
    return jax.tree_util.tree_map(
        lambda p, g, m: p - step_size * g if m else p,
        params, grads, mask)


def head_only_mask(params):
    """ANIL adapt-mask: True only on the network's head leaves.

    Covers both param layouts: the MLP stack (sequence of layer dicts —
    head is the last layer) and the raw-image backbones (dict with an
    explicit ``"head"`` entry)."""
    if isinstance(params, dict) and "head" in params:
        return {k: jax.tree_util.tree_map(lambda _: k == "head", v)
                for k, v in params.items()}
    seq = list(params)
    n = len(seq)
    mask = [jax.tree_util.tree_map(lambda _, i=i: i == n - 1, p)
            for i, p in enumerate(seq)]
    return type(params)(mask) if isinstance(params, tuple) else mask


def _accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Query accuracy (ref: maml.py:196-198 / fumi.py:329-331)."""
    preds = jnp.argmax(logits, axis=-1)
    return jnp.mean((preds == targets).astype(jnp.float32))


# ---------------------------------------------------------------------------
# MAML
# ---------------------------------------------------------------------------

def maml_episode_loss(apply_fn: Callable,
                      params,
                      episode: Episode,
                      *,
                      n_steps: int,
                      step_size: float,
                      first_order: bool,
                      remat: bool = None,
                      adapt_mask=None):
    """Mean outer loss over the meta-batch (ref: maml.py:134-193).

    Each task adapts a private copy of ``params`` for ``n_steps`` inner SGD
    steps on its support set, then contributes the query cross-entropy.
    ``adapt_mask`` restricts the inner updates to marked leaves (ANIL).

    Returns ``(outer_loss, aux)`` with aux = {"acc", "preds"}; outer_loss is
    differentiable w.r.t. ``params`` (2nd order unless ``first_order``).
    """

    def task_loss(s_x, s_y, q_x, q_y):
        def inner(p, _):
            def support_loss(p_):
                return cross_entropy(apply_fn(p_, s_x), s_y)
            grads = jax.grad(support_loss)(p)
            if first_order:
                grads = jax.lax.stop_gradient(grads)
            return sgd_inner_update(p, grads, step_size, adapt_mask), None

        inner = _maybe_remat(inner, n_steps, remat)
        adapted, _ = jax.lax.scan(inner, params, None, length=n_steps,
                                  unroll=_unroll(n_steps))
        q_logits = apply_fn(adapted, q_x)
        loss = cross_entropy(q_logits, q_y)
        acc = _accuracy(jax.lax.stop_gradient(q_logits), q_y)
        preds = jnp.argmax(q_logits, axis=-1).astype(jnp.int32)
        return loss, acc, preds

    losses, accs, preds = jax.vmap(task_loss)(
        episode.support_im, episode.support_y,
        episode.query_im, episode.query_y)
    # ref divides summed task losses by the meta-batch size (maml.py:185-186)
    outer_loss = jnp.mean(losses)
    return outer_loss, {"acc": jnp.mean(accs), "preds": preds}


# ---------------------------------------------------------------------------
# FuMI
# ---------------------------------------------------------------------------

def fumi_episode_loss(model,  # fumi_tpu.models.fumi.FUMI
                      params,
                      episode: Episode,
                      *,
                      n_steps: int,
                      step_size: float,
                      rng: jax.Array,
                      train: bool,
                      remat: bool = None):
    """Mean outer loss over the meta-batch (ref: fumi.py:115-196).

    Per task: the hypernetwork emits the generated head from the per-class
    support text (ref: fumi.py:156,198-212); the inner loop then jointly
    adapts (base im_net params, generated head) by SGD on the support
    cross-entropy. Both updates are ALWAYS second-order, matching the
    reference (manual ``create_graph=True`` step on the hyper output,
    ref: fumi.py:165-168, and hardcoded ``first_order=False`` for the base
    net, ref: fumi.py:172-176 — ``--first_order`` is intentionally ignored).

    Both gradients are taken at the same pre-update point, so one joint
    ``jax.grad`` over the pair reproduces the reference trajectories.
    """

    def task_loss(s_text, s_x, s_y, q_x, q_y, task_rng):
        k_hyper, k_steps, k_query = jax.random.split(task_rng, 3)
        hyper0 = model.get_hyper_params(params, s_text, s_y, rng=k_hyper)
        im0 = params["im_net"]

        def inner(carry, step_rng):
            im_p, hyp = carry

            def support_loss(im_p_, hyp_):
                logits = model.im_forward(im_p_, hyp_, s_x,
                                          rng=step_rng, train=train)
                return cross_entropy(logits, s_y)

            g_im, g_hyp = jax.grad(support_loss, argnums=(0, 1))(im_p, hyp)
            return (sgd_inner_update(im_p, g_im, step_size),
                    hyp - step_size * g_hyp), None

        inner = _maybe_remat(inner, n_steps, remat)
        step_rngs = jax.random.split(k_steps, n_steps)
        (im_T, hyp_T), _ = jax.lax.scan(inner, (im0, hyper0), step_rngs,
                                        unroll=_unroll(n_steps))

        q_logits = model.im_forward(im_T, hyp_T, q_x,
                                    rng=k_query, train=train)
        loss = cross_entropy(q_logits, q_y)
        acc = _accuracy(jax.lax.stop_gradient(q_logits), q_y)
        preds = jnp.argmax(q_logits, axis=-1).astype(jnp.int32)
        return loss, acc, preds

    B = episode.support_im.shape[0]
    task_rngs = jax.random.split(rng, B)
    losses, accs, preds = jax.vmap(task_loss)(
        episode.support_text, episode.support_im, episode.support_y,
        episode.query_im, episode.query_y, task_rngs)
    outer_loss = jnp.mean(losses)  # ref: fumi.py:187-188
    return outer_loss, {"acc": jnp.mean(accs), "preds": preds}
