"""Reptile — first-order meta-learning by parameter interpolation
(Nichol, Achiam & Schulman, 2018).

Each task runs plain SGD on its support set (under ``stop_gradient`` — no
meta-graph at all), and the meta-update moves the initialization toward
the adapted parameters:

    θ ← θ + ε·(φ_T − θ)   ⇔   pseudo-gradient g = θ − φ_T

Packaged to the harness's ``train_loss`` contract via ``custom_vjp``: the
forward value is the post-adaptation QUERY loss (pure monitoring — Reptile
itself never differentiates it), while the backward pass substitutes the
pseudo-gradient. The standard optimizer stack (Adam etc.) then consumes it
like any other meta-gradient, which is the common "Reptile + Adam"
formulation. Cheapest engine in the suite: one forward-mode-free scan per
task, nothing else.

Select with ``--tpu_meta_grad reptile`` (MAML family). Extension — the
reference implements only explicit MAML (ref: fumi/models/maml.py:134-193).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fumi_tpu.core.episode import Episode
from fumi_tpu.ops.fewshot import cross_entropy
from fumi_tpu.metalearn.inner_loop import (_accuracy, _unroll,
                                           sgd_inner_update)


def make_reptile_task_loss(apply_fn: Callable, *, n_steps: int,
                           step_size: float):
    def adapt(theta, s_x, s_y):
        def inner(p, _):
            g = jax.grad(
                lambda p_: cross_entropy(apply_fn(p_, s_x), s_y))(p)
            return sgd_inner_update(p, g, step_size), None

        phi, _ = jax.lax.scan(inner, jax.lax.stop_gradient(theta), None,
                              length=n_steps, unroll=_unroll(n_steps))
        return phi

    @jax.custom_vjp
    def task_loss(theta, s_x, s_y, q_x, q_y):
        out, _phi = _values(theta, s_x, s_y, q_x, q_y)
        return out

    def _values(theta, s_x, s_y, q_x, q_y):
        phi = adapt(theta, s_x, s_y)
        q_logits = apply_fn(phi, q_x)
        loss = cross_entropy(q_logits, q_y)
        acc = _accuracy(q_logits, q_y)
        preds = jnp.argmax(q_logits, axis=-1).astype(jnp.int32)
        return (loss, acc, preds), phi

    def fwd(theta, s_x, s_y, q_x, q_y):
        out, phi = _values(theta, s_x, s_y, q_x, q_y)
        return out, (theta, phi)

    def bwd(res, cts):
        g_loss = cts[0]  # metric cotangents are zero/symbolic
        theta, phi = res
        pseudo = jax.tree_util.tree_map(
            lambda t, p: (t - p) * g_loss, theta, phi)
        return (pseudo, None, None, None, None)

    task_loss.defvjp(fwd, bwd)
    return task_loss


def reptile_episode_loss(apply_fn: Callable,
                         params,
                         episode: Episode,
                         *,
                         n_steps: int,
                         step_size: float):
    """Mean query loss over the meta-batch; its "gradient" is the Reptile
    pseudo-gradient ``mean_t(θ − φ_t)``. Same contract as
    :func:`inner_loop.maml_episode_loss`."""
    task_loss = make_reptile_task_loss(apply_fn, n_steps=n_steps,
                                       step_size=step_size)

    def one(s_x, s_y, q_x, q_y):
        return task_loss(params, s_x, s_y, q_x, q_y)

    losses, accs, preds = jax.vmap(one)(
        episode.support_im, episode.support_y,
        episode.query_im, episode.query_y)
    return jnp.mean(losses), {"acc": jnp.mean(accs), "preds": preds}
