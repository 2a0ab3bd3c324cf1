"""iMAML — implicit meta-gradients (Rajeswaran et al., arXiv:1909.04630).

Explicit MAML (metalearn/inner_loop.py) differentiates THROUGH the inner
loop: reverse-mode memory/compute grow with the adaptation horizon (remat
trades one for the other). iMAML sidesteps the horizon entirely. Each task
adapts on the PROXIMAL objective

    φ* = argmin_φ  L_s(φ) + (λ/2)·‖φ − θ‖²

and the meta-gradient comes from the implicit function theorem at the
solution:

    dL_q/dθ = (I + (1/λ)·H_s(φ*))⁻¹ · dL_q/dφ*

solved matrix-free by conjugate gradient on Hessian-vector products. The
TPU shape of this is ideal: the inner scan runs entirely under
``stop_gradient`` (NO reverse-mode state, no remat), and the CG solve is a
fixed number of HVPs — `jvp∘grad` forward-over-reverse passes — so
meta-gradient cost is INDEPENDENT of ``n_steps``. Adaptation horizons that
are memory-prohibitive for explicit second-order MAML are free here.

Select with ``--tpu_meta_grad imaml`` (MAML family); λ and the CG budget
via ``--tpu_imaml_lambda`` / ``--tpu_imaml_cg_iters``. An extension — the
reference implements only explicit MAML (ref: fumi/models/maml.py:134-193).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from fumi_tpu.core.episode import Episode
from fumi_tpu.ops.fewshot import cross_entropy
from fumi_tpu.metalearn.inner_loop import (_accuracy, _unroll,
                                           sgd_inner_update)


def proximal_adapt(apply_fn: Callable, theta, s_x, s_y, *, n_steps: int,
                   step_size: float, lam: float):
    """GD on the proximal objective; pure forward (no grad graph kept)."""
    theta0 = jax.lax.stop_gradient(theta)

    def prox_loss(p):
        ce = cross_entropy(apply_fn(p, s_x), s_y)
        sq = sum(jnp.vdot(a - b, a - b) for a, b in zip(
            jax.tree_util.tree_leaves(p),
            jax.tree_util.tree_leaves(theta0)))
        return ce + 0.5 * lam * sq

    def inner(p, _):
        return sgd_inner_update(p, jax.grad(prox_loss)(p), step_size), None

    phi, _ = jax.lax.scan(inner, theta0, None, length=n_steps,
                          unroll=_unroll(n_steps))
    return phi


def _tree_scale(tree, s):
    return jax.tree_util.tree_map(lambda x: x * s, tree)


def make_imaml_task_loss(apply_fn: Callable, *, n_steps: int,
                         step_size: float, lam: float, cg_iters: int):
    """Per-task query loss with an implicit-gradient custom VJP."""

    adapt = partial(proximal_adapt, apply_fn, n_steps=n_steps,
                    step_size=step_size, lam=lam)

    def _values(theta, s_x, s_y, q_x, q_y):
        phi = adapt(theta, s_x, s_y)
        q_logits = apply_fn(phi, q_x)
        loss = cross_entropy(q_logits, q_y)
        acc = _accuracy(q_logits, q_y)
        preds = jnp.argmax(q_logits, axis=-1).astype(jnp.int32)
        return (loss, acc, preds), phi

    @jax.custom_vjp
    def task_loss(theta, s_x, s_y, q_x, q_y):
        """(loss, acc, preds); only ``loss``'s gradient is implicit —
        metric outputs receive no cotangent from has_aux callers."""
        out, _phi = _values(theta, s_x, s_y, q_x, q_y)
        return out

    def fwd(theta, s_x, s_y, q_x, q_y):
        out, phi = _values(theta, s_x, s_y, q_x, q_y)
        return out, (phi, s_x, s_y, q_x, q_y)

    def bwd(res, cts):
        g_loss = cts[0]  # acc/preds cotangents are zero/symbolic
        phi, s_x, s_y, q_x, q_y = res
        v = jax.grad(lambda p: cross_entropy(apply_fn(p, q_x), q_y))(phi)

        support_grad = jax.grad(
            lambda p: cross_entropy(apply_fn(p, s_x), s_y))

        def operator(x):
            # (I + H_s/λ)·x, H_s·x as one forward-over-reverse JVP
            _, hvp = jax.jvp(support_grad, (phi,), (x,))
            return jax.tree_util.tree_map(
                lambda xi, hi: xi + hi / lam, x, hvp)

        x, _ = jax.scipy.sparse.linalg.cg(operator, v, maxiter=cg_iters)
        return (_tree_scale(x, g_loss), None, None, None, None)

    task_loss.defvjp(fwd, bwd)
    return task_loss


def imaml_episode_loss(apply_fn: Callable,
                       params,
                       episode: Episode,
                       *,
                       n_steps: int,
                       step_size: float,
                       lam: float = 2.0,
                       cg_iters: int = 5):
    """Mean outer loss over the meta-batch with implicit meta-gradients.

    Same contract as :func:`inner_loop.maml_episode_loss` — returns
    ``(outer_loss, {"acc", "preds"})``, ``outer_loss`` differentiable in
    ``params`` — but the gradient is the iMAML implicit gradient (CG on
    HVPs at the adapted point) rather than backprop through the scan.
    """
    task_loss = make_imaml_task_loss(
        apply_fn, n_steps=n_steps, step_size=step_size, lam=lam,
        cg_iters=cg_iters)

    def one(s_x, s_y, q_x, q_y):
        return task_loss(params, s_x, s_y, q_x, q_y)

    losses, accs, preds = jax.vmap(one)(
        episode.support_im, episode.support_y,
        episode.query_im, episode.query_y)
    return jnp.mean(losses), {"acc": jnp.mean(accs), "preds": preds}


# ---------------------------------------------------------------------------
# FuMI: implicit gradients through the hypernetwork dual update
# ---------------------------------------------------------------------------
#
# FuMI's adapted vector is z = (im_net params, generated head H) with the
# initial point z0(θ) = (θ_im, hypernet_θ(text)) — θ enters the base net
# directly AND the head through the hypernetwork. The IFT meta-gradient
# therefore carries the extra pull-back through z0:
#
#     dL_q/dθ = (∂z0/∂θ)ᵀ · (I + (1/λ)·H_s(z*))⁻¹ · dL_q/dz*
#
# where the (∂z0/∂θ)ᵀ factor is: identity onto θ_im for the im_net block,
# and the hypernetwork VJP for the head block (which also routes gradient
# into the text encoder iff fine_tune). The inner solve runs the proximal
# objective on the JOINT (im, head) vector — the implicit analogue of the
# reference's always-second-order dual update (ref: fumi.py:165-176).
# Dropout is OFF inside the solve: the IFT needs a deterministic
# stationary objective (documented deviation from the explicit engine's
# per-step dropout).

def _fumi_support_ce(model, z, s_x, s_y, rng):
    im_p, head = z
    logits = model.im_forward(im_p, head, s_x, rng=rng, train=False)
    return cross_entropy(logits, s_y)


def fumi_proximal_adapt(model, z0, s_x, s_y, rng, *, n_steps: int,
                        step_size: float, lam: float):
    """Proximal GD on FuMI's joint (im_net, generated-head) vector — THE
    inner solve of the iMAML-FuMI engine, shared with serving so the two
    cannot drift. Pure forward; dropout off (deterministic objective)."""

    def prox_loss(z):
        ce = _fumi_support_ce(model, z, s_x, s_y, rng)
        sq = sum(jnp.vdot(a - b, a - b) for a, b in zip(
            jax.tree_util.tree_leaves(z),
            jax.tree_util.tree_leaves(z0)))
        return ce + 0.5 * lam * sq

    def inner(z, _):
        return sgd_inner_update(z, jax.grad(prox_loss)(z), step_size), None

    phi, _ = jax.lax.scan(inner, z0, None, length=n_steps,
                          unroll=_unroll(n_steps))
    return phi


def make_imaml_fumi_task_loss(model, *, n_steps: int, step_size: float,
                              lam: float, cg_iters: int):
    def z0_of(theta, s_text, s_y, k_hyper):
        head0 = model.get_hyper_params(theta, s_text, s_y, rng=k_hyper)
        return (theta["im_net"], head0)

    def support_ce(z, s_x, s_y, rng):
        return _fumi_support_ce(model, z, s_x, s_y, rng)

    def adapt(z0, s_x, s_y, rng):
        return fumi_proximal_adapt(model, z0, s_x, s_y, rng,
                                   n_steps=n_steps, step_size=step_size,
                                   lam=lam)

    def _values(theta, s_text, s_x, s_y, q_x, q_y, task_rng):
        k_hyper, k_inner, k_q = jax.random.split(task_rng, 3)
        z0 = jax.lax.stop_gradient(z0_of(theta, s_text, s_y, k_hyper))
        phi = adapt(z0, s_x, s_y, k_inner)
        im_T, head_T = phi
        q_logits = model.im_forward(im_T, head_T, q_x, rng=k_q, train=False)
        loss = cross_entropy(q_logits, q_y)
        acc = _accuracy(q_logits, q_y)
        preds = jnp.argmax(q_logits, axis=-1).astype(jnp.int32)
        return (loss, acc, preds), phi, (k_hyper, k_inner, k_q)

    @jax.custom_vjp
    def task_loss(theta, s_text, s_x, s_y, q_x, q_y, task_rng):
        out, _phi, _ks = _values(theta, s_text, s_x, s_y, q_x, q_y,
                                 task_rng)
        return out

    def fwd(theta, s_text, s_x, s_y, q_x, q_y, task_rng):
        out, phi, ks = _values(theta, s_text, s_x, s_y, q_x, q_y, task_rng)
        return out, (theta, phi, s_text, s_x, s_y, q_x, q_y, ks)

    def bwd(res, cts):
        g_loss = cts[0]
        theta, phi, s_text, s_x, s_y, q_x, q_y, ks = res
        k_hyper, k_inner, k_q = ks

        v = jax.grad(lambda z: cross_entropy(
            model.im_forward(z[0], z[1], q_x, rng=k_q, train=False),
            q_y))(phi)

        sgrad = jax.grad(lambda z: support_ce(z, s_x, s_y, k_inner))

        def operator(x):
            _, hvp = jax.jvp(sgrad, (phi,), (x,))
            return jax.tree_util.tree_map(
                lambda xi, hi: xi + hi / lam, x, hvp)

        x, _ = jax.scipy.sparse.linalg.cg(operator, v, maxiter=cg_iters)
        x_im, x_head = x

        # pull x back through z0(θ): the head block through the
        # hypernetwork's VJP (this also routes into the text encoder iff
        # fine_tune — class_text_encoding stop_gradients it otherwise)...
        _, vjp_fn = jax.vjp(
            lambda t: model.get_hyper_params(t, s_text, s_y, rng=k_hyper),
            theta)
        (g_theta,) = vjp_fn(x_head)
        # ...and the im_net block by identity
        g_theta = dict(g_theta)
        g_theta["im_net"] = jax.tree_util.tree_map(
            lambda gi, xi: gi + xi, g_theta["im_net"], x_im)
        return (_tree_scale(g_theta, g_loss), None, None, None, None,
                None, None)

    task_loss.defvjp(fwd, bwd)
    return task_loss


def imaml_fumi_episode_loss(model,
                            params,
                            episode: Episode,
                            *,
                            n_steps: int,
                            step_size: float,
                            rng: jax.Array,
                            lam: float = 2.0,
                            cg_iters: int = 5):
    """FuMI with implicit meta-gradients. Same contract as
    :func:`inner_loop.fumi_episode_loss` (minus the ``train`` flag — the
    inner solve is deterministic, see module notes)."""
    task_loss = make_imaml_fumi_task_loss(
        model, n_steps=n_steps, step_size=step_size, lam=lam,
        cg_iters=cg_iters)

    B = episode.support_im.shape[0]
    task_rngs = jax.random.split(rng, B)

    def one(s_text, s_x, s_y, q_x, q_y, task_rng):
        return task_loss(params, s_text, s_x, s_y, q_x, q_y, task_rng)

    losses, accs, preds = jax.vmap(one)(
        episode.support_text, episode.support_im, episode.support_y,
        episode.query_im, episode.query_y, task_rngs)
    return jnp.mean(losses), {"acc": jnp.mean(accs), "preds": preds}
