"""Optimizer factories — optax transforms matching the reference's torch/HF
optimizers (ref: fumi/utils/utils.py:277-299) update-for-update:

- ``adam``: torch.optim.Adam with L2 ``weight_decay`` — torch adds ``wd·θ``
  to the gradient BEFORE the Adam moments (coupled L2, not AdamW), betas
  (0.9, 0.999), eps 1e-8, bias correction on.
- ``SGD``: torch.optim.SGD with momentum + coupled L2; torch's first-step
  momentum buffer is the raw gradient (optax ``trace`` matches).
- ``adamw``: transformers' AdamW — decoupled decay with HF defaults
  (weight_decay=0.0, eps=1e-6, bias correction).
- ``adamw_lin_schedule``: HF AdamW + ``get_linear_schedule_with_warmup``
  (linear 0→lr over ``num_warmup_steps``, then linear decay to 0 at
  ``epochs``). The reference returns an ``(opt, scheduler)`` tuple; only the
  AM3 harness actually steps the scheduler (ref: am3.py:195-196) — MAML/FuMI
  unpack it but never call ``scheduler.step()`` (ref: fumi.py:230-235). The
  harness reproduces that by passing ``schedule_active=False`` for those
  model families.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax


class EmaState(NamedTuple):
    """State of :func:`params_ema`; found back by :func:`find_ema`."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the POST-update params.

    Chained AFTER the optimizer (``optax.chain(opt, params_ema(d))``), so
    ``update`` sees the final updates and the pre-update params; the EMA
    tracks ``apply_updates(params, updates)``. A production-training
    extension (``--tpu_ema``): evaluation/checkpoint-selection read the
    smoothed weights via :func:`find_ema` while training continues on the
    raw ones. The reference has no equivalent."""

    def init(params):
        return EmaState(ema=params)

    def update(updates, state, params=None):
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def find_ema(opt_state) -> Optional[Any]:
    """Locate the :class:`EmaState` inside an (arbitrarily wrapped)
    optimizer state — chains, apply_if_finite, injected hyperparams."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, dict):
        children: tuple = tuple(opt_state.values())
    elif isinstance(opt_state, (tuple, list)):  # incl. NamedTuples
        children = tuple(opt_state)
    else:
        return None
    for child in children:
        found = find_ema(child)
        if found is not None:
            return found
    return None


def zero_updates_for_key(inner: optax.GradientTransformation,
                         key: str) -> optax.GradientTransformation:
    """Wrap ``inner`` so the final updates of one top-level params subtree
    are zero.

    torch optimizers SKIP parameters whose ``.grad`` is ``None`` — frozen
    text encoders (``fine_tune=False``, ref: am3.py:74-77, fumi.py:65-67)
    and the ``rand`` encoder's never-used Linear never move, even under
    Adam/SGD ``weight_decay`` (the coupled-L2 term only applies to params
    that HAVE a grad). optax transforms see a zero gradient instead and
    would happily decay those weights toward zero — destroying pretrained
    glove/w2v embeddings over a long run.

    Implemented as a state-TRANSPARENT wrapper (same ``init`` as
    ``inner``, updates zeroed after ``inner.update``) rather than an
    ``optax.chain`` link: chaining would change the optimizer-state
    pytree structure and make every previously-saved checkpoint of such
    configs unrestorable.
    """

    def init(params):
        return inner.init(params)

    def update(updates, state, params=None):
        updates, state = inner.update(updates, state, params)
        if isinstance(updates, dict) and key in updates:
            import jax.numpy as jnp
            updates = dict(updates)
            updates[key] = jax.tree_util.tree_map(
                jnp.zeros_like, updates[key])
        return updates, state

    return optax.GradientTransformation(init, update)


def linear_warmup_schedule(lr: float, num_warmup_steps: int,
                           num_training_steps: int) -> optax.Schedule:
    """transformers.get_linear_schedule_with_warmup semantics."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(num_warmup_steps, 1)
        frac_warm = step / warm
        denom = jnp.maximum(num_training_steps - num_warmup_steps, 1)
        frac_decay = jnp.maximum(
            0.0, (num_training_steps - step) / denom)
        return lr * jnp.where(step < num_warmup_steps, frac_warm, frac_decay)
    return schedule


def init_optim(optim: str, lr: float, weight_decay: float = 5e-4,
               momentum: float = 0.9, num_warmup_steps: int = 10,
               epochs: int = 50000,
               schedule_active: bool = True) -> optax.GradientTransformation:
    """Build the optax transform for a reference optimizer name."""
    if optim == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    if optim == "SGD":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale(-lr),
        )
    if optim == "adamw":
        # HF AdamW defaults: eps=1e-6, weight_decay=0.0
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.0)
    if optim == "adamw_lin_schedule":
        if schedule_active:
            sched = linear_warmup_schedule(lr, num_warmup_steps, epochs)
            return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-6,
                               weight_decay=0.0)
        # scheduler created but never stepped (MAML/FuMI quirk): constant lr
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.0)
    raise NotImplementedError(f"optimizer {optim!r}")
