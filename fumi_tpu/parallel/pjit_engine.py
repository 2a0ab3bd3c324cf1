"""2-D mesh (dp × mp) training via jit + NamedSharding (the pjit style).

The shard_map engine (fumi_tpu/parallel/engine.py) is explicit about its
collectives; this engine is the declarative alternative: annotate shardings
on params and episodes, let XLA insert the collectives (the
"How to Scale Your Model" recipe — pick a mesh, annotate, let XLA work).

Sharding layout:
- episodes: task axis over ``dp`` (episode data parallelism);
- params: large weight matrices sharded over ``mp`` along their INPUT
  (feature) dimension — e.g. PureImageNetwork's first layer (n_way ×
  2048-dim) or AM3's image encoder. Tiny tensors stay replicated.
  XLA turns the sharded matmul into per-shard partial products +
  reduce-scatter/all-reduce over ICI;
- gradients/optimizer state inherit the param shardings.

For the reference's model sizes ``mp`` buys nothing (SURVEY §2.6) — this
engine exists so the SAME code path scales a larger frozen encoder (the
``resnet``/CLIP direction) without restructuring; it is exercised by tests
and the multi-chip dry run at (dp, mp) = (2, 4).
"""

from __future__ import annotations

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fumi_tpu.core.config import Config
from fumi_tpu.core.mesh import DP_AXIS, MP_AXIS
from fumi_tpu.train.steps import (Family, FamilySteps, _train_metrics,
                                  build_family, make_opt)

# weights whose *input* dim is at least this wide get sharded over mp
MP_SHARD_MIN_DIM = 256


def param_pspecs(params, mesh: Mesh):
    """PartitionSpec pytree: 2-D (out, in) weights with a wide input dim
    shard that dim over mp; everything else replicated."""
    mp = mesh.shape[MP_AXIS]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if (len(shape) == 2 and shape[1] >= MP_SHARD_MIN_DIM
                and shape[1] % mp == 0):
            return P(None, MP_AXIS)  # shard the input/feature dim
        return P()

    return jax.tree_util.tree_map(spec, params)


def episode_pspecs(episode):
    return jax.tree_util.tree_map(lambda _: P(DP_AXIS), episode)


def make_pjit_steps(cfg: Config, key: jax.Array, mesh: Mesh,
                    dictionary=None) -> FamilySteps:
    """Declarative-sharding train/eval steps on a (dp, mp) mesh."""
    dp = mesh.shape[DP_AXIS]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by dp={dp}")

    family = build_family(cfg, key, dictionary)
    opt = make_opt(cfg)

    p_specs = param_pspecs(family.params, mesh)
    p_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), p_specs)
    ep_sharding = NamedSharding(mesh, P(DP_AXIS))

    def place_params(params):
        return jax.device_put(params, p_shardings)

    def place_episode(episode):
        return jax.device_put(
            episode, jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P(DP_AXIS)), episode))

    @jax.jit
    def train_step(p, opt_state, episode, rng):
        # constrain inputs; XLA propagates shardings + inserts collectives
        p = jax.lax.with_sharding_constraint(p, p_shardings)
        episode = jax.lax.with_sharding_constraint(
            episode, jax.tree_util.tree_map(lambda _: ep_sharding, episode))
        (loss, aux), grads = jax.value_and_grad(
            family.train_loss, has_aux=True)(p, episode, rng)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        p = jax.lax.with_sharding_constraint(p, p_shardings)
        m = _train_metrics(family, loss, aux, episode)
        return p, opt_state, m

    @jax.jit
    def eval_step(p, episode, rng):
        p = jax.lax.with_sharding_constraint(p, p_shardings)
        episode = jax.lax.with_sharding_constraint(
            episode, jax.tree_util.tree_map(lambda _: ep_sharding, episode))
        raw = family.eval_raw(p, episode, rng)
        return family.eval_finalize(raw)

    steps = FamilySteps(params=place_params(family.params), opt=opt,
                        train_step=train_step, eval_step=eval_step,
                        family=family, mesh=mesh)
    # expose the placement helpers for callers
    train_step.place_params = place_params  # type: ignore[attr-defined]
    train_step.place_episode = place_episode  # type: ignore[attr-defined]
    return steps
