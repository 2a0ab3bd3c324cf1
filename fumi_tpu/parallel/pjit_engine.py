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


def _mesh_setup(cfg: Config, family: Family, mesh: Mesh, sampler=None):
    """Shared sharding preamble for every builder in this engine:
    dp-divisibility check, param shardings (wide input dims over mp),
    episode sharding, and — when a sampler is given — its tables placed
    replicated on the mesh ONCE (passing single-device tables would
    re-broadcast them across chips on every dispatch)."""
    dp = mesh.shape[DP_AXIS]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by dp={dp}")
    p_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_pspecs(family.params, mesh))
    ep_sharding = NamedSharding(mesh, P(DP_AXIS))
    tables_rep = (jax.device_put(sampler.tables, NamedSharding(mesh, P()))
                  if sampler is not None else None)
    return p_shardings, ep_sharding, tables_rep


def make_pjit_steps(cfg: Config, key: jax.Array, mesh: Mesh,
                    dictionary=None) -> FamilySteps:
    """Declarative-sharding train/eval steps on a (dp, mp) mesh."""
    family = build_family(cfg, key, dictionary)
    opt = make_opt(cfg)

    p_shardings, ep_sharding, _ = _mesh_setup(cfg, family, mesh)

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


def make_pjit_chunked_train(cfg: Config, family: Family,
                            opt: optax.GradientTransformation,
                            sampler, mesh: Mesh, chunk: int):
    """Chunked (scan) driver for the 2-D declarative engine: `chunk` fused
    sample+train steps per dispatch with sharding constraints inside the
    scan body — wide weights stay sharded over ``mp`` across the whole
    chunk, episodes shard over ``dp``, XLA inserts the ICI collectives.
    Same contract as fumi_tpu.train.steps.make_chunked_train."""
    import functools

    from fumi_tpu.data.sampler import sample_episode

    p_shardings, ep_sharding, tables_rep = _mesh_setup(cfg, family, mesh,
                                                       sampler)
    spec = sampler.spec

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(params, opt_state, key, tables, n_steps):
        params = jax.lax.with_sharding_constraint(params, p_shardings)

        def body(carry, _):
            p, s, k = carry
            k, k_s, k_step = jax.random.split(k, 3)
            # carry the sampler's options (augment jitter, pallas gather) —
            # a bare sample_episode call would silently drop --augment here
            episode = sample_episode(
                tables, spec, k_s,
                use_pallas_gather=sampler.use_pallas_gather,
                augment_scale=sampler.augment_scale)
            episode = jax.lax.with_sharding_constraint(
                episode, jax.tree_util.tree_map(lambda _: ep_sharding,
                                                episode))
            (loss, aux), grads = jax.value_and_grad(
                family.train_loss, has_aux=True)(p, episode, k_step)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            p = jax.lax.with_sharding_constraint(p, p_shardings)
            m = _train_metrics(family, loss, aux, episode, grads)
            m = {k2: v for k2, v in m.items()
                 if getattr(v, "ndim", 1) == 0}
            return (p, s, k), m

        from fumi_tpu.train.steps import train_scan_unroll
        (params, opt_state, key), ms = jax.lax.scan(
            body, (params, opt_state, key), None, length=n_steps,
            unroll=train_scan_unroll(n_steps, cfg.train_unroll))
        return params, opt_state, key, ms

    def wrapper(params, opt_state, key, n=chunk):
        return run(params, opt_state, key, tables_rep, n)

    return wrapper


def make_pjit_chunked_eval(cfg: Config, family: Family, sampler,
                           mesh: Mesh, collect: bool = False):
    """Chunked eval for the 2-D engine. Artifact collection (per-query
    preds/ids) rides along like the serial driver's; metrics are computed
    on the global batch (no per-shard reductions needed — XLA handles the
    sharded compute)."""
    import functools

    from fumi_tpu.data.sampler import sample_episode

    p_shardings, ep_sharding, tables_rep = _mesh_setup(cfg, family, mesh,
                                                       sampler)
    spec = sampler.spec

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_jit(params, key, tables, n_steps):
        params = jax.lax.with_sharding_constraint(params, p_shardings)

        def body(k, _):
            k, k_s, k_step = jax.random.split(k, 3)
            episode = sample_episode(
                tables, spec, k_s,
                use_pallas_gather=sampler.use_pallas_gather,
                augment_scale=sampler.augment_scale)
            episode = jax.lax.with_sharding_constraint(
                episode, jax.tree_util.tree_map(lambda _: ep_sharding,
                                                episode))
            out = family.eval_finalize(family.eval_raw(params, episode,
                                                       k_step))
            scalars = {kk: v for kk, v in out.items()
                       if getattr(v, "ndim", 1) == 0}
            if collect:
                for kk in ("preds", "targets", "lamda"):
                    if kk in out:
                        scalars[kk] = out[kk]
                scalars["query_idx"] = episode.query_ids
                scalars["support_idx"] = episode.support_ids
            return k, scalars

        key, ms = jax.lax.scan(body, key, None, length=n_steps)
        return key, ms

    def run(params, key, n):
        _, ms = run_jit(params, key, tables_rep, n)
        return key, ms

    return run
