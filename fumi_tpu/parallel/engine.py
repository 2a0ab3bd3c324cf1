"""Episode-parallel train/eval steps over a device mesh.

The reference has no parallelism at all — a single torch device and a
sequential Python loop over tasks (ref: fumi/main.py:145-146,
maml.py:158-161; SURVEY §2.6). Here the meta-batch's task axis is sharded
over the mesh's ``dp`` axis with ``shard_map``:

- each device adapts its local shard of tasks (vmap over B/dp tasks),
- meta-gradients are ``pmean``-reduced over ICI — replacing the reference's
  implicit single-device accumulation (ref: fumi.py:187-193),
- the optax update runs replicated on every device (identical inputs →
  identical params, no broadcast needed),
- eval reduces each raw quantity per its declared reduction: ``pmean`` for
  losses/accuracies, ``psum`` for confusion matrices (so sklearn-macro
  metrics are exact over the global batch), gather for per-query
  predictions.

Requires ``cfg.batch_size % dp == 0`` (tasks split evenly).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fumi_tpu.core.config import Config
from fumi_tpu.core.mesh import DP_AXIS
from fumi_tpu.train.steps import (train_scan_unroll,
                                  Family, FamilySteps, _train_metrics,
                                  build_family, make_opt)

try:  # jax>=0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _episode_pspec(episode) -> object:
    """PartitionSpec pytree: every episode leaf sharded on its task axis."""
    return jax.tree_util.tree_map(lambda _: P(DP_AXIS), episode)


def _reduce_raw(raw: Dict, reduce_spec: Dict[str, str]) -> Dict:
    out = {}
    for k, v in raw.items():
        mode = reduce_spec.get(k, "mean")
        if mode == "mean":
            out[k] = jax.lax.pmean(v, DP_AXIS)
        elif mode == "sum":
            out[k] = jax.lax.psum(v, DP_AXIS)
        elif mode == "concat":
            # gather shards along the task axis -> global meta-batch order
            out[k] = jax.lax.all_gather(v, DP_AXIS, axis=0, tiled=True)
        else:
            raise ValueError(f"unknown reduction {mode!r} for {k}")
    return out


def make_parallel_steps(cfg: Config, key: jax.Array, mesh: Mesh,
                        dictionary=None) -> FamilySteps:
    """Build shard_map episode-parallel steps for the cfg's model family."""
    dp = mesh.shape[DP_AXIS]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by dp={dp}")

    family = build_family(cfg, key, dictionary)
    opt = make_opt(cfg)

    # probe episode pytree for in_specs construction happens per call via
    # tree_map, so no static episode needed here.
    rep = P()  # replicated

    def _train_shard(p, opt_state, episode, rng):
        # per-shard rng: fold in the dp coordinate so dropout/noise differ
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        (loss, aux), grads = jax.value_and_grad(
            family.train_loss, has_aux=True)(p, episode, rng)
        grads = jax.lax.pmean(grads, DP_AXIS)
        loss = jax.lax.pmean(loss, DP_AXIS)
        aux = _reduce_raw(aux, family.eval_reduce)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        m = _train_metrics(family, loss, aux, episode, grads)
        return p, opt_state, m

    def _eval_shard(p, episode, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        raw = family.eval_raw(p, episode, rng)
        raw = _reduce_raw(raw, family.eval_reduce)
        return family.eval_finalize(raw)

    @jax.jit
    def train_step(p, opt_state, episode, rng):
        ep_specs = _episode_pspec(episode)
        fn = shard_map(
            _train_shard, mesh=mesh,
            in_specs=(rep, rep, ep_specs, rep),
            out_specs=(rep, rep, rep),
            check_vma=False)
        return fn(p, opt_state, episode, rng)

    @jax.jit
    def eval_step(p, episode, rng):
        ep_specs = _episode_pspec(episode)
        fn = shard_map(
            _eval_shard, mesh=mesh,
            in_specs=(rep, ep_specs, rep),
            out_specs=rep,
            check_vma=False)
        return fn(p, episode, rng)

    return FamilySteps(params=family.params, opt=opt, train_step=train_step,
                       eval_step=eval_step, family=family, mesh=mesh)


def make_parallel_chunked_train(cfg: Config, family: Family,
                                opt: optax.GradientTransformation,
                                sampler, mesh: Mesh, chunk: int,
                                watch: bool = False) -> Callable:
    """Multi-chip chunked driver: ``lax.scan`` of fused sample+train steps
    INSIDE shard_map.

    Each device samples its own local shard of ``batch_size/dp`` tasks per
    step (per-shard PRNG stream via ``axis_index`` fold-in), adapts them,
    and ``pmean``s the meta-gradients over ICI — so a whole chunk of
    training steps costs ONE host dispatch regardless of mesh size, and the
    only cross-chip traffic is the per-step gradient all-reduce.

    Embedding tables are replicated (every chip can sample any class).
    Returns ``run(params, opt_state, key) -> (params, opt_state, key,
    stacked per-step metrics)``.
    """
    from fumi_tpu.data.sampler import sample_episode

    dp = mesh.shape[DP_AXIS]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by dp={dp}")
    import dataclasses
    local_spec = dataclasses.replace(sampler.spec,
                                     batch_size=cfg.batch_size // dp)
    # --tpu_grad_accum: each shard micro-batches its LOCAL tasks before
    # the pmean — mean(micro-means) per shard then mean over shards is
    # still the exact global batch gradient
    accum = cfg.grad_accum
    if accum > 1 and (cfg.batch_size // dp) % accum != 0:
        raise ValueError(
            f"--tpu_grad_accum {accum} must divide the per-shard batch "
            f"{cfg.batch_size // dp} (batch_size/dp)")
    from fumi_tpu.train.steps import accum_value_and_grad
    grad_fn = accum_value_and_grad(family, accum)
    rep = P()
    # place tables replicated on the mesh ONCE — passing single-device
    # tables would re-broadcast them across chips on every dispatch
    from jax.sharding import NamedSharding
    tables_rep = jax.device_put(sampler.tables, NamedSharding(mesh, P()))

    def _shard(params, opt_state, key, tables, n_steps):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))

        def _step(p, s, k):
            k, k_s, k_step = jax.random.split(k, 3)
            # carry the sampler's options (augment jitter, pallas gather) —
            # a bare sample_episode call would silently drop --augment here
            episode = sample_episode(
                tables, local_spec, k_s,
                use_pallas_gather=sampler.use_pallas_gather,
                augment_scale=sampler.augment_scale)
            (loss, aux), grads = grad_fn(p, episode, k_step)
            grads = jax.lax.pmean(grads, DP_AXIS)
            loss = jax.lax.pmean(loss, DP_AXIS)
            aux = _reduce_raw(aux, family.eval_reduce)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            m = _train_metrics(family, loss, aux, episode, grads)
            m = {k2: v for k2, v in m.items()
                 if getattr(v, "ndim", 1) == 0}
            return p, s, k, grads, m

        un = train_scan_unroll(n_steps, cfg.train_unroll)
        if not watch:
            def body(carry, _):
                p, s, k = carry
                p, s, k, _, m = _step(p, s, k)
                return (p, s, k), m

            (params, opt_state, shard_key), ms = jax.lax.scan(
                body, (params, opt_state, shard_key), None,
                length=n_steps, unroll=un)
            return params, opt_state, ms

        # --tpu_watch: the shared block-sampling harness over this
        # engine's step — each sampled gradient is the pmean'd GLOBAL
        # meta-gradient, identical on every shard, so the replicated
        # out_spec is consistent and counts match the serial driver's
        from fumi_tpu.train.watch import scan_with_watch
        (params, opt_state, shard_key), ms = scan_with_watch(
            _step, (params, opt_state, shard_key), n_steps, un)
        return params, opt_state, ms

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(params, opt_state, key, tables, n_steps):
        fn = shard_map(
            functools.partial(_shard, n_steps=n_steps), mesh=mesh,
            in_specs=(rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
            check_vma=False)
        return fn(params, opt_state, key, tables)

    def wrapper(params, opt_state, key, n=chunk):
        params, opt_state, ms = run(params, opt_state, key, tables_rep, n)
        # advance the host-side key chain deterministically
        next_key = jax.random.fold_in(key, n)
        return params, opt_state, next_key, ms

    return wrapper


def make_parallel_chunked_eval(cfg: Config, family: Family, sampler,
                               mesh: Mesh,
                               collect: bool = False) -> Callable:
    """Multi-chip chunked eval: scan of per-shard sample+eval inside
    shard_map; metrics pmean/psum-reduced per step, artifacts all_gathered
    to global meta-batch order. Returns ``run(params, key, n) -> (key,
    stacked metrics)`` matching the serial chunked-eval contract."""
    from fumi_tpu.data.sampler import sample_episode

    dp = mesh.shape[DP_AXIS]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by dp={dp}")
    import dataclasses
    local_spec = dataclasses.replace(sampler.spec,
                                     batch_size=cfg.batch_size // dp)
    rep = P()
    from jax.sharding import NamedSharding
    tables_rep = jax.device_put(sampler.tables, NamedSharding(mesh, P()))

    def _shard(params, key, tables, n_steps):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))

        def body(k, _):
            k, k_s, k_step = jax.random.split(k, 3)
            episode = sample_episode(
                tables, local_spec, k_s,
                use_pallas_gather=sampler.use_pallas_gather,
                augment_scale=sampler.augment_scale)
            raw = family.eval_raw(params, episode, k_step)
            raw = _reduce_raw(raw, family.eval_reduce)
            out = family.eval_finalize(raw)
            scalars = {kk: v for kk, v in out.items()
                       if getattr(v, "ndim", 1) == 0}
            if collect:
                for kk in ("preds", "targets", "lamda"):
                    if kk in out:
                        scalars[kk] = out[kk]
                scalars["query_idx"] = jax.lax.all_gather(
                    episode.query_ids, DP_AXIS, axis=0, tiled=True)
                scalars["support_idx"] = jax.lax.all_gather(
                    episode.support_ids, DP_AXIS, axis=0, tiled=True)
            return k, scalars

        _, ms = jax.lax.scan(body, shard_key, None, length=n_steps)
        return ms

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_jit(params, key, tables, n_steps):
        fn = shard_map(
            functools.partial(_shard, n_steps=n_steps), mesh=mesh,
            in_specs=(rep, rep, rep),
            out_specs=rep,
            check_vma=False)
        return fn(params, key, tables)

    def run(params, key, n):
        ms = run_jit(params, key, tables_rep, n)
        return key, ms

    return run
