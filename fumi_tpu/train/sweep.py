"""Lockstep multi-seed training — ``--tpu_seed_sweep S``.

The reference paper's real workflow is a SWEEP: the same config trained
under several seeds, reported as mean +/- CI over seeds (each run is a
separate ``python fumi/main.py --seed k`` invocation; SURVEY §6's eval
protocol). On TPU the flagship configs are dispatch-bound, not
compute-bound (9.3% MFU, docs/PERFORMANCE.md) — so instead of S serial
processes, this module trains S independent replicas IN LOCKSTEP inside
one vmapped XLA program: the seed axis batches every matmul (better MXU
shapes) and S seeds share each dispatch (the actual bottleneck).

Faithfulness contract (pinned by tests/test_sweep.py): replica ``i``
follows the EXACT PRNG chain of a standalone run with ``--seed
(seed + i)`` — model init, fused episode sampling, dropout, and eval
streams all match, so per-seed trajectories are the standalone
trajectories (up to vmap/XLA fp reassociation).

Per-seed early stopping runs on a ``live`` mask: a seed whose patience
lapses freezes (params/opt-state hold; its key still advances so later
steps of other seeds are unaffected), and training ends when every seed
is done — the same semantics as S sequential runs, without desyncing the
lockstep program.

Multi-chip: the seed axis is embarrassingly parallel (replicas never
communicate), so on a multi-device platform the stacked pytrees are
sharded over the ``dp`` mesh axis (seed i lives wholly on device
i*D/S) and the SAME jitted programs run with zero collectives — XLA
just partitions the vmapped body. Sharded ≡ single-device is pinned by
tests/test_sweep.py.

Known trade-off: stacking duplicates FROZEN seed-invariant subtrees
(e.g. a pretrained glove table under ``--text_encoder glove`` without
``--fine_tune``) S times in HBM and in the sweep checkpoint. Replicating
those subtrees instead (vmap in_axes=None per subtree) would save the
memory at the cost of threading per-subtree axes through every stacked
program and the per-seed export; at the flagship scales (tables ≤ ~70 MB,
S ≤ 8) the duplication is accepted and recorded here.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fumi_tpu.core.config import Config
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train.logging import MetricWriter
from fumi_tpu.train.steps import (Family, _train_metrics, build_family,
                                  make_opt, train_scan_unroll)
from fumi_tpu.train.loop import ARTIFACT_KEYS, _ci95, _flatten_artifacts
from fumi_tpu.utils.profiling import Throughput


def sweep_seeds(cfg: Config) -> List[int]:
    """The sweep's seed list: ``seed, seed+1, ..., seed+S-1`` (the usual
    convention for a paper sweep launched from a base seed)."""
    return [cfg.seed + i for i in range(cfg.seed_sweep)]


def stack_trees(trees):
    """Stack a list of identically-structured pytrees along a new leading
    seed axis (device-resident)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree, i: int):
    """Slice replica ``i`` out of a stacked pytree."""
    return jax.tree.map(lambda x: x[i], tree)


def _where_seed(mask, new, old):
    """Per-seed select over stacked pytrees: ``mask`` is (S,) bool."""
    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)
    return jax.tree.map(sel, new, old)


def sweep_mesh(cfg: Config):
    """The seed-sharding mesh: explicit ``--tpu_mesh_dp`` (validated to
    divide S; ``1`` PINS the single-device layout, matching the
    standalone driver's convention), ``0`` auto-picks the largest device
    count dividing S. None for a single-device layout — the vmap is the
    same program either way; the mesh only changes placement.
    ``--tpu_seed_accum`` pins the single-device layout: grouping
    reshapes the seed axis, which would interleave a dp-sharded
    placement across devices (config.py validation rejects explicit
    dp > 1 with it)."""
    import jax
    from fumi_tpu.core import mesh as mesh_lib
    if cfg.seed_accum > 1:
        return None
    dp = cfg.mesh_dp
    if dp == 0:
        dp = mesh_lib.largest_divisor_leq(cfg.seed_sweep,
                                          len(jax.devices()))
    if dp <= 1:
        return None
    return mesh_lib.make_mesh(dp, 1)


def _seed_sharding(mesh):
    from fumi_tpu.core.mesh import DP_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(DP_AXIS))


def _place_sweep(mesh, sampler, *trees):
    """Shard stacked pytrees over the seed axis and replicate the
    sampler's tables (each device gathers its own seeds' episodes from a
    local copy). No-op when mesh is None."""
    if mesh is None:
        return trees
    import jax
    from fumi_tpu.core.mesh import put_replicated
    sampler.tables = put_replicated(sampler.tables, mesh)
    sh = _seed_sharding(mesh)
    return tuple(jax.device_put(t, sh) for t in trees)


def build_sweep_family(cfg: Config, dictionary=None):
    """Build the family once per seed (same functions, different init) and
    stack the params. Replica ``i``'s init key is the standalone run's:
    ``split(PRNGKey(seed + i), 3)[0]`` (cli/main.py:216-217)."""
    families = []
    for s in sweep_seeds(cfg):
        k_model = jax.random.split(jax.random.PRNGKey(s), 3)[0]
        families.append(build_family(cfg, k_model, dictionary))
    params = stack_trees([f.params for f in families])
    return families[0]._replace(params=params)


def make_sweep_chunked_train(family: Family,
                             opt: optax.GradientTransformation,
                             sampler, chunk: int, unroll: int = 0,
                             accum: int = 1, seed_accum: int = 1):
    """jitted (params, opt_state, keys, live) ->
    (params, opt_state, keys, metrics) running ``chunk`` lockstep steps.

    Stacked leaves carry a leading (S,) seed axis; ``keys`` is (S,)
    per-seed carry keys; ``live`` (S,) bool freezes finished seeds.
    Per seed the body is byte-for-byte the single-seed chunked driver's
    (steps.py make_chunked_train): split(3) -> sample -> grad -> update
    (incl. --tpu_grad_accum micro-batching via ``accum``).

    ``seed_accum`` G > 1 (``--tpu_seed_accum``): each training step
    processes the S seeds as G SEQUENTIAL groups of S/G (``lax.map``
    over groups, the same vmapped body within a group), so the
    per-moment working set scales with S/G — the grad-accum trick on
    the seed axis. S=8 on one chip then runs at the S/G sweet spot x G
    serial instead of falling off the measured working-set cliff
    (docs/PERFORMANCE.md "Multi-seed sweep scaling"). vmap is
    elementwise over seeds, so per-seed trajectories equal the
    unaccumulated sweep's to the last ulp of XLA's batch-shape codegen
    (key chains bitwise; floats ~1e-7 rel — pinned in test_sweep.py).
    """
    from fumi_tpu.train.steps import accum_value_and_grad
    grad_fn = accum_value_and_grad(family, accum)

    @functools.partial(jax.jit, static_argnums=(5,))
    def run(params, opt_state, keys, live, tables, n_steps):
        def body(carry, _):
            p, s, k = carry

            def one(p_i, s_i, k_i, live_i):
                k_i, k_s, k_step = jax.random.split(k_i, 3)
                episode = sampler.sample(k_s, tables)
                (loss, aux), grads = grad_fn(p_i, episode, k_step)
                updates, s_new = opt.update(grads, s_i, p_i)
                p_new = optax.apply_updates(p_i, updates)
                # dead seeds hold (their key still advances — the split
                # above — so the stream stays aligned with a standalone
                # run that stopped here)
                p_new = jax.tree.map(
                    lambda a, b: jnp.where(live_i, a, b), p_new, p_i)
                s_new = jax.tree.map(
                    lambda a, b: jnp.where(live_i, a, b), s_new, s_i)
                m = _train_metrics(family, loss, aux, episode, grads)
                return p_new, s_new, k_i, m

            if seed_accum <= 1:
                p, s, k, m = jax.vmap(one)(p, s, k, live)
            else:
                # (S, ...) -> (G, S/G, ...); lax.map (a scan) forces the
                # groups SEQUENTIAL — a Python loop would leave XLA free
                # to overlap them, defeating the working-set reduction
                G = seed_accum
                group = lambda t: jax.tree.map(
                    lambda x: x.reshape((G, x.shape[0] // G)
                                        + x.shape[1:]), t)
                ungroup = lambda t: jax.tree.map(
                    lambda x: x.reshape((-1,) + x.shape[2:]), t)
                p, s, k, m = (ungroup(t) for t in jax.lax.map(
                    lambda args: jax.vmap(one)(*args),
                    (group(p), group(s), group(k), group(live))))
            return (p, s, k), m

        (params, opt_state, keys), ms = jax.lax.scan(
            body, (params, opt_state, keys), None, length=n_steps,
            unroll=train_scan_unroll(n_steps, unroll))
        return params, opt_state, keys, ms

    return lambda p, s, k, live, n=chunk: run(p, s, k, live,
                                              sampler.tables, n)


def make_sweep_chunked_eval(family: Family, sampler,
                            collect: bool = False):
    """jitted (params, keys, n) -> per-seed stacked raw metrics, leaves
    (S, n, ...). Per seed identical to steps.py make_chunked_eval."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(params, keys, tables, n_steps):
        def one(p_i, k_i):
            def body(k, _):
                k, k_s, k_step = jax.random.split(k, 3)
                episode = sampler.sample(k_s, tables)
                out = family.eval_finalize(
                    family.eval_raw(p_i, episode, k_step))
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

            _, ms = jax.lax.scan(body, k_i, None, length=n_steps)
            return ms

        return jax.vmap(one)(params, keys)

    return lambda p, k, n: run(p, k, sampler.tables, n)


def _eval_view_stacked(cfg: Config, params, opt_state):
    """Stacked analogue of loop.eval_view: the EMA (when on) rides in the
    stacked optimizer state, so the same lookup applies."""
    if cfg.ema > 0:
        from fumi_tpu.train.optim import find_ema
        ema = find_ema(opt_state)
        if ema is not None:
            return ema
    return params


def sweep_test(cfg: Config, family: Family, params, sampler,
               keys, max_num_batches: int,
               collect_artifacts: bool = False, mesh=None) -> List[Dict]:
    """Per-seed test metrics (list of dicts shaped like loop.test_loop's
    output). ``params`` stacked (S,...); ``keys`` (S,) per-seed rngs."""
    if mesh is not None:
        params, keys = _place_sweep(mesh, sampler, params, keys)
    run = make_sweep_chunked_eval(family, sampler,
                                  collect=collect_artifacts)
    ms = run(params, keys, max_num_batches + 1)
    ms = {k: np.asarray(v) for k, v in ms.items()}
    S = next(iter(ms.values())).shape[0]
    out = []
    for i in range(S):
        d = {k: float(v[i].mean()) for k, v in ms.items()
             if k not in ARTIFACT_KEYS}
        d.update(_ci95(ms.get("acc", [None] * S)[i],
                       ms.get("loss", [None] * S)[i]))
        if collect_artifacts:
            # same key mapping as the standalone test_loop's artifacts
            d.update(_flatten_artifacts(
                {k: v[i] for k, v in ms.items() if k in ARTIFACT_KEYS}))
        out.append(d)
    return out


def _key_payload(keys):
    """Checkpoint-safe form of a stacked PRNG-key array (typed keys are
    unwrapped to raw data; legacy uint32 keys pass through)."""
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(keys)
    return keys


def _keys_from_payload(data, like):
    if jnp.issubdtype(like.dtype, jax.dtypes.prng_key):
        return jax.random.wrap_key_data(
            jnp.asarray(data), impl=jax.random.key_impl(like))
    return jnp.asarray(data)


def sweep_training_run(cfg: Config, family: Family,
                       opt: optax.GradientTransformation,
                       train_sampler, val_sampler, writer: MetricWriter,
                       run_dir: str, mesh=None, resume_dir=None):
    """Lockstep training of the S stacked replicas.

    Returns ``(params, opt_state, info)`` — the stacked per-seed FINAL
    raw params + optimizer state (each seed's best for AM3/FuMI, last
    for the MAML family — loop.py's reload semantics, ref: maml.py:107;
    evaluation should see ``_eval_view_stacked`` of them), and ``info``
    with per-seed ``best_loss``/``best_batch_idx`` + the final
    ``batch_idx`` for per-seed checkpoint export.

    Harness semantics per seed match train/loop.py training_run: initial
    val seeds best_loss, eval every ``eval_freq`` (AM3 at batch 0 too),
    per-seed patience, stop after step ``epochs``.
    """
    from fumi_tpu.train.loop import CHUNK
    seeds = sweep_seeds(cfg)
    S = len(seeds)
    is_am3 = cfg.model == "am3"
    eval_at_zero = is_am3
    reload_best = cfg.model in ("am3", "fumi")

    # per-seed PRNG chains, exactly the standalone driver's
    # (cli/main.py:216-217 then loop.py:219)
    k_trains, k_vals, k_inits = [], [], []
    for s in seeds:
        _, k_train_root, _ = jax.random.split(jax.random.PRNGKey(s), 3)
        k_init, k_train, k_val = jax.random.split(k_train_root, 3)
        k_inits.append(k_init)
        k_trains.append(k_train)
        k_vals.append(k_val)
    k_inits = jnp.stack(k_inits)
    train_keys = jnp.stack(k_trains)
    k_vals = jnp.stack(k_vals)

    params = family.params
    opt_state = jax.vmap(opt.init)(params)
    max_test_batches = cfg.max_test_batches // 2  # ref: main.py:82,85,95

    # stacked on-device snapshots of each seed's best RAW state — the
    # standalone loop's best/ checkpoint role (reload semantics AND the
    # per-seed export's contents; eval_view of them is what eval sees).
    # ever_improved guards the final selection: a seed that never beats
    # its INITIAL validation has no best/ in standalone terms (loop.py
    # reloads best/ only if it exists) and must fall back to its final
    # trained params, not these init-time snapshots.
    best_params, best_opt = params, opt_state
    best_loss = None  # set by the initial eval (or restored)
    best_batch_idx = np.zeros(S, dtype=np.int64)
    live = np.ones(S, dtype=bool)
    ever_improved = np.zeros(S, dtype=bool)
    start_batch = 0

    if resume_dir is not None:
        # crash recovery (--tpu_auto_resume): restore the LIVE + BEST
        # stacked states AND the carried per-seed train keys — the
        # resumed run replays any steps past the last boundary with the
        # exact key stream a crash-free run would have used
        try:
            payload_p = {"state": params, "best": best_params,
                         "train_keys": _key_payload(train_keys)}
            payload_s = {"state": opt_state, "best": best_opt}
            payload_p, payload_s, meta = ckpt_lib.load_checkpoint(
                resume_dir, payload_p, payload_s, best=False)
        except Exception as e:
            # recovery must not be worse than no recovery (same policy
            # as the standalone driver, cli/main.py): an incompatible
            # checkpoint starts fresh instead of dying at startup
            print(f"sweep auto-resume: cannot restore {resume_dir} "
                  f"({type(e).__name__}: {e}); starting fresh")
        else:
            params, best_params = payload_p["state"], payload_p["best"]
            train_keys = _keys_from_payload(payload_p["train_keys"],
                                            train_keys)
            opt_state, best_opt = payload_s["state"], payload_s["best"]
            best_loss = np.asarray(meta["best_loss_per_seed"], np.float64)
            best_batch_idx = np.asarray(meta["best_batch_idx_per_seed"],
                                        np.int64)
            live = np.asarray(meta["live_per_seed"], bool)
            ever_improved = np.asarray(meta["ever_improved_per_seed"],
                                       bool)
            start_batch = int(meta["batch_idx"]) + 1
            if cfg.patience > 0:
                # the boundary's own patience flip happens AFTER the save
                # in a crash-free run — re-derive it so a seed that
                # lapsed at the checkpointed step stays frozen on resume
                live = live & ~(int(meta["batch_idx"]) - best_batch_idx
                                > cfg.patience)
            print(f"sweep auto-resume: {resume_dir} "
                  f"(batch {meta['batch_idx']}, live {live.tolist()})")

    if mesh is not None:
        # seed-sharded placement: replica i lives wholly on its device
        # slice; the jitted programs below partition with no collectives
        (params, opt_state, best_params, best_opt, train_keys, k_inits,
         k_vals) = _place_sweep(
            mesh, train_sampler, params, opt_state, best_params, best_opt,
            train_keys, k_inits, k_vals)
        _place_sweep(mesh, val_sampler)

    eval_fn = make_sweep_chunked_eval(family, val_sampler)

    def run_eval(p_view, keys):
        ms = eval_fn(p_view, keys, max_test_batches + 1)
        return {k: np.asarray(v) for k, v in ms.items()}

    throughput = Throughput()
    if best_loss is None:
        view = _eval_view_stacked(cfg, params, opt_state)
        ms0 = run_eval(view, k_inits)
        best_loss = ms0["loss"].mean(axis=1)  # (S,)
        print(f"\nsweep initial loss: {best_loss.tolist()}, "
              f"acc: {ms0['acc'].mean(axis=1).tolist()}")

    chunk = cfg.chunk or CHUNK
    chunked = make_sweep_chunked_train(family, opt, train_sampler, chunk,
                                       unroll=cfg.train_unroll,
                                       accum=cfg.grad_accum,
                                       seed_accum=cfg.seed_accum)

    def next_stop(batch_idx: int) -> int:
        stops = [cfg.epochs]
        if cfg.eval_freq > 0:
            b = (batch_idx // cfg.eval_freq) * cfg.eval_freq
            while b < batch_idx or (b == 0 and not eval_at_zero):
                b += cfg.eval_freq
            stops.append(b)
        if cfg.patience > 0 and live.any():
            stops.append(int(best_batch_idx[live].min())
                         + cfg.patience + 1)
        return min(stops)

    def place_live(mask):
        arr = jnp.asarray(mask)
        if mesh is not None:
            arr = jax.device_put(arr, _seed_sharding(mesh))
        return arr

    batch_idx = start_batch
    live_dev = place_live(live)
    # cumulative episodes actually trained (live replicas only). On a
    # crash resume the pre-crash per-step live history is not stored;
    # approximate the prefix as all-live (exact for crash-free runs and
    # for any prefix before the first patience freeze).
    episodes_done = start_batch * cfg.batch_size * S
    try:
        while True:
            stop = next_stop(batch_idx)
            if not live.any() or stop < batch_idx:
                # resumed a finished (or fully patience-stopped) sweep:
                # nothing left to train. The last TRAINED batch is the
                # checkpointed one (start_batch - 1), not the batch we
                # were about to run — info["batch_idx"] feeds the
                # per-seed exports' at_step metadata
                batch_idx = max(0, batch_idx - 1)
                break
            n = stop - batch_idx + 1
            done = 0
            while done < n:
                c = min(chunk, n - done)
                params, opt_state, train_keys, ms = chunked(
                    params, opt_state, train_keys, live_dev, c)
                episodes_done = _log_sweep_train(
                    writer, cfg, batch_idx + done, ms, is_am3, live,
                    episodes_done)
                done += c
            batch_idx = stop

            eps_rate = throughput.update(
                (batch_idx + 1) * cfg.batch_size * S)

            is_eval = (cfg.eval_freq > 0 and batch_idx % cfg.eval_freq == 0
                       and (eval_at_zero or batch_idx != 0))
            if is_eval:
                view = _eval_view_stacked(cfg, params, opt_state)
                keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, batch_idx))(k_vals)
                ms = run_eval(view, keys)
                val_loss = ms["loss"].mean(axis=1)
                improved = live & (val_loss < best_loss)
                best_loss = np.where(improved, val_loss, best_loss)
                best_batch_idx = np.where(improved, batch_idx,
                                          best_batch_idx)
                ever_improved = ever_improved | improved
                imp_dev = place_live(improved)
                best_params = _where_seed(imp_dev, params, best_params)
                best_opt = _where_seed(imp_dev, opt_state, best_opt)
                rec = {}
                for k, v in ms.items():
                    per_seed = v.mean(axis=1)
                    rec[f"val/{k}"] = float(per_seed.mean())
                    for i, s in enumerate(seeds):
                        rec[f"val/seed{s}/{k}"] = float(per_seed[i])
                rec["episodes_per_sec"] = eps_rate
                writer.log(rec, step=batch_idx)
                # payload carries the BEST stacked snapshots and the
                # in-flight train keys alongside the live state, so a
                # crash-resume reconstructs the full sweep (per-seed
                # bests included) and continues the exact key stream
                ckpt_lib.save_checkpoint(
                    run_dir,
                    {"state": params, "best": best_params,
                     "train_keys": _key_payload(train_keys)},
                    {"state": opt_state, "best": best_opt},
                    batch_idx, float(best_loss.min()),
                    bool(improved.any()),
                    extra_meta={
                        "model": cfg.model, "sweep_seeds": seeds,
                        "best_loss_per_seed": best_loss.tolist(),
                        "best_batch_idx_per_seed":
                            best_batch_idx.tolist(),
                        "live_per_seed": live.tolist(),
                        "ever_improved_per_seed": ever_improved.tolist(),
                        "args": dataclasses.asdict(cfg)})
                print(f"\nBatch {batch_idx + 1}/{cfg.epochs}: "
                      f"val/loss per seed: {val_loss.tolist()}")

            # per-seed patience (ref: am3.py:295-297, applied per replica)
            if cfg.patience > 0:
                lapsed = batch_idx - best_batch_idx > cfg.patience
                if (live & lapsed).any():
                    live = live & ~lapsed
                    live_dev = place_live(live)
            if (batch_idx > cfg.epochs - 1) or not live.any():
                break
            batch_idx += 1
    except KeyboardInterrupt:
        pass

    info = {"best_loss": best_loss, "best_batch_idx": best_batch_idx,
            "batch_idx": batch_idx, "ever_improved": ever_improved,
            "selection": "best" if reload_best else "last"}
    if reload_best:
        # per-seed fallback: no-improvement seeds keep their final
        # trained state (standalone loop.py:338 reloads best/ only when
        # it exists)
        ei = place_live(ever_improved)
        return (_where_seed(ei, best_params, params),
                _where_seed(ei, best_opt, opt_state), info)
    return params, opt_state, info


def _log_sweep_train(writer: MetricWriter, cfg: Config, start_idx: int,
                     ms: Dict, is_am3: bool, live,
                     episodes_done: int) -> int:
    """Per-step logs from a sweep chunk: metric leaves are (chunk, S)
    (scan stacks the step axis first) — each step logs the across-seed
    mean over LIVE replicas only (a patience-frozen replica's
    held-constant loss/grad-norm would dilute the monitored curves; S
    sequential runs log nothing for a stopped run). Per-seed traces stay
    available at val boundaries; logging S full per-step traces would
    multiply the writer volume for monitoring data. ``num_episodes``
    likewise counts live replicas' episodes only; returns the updated
    cumulative count."""
    from fumi_tpu.train.loop import _train_log_keys
    from fumi_tpu.core.mesh import host_fetch
    stacked = {k: np.asarray(host_fetch(ms[k]))
               for k in _train_log_keys(ms, is_am3)}
    n = next(iter(stacked.values())).shape[0]
    live = np.asarray(live)
    per_step = cfg.batch_size * int(live.sum())
    for j in range(n):
        rec = {f"train/{k}": float(v[j][live].mean())
               for k, v in stacked.items()}
        episodes_done += per_step
        rec["num_episodes"] = episodes_done
        writer.log(rec, step=start_idx + j)
    return episodes_done


def sweep_main(cfg: Config, dictionary, samplers, writer: MetricWriter,
               run_dir: str, results_path: str) -> dict:
    """Driver for ``--tpu_seed_sweep S``: lockstep train, per-seed test,
    aggregate report (mean +/- 95% CI over seeds — the paper's headline
    shape), one prediction CSV per seed."""
    train_s, val_s, test_s = samplers
    if cfg.watch:
        # loud, not silent: histogram telemetry samples one meta-gradient
        # per boundary on ONE param set; the lockstep sweep carries S
        # stacked replicas — per-seed watch is not wired (grad norms
        # still ride the sweep's per-step metrics)
        print("--tpu_watch is not supported with --tpu_seed_sweep; "
              "skipping histogram telemetry (per-seed grad norms still "
              "logged)")
    seeds = sweep_seeds(cfg)
    family = build_sweep_family(cfg, dictionary)
    opt = make_opt(cfg)
    mesh = sweep_mesh(cfg)
    if mesh is not None:
        print(f"seed sweep sharded over {mesh.shape} "
              f"({cfg.seed_sweep} seeds)")

    resume_dir = None
    if cfg.auto_resume:
        resume_dir = ckpt_lib.find_latest_resumable(
            cfg.log_dir, model=cfg.model, sweep_seeds=seeds)

    from fumi_tpu.utils.profiling import profile_trace
    with profile_trace(cfg.profile_dir):
        params, opt_state, info = sweep_training_run(
            cfg, family, opt, train_s, val_s, writer, run_dir, mesh=mesh,
            resume_dir=resume_dir)

    # per-seed export: each seed becomes a FIRST-CLASS run dir
    # (<run>/seed<k>/ with best/ + ckpt/ + config.json + meta) usable by
    # --checkpoint, --evaluate, serving, and export_torch exactly like a
    # standalone run's — the sweep's stacked pytrees never leak out
    export_seed_runs(cfg, run_dir, seeds, params, opt_state, info)

    view = _eval_view_stacked(cfg, params, opt_state)
    # per-seed test keys: the standalone driver's k_test
    # (cli/main.py:216-217)
    k_tests = jnp.stack([jax.random.split(jax.random.PRNGKey(s), 3)[2]
                         for s in seeds])
    per_seed = sweep_test(cfg, family, view, test_s, k_tests,
                          cfg.max_test_batches, collect_artifacts=True,
                          mesh=mesh)

    out = {}
    scalar_keys = [k for k, v in per_seed[0].items()
                   if isinstance(v, (int, float))]
    for k in scalar_keys:
        vals = np.asarray([d[k] for d in per_seed], dtype=np.float64)
        out[f"test/{k}"] = float(vals.mean())
        if len(vals) > 1:
            out[f"test/{k}_seed_ci95"] = float(
                1.96 * vals.std(ddof=1) / np.sqrt(len(vals)))
        for s, d in zip(seeds, per_seed):
            out[f"test/seed{s}/{k}"] = float(d[k])
    print(f"\n SWEEP TEST (mean over {len(seeds)} seeds): "
          f"{ {k: v for k, v in out.items() if '/' not in k[5:]} }")
    writer.log(out)

    from fumi_tpu.cli.main import _save_predictions_csv
    for s, d in zip(seeds, per_seed):
        sub = MetricWriterName(f"{writer.run_name}_seed{s}")
        _save_predictions_csv(cfg, sub, results_path, d)
    writer.finish()
    return out


def export_seed_runs(cfg: Config, run_dir: str, seeds, params, opt_state,
                     info) -> None:
    """Write one standard run dir per seed under ``run_dir/seed<k>/``:
    the seed's slice of the SELECTED raw params + optimizer state as both
    ``ckpt/`` and ``best/`` (they coincide — the stacked state returned
    by training IS each seed's selected state: best-val for AM3/FuMI,
    final for the MAML family, ``info["selection"]``), a ``config.json``
    with ``seed=<k>, seed_sweep=0`` so downstream tools rebuild the right
    model, and the vocabulary artifact when the parent run has one.
    Metadata stamps the step the stored state actually comes from:
    best step for a seed selected at its best val, the FINAL step for
    "last" selection AND for a best-selection seed that never improved
    (that seed fell back to its final trained params — standalone
    loop.py reloads best/ only when it exists — so stamping its
    init-time best step would claim untrained provenance; the meta
    records the fallback under ``no_improvement``). ``best_loss`` is
    always the best VAL loss observed during the run, which for a
    no-improvement seed was measured on the initial params, not the
    exported ones."""
    import os
    import json
    import shutil

    for i, s in enumerate(seeds):
        seed_dir = os.path.join(run_dir, f"seed{s}")
        fell_back = (info["selection"] == "best"
                     and not bool(info["ever_improved"][i]))
        selection = "last" if fell_back else info["selection"]
        at_step = (int(info["best_batch_idx"][i]) if selection == "best"
                   else int(info["batch_idx"]))
        extra = {"model": cfg.model, "seed": int(s),
                 "exported_from_sweep": True, "selection": selection}
        if fell_back:
            extra["no_improvement"] = True
        ckpt_lib.save_checkpoint(
            seed_dir, unstack_tree(params, i), unstack_tree(opt_state, i),
            at_step, float(info["best_loss"][i]),
            is_best=True, extra_meta=extra)
        solo = dataclasses.asdict(cfg.replace(seed=int(s), seed_sweep=0))
        with open(os.path.join(seed_dir, "config.json"), "w") as f:
            json.dump(solo, f, indent=1, default=str)
        vocab = os.path.join(run_dir, "vocab.json")
        if os.path.exists(vocab):
            shutil.copyfile(vocab, os.path.join(seed_dir, "vocab.json"))


class MetricWriterName:
    """Minimal run_name carrier for per-seed CSV naming."""

    def __init__(self, run_name: str):
        self.run_name = run_name
