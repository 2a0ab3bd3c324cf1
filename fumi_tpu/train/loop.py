"""Episodic training/eval harness (MAML / FuMI / AM3 families).

Reproduces the reference harness semantics (ref: am3.py:215-367,
maml.py:36-131, fumi.py:220-326) — including the documented quirks:

- an initial validation pass seeds ``best_loss`` (ref: am3.py:222-224).
- validation + checkpoint every ``--eval_freq`` batches; AM3 evaluates at
  batch 0 as well (``batch_idx % eval_freq == 0``, ref: am3.py:260), while
  MAML/FuMI skip batch 0 (``and batch_idx != 0``, ref: maml.py:70,
  fumi.py:257).
- early stop on ``--patience`` val-loss plateau (the reference's per-step
  check ``batch_idx - best_batch_idx > patience``, ref: am3.py:295-297 —
  honored exactly, including mid-eval-period triggers) or on ``--epochs``
  (the reference breaks AFTER processing step ``epochs``, i.e. epochs+1
  steps total, ref: am3.py:295).
- KeyboardInterrupt is caught so a manual stop still proceeds to
  best-checkpoint reload + test (ref: am3.py:298-299).
- AM3 and FuMI reload the best checkpoint after training; MAML returns the
  LAST model (ref: maml.py:107 — no reload).
- test loops process ``max_num_batches + 1`` batches (the reference breaks
  AFTER processing when ``batch_idx > max-1``, ref: am3.py:364-365).

Performance: with the device sampler, the loop itself runs on device —
``lax.scan`` chunks of fused sample+train steps per dispatch (one dispatch
costs milliseconds on a tunneled TPU, more than a whole meta-step's
compute), with per-step metrics returned stacked so the reference's
per-step logging granularity is kept. The host sampler path steps
one-batch-at-a-time (parity mode).
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np

from fumi_tpu.core.config import Config
from fumi_tpu.data.sampler import DeviceEpisodeSampler
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train.logging import AverageMeter, MetricWriter
from fumi_tpu.train.steps import (FamilySteps, fuse_sampler,
                                  make_chunked_eval, make_chunked_train)
from fumi_tpu.utils.profiling import Throughput

AM3_TRAIN_KEYS = ("loss", "acc", "f1", "prec", "rec", "avg_lamda",
                  "grad_norm")
CHUNK = 1000  # train steps per device dispatch (amortizes the
              # ~27 ms per-dispatch RPC cost of tunneled TPUs to ~3%)
ARTIFACT_KEYS = ("preds", "targets", "lamda", "query_idx", "support_idx")

# Chunked-eval function cache: test_loop runs at every eval boundary, and a
# freshly-built jitted closure would recompile each time (jit caches on
# function identity). Keyed by the identities of the family/sampler/mesh;
# each entry also holds STRONG references to those key objects, so their
# ids cannot be recycled onto a different family/sampler while the entry
# lives (id() aliasing after GC would otherwise hand a stale closure to a
# new object). Bounded: cleared when it outgrows _EVAL_FN_CACHE_MAX.
_EVAL_FN_CACHE = {}
_EVAL_FN_CACHE_MAX = 64


# module-level jitted sampler for the per-batch path (a fresh jax.jit
# wrapper per call would re-trace every batch); tables as args,
# spec + augment_scale static (the scale gates a Python-level branch)
from fumi_tpu.data.sampler import sample_episode as _sample_episode
_jitted_sample = jax.jit(
    _sample_episode, static_argnames=("spec", "augment_scale"))


def _mesh_mp(mesh) -> int:
    from fumi_tpu.core.mesh import MP_AXIS
    return int(mesh.shape.get(MP_AXIS, 1))


def _chunked_eval_fn(cfg, steps, sampler, collect):
    key = (id(steps.family), id(sampler), bool(collect),
           id(steps.mesh) if steps.mesh is not None else None)
    entry = _EVAL_FN_CACHE.get(key)
    if entry is not None:
        # refresh recency: move the hit to the end of insertion order
        _EVAL_FN_CACHE[key] = _EVAL_FN_CACHE.pop(key)
        fn, _refs = entry
        return fn
    if steps.mesh is not None and _mesh_mp(steps.mesh) > 1:
        from fumi_tpu.parallel.pjit_engine import make_pjit_chunked_eval
        fn = make_pjit_chunked_eval(cfg, steps.family, sampler,
                                    steps.mesh, collect=collect)
    elif steps.mesh is not None:
        from fumi_tpu.parallel.engine import make_parallel_chunked_eval
        fn = make_parallel_chunked_eval(cfg, steps.family, sampler,
                                        steps.mesh, collect=collect)
    else:
        fn = make_chunked_eval(steps.family, sampler, collect=collect)
    while len(_EVAL_FN_CACHE) >= _EVAL_FN_CACHE_MAX:
        # LRU eviction (dict preserves insertion order; hits below re-insert)
        _EVAL_FN_CACHE.pop(next(iter(_EVAL_FN_CACHE)))
    _EVAL_FN_CACHE[key] = (fn, (steps.family, sampler, steps.mesh))
    return fn


def test_loop(cfg: Config, steps: FamilySteps, params, sampler,
              max_num_batches: int, rng: jax.Array,
              collect_artifacts: bool = False) -> Dict:
    """Evaluate on val/test episodes (ref: am3.py:308-367, fumi.py:302-326).

    Processes ``max_num_batches + 1`` meta-batches (reference quirk).
    Device-sampler path: the whole eval loop is one scan dispatch.
    """
    total = max_num_batches + 1
    if isinstance(sampler, DeviceEpisodeSampler) and \
            steps.family is not None:
        run = _chunked_eval_fn(cfg, steps, sampler, collect_artifacts)
        _, ms = run(params, rng, total)
        # host_fetch, not np.asarray: under a pod-wide mesh the pjit eval's
        # artifact outputs can come back host-sharded
        from fumi_tpu.core.mesh import host_fetch
        ms = {k: host_fetch(v) for k, v in ms.items()}
        out = {k: float(v.mean()) for k, v in ms.items()
               if k not in ARTIFACT_KEYS}
        out.update(_ci95(ms.get("acc"), ms.get("loss")))
        if collect_artifacts:
            out.update(_flatten_artifacts(ms))
        return out

    # host-sampler / custom-steps path: one dispatch per batch
    meters: Dict[str, AverageMeter] = {}
    series: Dict[str, List] = {"acc": [], "loss": []}  # for the 95% CI
    arts: Dict[str, List] = {k: [] for k in ARTIFACT_KEYS}
    for batch_idx in range(total):
        key = jax.random.fold_in(rng, batch_idx)
        k_ep, k_step = jax.random.split(key)
        if isinstance(sampler, DeviceEpisodeSampler):
            episode = _jitted_sample(sampler.tables, sampler.spec, k_ep,
                                     augment_scale=sampler.augment_scale)
        else:
            episode = sampler.sample()
        m = steps.eval_step(params, episode, k_step)
        for k, v in m.items():
            if k in ("preds", "targets", "lamda"):
                continue
            meters.setdefault(k, AverageMeter()).update(float(v))
            if k in series:
                series[k].append(float(v))
        if collect_artifacts:
            arts["preds"] += np.asarray(m["preds"]).reshape(-1).tolist()
            arts["targets"] += np.asarray(m["targets"]).reshape(-1).tolist()
            arts["query_idx"] += np.asarray(
                episode.query_ids).reshape(-1).tolist()
            arts["support_idx"] += np.asarray(
                episode.support_ids).reshape(-1).tolist()
            if "lamda" in m:
                arts["lamda"] += np.asarray(m["lamda"]).reshape(-1).tolist()
    out = {k: meter.avg for k, meter in meters.items()}
    out.update(_ci95(np.asarray(series["acc"]), np.asarray(series["loss"])))
    if collect_artifacts:
        out.update(preds=arts["preds"], targets=arts["targets"],
                   query_idx=arts["query_idx"],
                   support_idx=arts["support_idx"],
                   support_lamdas=arts["lamda"])
    return out


def _ci95(accs, losses) -> Dict:
    """Standard few-shot reporting: the 95% confidence half-width of the
    mean over the evaluated meta-batches (the reference reports only the
    mean, ref: am3.py:325-335 AverageMeter)."""
    out = {}
    for name, v in (("acc", accs), ("loss", losses)):
        if v is None:
            continue
        v = np.asarray(v).reshape(-1)
        if v.size > 1:
            out[f"{name}_ci95"] = float(
                1.96 * v.std(ddof=1) / np.sqrt(v.size))
    return out


def _flatten_artifacts(ms: Dict) -> Dict:
    out = {}
    for src, dst in (("preds", "preds"), ("targets", "targets"),
                     ("query_idx", "query_idx"),
                     ("support_idx", "support_idx"),
                     ("lamda", "support_lamdas")):
        if src in ms:
            out[dst] = ms[src].reshape(-1).tolist()
    return out


def eval_view(cfg: Config, params, opt_state):
    """The parameters evaluation should see: the EMA when ``--tpu_ema`` is
    on (and the state already holds one), else the raw params."""
    if cfg.ema > 0:
        from fumi_tpu.train.optim import find_ema
        ema = find_ema(opt_state)
        if ema is not None:
            return ema
    return params


def training_run(cfg: Config, steps: FamilySteps, train_sampler, val_sampler,
                 writer: MetricWriter, run_dir: str,
                 rng: jax.Array, opt_state=None, start_batch: int = 0,
                 initial_best: float = None):
    """Train loop for the episodic families. Returns final params.

    ``opt_state`` (optional) continues from a restored optimizer state —
    the reference restores it on ``--checkpoint`` resume
    (ref: utils.py:433-435). ``start_batch``/``initial_best`` continue the
    batch counter and best-loss bookkeeping from a crash-resumed run
    (``--tpu_auto_resume``; the reference always restarts counting at 0)."""
    is_am3 = cfg.model == "am3"
    eval_at_zero = is_am3  # ref: am3.py:260 vs maml.py:70 / fumi.py:257
    reload_best = cfg.model in ("am3", "fumi")  # ref: maml.py:107 no reload

    params = steps.params
    if opt_state is None:
        opt_state = steps.opt.init(params)
    max_test_batches = cfg.max_test_batches // 2  # ref: main.py:82,85,95

    k_init, k_train, k_val = jax.random.split(rng, 3)
    # seed best_loss from the same view later evals use (EMA when on —
    # matters when resuming with a restored optimizer state)
    val_m = test_loop(cfg, steps, eval_view(cfg, params, opt_state),
                      val_sampler, max_test_batches, k_init)
    best_loss = val_m["loss"]
    if initial_best is not None:
        best_loss = min(best_loss, float(initial_best))
    best_batch_idx = start_batch  # fresh patience window on resume
    throughput = Throughput()
    print(f"\ninitial loss: {best_loss}, acc: {val_m['acc']}")

    device_path = (isinstance(train_sampler, DeviceEpisodeSampler)
                   and steps.family is not None)
    chunk = cfg.chunk or CHUNK  # --tpu_chunk override (autotune output)
    # --tpu_watch gradient histograms: on the chunked drivers (serial +
    # dp engine) counts are accumulated on device from every
    # WATCH_STRIDE-th training step of the chunk (train/watch.py — a
    # systematic sample of the actual training stream at ~2% cost,
    # strictly more fidelity than wandb.watch's log_freq point samples);
    # the 2-D (mp) engine and host-sampler path fall back to a
    # per-boundary point sample.
    accumulate_watch = bool(cfg.watch) and device_path and not (
        steps.mesh is not None and _mesh_mp(steps.mesh) > 1)
    watch_accum: Dict[str, np.ndarray] = {}
    watch_steps = [0]

    def _absorb_watch(ms):
        if not accumulate_watch:
            return ms
        from fumi_tpu.train.watch import split_watch_counts
        ms, counts, steps = split_watch_counts(ms)
        for k, v in counts.items():
            watch_accum[k] = watch_accum.get(k, 0) + v
        watch_steps[0] += steps
        return ms

    if device_path:
        if steps.mesh is not None and _mesh_mp(steps.mesh) > 1:
            if cfg.grad_accum > 1:
                # backstop for programmatic callers; the CLI fails fast in
                # Config.validate (micro-batching the pjit engine's
                # globally-sharded task axis would reshuffle the sharded
                # dim — the dp engine and serial driver both support it)
                raise NotImplementedError(
                    "--tpu_grad_accum > 1 is not wired into the 2-D (mp) "
                    "engine — use --tpu_mesh_mp 1")
            # 2-D (dp × mp) declarative engine: wide weights sharded over
            # mp, episodes over dp, XLA-inserted collectives
            from fumi_tpu.parallel.pjit_engine import make_pjit_chunked_train
            chunked = make_pjit_chunked_train(
                cfg, steps.family, steps.opt, train_sampler, steps.mesh,
                chunk)
        elif steps.mesh is not None:
            from fumi_tpu.parallel.engine import make_parallel_chunked_train
            chunked = make_parallel_chunked_train(
                cfg, steps.family, steps.opt, train_sampler, steps.mesh,
                chunk, watch=accumulate_watch)
        else:
            chunked = make_chunked_train(steps.family, steps.opt,
                                         train_sampler, chunk,
                                         unroll=cfg.train_unroll,
                                         accum=cfg.grad_accum,
                                         watch=accumulate_watch)
        train_key = k_train
    else:
        fused = (fuse_sampler(steps.train_step, train_sampler)
                 if isinstance(train_sampler, DeviceEpisodeSampler)
                 else None)

    watch_grad = None
    if cfg.watch and steps.family is not None and not accumulate_watch:
        # --tpu_watch gradient FALLBACK sample (host-sampler / 2-D-mesh
        # paths only — the chunked drivers accumulate the real stream,
        # see accumulate_watch above): the meta-gradient of ONE fresh
        # meta-batch at each eval boundary, the distribution telemetry
        # wandb.watch provides at its log_freq cadence
        _fam_loss = steps.family.train_loss
        watch_grad = jax.jit(lambda p, ep, k: jax.grad(
            lambda p_: _fam_loss(p_, ep, k)[0])(p))

    watch_sampler_box = []  # lazily built side-channel sampler (host path)

    def _log_watch_boundary(batch_idx: int) -> None:
        if not cfg.watch:
            return
        from fumi_tpu.train.watch import log_watch, watch_record
        if accumulate_watch:
            # counts summed over EVERY train step since the last
            # boundary; watch/grad_steps records how many, so consumers
            # can normalize (counts sum to n_params x steps)
            rec = watch_record(params, grad_counts=dict(watch_accum))
            rec["watch/grad_steps"] = np.int64(watch_steps[0])
            watch_accum.clear()
            watch_steps[0] = 0
            log_watch(writer, rec, step=batch_idx)
            return
        grads = None
        if watch_grad is not None:
            # a stream distinct from the eval fold_in(k_val, batch_idx)
            k_w = jax.random.fold_in(
                jax.random.fold_in(k_val, 2 ** 31 - 1), batch_idx)
            k_ep, k_step = jax.random.split(k_w)
            if isinstance(train_sampler, DeviceEpisodeSampler):
                # same augment_scale as training: the logged gradient
                # distribution must be measured on the distribution the
                # model actually trains on (the host path's watch_clone
                # preserves augmentation the same way)
                ep = _jitted_sample(
                    train_sampler.tables, train_sampler.spec, k_ep,
                    augment_scale=train_sampler.augment_scale)
            else:
                # host path: NEVER draw from the live training stream —
                # telemetry must not shift the episodes a watch-off run
                # would train on. A derived-seed clone of the underlying
                # host sampler supplies the side-channel episodes.
                if not watch_sampler_box:
                    base = getattr(train_sampler, "sampler", train_sampler)
                    watch_sampler_box.append(base.watch_clone())
                ep = watch_sampler_box[0].sample()
            grads = watch_grad(params, ep, k_step)
        log_watch(writer, watch_record(params, grads), step=batch_idx)

    def next_stop(batch_idx: int) -> int:
        """The next step index after which the loop must pause: an eval
        boundary, the epochs end, or the patience trigger."""
        stops = [cfg.epochs]  # ref breaks after processing step `epochs`
        if cfg.eval_freq > 0:
            b = (batch_idx // cfg.eval_freq) * cfg.eval_freq
            while b < batch_idx or (b == 0 and not eval_at_zero):
                b += cfg.eval_freq
            stops.append(b)
        if cfg.patience > 0:
            stops.append(best_batch_idx + cfg.patience + 1)
        return min(stops)

    batch_idx = start_batch
    try:
        while True:
            stop = next_stop(batch_idx)
            if stop < batch_idx:  # resumed at/past the end: nothing to run
                break
            n = stop - batch_idx + 1  # steps batch_idx..stop inclusive

            if device_path:
                # split n into chunk-sized dispatches + one remainder
                done = 0
                while done < n:
                    c = min(chunk, n - done)
                    params, opt_state, train_key, ms = chunked(
                        params, opt_state, train_key, c)
                    ms = _absorb_watch(ms)
                    _log_train_stack(writer, cfg, batch_idx + done, ms,
                                     is_am3)
                    done += c
            else:
                for j in range(n):
                    key = jax.random.fold_in(k_train, batch_idx + j)
                    if fused is not None:
                        params, opt_state, m = fused(params, opt_state, key)
                    else:
                        k_ep, k_step = jax.random.split(key)
                        episode = train_sampler.sample()
                        params, opt_state, m = steps.train_step(
                            params, opt_state, episode, k_step)
                    _log_train(writer, cfg, batch_idx + j, m, is_am3)

            batch_idx = stop  # last processed step index

            eps_rate = throughput.update((batch_idx + 1) * cfg.batch_size)

            is_eval = (cfg.eval_freq > 0 and batch_idx % cfg.eval_freq == 0
                       and (eval_at_zero or batch_idx != 0))
            if is_eval:
                val_m = test_loop(cfg, steps,
                                  eval_view(cfg, params, opt_state),
                                  val_sampler, max_test_batches,
                                  jax.random.fold_in(k_val, batch_idx))
                is_best = val_m["loss"] < best_loss
                if is_best:
                    best_loss = val_m["loss"]
                    best_batch_idx = batch_idx
                rec = {f"val/{k}": v for k, v in val_m.items()}
                rec["episodes_per_sec"] = eps_rate
                from fumi_tpu.utils.profiling import hbm_stats
                rec.update(hbm_stats())  # mem/* when the runtime reports
                writer.log(rec, step=batch_idx)
                _log_watch_boundary(batch_idx)
                import dataclasses as _dc
                ckpt_lib.save_checkpoint(
                    run_dir, params, opt_state, batch_idx, best_loss,
                    is_best,
                    extra_meta={"model": cfg.model,
                                "args": _dc.asdict(cfg)})
                print(f"\nBatch {batch_idx + 1}/{cfg.epochs}: "
                      f"val/loss: {val_m['loss']}, val/acc: {val_m['acc']}")

            # ref: am3.py:295-297 — break on max iters or patience
            if (batch_idx > cfg.epochs - 1) or (
                    cfg.patience > 0 and
                    batch_idx - best_batch_idx > cfg.patience):
                break
            batch_idx += 1
    except KeyboardInterrupt:
        pass

    if reload_best and os.path.exists(os.path.join(run_dir, "best")):
        params, opt_state, _ = ckpt_lib.load_checkpoint(
            run_dir, params, opt_state, best=True)
    # with --tpu_ema the final test (and serving) sees the smoothed
    # weights, matching what validation selected the checkpoint on
    return eval_view(cfg, params, opt_state)


def _train_log_keys(m: Dict, is_am3: bool):
    keys = AM3_TRAIN_KEYS if is_am3 else ("loss", "acc", "grad_norm")
    # per-layer grad norms ride along (wandb.watch's role, utils.py:272)
    return [k for k in m if k in keys or k.startswith("grad_norm/")]


def _log_train(writer: MetricWriter, cfg: Config, batch_idx: int, m: Dict,
               is_am3: bool) -> None:
    rec = {f"train/{k}": float(m[k]) for k in _train_log_keys(m, is_am3)}
    rec["num_episodes"] = (batch_idx + 1) * cfg.batch_size
    writer.log(rec, step=batch_idx)


def _log_train_stack(writer: MetricWriter, cfg: Config, start_idx: int,
                     ms: Dict, is_am3: bool) -> None:
    """Per-step logs from a chunk's stacked metrics (one device sync)."""
    from fumi_tpu.core.mesh import host_fetch
    stacked = {k: host_fetch(ms[k]) for k in _train_log_keys(ms, is_am3)}
    n = len(next(iter(stacked.values())))
    for j in range(n):
        rec = {f"train/{k}": float(v[j]) for k, v in stacked.items()}
        rec["num_episodes"] = (start_idx + j + 1) * cfg.batch_size
        writer.log(rec, step=start_idx + j)
