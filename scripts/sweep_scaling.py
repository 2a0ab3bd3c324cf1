"""Measure lockstep multi-seed sweep throughput scaling on the local
device (flagship FuMI config, bench.py shapes).

For each S in --sweeps, times the sweep chunked-train driver
(fumi_tpu/train/sweep.py) and reports aggregate episodes/sec (episodes
summed across the S replicas) and the speedup over S serial runs at the
S=1 rate. On the dispatch-bound flagship config the seed axis rides the
idle MXU, so aggregate throughput should grow well past 1x.

Usage:  python scripts/sweep_scaling.py [--sweeps 1 2 4 8] [--chunk 500]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # repo root (run from there; no PYTHONPATH on TPU)

from bench import (BATCH, IM_DIM, K_SHOT, N_WAY, Q_TRAIN,  # noqa: E402
                   TXT_DIM, _bench_cfg)


def bench_sweep(S: int, chunk: int, iters: int,
                compute_dtype: str = "float32",
                seed_accum: int = 1) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler, table_storage
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import make_opt
    from fumi_tpu.train.sweep import (build_sweep_family,
                                      make_sweep_chunked_train)

    cfg = _bench_cfg("fumi", compute_dtype).replace(seed_sweep=S, seed=0)
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(
        table_storage(jnp.asarray(table), compute_dtype),
        jnp.asarray(ids), cs, spec)
    family = build_sweep_family(cfg)
    opt = make_opt(cfg)
    params = family.params
    opt_state = jax.vmap(opt.init)(params)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(S)])
    live = jnp.ones(S, dtype=bool)
    run = make_sweep_chunked_train(family, opt, sampler, chunk,
                                   seed_accum=seed_accum)

    params, opt_state, keys, ms = run(params, opt_state, keys, live)
    _ = float(np.asarray(ms["loss"])[-1].mean())  # sync fetch

    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        params, opt_state, keys, ms = run(params, opt_state, keys, live)
        _ = float(np.asarray(ms["loss"])[-1].mean())
        best = max(best, chunk * BATCH * S / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--seed_accum", type=int, default=1,
                    help="--tpu_seed_accum G: each step runs the S seeds "
                         "as G sequential groups of S/G (the single-chip "
                         "working-set lever past the S sweet spot)")
    args = ap.parse_args()

    import jax
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    rows = {}
    for S in args.sweeps:
        rate = bench_sweep(S, args.chunk, args.iters,
                           seed_accum=args.seed_accum)
        rows[S] = rate
        base = rows.get(1)
        speedup = rate / base if base else float("nan")
        print(f"S={S:3d}  {rate:12.1f} eps/s aggregate   "
              f"{rate / S:10.1f} eps/s/seed   "
              f"{speedup:6.2f}x vs S serial", flush=True)
    print(json.dumps({"sweep_eps_per_sec": rows}))


if __name__ == "__main__":
    main()
