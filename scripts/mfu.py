"""MFU estimate for the flagship FuMI train step.

Computes FLOPs/step for the production fused sample+train program (the
exact program bench.py times) from XLA's compiled cost analysis, combines
it with measured steps/sec, and reports achieved FLOP/s against the chip's
peak matmul throughput — the standard MFU (model FLOP utilization)
statistic. This quantifies how much compute headroom the sub-ms step
leaves, i.e. whether the workload is dispatch/bandwidth-bound or
compute-bound (docs/PERFORMANCE.md).

Run on the TPU:  python scripts/mfu.py            (measures eps/sec)
                 python scripts/mfu.py --eps N    (reuse a bench number)

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak dense-matmul FLOP/s per chip (bf16 MXU peak — the conventional MFU
# denominator; fp32 matmuls run the MXU at a fraction of this, so fp32
# models report conservative MFU). Public spec-sheet numbers.
PEAK_FLOPS = {
    "TPU v2": 22.5e12,
    "TPU v3": 61.25e12,  # per chip (2 cores)
    "TPU v4": 137.5e12,  # per chip (1 die pair = 275e12 per 2-chip board?)
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 229.5e12,
    "TPU v6 lite": 459e12,
    "TPU v6e": 459e12,
}


def find_peak(device_kind: str):
    for k, v in PEAK_FLOPS.items():
        if device_kind.lower().startswith(k.lower()):
            return v
    return None


def build_chunked(chunk: int):
    import jax
    import jax.numpy as jnp
    from bench import (BATCH, IM_DIM, K_SHOT, N_WAY, Q_TRAIN, TXT_DIM,
                       _bench_cfg)
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = _bench_cfg("fumi")
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_chunked_train(family, opt, sampler, chunk)
    params = family.params
    opt_state = opt.init(params)
    return chunked, params, opt_state, BATCH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=None,
                    help="episodes/sec from a bench run (skips measuring)")
    ap.add_argument("--chunk", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import numpy as np
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    # FLOPs from XLA's own cost model, on a SMALL chunk (AOT-compiling the
    # production 1000-step chunk through the tunneled runtime takes many
    # minutes; FLOPs are exactly linear in chunk length, so an 8-step
    # program gives the same per-step figure)
    ANALYZE_CHUNK = 8
    small, params, opt_state, batch = build_chunked(ANALYZE_CHUNK)
    key = jax.random.PRNGKey(1)
    lowered = small.jitted.lower(params, opt_state, key, small.tables,
                                 ANALYZE_CHUNK)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops_chunk = float(cost.get("flops", float("nan")))
    flops_step = flops_chunk / ANALYZE_CHUNK
    flops_episode = flops_step / batch

    eps = args.eps
    if eps is None:
        # measure: same best-of-chunks protocol as bench.py
        chunked, p, s, _b = build_chunked(args.chunk)
        p, s, key, ms = chunked(p, s, key, args.chunk)
        _ = float(np.asarray(ms["loss"])[-1])
        best = 0.0
        for _i in range(3):
            t0 = time.perf_counter()
            p, s, key, ms = chunked(p, s, key, args.chunk)
            _ = float(np.asarray(ms["loss"])[-1])
            best = max(best, args.chunk * batch / (time.perf_counter() - t0))
        eps = best

    steps_per_sec = eps / batch
    achieved = flops_step * steps_per_sec
    kind = jax.devices()[0].device_kind
    peak = find_peak(kind)
    out = {
        "device_kind": kind,
        "flops_per_step": flops_step,
        "flops_per_episode": flops_episode,
        "episodes_per_sec": round(eps, 2),
        "achieved_flops_per_sec": achieved,
        "peak_flops_per_sec": peak,
        "mfu": (achieved / peak) if peak else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
