"""Benchmark: episodes/sec on the flagship FuMI config (5-way 5-shot,
reference dims) — fused device-sampled train steps on the TPU vs a torch-CPU
restatement of the reference's sequential episode step (the reference
publishes no numbers and its full stack isn't runnable here, SURVEY §6; the
baseline is the same math executed the way the reference executes it:
eager torch, per-task Python loop, create_graph inner steps).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "episodes/sec", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")

# flagship config: reference defaults (ref: utils.py:80-179)
IM_DIM, TXT_DIM = 2048, 768
IM_HID = (256, 64)
TXT_HID = 256
N_WAY, K_SHOT, Q_TRAIN = 5, 5, 32
BATCH = 4
INNER_STEPS = 5
STEP_SIZE = 0.01
LR = 3e-5


def _bench_cfg(model: str, compute_dtype: str = "float32"):
    from fumi_tpu.core.config import Config
    return Config(model=model, im_emb_dim=IM_DIM, text_emb_dim=TXT_DIM,
                  im_hid_dim=IM_HID, text_hid_dim=TXT_HID, num_ways=N_WAY,
                  num_shots=K_SHOT, num_shots_test=Q_TRAIN,
                  num_train_adapt_steps=INNER_STEPS, batch_size=BATCH,
                  dropout=0.25, text_encoder="precomputed",
                  step_size=STEP_SIZE, lr=LR, optim="adam",
                  prototype_dim=512, compute_dtype=compute_dtype)


def bench_tpu(num_steps: int = 3000, chunk: int = 1000,
              model: str = "fumi",
              compute_dtype: str = "float32") -> float:
    """episodes/sec of the chunked (scan) fused sample+train driver — the
    production training path (fumi_tpu/train/loop.py)."""
    import jax
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")  # threefry costs
    # ~0.1 ms/step on TPU; rbg is hardware-speed
    import jax.numpy as jnp
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import (DeviceEpisodeSampler,
                                       table_storage)
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = _bench_cfg(model, compute_dtype)

    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    table = table_storage(jnp.asarray(table), compute_dtype)
    sampler = DeviceEpisodeSampler(table, jnp.asarray(ids), cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_chunked_train(family, opt, sampler, chunk)

    # warm + per-chunk best-of-N with sync-by-fetch: the one shared
    # timing convention (scripts/mfu.py:timed_chunks has the rationale);
    # full sample returned so the headline can carry median/spread
    # alongside the best-of (tunnel-wedge robustness, VERDICT r4 weak #5)
    import numpy as _np
    from scripts.mfu import timed_chunks_stats

    state = [family.params, opt.init(family.params), jax.random.PRNGKey(1)]

    def run_chunk(_i):
        state[0], state[1], state[2], ms = chunked(*state, chunk)
        return float(_np.asarray(ms["loss"])[-1])  # sync fetch

    return timed_chunks_stats(run_chunk, chunk * BATCH,
                              max(1, num_steps // chunk))


def bench_eval(episodes: int = 256, chunk: int = 64,
               compute_dtype: str = "float32") -> float:
    """episodes/sec of the chunked eval driver (100-step test adaptation)."""
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as _np
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import (DeviceEpisodeSampler,
                                       table_storage)
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import build_family, make_chunked_eval

    cfg = _bench_cfg("fumi", compute_dtype)
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, cfg.num_query_eval,
                       IM_DIM, TXT_DIM)
    table = table_storage(jnp.asarray(table), compute_dtype)
    sampler = DeviceEpisodeSampler(table, jnp.asarray(ids), cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    run = make_chunked_eval(family, sampler)
    from scripts.mfu import timed_chunks

    def run_chunk(i):  # warm i=0 uses key 1; scored i>=1 use keys 2..
        _, ms = run(family.params, jax.random.PRNGKey(1 + i), chunk)
        return float(_np.asarray(ms["loss"])[-1])  # sync fetch

    return timed_chunks(run_chunk, chunk * BATCH,
                        max(2, episodes // (chunk * BATCH)))


def bench_torch_baseline(num_steps: int = 3) -> float:
    """Reference-style eager torch CPU FuMI episode step, episodes/sec.

    Same math as ref fumi.py:115-196: sequential loop over tasks, 5
    create_graph inner steps jointly updating base params and the hypernet
    output, outer backward + Adam."""
    import torch
    import torch.nn.functional as F
    torch.manual_seed(0)

    h1 = torch.nn.Linear(TXT_DIM, TXT_HID)
    h2 = torch.nn.Linear(TXT_HID, IM_HID[-1] + 1)
    im_layers = torch.nn.ModuleList([
        torch.nn.Linear(IM_DIM, IM_HID[0]),
        torch.nn.Linear(IM_HID[0], IM_HID[1]),
    ])
    all_params = (list(h1.parameters()) + list(h2.parameters()) +
                  list(im_layers.parameters()))
    opt = torch.optim.Adam(all_params, lr=LR)

    def hyper_fwd(x):
        return h2(torch.relu(h1(x)))

    def im_forward(ps, hyper, x):
        out = x
        for (w, b) in ps:
            out = torch.relu(F.linear(out, w, b))
        return out @ hyper[:, :-1].T + hyper[:, -1]

    rng = np.random.RandomState(0)
    NK, NQ = N_WAY * K_SHOT, N_WAY * Q_TRAIN
    s_im = torch.tensor(rng.randn(BATCH, NK, IM_DIM).astype(np.float32))
    q_im = torch.tensor(rng.randn(BATCH, NQ, IM_DIM).astype(np.float32))
    s_tx = torch.tensor(rng.randn(BATCH, N_WAY, TXT_DIM).astype(np.float32))
    s_y = torch.tensor(np.tile(np.repeat(np.arange(N_WAY), K_SHOT)[None],
                               (BATCH, 1)))
    q_y = torch.tensor(np.tile(np.repeat(np.arange(N_WAY), Q_TRAIN)[None],
                               (BATCH, 1)))

    def one_meta_step():
        outer = torch.tensor(0.0)
        for t in range(BATCH):
            hyper = hyper_fwd(s_tx[t])
            ps = [(l.weight, l.bias) for l in im_layers]
            for _ in range(INNER_STEPS):
                logit = im_forward(ps, hyper, s_im[t])
                inner = F.cross_entropy(logit, s_y[t])
                g_h = torch.autograd.grad(inner, hyper, create_graph=True,
                                          retain_graph=True)[0]
                flat = [p for pair in ps for p in pair]
                g_im = torch.autograd.grad(inner, flat, create_graph=True)
                hyper = hyper - STEP_SIZE * g_h
                ps = [(flat[2 * i] - STEP_SIZE * g_im[2 * i],
                       flat[2 * i + 1] - STEP_SIZE * g_im[2 * i + 1])
                      for i in range(len(ps))]
            q_logit = im_forward(ps, hyper, q_im[t])
            outer = outer + F.cross_entropy(q_logit, q_y[t])
        outer = outer / BATCH
        opt.zero_grad()
        outer.backward()
        opt.step()

    one_meta_step()  # warmup
    # best-of-steps (min-time), same statistic as bench_tpu so the
    # vs_baseline ratio compares like with like
    best = 0.0
    for _ in range(num_steps):
        t0 = time.perf_counter()
        one_meta_step()
        best = max(best, BATCH / (time.perf_counter() - t0))
    return best


def get_baseline(refresh: bool = False) -> float:
    if not refresh and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["episodes_per_sec"]
    eps = bench_torch_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"episodes_per_sec": eps,
                   "what": "torch-CPU reference-style FuMI episode step"},
                  f)
    return eps


def _wait_for_tpu(max_wait_s: float = 1800.0) -> None:
    """Ride out tunnel wedges before benching.

    The tunneled TPU runtime occasionally WEDGES (even ``jax.devices()``
    hangs indefinitely) — an in-process retry never fires because nothing
    throws. Probe with a small subprocess under a hard timeout (the child
    is killed by PID via the subprocess API) and sleep-retry up to
    ``max_wait_s``; then proceed regardless — if the tunnel recovered
    mid-probe the bench runs normally, and a still-wedged run is bounded
    by the caller's own timeout instead of silently recording nothing."""
    import subprocess
    probe = ("import jax, numpy as np, jax.numpy as jnp; "
             "jax.devices(); "
             "print(float(np.asarray(jnp.ones((8,8)).sum())))")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=300,
                           check=True, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except Exception:
            if time.time() >= deadline:
                print(f"# TPU probe still failing after {attempt} attempts"
                      f" (~{max_wait_s:.0f}s); proceeding anyway",
                      file=sys.stderr)
                return
            print(f"# TPU probe attempt {attempt} failed (tunnel wedged?);"
                  " sleeping 120s", file=sys.stderr)
            time.sleep(120)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--refresh-baseline", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="bench all families + eval; write "
                         "bench_all{_dtype}.json (dtype-suffixed for "
                         "non-default --compute_dtype, e.g. "
                         "bench_all_bfloat16.json)")
    ap.add_argument("--no-wait", action="store_true",
                    help="skip the tunnel-wedge probe loop")
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="--tpu_compute_dtype under the bench (bf16 "
                         "matmuls + bf16 table; measured numbers in "
                         "docs/PERFORMANCE.md)")
    args = ap.parse_args()

    if not args.no_wait:
        _wait_for_tpu()

    # non-default dtype runs record under their own metric names: a bf16
    # number must not land in the fp32 trend history (the ~0.96x bf16
    # delta would read as a throughput regression)
    suffix = ("" if args.compute_dtype == "float32"
              else f"_{args.compute_dtype}")

    if args.all:
        side = {}
        for model in ("fumi", "maml", "am3", "protonet", "matchingnet"):
            side[f"{model}_train_eps_per_sec{suffix}"] = round(
                bench_tpu(args.steps, model=model,
                          compute_dtype=args.compute_dtype)["value"], 2)
        side[f"eval_fumi_100step_eps_per_sec{suffix}"] = round(
            bench_eval(chunk=32, compute_dtype=args.compute_dtype), 2)
        # lockstep multi-seed sweep at the measured sweet spot S=4
        # (docs/PERFORMANCE.md sweep-scaling table)
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scripts.sweep_scaling import bench_sweep
        side[f"fumi_sweep4_aggregate_eps_per_sec{suffix}"] = round(
            bench_sweep(4, chunk=500, iters=4,
                        compute_dtype=args.compute_dtype), 2)
        # suffixed filename too: the fp32 bench_all.json is the trend file
        with open(f"bench_all{suffix}.json", "w") as f:
            json.dump(side, f, indent=1)
        print(json.dumps(side))
        return

    # the tunneled TPU runtime occasionally stalls or throws transient
    # INTERNAL errors (see docs/PERFORMANCE.md platform caveats); one retry
    # keeps unattended driver runs from recording nothing
    try:
        stats = bench_tpu(args.steps, compute_dtype=args.compute_dtype)
    except Exception as e:
        print(f"# bench attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        time.sleep(60)
        stats = bench_tpu(args.steps, compute_dtype=args.compute_dtype)
    baseline = get_baseline(args.refresh_baseline)
    # value stays best-of (comparable to every prior round's number);
    # median/n/spread expose a run whose best-of rode one lucky chunk
    # through a wedged tunnel (scripts/mfu.py:timed_chunks_stats)
    print(json.dumps({
        "metric": f"fumi_5way5shot_train_episodes_per_sec{suffix}",
        "value": round(stats["value"], 2),
        "unit": "episodes/sec",
        "vs_baseline": round(stats["value"] / baseline, 2),
        "median": stats["median"],
        "n": stats["n"],
        "spread": stats["spread"],
    }))


if __name__ == "__main__":
    main()
