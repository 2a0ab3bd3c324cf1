"""Autotune the chunked training driver for the local device.

Sweeps (meta-batch B, scan chunk length, outer-scan unroll) for a model
family at given dims, measuring train episodes/sec at each grid point
(best-of-chunks / min-time, the same statistic as bench.py — robust to
the tunneled runtime's RPC jitter). Emits a JSON artifact with the full
grid plus the winning point rendered as the CLI flags that apply it::

    python scripts/autotune.py --model fumi --out autotune.json
    # -> best: B=16 chunk=1000 unroll=4  ->  31k eps/s
    #    apply: --batch_size 16 --tpu_chunk 1000 --tpu_train_unroll 4

Rationale: the per-step program is tiny (~0.2 ms at reference shapes),
so throughput is set by dispatch amortization (chunk), scan sequencing
overhead (unroll), and MXU occupancy (B) — all hardware-dependent. The
defaults (B=4 protocol, chunk=1000, unroll=4) were tuned on a tunneled
TPU v5e (docs/PERFORMANCE.md); a local-runtime chip or a different
generation lands elsewhere. NOTE: B is part of the *training protocol*
(meta-batch size), not a free knob — the reference protocol fixes B=4;
larger B changes optimization dynamics. The sweep includes it so the
throughput cost of protocol choices is visible, and the "apply" line of
the protocol-preserving best is reported separately.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference dims (bench.py flagship config, ref utils.py:80-179)
IM_DIM, TXT_DIM = 2048, 768
IM_HID = (256, 64)
TXT_HID = 256
N_WAY, K_SHOT, Q_TRAIN = 5, 5, 32
INNER_STEPS = 5


def measure(model: str, batch: int, chunk: int, unroll: int,
            repeats: int = 3) -> float:
    """Train episodes/sec for one grid point (best-of-repeats)."""
    import jax
    import jax.numpy as jnp
    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = Config(model=model, im_emb_dim=IM_DIM, text_emb_dim=TXT_DIM,
                 im_hid_dim=IM_HID, text_hid_dim=TXT_HID, num_ways=N_WAY,
                 num_shots=K_SHOT, num_shots_test=Q_TRAIN,
                 num_train_adapt_steps=INNER_STEPS, batch_size=batch,
                 dropout=0.25, text_encoder="precomputed", step_size=0.01,
                 lr=3e-5, optim="adam", prototype_dim=512)
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(batch, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_chunked_train(family, opt, sampler, chunk, unroll=unroll)

    params, opt_state = family.params, opt.init(family.params)
    key = jax.random.PRNGKey(1)
    # compile + warmup; synchronize by FETCHING (tunneled-runtime caveat,
    # docs/PERFORMANCE.md)
    params, opt_state, key, ms = chunked(params, opt_state, key, chunk)
    _ = float(np.asarray(ms["loss"])[-1])
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, key, ms = chunked(params, opt_state, key, chunk)
        _ = float(np.asarray(ms["loss"])[-1])
        best = max(best, chunk * batch / (time.perf_counter() - t0))
    return best


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="fumi")
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[250, 500, 1000, 2000])
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--protocol_batch", type=int, default=4,
                    help="the training-protocol meta-batch (reference: 4);"
                         " the protocol-preserving best is reported too")
    ap.add_argument("--out", default="autotune.json")
    args = ap.parse_args(argv)

    import jax
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    grid = []
    points = list(itertools.product(args.batches, args.chunks, args.unrolls))
    for i, (b, c, u) in enumerate(points):
        try:
            eps = measure(args.model, b, c, u, args.repeats)
        except Exception as e:  # e.g. OOM at large B*chunk: record + go on
            print(f"[{i + 1}/{len(points)}] B={b} chunk={c} unroll={u} "
                  f"FAILED: {type(e).__name__}: {e}")
            grid.append({"batch": b, "chunk": c, "unroll": u,
                         "eps_per_sec": None,
                         "error": f"{type(e).__name__}: {e}"})
            continue
        print(f"[{i + 1}/{len(points)}] B={b} chunk={c} unroll={u} -> "
              f"{eps:,.0f} eps/s")
        grid.append({"batch": b, "chunk": c, "unroll": u,
                     "eps_per_sec": round(eps, 1)})

    ok = [g for g in grid if g["eps_per_sec"]]
    if not ok:
        raise SystemExit("every grid point failed")
    best = max(ok, key=lambda g: g["eps_per_sec"])
    proto = [g for g in ok if g["batch"] == args.protocol_batch]
    best_proto = max(proto, key=lambda g: g["eps_per_sec"]) if proto else None

    def flags(g):
        return (f"--batch_size {g['batch']} --tpu_chunk {g['chunk']} "
                f"--tpu_train_unroll {g['unroll']}")

    result = {
        "model": args.model,
        "device": str(jax.devices()[0]),
        "grid": grid,
        "best": {**best, "apply": flags(best)},
    }
    if best_proto is not None:
        result["best_protocol_preserving"] = {
            **best_proto, "apply": flags(best_proto)}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nbest: {json.dumps(result['best'])}")
    if best_proto is not None:
        print(f"best at protocol B={args.protocol_batch}: "
              f"{json.dumps(result['best_protocol_preserving'])}")
    print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
