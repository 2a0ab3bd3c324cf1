"""Conv-backbone raw-image training: throughput + MFU on the real chip.

The flagship FuMI/MAML configs run tiny MLP matmuls over precomputed
embeddings and are DISPATCH-bound (docs/PERFORMANCE.md "Mixed precision":
bf16 is ~0.96x there). The raw-image conv path (--im_encoder
conv4|resnet12) is the opposite regime — image-sized convolutions lower
onto the MXU and the FLOPs are real. This experiment measures episodes/sec
and MFU for conv4/resnet12 MAML episodes at standard few-shot geometry
(84x84x3, 5-way 5-shot), fp32 vs bf16, mirroring production exactly:
uint8 raw table in HBM, fp32 [0,1] at gather time, fused
sample+train chunked driver.

FLOPs/step via the marginal-unroll method of scripts/mfu.py (XLA cost
analysis of n=1 vs n=2 unrolled fused steps; lax.scan bodies are counted
once, so the production scan program cannot be used directly).

Run on the TPU:
  python scripts/exp_conv_bench.py --encoder conv4 --dtype float32
  python scripts/exp_conv_bench.py --encoder conv4 --dtype bfloat16

Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.mfu import find_peak, marginal_cost  # noqa: E402

N_WAY, K_SHOT, Q_TRAIN = 5, 5, 15
BATCH = 4  # default; --batch overrides (module-level so helpers agree)
INNER_STEPS = 5


def build_pieces(encoder: str, im_size: int, dtype: str,
                 remat: str = "auto", channels=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler, table_storage
    from fumi_tpu.data.synthetic import synthetic_raw_image_set
    from fumi_tpu.train.steps import build_family, make_opt

    kw = {}
    if channels is not None:
        kw["resnet12_channels"] = tuple(channels)
    cfg = Config(model="maml", im_encoder=encoder, im_size=im_size,
                 im_emb_dim=im_size * im_size * 3, text_emb_dim=32,
                 num_ways=N_WAY, num_shots=K_SHOT, num_shots_test=Q_TRAIN,
                 num_train_adapt_steps=INNER_STEPS, batch_size=BATCH,
                 dropout=0.0, text_encoder="precomputed", step_size=0.01,
                 lr=1e-3, optim="adam", compute_dtype=dtype, remat=remat,
                 **kw)
    cs, table, ids = synthetic_raw_image_set(
        num_classes=32, images_per_class=40, im_size=im_size, text_dim=32,
        seed=0)
    # production storage: uint8 pixels in HBM, fp32 [0,1] at gather time
    table_u8 = np.clip((table - table.min()) /
                       (np.ptp(table) + 1e-9) * 255.0, 0, 255).astype(np.uint8)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN,
                       im_size * im_size * 3, 32)
    sampler = DeviceEpisodeSampler(
        table_storage(jnp.asarray(table_u8), dtype), jnp.asarray(ids),
        cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    return family, opt, sampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="conv4",
                    choices=("conv4", "resnet12"))
    ap.add_argument("--im_size", type=int, default=84)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip_mfu", action="store_true",
                    help="skip the unrolled cost-analysis compiles")
    ap.add_argument("--pool", default=None,
                    choices=("reduce_window", "slices", "reshape"),
                    help="override conv4.POOL_IMPL (A/B the max-pool "
                         "formulation; 'slices' fuses with the norm/relu "
                         "epilogue, see conv4.maxpool2x2)")
    ap.add_argument("--remat", default="auto", choices=("auto", "on", "off"),
                    help="--tpu_remat inner-loop policy. For resnet12, "
                         "auto = save_convs (whole-step checkpoint keeping "
                         "the named conv outputs; measured 4.6 eps/s) and "
                         "on = plain whole-step (4.4) — the remat A/B is "
                         "auto vs on")
    ap.add_argument("--block_remat", action="store_true",
                    help="checkpoint each conv block: save block inputs, "
                         "recompute conv/norm/relu/pool in backward "
                         "(conv4.BLOCK_REMAT)")
    ap.add_argument("--stage_remat", default=None,
                    help="resnet12 only: force a per-stage checkpoint "
                         "pattern, e.g. 1100 = remat stages 0-1, store "
                         "2-3 (resnet12.STAGE_REMAT_OVERRIDE; measured "
                         "negative — the auto policy keeps whole-step "
                         "remat)")
    ap.add_argument("--batch", type=int, default=None,
                    help="meta-batch size B (default 4, the production "
                         "protocol; episode-width ablation)")
    ap.add_argument("--save_names", default=None,
                    help="comma list overriding the save_convs policy's "
                         "kept names (inner_loop.SAVE_CONVS_NAMES), e.g. "
                         "'conv_out' to A/B without the norm stats")
    ap.add_argument("--channels", default=None,
                    help="resnet12 only: comma stage widths (DIAGNOSTIC "
                         "— a lane-aligned set like 128,256,384,640 "
                         "isolates physical tile padding of the standard "
                         "64/160/320/640 widths from the cost model's "
                         "logical bytes; not a shipping configuration)")
    args = ap.parse_args()

    if args.batch is not None:
        global BATCH
        BATCH = args.batch
    if args.save_names is not None:
        from fumi_tpu.metalearn import inner_loop
        inner_loop.SAVE_CONVS_NAMES = tuple(
            s for s in args.save_names.split(",") if s)

    if args.pool is not None:
        from fumi_tpu.models import conv4
        conv4.POOL_IMPL = args.pool
    if args.block_remat:
        from fumi_tpu.models import conv4
        conv4.BLOCK_REMAT = True
    if args.stage_remat is not None:
        # the override only reaches the backbone through the auto policy
        # (train/steps.py:resnet12_stage_remat returns None otherwise);
        # refuse the combination rather than record a mislabeled datapoint
        if args.remat != "auto" or args.encoder != "resnet12":
            ap.error("--stage_remat requires --encoder resnet12 --remat "
                     "auto (train/steps.py:resnet12_stage_remat routes the "
                     "pattern only there; otherwise it would be silently "
                     "ignored and the datapoint mislabeled)")
        from fumi_tpu.models import resnet12
        resnet12.STAGE_REMAT_OVERRIDE = tuple(
            c == "1" for c in args.stage_remat)

    import jax
    import numpy as np
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    channels = (tuple(int(c) for c in args.channels.split(","))
                if args.channels else None)
    if channels and args.encoder != "resnet12":
        ap.error("--channels is a resnet12 diagnostic")
    family, opt, sampler = build_pieces(args.encoder, args.im_size,
                                        args.dtype, args.remat, channels)

    flops_step = bytes_step = None
    if not args.skip_mfu:
        flops_step, bytes_step = marginal_cost(family, opt, sampler, 1, 2)

    from fumi_tpu.train.steps import make_chunked_train
    from scripts.mfu import timed_chunks
    chunked = make_chunked_train(family, opt, sampler, args.chunk)
    state = [family.params, opt.init(family.params), jax.random.PRNGKey(2)]

    def run_chunk(_i):
        state[0], state[1], state[2], ms = chunked(*state, args.chunk)
        return float(np.asarray(ms["loss"])[-1])  # sync fetch (tunnel-safe)

    best = timed_chunks(run_chunk, args.chunk * BATCH, args.iters)

    out = {"encoder": args.encoder, "im_size": args.im_size,
           "dtype": args.dtype, "remat": args.remat,
           "block_remat": args.block_remat,
           "stage_remat": args.stage_remat, "batch": BATCH,
           "save_names": args.save_names, "channels": args.channels,
           "eps_per_sec": round(best, 1)}
    if flops_step is not None:
        steps_per_sec = best / BATCH
        achieved = flops_step * steps_per_sec
        kind = jax.devices()[0].device_kind
        peak = find_peak(kind)
        out.update(flops_per_step=flops_step,
                   achieved_tflops=round(achieved / 1e12, 2),
                   mfu_pct=(round(100 * achieved / peak, 1)
                            if peak else None))
        # HBM roofline: XLA's "bytes accessed" is the fusion-aware HBM
        # traffic of one marginal step; traffic/BW is the bandwidth-bound
        # step-time floor, and achieved/peak the bandwidth utilization
        # (the dual of MFU for an HBM-bound path).
        from scripts.mfu import PEAK_HBM_BW
        bw = find_peak(kind, PEAK_HBM_BW)
        if bw and bytes_step == bytes_step:  # not NaN
            out.update(
                hbm_gb_per_step=round(bytes_step / 1e9, 2),
                hbm_util_pct=round(100 * bytes_step * steps_per_sec / bw, 1),
                roofline_eps_per_sec=round(BATCH * bw / bytes_step, 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
