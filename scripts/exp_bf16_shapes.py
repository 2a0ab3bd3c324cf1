"""Where does the bf16 matmul policy (--tpu_compute_dtype bfloat16) pay?

At the flagship few-shot shapes the chunked train chain is
dispatch/latency-bound (docs/PERFORMANCE.md MFU section): operands are
tiny (<=185 rows), so halving operand width cannot move the MXU occupancy
and the extra cast kernels are pure overhead. This experiment measures
fp32 vs bf16 train throughput at the flagship dims AND at scaled-up dims
(wide embeddings / hidden layers / bigger meta-batch, where the dots are
large enough for operand width to matter) on the real chip.

Usage: python scripts/exp_bf16_shapes.py  (prints one JSON line)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(im_dim, txt_dim, im_hid, txt_hid, proto, batch,
            compute_dtype, num_steps=2000, chunk=500, warm=1):
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import (DeviceEpisodeSampler,
                                       table_storage)
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = Config(model="fumi", im_emb_dim=im_dim, text_emb_dim=txt_dim,
                 im_hid_dim=im_hid, text_hid_dim=txt_hid,
                 num_ways=5, num_shots=1, num_shots_test=32,
                 num_train_adapt_steps=5, batch_size=batch, dropout=0.25,
                 text_encoder="precomputed", step_size=0.01, lr=3e-5,
                 optim="adam", prototype_dim=proto,
                 compute_dtype=compute_dtype)
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=im_dim,
        text_dim=txt_dim, seed=0)
    spec = EpisodeSpec(batch, 5, 1, 32, im_dim, txt_dim)
    table = table_storage(jnp.asarray(table), compute_dtype)
    sampler = DeviceEpisodeSampler(table, jnp.asarray(ids), cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    from scripts.mfu import timed_chunks
    run = make_chunked_train(family, opt, sampler, chunk)
    state = [family.params, opt.init(family.params), jax.random.PRNGKey(0)]

    def run_chunk(_i):
        state[0], state[1], state[2], ms = run(*state)
        return float(np.asarray(ms["loss"])[-1])  # fetch = sync

    return timed_chunks(run_chunk, chunk * batch, num_steps // chunk,
                        warm=warm)


SHAPES = {
    # flagship protocol dims (the bench.py config)
    "flagship(D2048,h256/64,B4)": dict(im_dim=2048, txt_dim=768,
                                       im_hid=(256, 64), txt_hid=256,
                                       proto=512, batch=4),
    # wide: 4x hidden, 8k text/proto, B=16 — dots big enough to tile MXU
    "wide(D8192,h2048/512,B16)": dict(im_dim=8192, txt_dim=4096,
                                      im_hid=(2048, 512), txt_hid=2048,
                                      proto=2048, batch=16),
}


def flops_per_episode(im_dim, txt_dim, im_hid, txt_hid, proto, batch,
                      compute_dtype="float32"):
    """Marginal XLA-counted FLOPs of one fused sample+train step / batch
    (scripts/mfu.py `marginal_cost` — scan bodies are counted once by
    HloCostAnalysis, so two python-unrolled programs are differenced)."""
    import jax
    import jax.numpy as jnp

    from scripts.mfu import marginal_cost
    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import (DeviceEpisodeSampler,
                                       table_storage)
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = Config(model="fumi", im_emb_dim=im_dim, text_emb_dim=txt_dim,
                 im_hid_dim=im_hid, text_hid_dim=txt_hid,
                 num_ways=5, num_shots=1, num_shots_test=32,
                 num_train_adapt_steps=5, batch_size=batch, dropout=0.25,
                 text_encoder="precomputed", step_size=0.01, lr=3e-5,
                 optim="adam", prototype_dim=proto,
                 compute_dtype=compute_dtype)
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=im_dim,
        text_dim=txt_dim, seed=0)
    spec = EpisodeSpec(batch, 5, 1, 32, im_dim, txt_dim)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)

    flops_step, _ = marginal_cost(family, opt, sampler, 2, 4)
    return flops_step / batch


V5E_BF16_PEAK = 197e12  # TFLOP/s, same row as docs/PERFORMANCE.md


def main():
    out = {}
    for name, kw in SHAPES.items():
        for dt in ("float32", "bfloat16"):
            r = measure(compute_dtype=dt, **kw)
            out[f"{name}/{dt}"] = round(r, 1)
            print(f"{name} {dt}: {r:.1f} eps/s", flush=True)
    for name, kw in SHAPES.items():
        out[f"{name}/bf16_speedup"] = round(
            out[f"{name}/bfloat16"] / out[f"{name}/float32"], 3)
        fpe = flops_per_episode(**kw)
        out[f"{name}/flops_per_episode"] = fpe
        for dt in ("float32", "bfloat16"):
            mfu = out[f"{name}/{dt}"] * fpe / V5E_BF16_PEAK
            out[f"{name}/mfu_{dt}"] = round(mfu, 4)
            print(f"{name} {dt}: MFU {100 * mfu:.1f}%", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
