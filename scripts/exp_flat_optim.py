"""Experiment: does flattening the params pytree into ONE vector for the
optimizer reduce per-step kernel count enough to matter?

Hypothesis: the train step is kernel-issue-bound (9.3% MFU,
scripts/mfu.py).
optax applies Adam leaf-by-leaf (~10 leaves × ~6 elementwise kernels);
running the moment math on a single raveled vector cuts that to ~6 kernels
+ concat/split glue. Measures the production chunked driver both ways on
the flagship FuMI config.

Run on TPU:  python scripts/exp_flat_optim.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flat_wrap(inner):
    """Wrap a GradientTransformation to run on the raveled flat vector."""
    import jax
    import optax
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, unravel = ravel_pytree(params)
        return (inner.init(flat),)

    def update(updates, state, params=None):
        flat_u, unravel = ravel_pytree(updates)
        flat_p, _ = ravel_pytree(params) if params is not None else (None,
                                                                     None)
        new_u, inner_state = inner.update(flat_u, state[0], flat_p)
        return unravel(new_u), (inner_state,)

    import optax
    return optax.GradientTransformation(init, update)


def bench_variant(flat: bool, chunk: int = 1000, iters: int = 3) -> float:
    import jax
    import numpy as np
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax
    from bench import BATCH, IM_DIM, K_SHOT, N_WAY, Q_TRAIN, TXT_DIM, \
        _bench_cfg
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.optim import init_optim
    from fumi_tpu.train.steps import build_family, make_chunked_train

    cfg = _bench_cfg("fumi")
    cs, table, ids = synthetic_class_set(
        num_classes=64, images_per_class=64, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(BATCH, N_WAY, K_SHOT, Q_TRAIN, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = init_optim("adam", cfg.lr, cfg.weight_decay)
    if flat:
        opt = flat_wrap(opt)
    chunked = make_chunked_train(family, opt, sampler, chunk)
    params = family.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    params, opt_state, key, ms = chunked(params, opt_state, key, chunk)
    _ = float(np.asarray(ms["loss"])[-1])
    best = 0.0
    for _i in range(iters):
        t0 = time.perf_counter()
        params, opt_state, key, ms = chunked(params, opt_state, key, chunk)
        _ = float(np.asarray(ms["loss"])[-1])
        best = max(best, chunk * BATCH / (time.perf_counter() - t0))
    return best


def main():
    base = bench_variant(flat=False)
    flat = bench_variant(flat=True)
    print(json.dumps({"baseline_eps": round(base, 1),
                      "flat_optim_eps": round(flat, 1),
                      "speedup": round(flat / base, 4)}))


if __name__ == "__main__":
    main()
