"""Episode-parallel engine tests on the 8-device virtual CPU mesh:
shard_map steps must reproduce single-device results exactly (dropout off)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.core.mesh import make_mesh, put_episode, put_replicated
from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
from fumi_tpu.parallel import make_parallel_steps
from fumi_tpu.train.steps import make_steps

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

IM_DIM, TXT_DIM = 32, 16


def small_cfg(model, **kw):
    base = dict(
        model=model, im_emb_dim=IM_DIM, text_emb_dim=TXT_DIM,
        im_hid_dim=(32, 16), prototype_dim=16, text_hid_dim=16,
        num_ways=3, num_shots=3, num_shots_test=5,
        num_train_adapt_steps=2, num_test_adapt_steps=3,
        batch_size=8, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        image_embedding_model="resnet-152",
    )
    base.update(kw)
    return Config(**base)


def sample_episode(cfg, seed=0):
    cs, table, ids = synthetic_class_set(
        num_classes=10, images_per_class=20, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=seed)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    return jax.jit(sampler.sample)(jax.random.PRNGKey(seed))


@pytest.mark.parametrize("model", ["maml", "fumi", "am3"])
def test_parallel_matches_serial(model):
    cfg = small_cfg(model)
    mesh = make_mesh(dp=4, mp=1)
    episode = sample_episode(cfg)

    serial = make_steps(cfg, jax.random.PRNGKey(0))
    par = make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)

    # identical initial params by construction (same key)
    chex_eq = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        serial.params, par.params)
    del chex_eq

    rng = jax.random.PRNGKey(42)
    s_state = serial.opt.init(serial.params)
    p_state = par.opt.init(par.params)

    sp, ss, sm = serial.train_step(serial.params, s_state, episode, rng)
    ep_sharded = put_episode(episode, mesh)
    pp, ps, pm = par.train_step(
        put_replicated(par.params, mesh), put_replicated(p_state, mesh),
        ep_sharded, rng)

    assert abs(float(sm["loss"]) - float(pm["loss"])) < 1e-5
    assert abs(float(sm["acc"]) - float(pm["acc"])) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        sp, pp)

    # eval equivalence, including concat'ed preds ordering
    sm_e = serial.eval_step(sp, episode, rng)
    pm_e = par.eval_step(pp, ep_sharded, rng)
    assert abs(float(sm_e["loss"]) - float(pm_e["loss"])) < 1e-5
    assert abs(float(sm_e["acc"]) - float(pm_e["acc"])) < 1e-6
    np.testing.assert_array_equal(np.asarray(sm_e["preds"]),
                                  np.asarray(pm_e["preds"]))
    if model == "am3":
        for k in ("prec", "rec", "f1"):
            assert abs(float(sm_e[k]) - float(pm_e[k])) < 1e-6


def test_batch_size_must_divide():
    cfg = small_cfg("maml", batch_size=6)
    mesh = make_mesh(dp=4, mp=1)
    with pytest.raises(ValueError):
        make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)


def test_parallel_multi_step_training():
    """A few parallel steps actually reduce the loss."""
    cfg = small_cfg("maml", batch_size=8)
    mesh = make_mesh(dp=8, mp=1)
    par = make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)
    params = put_replicated(par.params, mesh)
    state = put_replicated(par.opt.init(par.params), mesh)
    losses = []
    for i in range(8):
        episode = put_episode(sample_episode(cfg, seed=i), mesh)
        params, state, m = par.train_step(params, state, episode,
                                          jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_parallel_chunked_training():
    """Chunked scan-inside-shard_map driver trains on the 8-device mesh."""
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
    from fumi_tpu.parallel.engine import make_parallel_chunked_train
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = small_cfg("fumi", batch_size=8)
    mesh = make_mesh(dp=8, mp=1)
    cs, table, ids = synthetic_class_set(
        num_classes=10, images_per_class=20, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_parallel_chunked_train(cfg, family, opt, sampler, mesh,
                                          chunk=10)
    from fumi_tpu.core.mesh import put_replicated
    params = put_replicated(family.params, mesh)
    state = put_replicated(opt.init(family.params), mesh)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(4):
        params, state, key, ms = chunked(params, state, key)
        losses.append(float(np.asarray(ms["loss"]).mean()))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_chunked_train_carries_sampler_augment():
    """Regression: the chunked drivers must sample with the SAMPLER's
    options — a bare sample_episode call silently drops --augment (the jit
    default is augment_scale=0.0), training unaugmented with no warning."""
    from fumi_tpu.parallel.engine import make_parallel_chunked_train
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = small_cfg("maml", batch_size=8)
    mesh = make_mesh(dp=4, mp=1)
    cs, table, ids = synthetic_class_set(
        num_classes=10, images_per_class=20, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)

    def chunk_losses(augment_scale):
        sampler = DeviceEpisodeSampler(
            jnp.asarray(table), jnp.asarray(ids), cs, spec,
            augment_scale=augment_scale)
        chunked = make_parallel_chunked_train(cfg, family, opt, sampler,
                                              mesh, chunk=2)
        p = put_replicated(family.params, mesh)
        s = put_replicated(opt.init(family.params), mesh)
        _, _, _, ms = chunked(p, s, jax.random.PRNGKey(5))
        return np.asarray(ms["loss"])

    base = chunk_losses(0.0)
    jittered = chunk_losses(0.9)
    assert np.isfinite(base).all() and np.isfinite(jittered).all()
    assert not np.allclose(base, jittered), (base, jittered)


def test_per_shard_rng_stream_semantics():
    """Pin the engine's per-shard PRNG policy (parallel/engine.py): each dp
    shard draws ``fold_in(rng, shard_index)``, so with dropout ON the
    parallel loss equals the mean over shards of the serial train loss on
    that shard's task slice under the folded key — distinct, deterministic
    streams (documented deviation from serial ≡ parallel in PARITY.md)."""
    cfg = small_cfg("fumi", dropout=0.3)
    dp = 4
    mesh = make_mesh(dp=dp, mp=1)
    episode = sample_episode(cfg)
    par = make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)
    rng = jax.random.PRNGKey(7)

    ep_sharded = put_episode(episode, mesh)
    params = put_replicated(par.params, mesh)
    state = put_replicated(par.opt.init(par.params), mesh)
    _, _, m1 = par.train_step(params, state, ep_sharded, rng)
    _, _, m2 = par.train_step(params, state, ep_sharded, rng)
    # deterministic: same key -> same result
    assert float(m1["loss"]) == float(m2["loss"])

    # exact restatement of the intended semantics, shard by shard
    fam = par.family
    per = cfg.batch_size // dp
    losses = []
    for s in range(dp):
        sl = jax.tree_util.tree_map(
            lambda x, s=s: x[s * per:(s + 1) * per], episode)
        k = jax.random.fold_in(rng, s)
        loss, _ = fam.train_loss(par.params, sl, k)
        losses.append(float(loss))
    assert abs(float(m1["loss"]) - float(np.mean(losses))) < 1e-5

    # distinct streams: identical tasks under different shard keys give
    # different dropout masks, hence different losses
    sl0 = jax.tree_util.tree_map(lambda x: x[:per], episode)
    l0 = float(fam.train_loss(par.params, sl0,
                              jax.random.fold_in(rng, 0))[0])
    l1 = float(fam.train_loss(par.params, sl0,
                              jax.random.fold_in(rng, 1))[0])
    assert l0 != l1
