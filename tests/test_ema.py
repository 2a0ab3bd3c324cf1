"""Parameter EMA (--tpu_ema): the optax-chained EMA must track the
post-update parameters exactly, survive the apply_if_finite wrap and the
chunked drivers, and actually be what evaluation sees."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from fumi_tpu.train.optim import EmaState, find_ema, init_optim, params_ema

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow


def test_ema_tracks_post_update_params():
    decay = 0.9
    opt = optax.chain(init_optim("adam", lr=0.1, weight_decay=0.0),
                      params_ema(decay))
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = opt.init(params)
    ema_manual = params
    for i in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.1 * (i + 1)), params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        ema_manual = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, ema_manual, params)
    got = find_ema(state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        got, ema_manual)


def test_find_ema_through_wrappers():
    params = {"w": jnp.ones((2,))}
    opt = optax.apply_if_finite(
        optax.chain(optax.sgd(0.1), params_ema(0.99)), 3)
    state = opt.init(params)
    assert find_ema(state) is not None
    # no EMA in the chain -> None
    assert find_ema(optax.sgd(0.1).init(params)) is None
    # direct state
    assert find_ema(EmaState(ema={"x": 1})) == {"x": 1}


def test_ema_flows_through_chunked_driver():
    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.steps import (build_family, make_chunked_train,
                                      make_opt)

    cfg = Config(model="protonet", dataset="synthetic", im_emb_dim=16,
                 text_emb_dim=8, prototype_dim=8, num_ways=3, num_shots=2,
                 num_shots_test=3, batch_size=4, lr=1e-2, optim="adam",
                 dropout=0.0, text_encoder="precomputed", ema=0.95,
                 prng_impl="threefry2x32")
    cs, table, ids = synthetic_class_set(num_classes=8, images_per_class=16,
                                         im_dim=16, text_dim=8, seed=0)
    spec = EpisodeSpec(4, 3, 2, 3, 16, 8)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_family(cfg, jax.random.PRNGKey(0))
    opt = make_opt(cfg)
    chunked = make_chunked_train(family, opt, sampler, chunk=5)
    p, s, _, _ = chunked(family.params, opt.init(family.params),
                         jax.random.PRNGKey(1), 5)
    ema = find_ema(s)
    assert ema is not None
    # EMA lags the raw params but has moved off the init
    d_raw = float(jnp.sum(jnp.abs(p["w"] - family.params["w"])))
    d_ema = float(jnp.sum(jnp.abs(ema["w"] - family.params["w"])))
    assert 0.0 < d_ema < d_raw


def test_training_run_returns_ema_view(tmp_path):
    """Sharp check that evaluation/return consume the EMA: with decay=1.0
    the EMA never leaves the init, so training_run must hand back EXACTLY
    the initial params (while the ema=0 control returns trained ones)."""
    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.train.logging import MetricWriter
    from fumi_tpu.train.loop import training_run
    from fumi_tpu.train.steps import make_steps

    def run(ema):
        cfg = Config(model="maml", dataset="synthetic", im_emb_dim=16,
                     im_hid_dim=(8,), text_emb_dim=8, num_ways=3,
                     num_shots=2, num_shots_test=3,
                     num_train_adapt_steps=1, num_test_adapt_steps=1,
                     batch_size=4, epochs=6, eval_freq=3, patience=0,
                     num_ep_test=4, lr=1e-2, optim="adam", dropout=0.0,
                     text_encoder="precomputed", step_size=0.1,
                     wandb_offline=True, seed=0,
                     prng_impl="threefry2x32", ema=ema)
        cs, table, ids = synthetic_class_set(
            num_classes=8, images_per_class=16, im_dim=16, text_dim=8,
            seed=0)
        spec = EpisodeSpec(4, 3, 2, 3, 16, 8)
        mk = lambda: DeviceEpisodeSampler(jnp.asarray(table),
                                          jnp.asarray(ids), cs, spec)
        steps = make_steps(cfg, jax.random.PRNGKey(0))
        writer = MetricWriter(str(tmp_path / f"logs{ema}"), use_wandb=False)
        out = training_run(cfg, steps, mk(), mk(), writer,
                           str(tmp_path / f"run{ema}"),
                           jax.random.PRNGKey(1))
        writer.finish()
        return steps.params, out

    init, out_frozen = run(1.0)  # EMA pinned to init
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        init, out_frozen)

    init0, out_raw = run(0.0)  # control: raw params moved
    moved = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(init0),
                                jax.tree_util.tree_leaves(out_raw)))
    assert moved > 0.0


def test_cli_ema_end_to_end(tmp_path):
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="protonet", dataset="synthetic", im_emb_dim=16,
        text_emb_dim=8, prototype_dim=8, num_ways=3, num_shots=2,
        num_shots_test=4, batch_size=8, epochs=20, eval_freq=10,
        patience=0, num_ep_test=8, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", wandb_offline=True, seed=0,
        prng_impl="threefry2x32", ema=0.9, log_dir=str(tmp_path))
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


def test_from_checkpoint_serves_ema(tmp_path):
    """Regression: serving a --tpu_ema checkpoint must use the smoothed
    weights the run validated/selected on, not the raw params."""
    from fumi_tpu.core.config import Config
    from fumi_tpu.serve import FewShotClassifier
    from fumi_tpu.train.checkpoint import save_checkpoint
    from fumi_tpu.train.steps import make_steps

    cfg = Config(model="maml", dataset="synthetic", im_emb_dim=8,
                 im_hid_dim=(6,), text_emb_dim=4, num_ways=3, num_shots=2,
                 num_test_adapt_steps=1, dropout=0.0,
                 text_encoder="precomputed", step_size=0.1, ema=0.9,
                 prng_impl="threefry2x32")
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    # craft an opt_state whose EMA differs measurably from the raw params
    opt_state = steps.opt.init(steps.params)
    raw = jax.tree_util.tree_map(lambda p: p + 1.0, steps.params)
    ema_p = jax.tree_util.tree_map(lambda p: p - 1.0, steps.params)

    def put_ema(state):
        if isinstance(state, EmaState):
            return EmaState(ema=ema_p)
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            return tuple(put_ema(s) for s in state)
        if hasattr(state, "_fields"):
            return type(state)(*[put_ema(getattr(state, f))
                                 for f in state._fields])
        return state

    opt_state = put_ema(opt_state)
    save_checkpoint(str(tmp_path), raw, opt_state, 5, 0.1, is_best=True)

    clf = FewShotClassifier.from_checkpoint(str(tmp_path), cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        clf.params, ema_p)


def test_ema_decay_range_validated():
    import pytest

    from fumi_tpu.core.config import Config

    with pytest.raises(ValueError, match="tpu_ema"):
        Config(dataset="synthetic", ema=1.0).validate()
    with pytest.raises(ValueError, match="tpu_ema"):
        Config(dataset="synthetic", ema=-0.1).validate()
    Config(dataset="synthetic", ema=0.999).validate()


def test_restore_mismatch_error_names_flags(tmp_path):
    """Regression: restoring an --tpu_ema checkpoint WITHOUT the flag must
    raise an error naming the saved flags, not an opaque pytree error."""
    import dataclasses

    import pytest

    from fumi_tpu.core.config import Config
    from fumi_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from fumi_tpu.train.steps import make_steps

    cfg = Config(model="maml", dataset="synthetic", im_emb_dim=8,
                 im_hid_dim=(6,), text_emb_dim=4, num_ways=3,
                 dropout=0.0, text_encoder="precomputed", ema=0.9,
                 prng_impl="threefry2x32")
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), steps.params,
                    steps.opt.init(steps.params), 1, 0.5, is_best=False,
                    extra_meta={"model": "maml",
                                "args": dataclasses.asdict(cfg)})

    plain = make_steps(cfg.replace(ema=0.0), jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="ema"):
        load_checkpoint(str(tmp_path), plain.params,
                        plain.opt.init(plain.params), best=False)
