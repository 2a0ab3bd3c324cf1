"""Reptile (--tpu_meta_grad reptile): the pseudo-gradient must equal
mean_t(θ − φ_t) exactly, and the engine must train through the harness."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from fumi_tpu.core.episode import Episode
from fumi_tpu.metalearn.inner_loop import sgd_inner_update
from fumi_tpu.metalearn.reptile import reptile_episode_loss
from fumi_tpu.models import mlp
from fumi_tpu.ops.fewshot import cross_entropy

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

B, N, K, Q, D, H = 2, 3, 2, 4, 10, 6
STEPS, LR_IN = 3, 0.1


def _episode(seed=0):
    rng = np.random.RandomState(seed)
    return Episode(
        support_im=jnp.asarray(rng.randn(B, N * K, D).astype(np.float32)),
        support_text=jnp.zeros((B, N * K, 1), jnp.float32),
        support_text_mask=None,
        support_ids=jnp.zeros((B, N * K), jnp.int32),
        support_y=jnp.asarray(np.tile(np.repeat(np.arange(N), K), (B, 1))
                              .astype(np.int32)),
        query_im=jnp.asarray(rng.randn(B, N * Q, D).astype(np.float32)),
        query_ids=jnp.zeros((B, N * Q), jnp.int32),
        query_y=jnp.asarray(np.tile(np.repeat(np.arange(N), Q), (B, 1))
                            .astype(np.int32)))


def _manual_adapt(params, s_x, s_y):
    p = params
    for _ in range(STEPS):
        g = jax.grad(lambda p_: cross_entropy(mlp.apply(p_, s_x), s_y))(p)
        p = sgd_inner_update(p, g, LR_IN)
    return p


def test_pseudo_gradient_is_theta_minus_phi_mean():
    params = mlp.init(jax.random.PRNGKey(0), D, N, (H,))
    episode = _episode()

    (_loss, aux), grads = jax.value_and_grad(
        lambda p: reptile_episode_loss(mlp.apply, p, episode,
                                       n_steps=STEPS, step_size=LR_IN),
        has_aux=True)(params)
    assert 0.0 <= float(aux["acc"]) <= 1.0

    phis = [ _manual_adapt(params, episode.support_im[t],
                           episode.support_y[t]) for t in range(B) ]
    for li, layer in enumerate(params):
        for k in ("w", "b"):
            want = np.mean([np.asarray(layer[k]) - np.asarray(phis[t][li][k])
                            for t in range(B)], axis=0)
            np.testing.assert_allclose(np.asarray(grads[li][k]), want,
                                       rtol=1e-5, atol=1e-6)


def test_reptile_trains_down_synthetic():
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set

    cs, table, ids = synthetic_class_set(num_classes=8, images_per_class=16,
                                         im_dim=16, text_dim=8, seed=0)
    spec = EpisodeSpec(4, 3, 3, 4, 16, 8)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    params = mlp.init(jax.random.PRNGKey(0), 16, 3, (16, 8))
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        ep = sampler.sample(key)
        (loss, aux), grads = jax.value_and_grad(
            lambda p_: reptile_episode_loss(mlp.apply, p_, ep, n_steps=5,
                                            step_size=0.05),
            has_aux=True)(p)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss, aux["acc"]

    accs = []
    for i in range(40):
        params, state, loss, acc = step(params, state, jax.random.PRNGKey(i))
        accs.append(float(acc))
    assert np.isfinite(accs).all()
    assert np.mean(accs[-10:]) > max(np.mean(accs[:10]), 1.0 / 3 + 0.1)


def test_cli_reptile(tmp_path):
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="maml", dataset="synthetic", im_emb_dim=16,
        im_hid_dim=(16, 8), text_emb_dim=8,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=3, num_test_adapt_steps=5,
        batch_size=4, epochs=8, eval_freq=4, patience=0, num_ep_test=4,
        lr=1e-2, optim="adam", dropout=0.0, text_encoder="precomputed",
        step_size=0.1, log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32", meta_grad="reptile")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


def test_reptile_head_only_rejected():
    from fumi_tpu.core.config import Config
    with pytest.raises(NotImplementedError):
        Config(meta_grad="reptile", adapt_params="head",
               dataset="synthetic").validate()
