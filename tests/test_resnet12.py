"""ResNet-12 raw-image backbone: residual block ≡ torch restatement,
shape/geometry contracts, and the MAML/AM3 integration paths."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.models import resnet12

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow


def _t(w):  # HWIO -> torch OIHW
    return torch.tensor(np.asarray(w).transpose(3, 2, 0, 1))


def _torch_conv_bn(p, x):
    y = torch.nn.functional.conv2d(
        x, _t(p["w"]), torch.tensor(np.asarray(p["b"])), padding="same")
    return torch.nn.functional.batch_norm(
        y, None, None, weight=torch.tensor(np.asarray(p["gamma"])),
        bias=torch.tensor(np.asarray(p["beta"])), training=True,
        eps=resnet12.EPS)


def torch_res_block(p, x):
    lrelu = lambda v: torch.nn.functional.leaky_relu(v, resnet12.LEAK)
    y = lrelu(_torch_conv_bn(p["c1"], x))
    y = lrelu(_torch_conv_bn(p["c2"], y))
    y = _torch_conv_bn(p["c3"], y)
    sc = _torch_conv_bn(p["sc"], x)
    return torch.nn.functional.max_pool2d(lrelu(y + sc), 2)


def test_res_block_matches_torch(rng_np):
    in_ch, out_ch = 3, 8
    p = resnet12.block_init(jax.random.PRNGKey(0), in_ch, out_ch)
    x = rng_np.randn(5, 12, 12, in_ch).astype(np.float32)  # NHWC
    got = np.asarray(resnet12.res_block(p, jnp.asarray(x)))
    want = torch_res_block(
        p, torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_shapes_and_feature_dim():
    channels = (8, 12, 16, 24)
    params = resnet12.init(jax.random.PRNGKey(0), im_size=16,
                           in_channels=3, n_way=5, channels=channels)
    x = jnp.ones((7, 16, 16, 3))
    feats = resnet12.backbone(params, x)
    assert feats.shape == (7, 24)  # global average pool -> channels[-1]
    logits = resnet12.apply(params, x)
    assert logits.shape == (7, 5)
    assert resnet12.feature_dim(16, channels) == 24
    assert resnet12.feature_dim(84) == resnet12.CHANNELS[-1]
    with pytest.raises(ValueError, match="collapses"):
        resnet12.feature_dim(8)  # 4 pools need >= 16


@pytest.mark.slow
def test_maml_resnet12_learns(tmp_path):
    """--im_encoder resnet12 end to end through the CLI: second-order MAML
    adapts the full residual backbone and the loss moves."""
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="maml", dataset="synthetic", im_encoder="resnet12",
        im_size=16, im_channels=3, im_emb_dim=32, text_emb_dim=8,
        resnet12_channels=(8, 12, 16, 24),  # --tpu_resnet12_channels
        num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=1, num_test_adapt_steps=1,
        batch_size=2, epochs=6, eval_freq=3, patience=0, num_ep_test=2,
        lr=1e-3, optim="adam", dropout=0.0, text_encoder="precomputed",
        step_size=0.1, log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


def test_am3_resnet12_encoder():
    """AM3's image encoder accepts the resnet12 backbone + prototype
    projection head."""
    from fumi_tpu.models import text_encoders
    from fumi_tpu.models.am3 import AM3

    enc = text_encoders.make_text_encoder("precomputed",
                                          jax.random.PRNGKey(1), 8)
    model = AM3(im_emb_dim=32, prototype_dim=8, text_encoder=enc,
                text_emb_dim=8, text_hid_dim=8, dropout=0.0,
                fine_tune=False, lamda_fixed=None,
                im_encoder_kind="resnet12", im_size=16, im_channels=3,
                resnet12_channels=(8, 12, 16, 24))
    params = model.init_params(jax.random.PRNGKey(0))
    assert "blocks" in params["image_encoder"]
    x = jnp.ones((2, 6, 16, 16, 3))  # (B, M, H, W, C)
    out = model.encode_image(params, x)
    assert out.shape == (2, 6, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_remat_policy():
    """--tpu_remat auto forces inner-loop rematerialization for resnet12
    at every horizon (its unrolled second-order graph OOMs a 16G chip at
    production geometry, even at bf16 storage) but leaves MLPs/conv4 on
    the horizon threshold; on/off override both. The stage-selective
    experiment switch (measured slower, docs/PERFORMANCE.md) replaces
    whole-step remat with its own pattern when set."""
    from fumi_tpu.core.config import Config
    from fumi_tpu.train.steps import remat_of, resnet12_stage_remat

    base = dict(
        model="maml", dataset="synthetic", im_emb_dim=16, im_hid_dim=(8,),
        text_emb_dim=8, num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=1, num_test_adapt_steps=1, batch_size=2,
        lr=1e-3, dropout=0.0, text_encoder="precomputed", step_size=0.1,
        seed=0)
    assert remat_of(Config(**base)) is None
    assert remat_of(Config(**base, im_encoder="conv4", im_size=16)) is None
    # resnet12 auto = save_convs: whole-step checkpoint that keeps the
    # named conv outputs (measured faster than plain whole-step;
    # _maybe_remat falls back to plain whole-step at long horizons)
    assert remat_of(Config(**base, im_encoder="resnet12",
                           im_size=16)) == "save_convs"
    assert remat_of(Config(**base, remat="on")) is True
    assert remat_of(Config(**base, im_encoder="resnet12", im_size=16,
                           remat="on")) is True
    assert remat_of(Config(**base, im_encoder="resnet12", im_size=16,
                           remat="off")) is False
    with pytest.raises(ValueError, match="tpu_remat"):
        Config(**base, remat="maybe").validate()

    # the experiment override routes resnet12 to per-stage checkpoints
    # (and disables the whole-step remat that would double the recompute)
    r12 = Config(**base, im_encoder="resnet12", im_size=84)
    assert resnet12_stage_remat(r12) is None
    assert resnet12_stage_remat(Config(**base)) is None
    try:
        resnet12.STAGE_REMAT_OVERRIDE = (True, True, False, False)
        assert resnet12_stage_remat(r12) == (True, True, False, False)
        assert remat_of(r12) is None
        assert resnet12_stage_remat(
            Config(**base, im_encoder="resnet12", im_size=84,
                   remat="on")) is None
    finally:
        resnet12.STAGE_REMAT_OVERRIDE = None



def test_stage_remat_is_value_preserving():
    """Per-stage jax.checkpoint changes the memory/recompute schedule,
    never the math: loss and gradients match the store-everything
    program to float tolerance."""
    params = resnet12.init(jax.random.PRNGKey(0), im_size=16, n_way=3,
                           channels=(8, 12, 16, 24))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 16, 16, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (6,), 0, 3)

    def loss(p, sr):
        logits = resnet12.apply(p, x, stage_remat=sr)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    l0, g0 = jax.value_and_grad(loss)(params, None)
    l1, g1 = jax.value_and_grad(loss)(params, (True, True, False, False))
    assert jnp.allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_save_convs_remat_is_value_preserving():
    """The save_convs remat policy (whole-step checkpoint that KEEPS the
    named conv outputs, layers.conv2d_f32acc "conv_out") changes only the
    store/recompute schedule: the second-order MAML meta-loss and
    meta-gradients match whole-step remat to float tolerance."""
    from jax.flatten_util import ravel_pytree

    from fumi_tpu.core.episode import Episode
    from fumi_tpu.metalearn.inner_loop import maml_episode_loss

    key = jax.random.PRNGKey(0)
    params = resnet12.init(key, im_size=16, n_way=2, channels=(4, 6, 8, 8))

    def apply_fn(p, x):
        return resnet12.apply(p, x.reshape(-1, 16, 16, 3),
                              compute_dtype=jnp.bfloat16)

    B, N, K, Q = 1, 2, 2, 2
    ks = jax.random.split(key, 2)
    ep = Episode(
        support_im=jax.random.uniform(ks[0], (B, N * K, 16 * 16 * 3)),
        support_text=jnp.zeros((B, N * K, 4)), support_text_mask=None,
        support_ids=jnp.zeros((B, N * K), jnp.int32),
        support_y=jnp.tile(jnp.repeat(jnp.arange(N), K)[None], (B, 1)),
        query_im=jax.random.uniform(ks[1], (B, N * Q, 16 * 16 * 3)),
        query_ids=jnp.zeros((B, N * Q), jnp.int32),
        query_y=jnp.tile(jnp.repeat(jnp.arange(N), Q)[None], (B, 1)))

    def loss(p, remat):
        return maml_episode_loss(apply_fn, p, ep, n_steps=2,
                                 step_size=0.01, first_order=False,
                                 remat=remat)[0]

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    l1, g1 = jax.jit(
        jax.value_and_grad(lambda p: loss(p, "save_convs")))(params)
    assert jnp.allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ravel_pytree(g0)[0]),
                               np.asarray(ravel_pytree(g1)[0]),
                               rtol=1e-5, atol=1e-6)
