"""Conv4 raw-image backbone: forward parity vs torch, and MAML adaptation
over raw images (the capability the reference leaves as a TODO,
ref am3.py:44-46; BASELINE config 'MAML image-only Conv4')."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data.sampler import DeviceEpisodeSampler
from fumi_tpu.data.synthetic import synthetic_raw_image_set
from fumi_tpu.models import conv4
from fumi_tpu.train.loop import test_loop as run_test_loop
from fumi_tpu.train.steps import make_steps

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow


def test_conv_block_matches_torch(rng_np):
    """conv + batch-stat norm + relu + maxpool == torch equivalents."""
    in_ch, out_ch, S, M = 3, 8, 12, 4
    p = conv4.conv_init(jax.random.PRNGKey(0), in_ch, out_ch)
    x = rng_np.randn(M, S, S, in_ch).astype(np.float32)
    got = np.asarray(conv4.conv_block(p, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
    sd = tconv.state_dict()
    # HWIO -> OIHW
    sd["weight"] = torch.tensor(
        np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    sd["bias"] = torch.tensor(np.asarray(p["b"]))
    tconv.load_state_dict(sd)
    bn = torch.nn.BatchNorm2d(out_ch, eps=conv4.EPS, affine=True)
    bn.train()  # batch statistics
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(np.asarray(p["gamma"])))
        bn.bias.copy_(torch.tensor(np.asarray(p["beta"])))
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))  # NCHW
    with torch.no_grad():
        y = torch.relu(bn(tconv(xt)))
        y = torch.nn.functional.max_pool2d(y, 2)
    want = np.transpose(y.numpy(), (0, 2, 3, 1))  # NHWC
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_maxpool_impls_agree(rng_np):
    """All maxpool2x2 formulations (reduce_window default, the fusable
    'reshape' used by the conv bench ladder, the 'slices' form kept as the
    measured-fault record — docs/PERFORMANCE.md) are bitwise equal, values
    AND gradients, odd dims included."""
    for shape in ((3, 12, 12, 8), (2, 13, 11, 4)):
        x = jnp.asarray(rng_np.randn(*shape).astype(np.float32))

        def pooled_sum(x_, impl):
            old = conv4.POOL_IMPL
            conv4.POOL_IMPL = impl
            try:
                return jnp.sum(conv4.maxpool2x2(x_) * 1.7)
            finally:
                conv4.POOL_IMPL = old

        v0 = g0 = None
        for impl in ("reduce_window", "reshape", "slices"):
            v, g = jax.value_and_grad(pooled_sum)(x, impl)
            if v0 is None:
                v0, g0 = v, g
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v))
            np.testing.assert_array_equal(np.asarray(g0), np.asarray(g))


def test_conv4_shapes():
    params = conv4.init(jax.random.PRNGKey(0), im_size=28, in_channels=3,
                        n_way=5)
    x = jnp.zeros((7, 28, 28, 3))
    logits = conv4.apply(params, x)
    assert logits.shape == (7, 5)
    assert conv4.feature_dim(28) == 1 * 1 * 64
    assert conv4.feature_dim(84) == 5 * 5 * 64


def test_maml_conv4_learns():
    cfg = Config(
        model="maml", dataset="synthetic", im_encoder="conv4",
        im_size=16, im_channels=3, num_ways=3, num_shots=3,
        num_shots_test=5, num_train_adapt_steps=3, num_test_adapt_steps=3,
        batch_size=4, lr=1e-3, optim="adam", step_size=0.05,
        prng_impl="threefry2x32")
    cs, table, ids = synthetic_raw_image_set(num_classes=8,
                                             images_per_class=12,
                                             im_size=16, noise=3.0, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, im_dim=0, text_dim=16)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    params = steps.params
    opt_state = steps.opt.init(params)

    ep0 = jax.jit(sampler.sample)(jax.random.PRNGKey(100))
    assert ep0.support_im.shape == (4, 9, 16, 16, 3)
    before = steps.eval_step(params, ep0, jax.random.PRNGKey(5))

    for i in range(8):
        ep = jax.jit(sampler.sample)(jax.random.PRNGKey(i))
        params, opt_state, m = steps.train_step(params, opt_state, ep,
                                                jax.random.PRNGKey(1000 + i))
    after = steps.eval_step(params, ep0, jax.random.PRNGKey(5))
    assert np.isfinite(float(after["loss"]))
    # tolerance: the two means can land on the same accuracy (e.g. 0.45)
    # with different fp summation rounding
    assert float(after["acc"]) >= float(before["acc"]) - 1e-6
    assert float(after["loss"]) < float(before["loss"]), \
        (float(before["loss"]), float(after["loss"]))


def test_am3_conv4_episode():
    """AM3 with the conv4 raw-image encoder runs an episode end to end."""
    from fumi_tpu.train.steps import make_steps as mk
    cfg = Config(
        model="am3", dataset="synthetic", im_encoder="conv4",
        im_size=16, im_channels=3, prototype_dim=8, text_hid_dim=8,
        text_emb_dim=16, num_ways=3, num_shots=2, num_shots_test=4,
        batch_size=2, lr=1e-3, optim="adam", dropout=0.0,
        text_encoder="precomputed", prng_impl="threefry2x32")
    cs, table, ids = synthetic_raw_image_set(num_classes=6,
                                             images_per_class=10,
                                             im_size=16, seed=1)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, im_dim=0, text_dim=16)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    steps = mk(cfg, jax.random.PRNGKey(0))
    params, opt_state = steps.params, steps.opt.init(steps.params)
    ep = jax.jit(sampler.sample)(jax.random.PRNGKey(0))
    params, opt_state, m = steps.train_step(params, opt_state, ep,
                                            jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    em = steps.eval_step(params, ep, jax.random.PRNGKey(2))
    assert np.isfinite(float(em["loss"])) and "f1" in em
