"""Optimizer parity vs torch/HF (ref: fumi/utils/utils.py:277-299)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax
import pytest

from fumi_tpu.train.optim import init_optim, linear_warmup_schedule


def run_optax(opt, w0, grads_seq):
    w = jnp.asarray(w0)
    state = opt.init(w)
    for g in grads_seq:
        updates, state = opt.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


def run_torch(make_opt, w0, grads_seq):
    w = torch.tensor(np.array(w0), requires_grad=True)
    opt = make_opt([w])
    for g in grads_seq:
        opt.zero_grad()
        w.grad = torch.tensor(np.array(g))
        opt.step()
    return w.detach().numpy()


@pytest.fixture
def problem(rng_np):
    w0 = rng_np.randn(4, 3).astype(np.float32)
    grads = [rng_np.randn(4, 3).astype(np.float32) for _ in range(5)]
    return w0, grads


def test_adam_matches_torch(problem):
    w0, grads = problem
    got = run_optax(init_optim("adam", lr=1e-2, weight_decay=5e-4),
                    w0, grads)
    want = run_torch(lambda p: torch.optim.Adam(p, lr=1e-2, weight_decay=5e-4),
                     w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sgd_matches_torch(problem):
    w0, grads = problem
    got = run_optax(init_optim("SGD", lr=1e-2, weight_decay=5e-4,
                               momentum=0.9), w0, grads)
    want = run_torch(
        lambda p: torch.optim.SGD(p, lr=1e-2, weight_decay=5e-4,
                                  momentum=0.9), w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch(problem):
    w0, grads = problem
    got = run_optax(init_optim("adamw", lr=1e-2), w0, grads)
    # HF AdamW == torch AdamW with weight_decay=0, eps=1e-6
    want = run_torch(
        lambda p: torch.optim.AdamW(p, lr=1e-2, weight_decay=0.0, eps=1e-6),
        w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_linear_warmup_schedule():
    sched = linear_warmup_schedule(1.0, num_warmup_steps=10,
                                   num_training_steps=100)
    assert abs(float(sched(0))) < 1e-9
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(55)) - 0.5) < 1e-6
    assert abs(float(sched(100))) < 1e-9


def test_adamw_lin_schedule_inactive_is_constant(problem):
    w0, grads = problem
    got_inactive = run_optax(
        init_optim("adamw_lin_schedule", lr=1e-2, schedule_active=False),
        w0, grads)
    got_adamw = run_optax(init_optim("adamw", lr=1e-2), w0, grads)
    np.testing.assert_allclose(got_inactive, got_adamw, rtol=1e-7)


def test_frozen_mask_preserves_opt_state_structure():
    """The frozen-text-encoder update mask must be state-TRANSPARENT:
    wrapping the optimizer may not change the optimizer-state pytree
    structure, or every previously-saved checkpoint of frozen-encoder
    configs (glove/w2v/RNN/RNNhid with fine_tune off, rand) becomes
    unrestorable."""
    import jax
    import jax.numpy as jnp

    from fumi_tpu.core.config import Config
    from fumi_tpu.train.steps import frozen_text_encoder, make_opt

    params = {"text_encoder": {"embed": jnp.ones((4, 3))},
              "image_encoder": {"w": jnp.ones((3, 2)),
                                "b": jnp.zeros((2,))}}
    frozen_cfg = Config(model="am3", text_encoder="glove", fine_tune=False,
                        optim="adam", weight_decay=5e-4)
    plain_cfg = Config(model="am3", text_encoder="precomputed",
                       optim="adam", weight_decay=5e-4)
    assert frozen_text_encoder(frozen_cfg)
    assert not frozen_text_encoder(plain_cfg)
    s_frozen = make_opt(frozen_cfg).init(params)
    s_plain = make_opt(plain_cfg).init(params)
    assert jax.tree_util.tree_structure(s_frozen) == \
        jax.tree_util.tree_structure(s_plain)

    # and the mask still works: frozen subtree's update is exactly zero
    # even under coupled-L2 weight decay
    opt = make_opt(frozen_cfg)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = opt.update(grads, s_frozen, params)
    assert float(jnp.abs(updates["text_encoder"]["embed"]).max()) == 0.0
    # the un-frozen subtree DOES decay from the same zero gradient
    assert float(jnp.abs(updates["image_encoder"]["w"]).max()) > 0.0
