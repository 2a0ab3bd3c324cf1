"""ANIL (--tpu_adapt_params head): head-only inner adaptation must leave
the body untouched inside the inner loop, track a torch restatement over a
training trajectory, and run end to end through the CLI."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from fumi_tpu.core.episode import Episode
from fumi_tpu.metalearn.inner_loop import (head_only_mask,
                                           maml_episode_loss,
                                           sgd_inner_update)
from fumi_tpu.models import mlp
from fumi_tpu.train.optim import init_optim

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

B, N, K, Q, D, H = 2, 3, 2, 4, 10, 6
STEPS, LR_IN, LR_OUT, WD = 2, 0.1, 1e-2, 5e-4
N_UPDATES = 20


def test_masked_update_freezes_body():
    params = mlp.init(jax.random.PRNGKey(0), D, N, (H,))
    mask = head_only_mask(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    out = sgd_inner_update(params, grads, 0.5, mask)
    for i, (p, o) in enumerate(zip(params, out)):
        if i == len(params) - 1:
            np.testing.assert_allclose(np.asarray(o["w"]),
                                       np.asarray(p["w"]) - 0.5)
        else:
            np.testing.assert_array_equal(np.asarray(o["w"]),
                                          np.asarray(p["w"]))


def test_head_only_mask_raw_backbone_layout():
    from fumi_tpu.models import conv4
    params = conv4.init(jax.random.PRNGKey(0), im_size=16, n_way=N)
    mask = head_only_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["head"]))
    assert not any(jax.tree_util.tree_leaves(mask["convs"]))


def _episodes(rng, n):
    eps = []
    for _ in range(n):
        s = rng.randn(B, N * K, D).astype(np.float32)
        q = rng.randn(B, N * Q, D).astype(np.float32)
        s_y = np.tile(np.repeat(np.arange(N), K)[None], (B, 1))
        q_y = np.tile(np.repeat(np.arange(N), Q)[None], (B, 1))
        eps.append((s, s_y.astype(np.int64), q, q_y.astype(np.int64)))
    return eps


def _torch_anil_train(params_np, episodes):
    tparams = [[torch.tensor(p["w"], requires_grad=True),
                torch.tensor(p["b"], requires_grad=True)]
               for p in params_np]
    flat = [p for pair in tparams for p in pair]
    opt = torch.optim.Adam(flat, lr=LR_OUT, weight_decay=WD)

    def fwd(ps, x):
        for (w, b) in ps[:-1]:
            x = torch.relu(torch.nn.functional.linear(x, w, b))
        w, b = ps[-1]
        return torch.nn.functional.linear(x, w, b)

    losses = []
    for (s, s_y, q, q_y) in episodes:
        outer = torch.tensor(0.0)
        for t in range(B):
            ps = [tuple(pair) for pair in tparams]
            for _ in range(STEPS):
                inner = torch.nn.functional.cross_entropy(
                    fwd(ps, torch.tensor(s[t])), torch.tensor(s_y[t]))
                hw, hb = ps[-1]
                gw, gb = torch.autograd.grad(inner, [hw, hb],
                                             create_graph=True)
                ps = ps[:-1] + [(hw - LR_IN * gw, hb - LR_IN * gb)]
            outer = outer + torch.nn.functional.cross_entropy(
                fwd(ps, torch.tensor(q[t])), torch.tensor(q_y[t]))
        outer = outer / B
        opt.zero_grad()
        outer.backward()
        opt.step()
        losses.append(float(outer.detach()))
    return losses, tparams


def test_anil_training_trajectory_matches_torch():
    rng = np.random.RandomState(21)
    episodes = _episodes(rng, N_UPDATES)
    params = mlp.init(jax.random.PRNGKey(0), D, N, (H,))
    params_np = [{k: np.asarray(v) for k, v in p.items()} for p in params]
    mask = head_only_mask(params)
    opt = init_optim("adam", lr=LR_OUT, weight_decay=WD)
    state = opt.init(params)

    @jax.jit
    def step(p, s, episode):
        (loss, _), grads = jax.value_and_grad(
            lambda p_: maml_episode_loss(
                mlp.apply, p_, episode, n_steps=STEPS, step_size=LR_IN,
                first_order=False, adapt_mask=mask), has_aux=True)(p)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss

    jax_losses = []
    for (s, s_y, q, q_y) in episodes:
        episode = Episode(
            support_im=jnp.asarray(s),
            support_text=jnp.zeros((B, N * K, 1), jnp.float32),
            support_text_mask=None,
            support_ids=jnp.zeros((B, N * K), jnp.int32),
            support_y=jnp.asarray(s_y.astype(np.int32)),
            query_im=jnp.asarray(q),
            query_ids=jnp.zeros((B, N * Q), jnp.int32),
            query_y=jnp.asarray(q_y.astype(np.int32)))
        params, state, loss = step(params, state, episode)
        jax_losses.append(float(loss))

    torch_losses, torch_final = _torch_anil_train(params_np, episodes)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=2e-4)
    for jp, (tw, _tb) in zip(params, torch_final):
        np.testing.assert_allclose(np.asarray(jp["w"]),
                                   tw.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_cli_anil(tmp_path):
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config

    cfg = Config(
        model="maml", dataset="synthetic", im_emb_dim=16,
        im_hid_dim=(16, 8), text_emb_dim=8,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=4,
        batch_size=4, epochs=8, eval_freq=4, patience=0, num_ep_test=4,
        lr=1e-2, optim="adam", dropout=0.0, text_encoder="precomputed",
        step_size=0.1, log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32", adapt_params="head")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0
