"""End-to-end training-trajectory parity: our MAML training path (episode
loss + meta-grads + torch-matched Adam) must track an independent torch
implementation step-for-step over dozens of updates when fed identical
episodes from identical initial params.

This is the strongest numeric-fidelity statement we can make without the
reference's full stack: it exercises meta-gradient math, optimizer
semantics, and update application jointly over a long horizon.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from fumi_tpu.core.episode import Episode
from fumi_tpu.metalearn import maml_episode_loss
from fumi_tpu.models import mlp
from fumi_tpu.train.optim import init_optim

B, N, K, Q, D, H = 2, 3, 2, 5, 16, 8
STEPS, LR_INNER, LR_OUTER, WD = 2, 0.1, 1e-2, 5e-4
N_UPDATES = 40


def make_episodes(rng, n):
    eps = []
    for _ in range(n):
        s_im = rng.randn(B, N * K, D).astype(np.float32)
        q_im = rng.randn(B, N * Q, D).astype(np.float32)
        s_y = np.tile(np.repeat(np.arange(N), K)[None], (B, 1))
        q_y = np.tile(np.repeat(np.arange(N), Q)[None], (B, 1))
        eps.append((s_im, s_y.astype(np.int64), q_im, q_y.astype(np.int64)))
    return eps


def torch_train(params_np, episodes):
    tparams = [[torch.tensor(p["w"], requires_grad=True),
                torch.tensor(p["b"], requires_grad=True)]
               for p in params_np]
    flat_params = [p for pair in tparams for p in pair]
    opt = torch.optim.Adam(flat_params, lr=LR_OUTER, weight_decay=WD)

    def fwd(ps, x):
        for (w, b) in ps[:-1]:
            x = torch.relu(torch.nn.functional.linear(x, w, b))
        w, b = ps[-1]
        return torch.nn.functional.linear(x, w, b)

    losses = []
    for (s_im, s_y, q_im, q_y) in episodes:
        outer = torch.tensor(0.0)
        for t in range(B):
            ps = [tuple(pair) for pair in tparams]
            for _ in range(STEPS):
                logit = fwd(ps, torch.tensor(s_im[t]))
                inner = torch.nn.functional.cross_entropy(
                    logit, torch.tensor(s_y[t]))
                flat = [p for pair in ps for p in pair]
                grads = torch.autograd.grad(inner, flat, create_graph=True)
                ps = [(flat[2 * i] - LR_INNER * grads[2 * i],
                       flat[2 * i + 1] - LR_INNER * grads[2 * i + 1])
                      for i in range(len(ps))]
            q_logit = fwd(ps, torch.tensor(q_im[t]))
            outer = outer + torch.nn.functional.cross_entropy(
                q_logit, torch.tensor(q_y[t]))
        outer = outer / B
        opt.zero_grad()
        outer.backward()
        opt.step()
        losses.append(float(outer.detach()))
    return losses, tparams


def test_maml_training_trajectory_matches_torch():
    rng = np.random.RandomState(11)
    episodes = make_episodes(rng, N_UPDATES)

    params = mlp.init(jax.random.PRNGKey(0), D, N, (H,))
    params_np = [{k: np.asarray(v) for k, v in p.items()} for p in params]

    opt = init_optim("adam", lr=LR_OUTER, weight_decay=WD)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, episode):
        def loss_fn(p_):
            return maml_episode_loss(mlp.apply, p_, episode, n_steps=STEPS,
                                     step_size=LR_INNER, first_order=False)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    jax_losses = []
    for (s_im, s_y, q_im, q_y) in episodes:
        episode = Episode(
            support_im=jnp.asarray(s_im),
            support_text=jnp.zeros((B, N * K, 1), jnp.float32),
            support_text_mask=None,
            support_ids=jnp.zeros((B, N * K), jnp.int32),
            support_y=jnp.asarray(s_y.astype(np.int32)),
            query_im=jnp.asarray(q_im),
            query_ids=jnp.zeros((B, N * Q), jnp.int32),
            query_y=jnp.asarray(q_y.astype(np.int32)),
        )
        params, opt_state, loss = train_step(params, opt_state, episode)
        jax_losses.append(float(loss))

    torch_losses, torch_final = torch_train(params_np, episodes)

    # per-step losses track to fp32 accumulation error over 40 updates
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=2e-4)
    # final parameters agree
    for jp, (tw, tb) in zip(params, torch_final):
        np.testing.assert_allclose(np.asarray(jp["w"]), tw.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jp["b"]), tb.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)
    # sanity: training actually moved the loss
    assert jax_losses[-1] < jax_losses[0]
