"""FuMI hypernetwork inner-loop parity vs an independent torch restatement of
the reference semantics (fumi/models/fumi.py:115-218): per-class text → the
generated head via hyper_net; inner loop jointly adapts the base im_net
(2nd-order SGD) and the hypernet OUTPUT (manual create_graph step); outer
grads flow to hyper_net and im_net initial params."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from fumi_tpu.core.episode import Episode
from fumi_tpu.metalearn import fumi_episode_loss
from fumi_tpu.models import fumi as fumi_model
from fumi_tpu.models import text_encoders

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

B, N, K, Q = 2, 3, 2, 4
D_IM, E_TXT, H_TXT = 8, 5, 7
IM_HID = (6, 4)
STEPS, LR = 3, 0.1


def build_model():
    enc = text_encoders.make_text_encoder("precomputed", jax.random.PRNGKey(1),
                                          E_TXT)
    model = fumi_model.FUMI(
        n_way=N, im_emb_dim=D_IM, im_hid_dim=IM_HID,
        text_encoder=enc, text_emb_dim=E_TXT, text_hid_dim=H_TXT,
        dropout_rate=0.0, norm_hypernet=False, fine_tune=False,
        init_bias=False)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def make_episode(rng):
    s_im = rng.randn(B, N * K, D_IM).astype(np.float32)
    q_im = rng.randn(B, N * Q, D_IM).astype(np.float32)
    s_tx = rng.randn(B, N * K, E_TXT).astype(np.float32)
    s_y = np.tile(np.repeat(np.arange(N), K)[None], (B, 1)).astype(np.int64)
    q_y = np.tile(np.repeat(np.arange(N), Q)[None], (B, 1)).astype(np.int64)
    for b in range(B):
        rng.shuffle(s_y[b]); rng.shuffle(q_y[b])
    return s_im, s_tx, s_y, q_im, q_y


def torch_fumi(params, s_im, s_tx, s_y, q_im, q_y, norm_hypernet=False):
    """Torch restatement of ref fumi.py:148-193 for one meta-batch."""
    h1w = torch.tensor(np.asarray(params["hyper_net"][0]["w"]),
                       requires_grad=True)
    h1b = torch.tensor(np.asarray(params["hyper_net"][0]["b"]),
                       requires_grad=True)
    h2w = torch.tensor(np.asarray(params["hyper_net"][1]["w"]),
                       requires_grad=True)
    h2b = torch.tensor(np.asarray(params["hyper_net"][1]["b"]),
                       requires_grad=True)
    im_ps = [(torch.tensor(np.asarray(p["w"]), requires_grad=True),
              torch.tensor(np.asarray(p["b"]), requires_grad=True))
             for p in params["im_net"]]

    def hyper_fwd(x):
        h = torch.relu(torch.nn.functional.linear(x, h1w, h1b))
        out = torch.nn.functional.linear(h, h2w, h2b)
        return torch.tanh(out) if norm_hypernet else out

    def im_base(ps, x):
        for (w, b) in ps:
            x = torch.relu(torch.nn.functional.linear(x, w, b))
        return x

    def im_forward(ps, hyper, x):
        out = im_base(ps, x)
        # ref fumi.py:214-218
        out = torch.matmul(out, hyper[:, :-1].unsqueeze(2).transpose(0, 2)
                           .squeeze(0))  # (M, n_way) == out @ W.T
        return out + hyper[:, -1]

    outer_loss = torch.tensor(0.0)
    for t in range(B):
        text = torch.tensor(s_tx[t])
        tgt = torch.tensor(s_y[t])
        # first support sample per class (ref fumi.py:207-210)
        class_enc = torch.stack(
            [text[(tgt == i).nonzero(as_tuple=True)[0][0]]
             for i in range(N)])
        hyper = hyper_fwd(class_enc)
        ps = [(w, b) for (w, b) in im_ps]
        for _ in range(STEPS):
            logit = im_forward(ps, hyper, torch.tensor(s_im[t]))
            inner = torch.nn.functional.cross_entropy(logit, tgt)
            # manual hyper grad step (ref fumi.py:165-168)
            g_h = torch.autograd.grad(inner, hyper, create_graph=True,
                                      retain_graph=True)[0]
            # base params step, 2nd order (ref fumi.py:172-176)
            flat = [p for pair in ps for p in pair]
            g_im = torch.autograd.grad(inner, flat, create_graph=True)
            hyper = hyper - LR * g_h
            ps = [(flat[2 * i] - LR * g_im[2 * i],
                   flat[2 * i + 1] - LR * g_im[2 * i + 1])
                  for i in range(len(ps))]
        q_logit = im_forward(ps, hyper, torch.tensor(q_im[t]))
        outer_loss = outer_loss + torch.nn.functional.cross_entropy(
            q_logit, torch.tensor(q_y[t]))
    outer_loss = outer_loss / B
    outer_loss.backward()
    return (float(outer_loss.detach()),
            {"h1w": h1w.grad.numpy(), "h1b": h1b.grad.numpy(),
             "h2w": h2w.grad.numpy(), "h2b": h2b.grad.numpy(),
             "im": [(w.grad.numpy(), b.grad.numpy()) for (w, b) in im_ps]})


def test_fumi_matches_torch():
    rng = np.random.RandomState(3)
    s_im, s_tx, s_y, q_im, q_y = make_episode(rng)
    model, params = build_model()
    episode = Episode(
        support_im=jnp.asarray(s_im),
        support_text=jnp.asarray(s_tx),
        support_text_mask=None,
        support_ids=jnp.zeros((B, N * K), jnp.int32),
        support_y=jnp.asarray(s_y.astype(np.int32)),
        query_im=jnp.asarray(q_im),
        query_ids=jnp.zeros((B, N * Q), jnp.int32),
        query_y=jnp.asarray(q_y.astype(np.int32)),
    )

    def loss_fn(p):
        return fumi_episode_loss(model, p, episode, n_steps=STEPS,
                                 step_size=LR, rng=jax.random.PRNGKey(9),
                                 train=True)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    t_loss, t_grads = torch_fumi(params, s_im, s_tx, s_y, q_im, q_y)

    assert abs(float(loss) - t_loss) < 1e-5, (float(loss), t_loss)
    np.testing.assert_allclose(np.asarray(grads["hyper_net"][0]["w"]),
                               t_grads["h1w"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["hyper_net"][0]["b"]),
                               t_grads["h1b"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["hyper_net"][1]["w"]),
                               t_grads["h2w"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["hyper_net"][1]["b"]),
                               t_grads["h2b"], rtol=1e-4, atol=1e-6)
    for jg, (tw, tb) in zip(grads["im_net"], t_grads["im"]):
        np.testing.assert_allclose(np.asarray(jg["w"]), tw,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(jg["b"]), tb,
                                   rtol=1e-4, atol=1e-6)


def test_hypernet_bias_init():
    """--hypernet_bias_init: zero head weight, normc bias (ref fumi.py:81-84,
    hypernet_init.py:137-167)."""
    enc = text_encoders.make_text_encoder("precomputed", jax.random.PRNGKey(1),
                                          E_TXT)
    model = fumi_model.FUMI(
        n_way=N, im_emb_dim=D_IM, im_hid_dim=IM_HID, text_encoder=enc,
        text_emb_dim=E_TXT, text_hid_dim=H_TXT, dropout_rate=0.0,
        norm_hypernet=False, fine_tune=False, init_bias=True)
    params = model.init_params(jax.random.PRNGKey(0))
    head = params["hyper_net"][1]
    assert float(jnp.max(jnp.abs(head["w"]))) == 0.0
    # normc with gain sqrt(2): row norm == sqrt(2)
    norm = float(jnp.linalg.norm(head["b"]))
    assert abs(norm - np.sqrt(2.0)) < 1e-5


def test_init_all_layers_raises():
    enc = text_encoders.make_text_encoder("precomputed", jax.random.PRNGKey(1),
                                          E_TXT)
    model = fumi_model.FUMI(
        n_way=N, im_emb_dim=D_IM, im_hid_dim=IM_HID, text_encoder=enc,
        text_emb_dim=E_TXT, text_hid_dim=H_TXT, dropout_rate=0.0,
        norm_hypernet=False, fine_tune=False, init_bias=False,
        init_all_layers=True)
    try:
        model.init_params(jax.random.PRNGKey(0))
        assert False, "expected NotImplementedError"
    except NotImplementedError:
        pass


def test_zero_shot_fumi():
    """BASELINE config 5: zero-shot FuMI — 0 adaptation steps classifies
    queries with the text-conditioned generated head alone."""
    rng = np.random.RandomState(3)
    s_im, s_tx, s_y, q_im, q_y = make_episode(rng)
    model, params = build_model()
    episode = Episode(
        support_im=jnp.asarray(s_im),
        support_text=jnp.asarray(s_tx),
        support_text_mask=None,
        support_ids=jnp.zeros((B, N * K), jnp.int32),
        support_y=jnp.asarray(s_y.astype(np.int32)),
        query_im=jnp.asarray(q_im),
        query_ids=jnp.zeros((B, N * Q), jnp.int32),
        query_y=jnp.asarray(q_y.astype(np.int32)),
    )
    loss, aux = fumi_episode_loss(model, params, episode, n_steps=0,
                                  step_size=LR, rng=jax.random.PRNGKey(0),
                                  train=False)
    assert np.isfinite(float(loss))
    assert aux["preds"].shape == (B, N * Q)
    # gradients still flow to the hypernet (pure zero-shot training works)
    g = jax.grad(lambda p: fumi_episode_loss(
        model, p, episode, n_steps=0, step_size=LR,
        rng=jax.random.PRNGKey(0), train=True)[0])(params)
    assert float(jnp.max(jnp.abs(g["hyper_net"][0]["w"]))) > 0
