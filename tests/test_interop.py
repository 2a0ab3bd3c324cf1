"""Torch-checkpoint interop: reference ``.pth.tar`` import/export.

Fast tier: pure structural round-trips (no torch). Slow tier: parity
against real reference-shaped ``nn.Module``s — forward equivalence of
imported weights, Adam-moment carry-over (one further identical step),
and export files restorable by torch ``load_state_dict(strict=True)`` +
``Optimizer.load_state_dict`` (what the reference's ``load_checkpoint``
calls, ref utils.py:422-441).
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fumi_tpu import interop
from fumi_tpu.models import am3 as am3_model
from fumi_tpu.models import clip as clip_model
from fumi_tpu.models import fumi as fumi_model
from fumi_tpu.models import mlp
from fumi_tpu.models import text_encoders

D_IM, P, E, H = 8, 6, 5, 7
N = 3
HID = (6, 4)
VOCAB = {"<PAD>": 0, "a": 1, "b": 2, "cat": 3, "dog": 4, "fish": 5}
E_RNN = 4  # total biLSTM width (2 per direction)


def build_maml():
    return mlp.init(jax.random.PRNGKey(0), D_IM, N, HID)


def build_am3(kind="precomputed"):
    enc = text_encoders.make_text_encoder(
        kind, jax.random.PRNGKey(1),
        E_RNN if kind in ("RNN", "RNNhid") else E,
        dictionary=VOCAB if kind not in ("precomputed", "BERT") else None)
    model = am3_model.AM3(
        im_emb_dim=D_IM, prototype_dim=P, text_encoder=enc,
        text_emb_dim=enc.out_dim, text_hid_dim=H, dropout=0.0,
        fine_tune=False, lamda_fixed=None)
    return model, model.init_params(jax.random.PRNGKey(0))


def build_fumi(kind="precomputed", norm=False):
    enc = text_encoders.make_text_encoder(
        kind, jax.random.PRNGKey(1), E,
        dictionary=VOCAB if kind not in ("precomputed", "BERT") else None)
    model = fumi_model.FUMI(
        n_way=N, im_emb_dim=D_IM, im_hid_dim=HID, text_encoder=enc,
        text_emb_dim=enc.out_dim, text_hid_dim=H, dropout_rate=0.0,
        norm_hypernet=norm, fine_tune=False, init_bias=False)
    return model, model.init_params(jax.random.PRNGKey(0))


def build_clip():
    model = clip_model.CLIP(text_input_dim=E, image_input_dim=D_IM,
                            latent_dim=P)
    return model, model.init_params(jax.random.PRNGKey(0))


def assert_trees_equal(a, b):
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


# ---------------------------------------------------------------------------
# Fast tier: structural round-trips, family detection, ordering
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("family,params", [
    ("maml", build_maml()),
    ("am3", build_am3()[1]),
    ("am3", build_am3("glove")[1]),
    ("am3", build_am3("RNN")[1]),
    ("am3", build_am3("rand")[1]),
    ("fumi", build_fumi()[1]),
    ("fumi", build_fumi("w2v")[1]),
    ("clip", build_clip()[1]),
])
def test_roundtrip(family, params):
    sd = interop.params_to_torch(params, family)
    assert interop.detect_family(sd) == family
    back = interop.torch_to_params(sd, family)
    assert_trees_equal(params, back)


def test_state_dict_registration_order():
    """Export key order must equal torch registration order — optimizer
    param ids depend on it (ref utils.py:281 passes model.parameters())."""
    sd = interop.params_to_torch(build_fumi("glove")[1], "fumi")
    keys = list(sd)
    assert keys[0] == "text_encoder.embed.weight"  # registered first
    assert keys.index("im_net.linear0.weight") < \
        keys.index("hyper_net.0.weight")  # im_net assigned before hyper_net
    sd = interop.params_to_torch(build_am3()[1], "am3")
    assert list(sd)[:3] == ["image_encoder.weight", "image_encoder.bias",
                            "g.0.weight"]


def test_wrong_family_rejected():
    sd = interop.params_to_torch(build_maml(), "maml")
    with pytest.raises(ValueError, match="missing key"):
        interop.torch_to_params(sd, "clip")
    with pytest.raises(ValueError, match="no torch interop"):
        interop.params_to_torch(build_maml(), "protonet")


def test_rnn_slots():
    """LSTM tensors land in the right direction/slot (gate order is
    untouched — both sides store (i,f,g,o) rows)."""
    _, params = build_am3("RNN")
    sd = interop.params_to_torch(params, "am3")
    te = params["text_encoder"]
    np.testing.assert_array_equal(
        sd["text_encoder.rnn.weight_ih_l0"], np.asarray(te["w_ih"]))
    np.testing.assert_array_equal(
        sd["text_encoder.rnn.weight_hh_l0_reverse"],
        np.asarray(te["w_hh_rev"]))
    np.testing.assert_array_equal(
        sd["text_encoder.embed.weight"], np.asarray(te["embed"]))


# ---------------------------------------------------------------------------
# Slow tier: real torch modules (reference-shaped)
# ---------------------------------------------------------------------------

def torch_pure_image_network():
    """Reference-shaped PureImageNetwork (ref maml.py:15-33)."""
    import torch.nn as nn
    layers = OrderedDict()
    in_dim = D_IM
    for i, hd in enumerate(HID):
        layers[f"lin_{i}"] = nn.Linear(in_dim, hd)
        layers[f"relu_{i}"] = nn.ReLU()
        in_dim = hd

    layers["lin_final"] = nn.Linear(in_dim, N)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(layers)

        def forward(self, x):
            return self.net(x)

    return M()


def torch_text_encoder(kind):
    import torch
    import torch.nn as nn
    if kind in ("precomputed", "BERT"):
        return nn.Identity()
    if kind == "rand":
        return nn.Linear(E, E)

    class TE(nn.Module):
        def __init__(self, rnn):
            super().__init__()
            width = E_RNN if rnn else E
            self.embed = nn.Embedding(len(VOCAB), width)
            if rnn:
                self.rnn = nn.LSTM(width, width // 2, num_layers=1,
                                   bidirectional=True, batch_first=True)

        def forward(self, x):  # pooled mean (WordEmbedding path only)
            return self.embed(x).mean(dim=-2)

    return TE(rnn=kind in ("RNN", "RNNhid"))


def torch_am3(kind="precomputed"):
    """Reference-shaped AM3 (ref am3.py:41-88; dropout 0 for determinism)."""
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = nn.Linear(D_IM, P)
            self.text_encoder = torch_text_encoder(kind)
            self.g = nn.Sequential(nn.Linear(E, H), nn.ReLU(),
                                   nn.Dropout(0.0), nn.Linear(H, P))
            self.h = nn.Sequential(nn.Linear(P, H), nn.ReLU(),
                                   nn.Dropout(0.0), nn.Linear(H, 1))

        def forward(self, text, im):
            import torch
            im_e = self.image_encoder(im)
            t = self.g(self.text_encoder(text))
            return im_e, t, torch.sigmoid(self.h(t))

    return M()


def torch_fumi(kind="precomputed", norm=False):
    """Reference-shaped FUMI (ref fumi.py:47-110): registration order is
    text_encoder, im_net, hyper_net."""
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_encoder = torch_text_encoder(kind)
            im_layers = OrderedDict()
            in_dim = D_IM
            for i, hd in enumerate(HID):
                im_layers[f"linear{i}"] = nn.Linear(in_dim, hd)
                im_layers[f"relu{i}"] = nn.ReLU()
                in_dim = hd
            self.im_net = nn.Sequential(im_layers)
            hyper = [nn.Linear(E, H), nn.ReLU(),
                     nn.Linear(H, HID[-1] + 1)]
            if norm:
                hyper.append(nn.Tanh())
            self.hyper_net = nn.Sequential(*hyper)

        def forward(self, text_embed):
            return self.hyper_net(text_embed)

    return M()


def torch_clip():
    """Reference-shaped CLIP (ref clip.py:11-40)."""
    import torch
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_fc = nn.Linear(E, P)
            self.text_af = nn.ReLU()
            self.text_fc2 = nn.Linear(P, P)
            self.image_fc = nn.Linear(D_IM, P)
            self.image_af = nn.ReLU()
            self.image_fc2 = nn.Linear(P, P)

        def forward(self, text, image):
            t = self.text_fc2(self.text_af(self.text_fc(text)))
            i = self.image_fc2(self.image_af(self.image_fc(image)))
            t = t / torch.linalg.norm(t, axis=1, keepdim=True)
            i = i / torch.linalg.norm(i, axis=1, keepdim=True)
            return t @ i.T

    return M()


def save_ref_ckpt(tmp_path, module, model_name, opt=None, batch_idx=7,
                  extra_args=None):
    import torch
    args = {"model": model_name}
    args.update(extra_args or {})
    path = str(tmp_path / "best.pth.tar")
    torch.save({
        "batch_idx": batch_idx,
        "state_dict": module.state_dict(),
        "best_loss": 1.25,
        "optimizer": opt.state_dict() if opt is not None else None,
        "args": args,
    }, path)
    return path


@pytest.mark.slow
def test_import_maml_forward_parity(tmp_path):
    import torch
    module = torch_pure_image_network()
    path = save_ref_ckpt(tmp_path, module, "maml")
    params, _, meta = interop.load_torch_checkpoint(path)
    assert meta["batch_idx"] == 7
    x = np.random.RandomState(0).randn(11, D_IM).astype(np.float32)
    ours = np.asarray(mlp.apply(params, jnp.asarray(x)))
    theirs = module(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_import_am3_forward_parity(tmp_path):
    import torch
    module = torch_am3()
    path = save_ref_ckpt(tmp_path, module, "am3")
    params, _, _ = interop.load_torch_checkpoint(path)
    model, params_like = build_am3()
    assert jax.tree.structure(params) == jax.tree.structure(params_like)
    rng = np.random.RandomState(1)
    im = rng.randn(2, N * 2, D_IM).astype(np.float32)
    tx = rng.randn(2, N * 2, E).astype(np.float32)
    im_e, t_e, lam = model.forward(params, jnp.asarray(tx), jnp.asarray(im),
                                   rng=jax.random.PRNGKey(0), train=False)
    t_im, t_t, t_lam = module(torch.tensor(tx), torch.tensor(im))
    np.testing.assert_allclose(np.asarray(im_e), t_im.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_e), t_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lam), t_lam.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("norm", [False, True])
def test_import_fumi_forward_parity(tmp_path, norm):
    import torch
    module = torch_fumi(norm=norm)
    path = save_ref_ckpt(tmp_path, module, "fumi")
    params, _, _ = interop.load_torch_checkpoint(path)
    model, params_like = build_fumi(norm=norm)
    assert jax.tree.structure(params) == jax.tree.structure(params_like)
    rng = np.random.RandomState(2)
    text = rng.randn(N, E).astype(np.float32)
    ours = np.asarray(model.hyper_forward(params["hyper_net"],
                                          jnp.asarray(text)))
    theirs = module(torch.tensor(text)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    # base im_net too
    x = rng.randn(9, D_IM).astype(np.float32)
    ours_b = np.asarray(model.im_base(params["im_net"], jnp.asarray(x),
                                      rng=jax.random.PRNGKey(0),
                                      train=False))
    theirs_b = module.im_net(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours_b, theirs_b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_import_clip_forward_parity(tmp_path):
    import torch
    module = torch_clip()
    path = save_ref_ckpt(tmp_path, module, "clip")
    params, _, _ = interop.load_torch_checkpoint(path)
    model, _ = build_clip()
    rng = np.random.RandomState(3)
    tx = rng.randn(4, E).astype(np.float32)
    im = rng.randn(6, D_IM).astype(np.float32)
    ours = np.asarray(model.forward(params, jnp.asarray(tx),
                                    jnp.asarray(im)))
    theirs = module(torch.tensor(tx), torch.tensor(im)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_adam_moment_carry_over(tmp_path):
    """Import after 3 torch Adam steps; the 4th step (same grads) must
    produce the same params on both sides — count/mu/nu landed right."""
    import torch
    from fumi_tpu.train.optim import init_optim

    LR, WD = 0.05, 5e-4
    module = torch_pure_image_network()
    opt = torch.optim.Adam(module.parameters(), lr=LR, weight_decay=WD)
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(16, D_IM).astype(np.float32))
    for _ in range(3):
        opt.zero_grad()
        module(x).pow(2).mean().backward()
        opt.step()
    path = save_ref_ckpt(tmp_path, module, "maml", opt=opt)

    jopt = init_optim("adam", lr=LR, weight_decay=WD)
    params0 = interop.torch_to_params(module.state_dict(), "maml")
    params, opt_state, _ = interop.load_torch_checkpoint(
        path, params_like=params0, opt_state_like=jopt.init(params0))

    # moments really imported (nonzero mu)
    import optax
    def find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, (tuple, list)):
            for c in s:
                f = find_adam(c)
                if f is not None:
                    return f
        return None
    adam = find_adam(opt_state)
    assert int(adam.count) == 3
    assert any(np.abs(np.asarray(l)).max() > 0
               for l in jax.tree.leaves(adam.mu))

    # one more identical step on both sides
    opt.zero_grad()
    module(x).pow(2).mean().backward()
    grads_by_name = {n: p.grad.detach().numpy()
                     for n, p in module.named_parameters()}
    opt.step()

    names = interop._name_tree("maml", sd=module.state_dict())
    grads = jax.tree.map(lambda n: jnp.asarray(grads_by_name[n]), names)
    updates, _ = jopt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    theirs_by_name = {n: p.detach().numpy()
                      for n, p in module.named_parameters()}
    for name, ours in zip(jax.tree.leaves(names),
                          jax.tree.leaves(new_params)):
        np.testing.assert_allclose(np.asarray(ours), theirs_by_name[name],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("family,builder,module_fn", [
    ("maml", build_maml, torch_pure_image_network),
    ("am3", lambda: build_am3()[1], torch_am3),
    ("fumi", lambda: build_fumi()[1], torch_fumi),
    ("clip", lambda: build_clip()[1], torch_clip),
])
def test_export_restorable_by_torch(tmp_path, family, builder, module_fn):
    """The exported file passes strict load_state_dict AND
    Optimizer.load_state_dict — the two calls the reference's
    load_checkpoint makes (ref utils.py:433-434)."""
    import torch
    from fumi_tpu.train.optim import init_optim

    params = builder()
    jopt = init_optim("adam", lr=0.01, weight_decay=5e-4)
    opt_state = jopt.init(params)
    # take one optax step so exported moments are nonzero
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    import optax
    updates, opt_state = jopt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "out.pth.tar")
    interop.export_torch_checkpoint(
        path, params, family, opt_state=opt_state,
        args={"model": family}, batch_idx=42, best_loss=0.5,
        lr=0.01, weight_decay=5e-4, optim="adam")

    ckpt = torch.load(path, weights_only=False)
    assert ckpt["batch_idx"] == 42 and ckpt["best_loss"] == 0.5
    module = module_fn()
    module.load_state_dict(ckpt["state_dict"], strict=True)
    topt = torch.optim.Adam(module.parameters(), lr=0.01, weight_decay=5e-4)
    topt.load_state_dict(ckpt["optimizer"])
    # a moment tensor actually round-tripped
    st = topt.state_dict()["state"]
    assert st and any(
        float(torch.abs(v["exp_avg"]).max()) > 0 for v in st.values())
    # and the params survive a re-import bit-exactly
    back = interop.torch_to_params(module.state_dict(), family)
    assert_trees_equal(params, back)


@pytest.mark.slow
def test_cli_torch_checkpoint_end_to_end(tmp_path):
    """--checkpoint <best.pth.tar>: evaluate a reference-trained model in
    this framework's CLI; then export a run and round-trip it."""
    import torch
    from fumi_tpu.cli.main import main
    from fumi_tpu.cli import export_torch
    from tests.test_cli import small_cfg

    module = torch_pure_image_network()
    path = save_ref_ckpt(
        tmp_path, module, "maml",
        extra_args={"im_hid_dim": list(HID), "text_encoder": "precomputed"})

    cfg = small_cfg(tmp_path, "maml", im_emb_dim=D_IM, num_ways=N,
                    im_hid_dim=HID, evaluate=True, checkpoint=path)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])

    # now train a tiny run and export it back to the reference format
    cfg2 = small_cfg(tmp_path, "maml", im_emb_dim=D_IM, num_ways=N,
                     im_hid_dim=HID, epochs=8, eval_freq=4)
    main(cfg2)
    import glob
    import os
    runs = [d for d in glob.glob(os.path.join(str(tmp_path), "runs", "*"))
            if os.path.exists(os.path.join(d, "config.json"))
            and os.path.exists(os.path.join(d, "ckpt"))]
    assert runs
    outp = export_torch.main([runs[-1], str(tmp_path / "exported.pth.tar")])
    ckpt = torch.load(outp, weights_only=False)
    module.load_state_dict(ckpt["state_dict"], strict=True)
    assert ckpt["args"]["model"] == "maml"


@pytest.mark.slow
def test_import_resets_ema_state(tmp_path):
    """--tpu_ema: eval/serving weights come from EmaState — a torch import
    must point it at the IMPORTED params, not the pre-import ones."""
    import optax
    from fumi_tpu.train.optim import find_ema, init_optim, params_ema

    module = torch_pure_image_network()
    path = save_ref_ckpt(tmp_path, module, "maml")
    old_params = build_maml()  # different random init
    opt = optax.chain(init_optim("adam", lr=0.01), params_ema(0.9))
    params, opt_state, _ = interop.load_torch_checkpoint(
        path, params_like=old_params, opt_state_like=opt.init(old_params))
    ema = find_ema(opt_state)
    assert ema is not None
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_export_adamw_group_loads_into_hf_adamw(tmp_path):
    """The reference's adamw path builds transformers' AdamW, whose param
    groups carry 'correct_bias'; torch load_state_dict REPLACES group
    dicts, so the exported group carries the UNION of legacy-HF and
    modern torch.optim.AdamW keys (each consumer reads only its own)."""
    import torch
    from fumi_tpu.train.optim import init_optim

    params = build_maml()
    jopt = init_optim("adamw", lr=0.01)
    opt_state = jopt.init(params)
    path = str(tmp_path / "out.pth.tar")
    interop.export_torch_checkpoint(path, params, "maml",
                                    opt_state=opt_state, lr=0.01,
                                    optim="adamw")
    ckpt = torch.load(path, weights_only=False)
    group = ckpt["optimizer"]["param_groups"][0]
    # legacy transformers AdamW (the reference's pinned 4.x) reads this:
    assert group["correct_bias"] is True and group["eps"] == 1e-6
    # modern torch.optim.AdamW loads AND steps on the same file:
    module = torch_pure_image_network()
    module.load_state_dict(ckpt["state_dict"], strict=True)
    topt = torch.optim.AdamW(module.parameters(), lr=0.01)
    topt.load_state_dict(ckpt["optimizer"])
    for p in module.parameters():
        p.grad = torch.zeros_like(p)
    topt.step()  # would KeyError 'amsgrad' without the union group


@pytest.mark.slow
def test_export_sgd_momentum_passthrough(tmp_path):
    import torch
    params = build_maml()
    path = str(tmp_path / "out.pth.tar")
    interop.export_torch_checkpoint(path, params, "maml", lr=0.1,
                                    momentum=0.5, optim="SGD",
                                    best_loss=0.0)
    ckpt = torch.load(path, weights_only=False)
    assert ckpt["optimizer"]["param_groups"][0]["momentum"] == 0.5
    assert ckpt["best_loss"] == 0.0  # falsy zero survives
    module = torch_pure_image_network()
    module.load_state_dict(ckpt["state_dict"], strict=True)
    topt = torch.optim.SGD(module.parameters(), lr=0.1, momentum=0.5)
    topt.load_state_dict(ckpt["optimizer"])


@pytest.mark.slow
def test_corrupt_file_raises_value_error(tmp_path):
    bad = tmp_path / "best.pth.tar"
    bad.write_text("this is not a torch pickle")
    with pytest.raises(ValueError, match="not a loadable torch checkpoint"):
        interop.load_torch_checkpoint(str(bad))
