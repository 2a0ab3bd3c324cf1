"""Text-encoder tests: LSTM parity vs torch packed sequences, pooling parity,
and end-to-end episodic training through the token path for every encoder
plugin (glove, w2v, RNN, RNNhid, rand)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
from fumi_tpu.models import text_encoders as te
from fumi_tpu.train.loop import test_loop as run_test_loop
from fumi_tpu.train.steps import make_steps

VOCAB, T, E = 50, 9, 12


def make_dictionary(vocab=VOCAB):
    d = {te.PAD_WORD: 0}
    for i in range(1, vocab):
        d[f"w{i}"] = i
    return d


def rand_tokens(rng, M, pad_id=0):
    """(M, T) token batches with suffix padding and varied lengths."""
    toks = np.zeros((M, T), dtype=np.int32)
    for m in range(M):
        L = rng.randint(2, T + 1)
        toks[m, :L] = rng.randint(1, VOCAB, size=L)
    return toks


def test_word_embedding_mean_matches_torch(rng_np):
    d = make_dictionary()
    weights = te.embedding_weights(d, embedding_dim=E)
    params = te.word_embedding_init(weights)
    toks = rand_tokens(rng_np, 6)
    got = np.asarray(te.word_embedding_apply(params, jnp.asarray(toks), 0,
                                             "mean"))
    # torch restatement of ref common.py:29-37
    emb = torch.tensor(weights)[torch.tensor(toks.astype(np.int64))]
    mask = torch.tensor((toks != 0).astype(np.float32))
    want = (emb.sum(dim=1) / mask.sum(dim=1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got_max = np.asarray(te.word_embedding_apply(params, jnp.asarray(toks),
                                                 0, "max"))
    want_max = emb.max(dim=1)[0].numpy()
    np.testing.assert_allclose(got_max, want_max, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["output", "hidden"])
def test_bilstm_matches_torch_packed(rng_np, variant):
    """Masked-scan biLSTM final states == torch packed-sequence LSTM
    (ref RNN common.py:90-101 / RnnHid common.py:153-161)."""
    d = make_dictionary()
    weights = te.embedding_weights(d, embedding_dim=E)
    hid_total = 8
    params = te.rnn_encoder_init(jax.random.PRNGKey(0), weights, hid_total)
    toks = rand_tokens(rng_np, 5)

    got = np.asarray(te.rnn_encoder_apply(params, jnp.asarray(toks), 0,
                                          hid_total, variant))

    # torch LSTM with identical weights
    lstm = torch.nn.LSTM(input_size=E, hidden_size=hid_total // 2,
                         num_layers=1, bidirectional=True, batch_first=True)
    sd = lstm.state_dict()
    sd["weight_ih_l0"] = torch.tensor(np.asarray(params["w_ih"]))
    sd["weight_hh_l0"] = torch.tensor(np.asarray(params["w_hh"]))
    sd["bias_ih_l0"] = torch.tensor(np.asarray(params["b_ih"]))
    sd["bias_hh_l0"] = torch.tensor(np.asarray(params["b_hh"]))
    sd["weight_ih_l0_reverse"] = torch.tensor(np.asarray(params["w_ih_rev"]))
    sd["weight_hh_l0_reverse"] = torch.tensor(np.asarray(params["w_hh_rev"]))
    sd["bias_ih_l0_reverse"] = torch.tensor(np.asarray(params["b_ih_rev"]))
    sd["bias_hh_l0_reverse"] = torch.tensor(np.asarray(params["b_hh_rev"]))
    lstm.load_state_dict(sd)

    emb = torch.tensor(weights)[torch.tensor(toks.astype(np.int64))]
    seq_lens = torch.tensor((toks != 0).sum(axis=1))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        emb, seq_lens, batch_first=True, enforce_sorted=False)
    out_packed, (hn, cn) = lstm(packed)
    if variant == "output":
        # final hidden states per direction == ref's output-state concat
        want = torch.cat([hn[0], hn[1]], dim=-1).detach().numpy()
    else:
        want = torch.cat([cn[0], cn[1]], dim=-1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_embedding_weights_pad_and_vectors():
    d = make_dictionary(5)
    vecs = {"w1": np.ones(4), "w3": np.full(4, 2.0)}
    w = te.embedding_weights(d, vecs)
    np.testing.assert_allclose(w[0], 0.0)  # PAD row zeroed
    np.testing.assert_allclose(w[1], 1.0)
    np.testing.assert_allclose(w[3], 2.0)
    assert np.all(np.abs(w[2]) <= 1.0)  # OOV uniform(-1, 1)


# ---------------------------------------------------------------------------
# End-to-end token-path training for every encoder plugin
# ---------------------------------------------------------------------------

def token_samplers(cfg, text_len=T):
    # enough images per class for num_shots + num_query_eval (the samplers
    # now fail fast on thinner classes)
    cs, table, ids = synthetic_class_set(
        num_classes=10, images_per_class=40, im_dim=cfg.im_emb_dim,
        text_tokens=True, vocab_size=VOCAB, text_len=text_len, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_eval, cfg.im_emb_dim, text_len,
                       text_is_tokens=True)
    return DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids), cs,
                                spec)


@pytest.mark.slow  # 10-way parametrized e2e episodic training
@pytest.mark.parametrize("model", ["am3", "fumi"])
@pytest.mark.parametrize("encoder", ["glove", "w2v", "RNN", "RNNhid",
                                     "rand"])
def test_episodic_step_with_encoder(model, encoder):
    cfg = Config(
        model=model, im_emb_dim=24, text_emb_dim=E, im_hid_dim=(16, 8),
        prototype_dim=8, text_hid_dim=8, num_ways=3, num_shots=2,
        num_shots_test=4, num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=2, dropout=0.0, text_encoder=encoder, step_size=0.1,
        lr=1e-2, optim="adam", num_ep_test=4,
        pooling_strat="mean")
    dictionary = make_dictionary()
    steps = make_steps(cfg, jax.random.PRNGKey(0), dictionary)
    sampler = token_samplers(cfg)

    params = steps.params
    opt_state = steps.opt.init(params)
    ep = jax.jit(sampler.sample)(jax.random.PRNGKey(1))
    params, opt_state, m = steps.train_step(params, opt_state, ep,
                                            jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    out = run_test_loop(cfg, steps, params, sampler, 1, jax.random.PRNGKey(3))
    assert np.isfinite(out["loss"])
    assert 0.0 <= out["acc"] <= 1.0


def test_fine_tune_freezes_or_trains_text_encoder():
    """--fine_tune gates the text-encoder meta-gradient (ref: am3.py:74-77,
    fumi.py:65-67): frozen encoders must get EXACTLY zero gradient, and
    fine_tune=True must train them — in both AM3 and FuMI."""
    import jax
    import numpy as np

    from fumi_tpu.core.episode import Episode
    from fumi_tpu.data.synthetic import synthetic_dictionary
    from fumi_tpu.metalearn.inner_loop import fumi_episode_loss
    from fumi_tpu.models import text_encoders
    from fumi_tpu.models.am3 import AM3
    from fumi_tpu.models.fumi import FUMI

    N, K, Q, T = 3, 2, 3, 6
    rng = np.random.RandomState(0)
    tokens = rng.randint(1, 30, (2, N * K, T)).astype(np.int32)
    episode = Episode(
        support_im=jnp.asarray(rng.randn(2, N * K, 12).astype(np.float32)),
        support_text=jnp.asarray(tokens),
        support_text_mask=None,
        support_ids=jnp.zeros((2, N * K), jnp.int32),
        support_y=jnp.asarray(np.tile(np.repeat(np.arange(N), K), (2, 1))
                              .astype(np.int32)),
        query_im=jnp.asarray(rng.randn(2, N * Q, 12).astype(np.float32)),
        query_ids=jnp.zeros((2, N * Q), jnp.int32),
        query_y=jnp.asarray(np.tile(np.repeat(np.arange(N), Q), (2, 1))
                            .astype(np.int32)),
    )
    vocab = synthetic_dictionary(32)

    def enc_grad_norm_fumi(fine_tune):
        enc = text_encoders.make_text_encoder(
            "glove", jax.random.PRNGKey(1), 8, dictionary=vocab,
            fine_tune=fine_tune)
        model = FUMI(n_way=N, im_emb_dim=12, im_hid_dim=(8,),
                     text_encoder=enc, text_emb_dim=enc.out_dim,
                     text_hid_dim=6, dropout_rate=0.0, norm_hypernet=False,
                     fine_tune=fine_tune, init_bias=False)
        params = model.init_params(jax.random.PRNGKey(0))
        grads = jax.grad(lambda p: fumi_episode_loss(
            model, p, episode, n_steps=1, step_size=0.1,
            rng=jax.random.PRNGKey(2), train=True)[0])(params)
        return sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["text_encoder"]))

    assert enc_grad_norm_fumi(False) == 0.0
    assert enc_grad_norm_fumi(True) > 0.0

    def enc_grad_norm_am3(fine_tune):
        enc = text_encoders.make_text_encoder(
            "glove", jax.random.PRNGKey(1), 8, dictionary=vocab,
            fine_tune=fine_tune)
        model = AM3(im_emb_dim=12, prototype_dim=8, text_encoder=enc,
                    text_emb_dim=enc.out_dim, text_hid_dim=6, dropout=0.0,
                    fine_tune=fine_tune, lamda_fixed=None)
        params = model.init_params(jax.random.PRNGKey(0))
        grads = jax.grad(lambda p: model.episode_loss(
            p, episode, N, rng=jax.random.PRNGKey(2), train=True)[0])(
                params)
        return sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["text_encoder"]))

    assert enc_grad_norm_am3(False) == 0.0
    assert enc_grad_norm_am3(True) > 0.0
