"""Text-encoder plugins: identity (BERT/precomputed), word-embedding pooling,
biLSTM encoders, and the ``rand`` noise encoder.

TPU-native re-design of ref fumi/models/common.py:
- ``WordEmbedding`` (ref: common.py:8-41): frozen embedding-matrix lookup as a
  jitted gather + padding-masked mean / max pooling.
- ``RNN`` (ref: common.py:44-101): 1-layer biLSTM; the encoding concatenates
  the forward direction's output at the last valid step with the backward
  direction's output at step 0 — both are the *final hidden states* of their
  direction, so here they come out of a masked ``lax.scan`` (no
  pack_padded_sequence machinery needed; padding is always a suffix).
- ``RnnHid`` (ref: common.py:104-161): same, but concatenates the final
  *cell* states (``c_n``) of both directions.
- ``get_embedding_weights`` (ref: common.py:164-196): OOV tokens random
  uniform(−1, 1), PAD row zeroed. Pretrained gensim vectors are replaced by a
  pluggable local vector table (gensim needs network downloads; this
  environment has none) — pass ``vectors`` to supply pretrained weights.

Encoders are pure: ``apply(params, tokens, *, train, rng) -> (M, out_dim)``
over flat token batches ``(M, T)`` int32; callers reshape (B, NK, T) views.
"""

from __future__ import annotations

import math
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.models import layers

PAD_WORD = "<PAD>"  # standard-tokenisation pad token (ref: data.py:456-458)


# ---------------------------------------------------------------------------
# Embedding weights
# ---------------------------------------------------------------------------

def embedding_weights(dictionary: Mapping[str, int],
                      vectors: Optional[Mapping[str, np.ndarray]] = None,
                      embedding_dim: int = 300,
                      seed: int = 0) -> np.ndarray:
    """Build the (V, E) embedding matrix (ref: common.py:164-196).

    - known words take their pretrained vector from ``vectors``;
    - OOV words are uniform(−1, 1) (ref: common.py:182-183);
    - the PAD row is zeroed (ref: common.py:187).
    """
    rng = np.random.RandomState(seed)
    if vectors is not None and len(vectors) > 0:
        any_vec = next(iter(vectors.values()))
        embedding_dim = int(np.asarray(any_vec).shape[-1])
    weights = 2.0 * rng.rand(len(dictionary), embedding_dim) - 1.0
    for word, token in dictionary.items():
        if word == PAD_WORD or word == "PAD":
            weights[token, :] = 0.0
        elif vectors is not None and word in vectors:
            weights[token, :] = np.asarray(vectors[word])
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Word-embedding pooling encoder (glove / w2v)
# ---------------------------------------------------------------------------

def word_embedding_init(weights: np.ndarray) -> Dict[str, jnp.ndarray]:
    return {"embed": jnp.asarray(weights)}


def word_embedding_apply(params: Dict[str, jnp.ndarray],
                         tokens: jnp.ndarray,
                         padding_token: int,
                         pooling_strat: str = "mean") -> jnp.ndarray:
    """(M, T) int tokens -> (M, E) pooled embedding (ref: common.py:23-41)."""
    emb = jnp.take(params["embed"], tokens, axis=0)  # (M, T, E)
    if pooling_strat == "mean":
        pad_mask = (tokens != padding_token).astype(emb.dtype)  # (M, T)
        seq_lens = jnp.sum(pad_mask, axis=-1, keepdims=True)  # (M, 1)
        # PAD rows are zero vectors, so an unmasked sum matches the reference
        # exactly (ref: common.py:37 sums all positions then divides by len).
        return jnp.sum(emb, axis=-2) / seq_lens
    elif pooling_strat == "max":
        return jnp.max(emb, axis=-2)
    raise NameError(f"{pooling_strat} pooling strat not defined")


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def lstm_init(key: jax.Array, input_dim: int, hidden_dim: int,
              bidirectional: bool = True) -> Dict[str, jnp.ndarray]:
    """torch ``nn.LSTM`` default init: all params U(−1/√H, 1/√H).

    Weight layout matches torch: ``w_ih`` (4H, in), ``w_hh`` (4H, H), biases
    (4H,), gate order (i, f, g, o).
    """
    bound = 1.0 / math.sqrt(hidden_dim)
    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    n_dir = 2 if bidirectional else 1
    keys = jax.random.split(key, 4 * n_dir)
    params = {}
    for d in range(n_dir):
        sfx = "" if d == 0 else "_rev"
        k0, k1, k2, k3 = keys[4 * d:4 * d + 4]
        params[f"w_ih{sfx}"] = u(k0, (4 * hidden_dim, input_dim))
        params[f"w_hh{sfx}"] = u(k1, (4 * hidden_dim, hidden_dim))
        params[f"b_ih{sfx}"] = u(k2, (4 * hidden_dim,))
        params[f"b_hh{sfx}"] = u(k3, (4 * hidden_dim,))
    return params


def _lstm_cell(params, sfx, x_t, h, c):
    gates = (jnp.matmul(x_t, params[f"w_ih{sfx}"].T,
                        preferred_element_type=x_t.dtype)
             + params[f"b_ih{sfx}"]
             + jnp.matmul(h, params[f"w_hh{sfx}"].T,
                          preferred_element_type=h.dtype)
             + params[f"b_hh{sfx}"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _masked_lstm_scan(params, sfx, xs, mask, hidden_dim):
    """Run an LSTM over (M, T, E) with (M, T) validity mask.

    The carry freezes on masked steps, so the final carry equals the state at
    each sequence's last valid step — torch's packed-sequence final state.
    """
    M = xs.shape[0]
    h0 = jnp.zeros((M, hidden_dim), xs.dtype)
    c0 = jnp.zeros((M, hidden_dim), xs.dtype)

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        h_new, c_new = _lstm_cell(params, sfx, x_t, h, c)
        m = m_t[:, None]
        return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), None

    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, M, E)
    mask_t = jnp.swapaxes(mask, 0, 1)  # (T, M)
    (h_fin, c_fin), _ = jax.lax.scan(step, (h0, c0), (xs_t, mask_t))
    return h_fin, c_fin


def bilstm_final_states(params: Dict[str, jnp.ndarray],
                        emb: jnp.ndarray,
                        mask: jnp.ndarray,
                        hidden_dim: int):
    """((h_fwd, c_fwd), (h_bwd, c_bwd)) over (M, T, E) embedded tokens.

    Padding is a suffix in both tokenisation modes (BERT padding=True and the
    manual ``<PAD>`` appends, ref: data.py:441-460), so the backward pass
    scans the time-reversed sequence: pads lead, the carry stays frozen until
    the first valid token, and the final carry is the backward state at
    original position 0 — exactly torch's ``rnn_out[:, 0, hid:]`` /
    ``c_n[1]`` (ref: common.py:97-98,159).
    """
    fwd = _masked_lstm_scan(params, "", emb, mask, hidden_dim)
    bwd = _masked_lstm_scan(params, "_rev", emb[:, ::-1, :], mask[:, ::-1],
                            hidden_dim)
    return fwd, bwd


def rnn_encoder_init(key: jax.Array, weights: np.ndarray,
                     rnn_hid_dim: int) -> Dict[str, jnp.ndarray]:
    """biLSTM encoder params. ``rnn_hid_dim`` is the *total* encoding width;
    each direction gets half (ref: common.py:52,116)."""
    emb_dim = int(weights.shape[-1])
    p = lstm_init(key, emb_dim, rnn_hid_dim // 2, bidirectional=True)
    p["embed"] = jnp.asarray(weights)
    return p


def rnn_encoder_apply(params: Dict[str, jnp.ndarray], tokens: jnp.ndarray,
                      padding_token: int, rnn_hid_dim: int,
                      variant: str = "output") -> jnp.ndarray:
    """(M, T) tokens -> (M, rnn_hid_dim) encoding.

    variant="output": concat final hidden states (ref RNN, common.py:94-99).
    variant="hidden": concat final cell states (ref RnnHid, common.py:158-159).
    """
    emb = jnp.take(params["embed"], tokens, axis=0)
    mask = tokens != padding_token
    (h_f, c_f), (h_b, c_b) = bilstm_final_states(params, emb, mask,
                                                 rnn_hid_dim // 2)
    if variant == "output":
        return jnp.concatenate([h_f, h_b], axis=-1)
    elif variant == "hidden":
        return jnp.concatenate([c_f, c_b], axis=-1)
    raise NameError(f"unknown rnn variant {variant}")


# ---------------------------------------------------------------------------
# Encoder factory
# ---------------------------------------------------------------------------

class TextEncoder:
    """A text-encoder plugin: params + pure apply.

    ``apply(params, text, rng) -> (M, out_dim)`` where ``text`` is either
    (M, T) int tokens or (M, E) precomputed float embeddings depending on
    ``kind``. The ``rand`` encoder is handled by the *models* (AM3 and FuMI
    draw noise with different shapes/placements — ref: am3.py:118-122,
    fumi.py:200-203), but it still carries an (unused) linear param to match
    the reference's parameter inventory (ref: am3.py:68-69, fumi.py:56-57).
    """

    def __init__(self, kind: str, params, apply_fn, out_dim: int,
                 trainable: bool):
        self.kind = kind
        self.params = params
        self._apply = apply_fn
        self.out_dim = out_dim
        self.trainable = trainable  # --fine_tune (ref: am3.py:74-77)

    def apply(self, params, text, rng=None):
        return self._apply(params, text)


def make_text_encoder(kind: str,
                      key: jax.Array,
                      text_emb_dim: int,
                      dictionary: Optional[Mapping[str, int]] = None,
                      pooling_strat: str = "mean",
                      fine_tune: bool = False,
                      vectors: Optional[Mapping[str, np.ndarray]] = None,
                      ) -> TextEncoder:
    """Build a text encoder (plugin set of ref am3.py:50-71, fumi.py:47-63).

    Pretrained vectors come either from the ``vectors`` argument or from a
    ``dictionary.vectors`` attribute (fumi_tpu.data.vectors.Vocabulary — the
    data loader attaches the ingested glove/w2v artifact there, replacing
    the reference's in-ctor gensim downloads, ref: common.py:164-196).
    """
    if vectors is None:
        vectors = getattr(dictionary, "vectors", None)
    if kind in ("BERT", "precomputed"):
        return TextEncoder(kind, {}, lambda p, t: t, text_emb_dim,
                           trainable=False)
    if kind in ("glove", "w2v"):
        if dictionary is None:
            raise ValueError(f"{kind} encoder needs a token dictionary")
        weights = embedding_weights(dictionary, vectors)
        params = word_embedding_init(weights)
        pad = dictionary.get(PAD_WORD, dictionary.get("PAD", 0))
        out_dim = weights.shape[-1]
        def apply_fn(p, t, pad=pad, strat=pooling_strat):
            return word_embedding_apply(p, t, pad, strat)
        return TextEncoder(kind, params, apply_fn, out_dim,
                           trainable=fine_tune)
    if kind in ("RNN", "RNNhid"):
        if dictionary is None:
            raise ValueError(f"{kind} encoder needs a token dictionary")
        # ref uses glove vectors under both RNN variants (am3.py:63, fumi.py:59)
        weights = embedding_weights(dictionary, vectors)
        params = rnn_encoder_init(key, weights, text_emb_dim)
        pad = dictionary.get(PAD_WORD, dictionary.get("PAD", 0))
        variant = "output" if kind == "RNN" else "hidden"
        def apply_fn(p, t, pad=pad, hd=text_emb_dim, v=variant):
            return rnn_encoder_apply(p, t, pad, hd, v)
        return TextEncoder(kind, params, apply_fn, text_emb_dim,
                           trainable=fine_tune)
    if kind == "rand":
        params = layers.linear_init(key, text_emb_dim, text_emb_dim)
        return TextEncoder(kind, params, lambda p, t: t, text_emb_dim,
                           trainable=fine_tune)
    raise NameError(f"{kind} not allowed as text encoder")
