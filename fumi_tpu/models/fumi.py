"""FuMI — Fusion by Meta-Initialisation (text-conditioned hypernetwork).

Re-design of ref fumi/models/fumi.py:18-218:
- ``hyper_net``: Linear(text_emb → text_hid)-ReLU-Linear(text_hid →
  im_hid[-1]+1), emitting the final-layer weights+bias of the image net per
  class; optional tanh normalisation (``--norm_hypernet``, ref: fumi.py:104-105)
  and optional normc bias init of the head (``--hypernet_bias_init``,
  ref: fumi.py:81-84 → hypernet_init.py:137-167 with adjust_weights=False,
  adjust_bias=True: head weight zeroed, head bias a normc row with ReLU gain).
- ``im_net``: Linear-ReLU-(Dropout) hidden stack with NO final head
  (ref: fumi.py:88-100) — the head is generated per class by the hypernet.
- ``--init_all_layers`` raises NotImplementedError, as in the reference
  (ref: fumi.py:101-102).

The per-task inner adaptation lives in :mod:`fumi_tpu.metalearn.inner_loop`;
this module provides the pure forward pieces.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers, text_encoders


class FUMI(NamedTuple):
    """Static model spec."""
    n_way: int
    im_emb_dim: int
    im_hid_dim: Tuple[int, ...]
    text_encoder: text_encoders.TextEncoder
    text_emb_dim: int
    text_hid_dim: int
    dropout_rate: float
    norm_hypernet: bool
    fine_tune: bool
    init_bias: bool
    init_all_layers: bool = False
    # "mlp" (the reference's embedding stack) or "conv4"/"resnet12" — the
    # hypernet-generated head then rides on raw-image BACKBONE features
    # (an extension; the reference's raw path is a TODO, am3.py:44-46)
    im_encoder_kind: str = "mlp"
    im_size: int = 84
    im_channels: int = 3
    resnet12_channels: Tuple[int, ...] = (64, 160, 320, 640)
    # --tpu_compute_dtype bfloat16: matmul operands in bf16 with fp32
    # accumulation (layers.linear policy); params, activations, inner-loop
    # updates stay fp32. None = pure fp32.
    compute_dtype: Optional[type] = None
    # resnet12 only: per-stage jax.checkpoint pattern for the backbone
    # inside the second-order inner loop. Measured NEGATIVE (whole-step
    # remat wins, docs/PERFORMANCE.md); reachable only via the experiment
    # switch resnet12.STAGE_REMAT_OVERRIDE, None in production.
    stage_remat: Optional[Tuple[bool, ...]] = None

    @property
    def head_in_dim(self) -> int:
        """Feature dim the generated head consumes."""
        if self.im_encoder_kind == "conv4":
            from fumi_tpu.models import conv4
            return conv4.feature_dim(self.im_size)
        if self.im_encoder_kind == "resnet12":
            return self.resnet12_channels[-1]
        return self.im_hid_dim[-1]

    def init_params(self, key: jax.Array) -> Dict:
        if self.init_all_layers:
            raise NotImplementedError(
                "Entire model hypernet initialisation removed")
        k_h1, k_h2, k_bias, k_im = jax.random.split(key, 4)
        head_out = self.head_in_dim + 1  # weights + bias (ref: fumi.py:76-79)
        hyper_head = layers.linear_init(k_h2, self.text_hid_dim, head_out)
        if self.init_bias:
            # ref: fumi.py:81-84 — zero head weight; normc bias with ReLU gain
            hyper_head = {
                "w": jnp.zeros_like(hyper_head["w"]),
                "b": layers.normc_init(k_bias, (1, head_out),
                                       gain=math.sqrt(2.0)).reshape(-1),
            }
        if self.im_encoder_kind in ("conv4", "resnet12"):
            from fumi_tpu.models import headless_backbone_init
            # headless: the hypernet generates the head
            im_net, _ = headless_backbone_init(
                self.im_encoder_kind, k_im, self.im_size, self.im_channels,
                self.resnet12_channels)
        else:
            im_keys = jax.random.split(k_im, max(len(self.im_hid_dim), 1))
            stack = []
            in_dim = self.im_emb_dim
            for i, hid in enumerate(self.im_hid_dim):
                stack.append(layers.linear_init(im_keys[i], in_dim, hid))
                in_dim = hid
            im_net = tuple(stack)
        return {
            "text_encoder": self.text_encoder.params,
            "hyper_net": (
                layers.linear_init(k_h1, self.text_emb_dim,
                                   self.text_hid_dim),
                hyper_head,
            ),
            "im_net": im_net,
        }

    # -- forward pieces ---------------------------------------------------

    def hyper_forward(self, hyper_params, text_embed: jnp.ndarray
                      ) -> jnp.ndarray:
        """Hypernetwork: (n_way, E) text → (n_way, im_hid[-1]+1) params
        (ref: fumi.py:109-113)."""
        h = jax.nn.relu(layers.linear(hyper_params[0], text_embed,
                                      self.compute_dtype))
        out = layers.linear(hyper_params[1], h, self.compute_dtype)
        if self.norm_hypernet:
            out = jnp.tanh(out)
        return out

    def class_text_encoding(self, params, text: jnp.ndarray,
                            targets: jnp.ndarray, *,
                            rng: jax.Array) -> jnp.ndarray:
        """Per-class text encoding = encoding of the FIRST support sample of
        each class (ref: fumi.py:198-212).

        Args:
          text: (NK, T) int tokens or (NK, E) float embeddings for one task.
          targets: (NK,) int class ids.
        Returns:
          (n_way, E) per-class encodings.
        """
        if self.text_encoder.kind == "rand":
            enc = 2.0 * jax.random.uniform(
                rng, (text.shape[0], self.text_emb_dim)) - 1.0
        else:
            enc_params = params["text_encoder"]
            if not self.fine_tune:
                enc_params = jax.lax.stop_gradient(enc_params)
            enc = self.text_encoder.apply(enc_params, text)
        # first occurrence of each class: argmax picks the first True
        hits = targets[None, :] == jnp.arange(self.n_way)[:, None]
        first_idx = jnp.argmax(hits, axis=1)  # (n_way,)
        return jnp.take(enc, first_idx, axis=0)

    def get_hyper_params(self, params, text: jnp.ndarray,
                         targets: jnp.ndarray, *,
                         rng: jax.Array) -> jnp.ndarray:
        """(n_way, im_hid[-1]+1) generated head for one task
        (ref: fumi.py:198-212)."""
        class_enc = self.class_text_encoding(params, text, targets, rng=rng)
        return self.hyper_forward(params["hyper_net"], class_enc)

    def im_base(self, im_params, x: jnp.ndarray, *, rng: jax.Array,
                train: bool) -> jnp.ndarray:
        """Base image net without head: Linear-ReLU-(Dropout) stack
        (ref: fumi.py:88-100), or a raw-image backbone (extension)."""
        if self.im_encoder_kind == "resnet12":
            from fumi_tpu.models import resnet12
            return resnet12.backbone(im_params, x, self.compute_dtype,
                                     self.stage_remat)
        if self.im_encoder_kind == "conv4":
            from fumi_tpu.models import conv4
            return conv4.backbone(im_params, x, self.compute_dtype)
        for i, p in enumerate(im_params):
            x = jax.nn.relu(layers.linear(p, x, self.compute_dtype))
            if self.dropout_rate > 0:
                x = layers.dropout(jax.random.fold_in(rng, i), x,
                                   self.dropout_rate, train)
        return x

    def im_forward(self, im_params, hyper_params: jnp.ndarray,
                   x: jnp.ndarray, *, rng: jax.Array,
                   train: bool) -> jnp.ndarray:
        """Base MLP then the per-class generated head (ref: fumi.py:214-218).

        The reference computes ``matmul(out, W_c.unsqueeze(2))`` per class and
        transposes; equivalently ``out @ Wᵀ + b`` with W = hyper[:, :-1]
        (n_way, hid) and b = hyper[:, -1] — one MXU matmul.
        """
        out = self.im_base(im_params, x, rng=rng, train=train)  # (M, hid)
        w = hyper_params[:, :-1]  # (n_way, hid)
        b = hyper_params[:, -1]  # (n_way,)
        return layers.matmul_f32acc(out, w.T, self.compute_dtype) + b
