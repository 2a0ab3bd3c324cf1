"""AM3 — Adaptive Modality Mixture Mechanism (prototypical, no inner loop).

Re-design of ref fumi/models/am3.py:16-126:
- ``image_encoder``: Linear(im_emb_dim → prototype_dim) for both
  ``precomputed`` and ``resnet`` branches (raw-image encoding is a TODO in
  the reference too, ref: am3.py:44-46).
- pluggable text encoder (identity for BERT/precomputed, word-embedding
  pooling, biLSTM variants, or ``rand`` forward-time noise).
- ``g``: text → prototype-space MLP (Linear-ReLU-Dropout-Linear,
  ref: am3.py:80-83).
- ``h``: text-prototype → λ MLP + sigmoid (ref: am3.py:86-88,125).

The whole episode step (support fwd + query fwd + prototypes + loss +
predictions) is one jittable function; the reference runs it eagerly with a
host sync per step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers, text_encoders
from fumi_tpu.ops import fewshot


class AM3(NamedTuple):
    """Static model spec (hashable; safe to close over in jit)."""
    im_emb_dim: int
    prototype_dim: int
    text_encoder: text_encoders.TextEncoder
    text_emb_dim: int
    text_hid_dim: int
    dropout: float
    fine_tune: bool
    lamda_fixed: Optional[int]
    # "linear" (precomputed/resnet branches, both Linear in the reference,
    # ref: am3.py:41-46) or "conv4"/"resnet12" (raw images — the
    # reference's TODO)
    im_encoder_kind: str = "linear"
    im_size: int = 84
    im_channels: int = 3
    resnet12_channels: tuple = (64, 160, 320, 640)
    # --tpu_compute_dtype bfloat16: matmul operands in bf16 with fp32
    # accumulation (layers.linear policy). Prototype/distance math
    # (ops/fewshot.py) stays fp32 — reductions are accuracy-sensitive
    # and bandwidth-bound, not MXU-bound. None = pure fp32.
    compute_dtype: Optional[type] = None

    def init_params(self, key: jax.Array) -> Dict:
        k_im, k_g1, k_g2, k_h1, k_h2 = jax.random.split(key, 5)
        if self.im_encoder_kind in ("conv4", "resnet12"):
            from fumi_tpu.models import headless_backbone_init
            k_bb, k_head = jax.random.split(k_im)
            bb, fdim = headless_backbone_init(
                self.im_encoder_kind, k_bb, self.im_size, self.im_channels,
                self.resnet12_channels)
            image_encoder = {
                **bb,  # backbone only; prototype projection below
                "head": layers.linear_init(k_head, fdim,
                                           self.prototype_dim),
            }
        else:
            image_encoder = layers.linear_init(k_im, self.im_emb_dim,
                                               self.prototype_dim)
        return {
            "image_encoder": image_encoder,
            "text_encoder": self.text_encoder.params,
            "g": (layers.linear_init(k_g1, self.text_emb_dim,
                                     self.text_hid_dim),
                  layers.linear_init(k_g2, self.text_hid_dim,
                                     self.prototype_dim)),
            "h": (layers.linear_init(k_h1, self.prototype_dim,
                                     self.text_hid_dim),
                  layers.linear_init(k_h2, self.text_hid_dim, 1)),
        }

    # -- forward --------------------------------------------------------

    def encode_image(self, params, im: jnp.ndarray) -> jnp.ndarray:
        """(B, M, im_emb_dim) or (B, M, H, W, C) -> (B, M, prototype_dim)
        (ref: am3.py:108; raw-image paths are the reference's TODO)."""
        if self.im_encoder_kind in ("conv4", "resnet12"):
            from fumi_tpu.models import raw_image_net
            net = raw_image_net(self.im_encoder_kind)
            B, M = im.shape[:2]
            feats = net.backbone(params["image_encoder"],
                                 im.reshape((B * M,) + im.shape[2:]),
                                 self.compute_dtype)
            out = layers.linear(params["image_encoder"]["head"], feats,
                                self.compute_dtype)
            return out.reshape(B, M, -1)
        return layers.linear(params["image_encoder"], im,
                             self.compute_dtype)

    def forward(self, params, text: jnp.ndarray, im: jnp.ndarray, *,
                rng: jax.Array, train: bool) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray,
                                                      jnp.ndarray]:
        """Support forward pass (ref: am3.py:90-126).

        Args:
          text: (B, NK, T) int tokens or (B, NK, E) precomputed embeddings.
          im:   (B, NK, im_emb_dim).
        Returns:
          (im_embeddings, text_embeddings, lamda) with shapes
          (B, NK, P), (B, NK, P), (B, NK, 1).
        """
        B, NK = im.shape[0], im.shape[1]
        im_embeddings = self.encode_image(params, im)

        k_noise, k_g, k_h = jax.random.split(rng, 3)
        if self.text_encoder.kind == "rand":
            # noise resampled at every forward (ref: am3.py:118-122)
            text_embeddings = 2.0 * jax.random.uniform(
                k_noise, (B, NK, self.prototype_dim)) - 1.0
        else:
            flat = text.reshape((B * NK,) + text.shape[2:])
            if not self.fine_tune:
                enc_params = jax.lax.stop_gradient(params["text_encoder"])
            else:
                enc_params = params["text_encoder"]
            enc = self.text_encoder.apply(enc_params, flat)
            enc = enc.reshape(B, NK, -1)
            text_embeddings = self._g(params["g"], enc, k_g, train)

        lamda = jax.nn.sigmoid(
            self._h(params["h"], text_embeddings, k_h, train))
        return im_embeddings, text_embeddings, lamda

    def _g(self, g_params, x, rng, train):
        h = jax.nn.relu(layers.linear(g_params[0], x, self.compute_dtype))
        h = layers.dropout(rng, h, self.dropout, train)
        return layers.linear(g_params[1], h, self.compute_dtype)

    def _h(self, h_params, x, rng, train):
        h = jax.nn.relu(layers.linear(h_params[0], x, self.compute_dtype))
        h = layers.dropout(rng, h, self.dropout, train)
        return layers.linear(h_params[1], h, self.compute_dtype)

    # -- episode --------------------------------------------------------

    def episode_loss(self, params, episode, num_ways: int, *,
                     rng: jax.Array, train: bool):
        """One meta-batch: loss + aux (ref: am3.py:128-212).

        Support fwd (image+text+λ), query fwd image-only, λ override for
        ``--lamda_fixed`` (ref: am3.py:174-179), λ-fused prototypes,
        prototypical CE on the query set.
        """
        im_emb, text_emb, lamda = self.forward(
            params, episode.support_text, episode.support_im,
            rng=rng, train=train)
        query_emb = self.encode_image(params, episode.query_im)

        if self.lamda_fixed == 0:
            lamda = jnp.zeros_like(lamda)
        elif self.lamda_fixed == 1:
            lamda = jnp.ones_like(lamda)

        prototypes = fewshot.get_prototypes(im_emb, text_emb, lamda,
                                            episode.support_y, num_ways)
        loss = fewshot.prototypical_loss(prototypes, query_emb,
                                         episode.query_y)
        aux = {
            "prototypes": prototypes,
            "query_emb": query_emb,
            "lamda": lamda,
            "avg_lamda": jnp.mean(lamda),
        }
        return loss, aux
