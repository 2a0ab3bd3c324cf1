"""CLIP-style dual-encoder with projection heads.

Re-design of ref fumi/models/clip.py:11-40: two 2-layer MLP projection heads
(text and image) into a shared latent space; the forward pass returns the
full text×image cosine-similarity matrix. Training uses symmetric
cross-entropy with arange labels (ref: clip.py:105-110); evaluation is
sliding-window retrieval (ref: clip.py:53-73). Both are provided as jitted
pure functions.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers
from fumi_tpu.ops.fewshot import cross_entropy


class CLIP(NamedTuple):
    text_input_dim: int
    image_input_dim: int
    latent_dim: int
    # --tpu_compute_dtype bfloat16: matmul operands in bf16 with fp32
    # accumulation (layers.linear policy); params/normalization stay fp32.
    compute_dtype: type = None

    def init_params(self, key: jax.Array) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "text_fc": layers.linear_init(k1, self.text_input_dim,
                                          self.latent_dim),
            "text_fc2": layers.linear_init(k2, self.latent_dim,
                                           self.latent_dim),
            "image_fc": layers.linear_init(k3, self.image_input_dim,
                                           self.latent_dim),
            "image_fc2": layers.linear_init(k4, self.latent_dim,
                                            self.latent_dim),
        }

    def encode_text(self, params, text: jnp.ndarray) -> jnp.ndarray:
        """(Nt, E_t) -> (Nt, latent) L2-normalized text embedding (the
        text projection head of ref clip.py:26-40)."""
        t = layers.linear(
            params["text_fc2"],
            jax.nn.relu(layers.linear(params["text_fc"], text,
                                      self.compute_dtype)),
            self.compute_dtype)
        return t / jnp.linalg.norm(t, axis=-1, keepdims=True)

    def encode_image(self, params, image: jnp.ndarray) -> jnp.ndarray:
        """(Ni, E_i) -> (Ni, latent) L2-normalized image embedding."""
        i = layers.linear(
            params["image_fc2"],
            jax.nn.relu(layers.linear(params["image_fc"], image,
                                      self.compute_dtype)),
            self.compute_dtype)
        return i / jnp.linalg.norm(i, axis=-1, keepdims=True)

    def forward(self, params, text: jnp.ndarray,
                image: jnp.ndarray) -> jnp.ndarray:
        """(Nt, E_t), (Ni, E_i) -> (Nt, Ni) cosine-similarity matrix
        (ref: clip.py:26-40). One matmul over the shared normalized
        encoders — serving (ClipRetrieval) reuses exactly these, so the
        two paths cannot drift."""
        t = self.encode_text(params, text)
        i = self.encode_image(params, image)
        return layers.matmul_f32acc(t, i.T, self.compute_dtype)

    def symmetric_ce_loss(self, params, text: jnp.ndarray,
                          image: jnp.ndarray) -> jnp.ndarray:
        """Symmetric cross-entropy on the sim matrix with arange labels
        (ref: clip.py:105-110). Rows and columns must be class-deduped by the
        caller (ref: clip.py:94-97)."""
        sim = self.forward(params, text, image)
        labels = jnp.arange(sim.shape[0], dtype=jnp.int32)
        loss_1 = cross_entropy(sim, labels)
        loss_2 = cross_entropy(sim.T, labels)
        return (loss_1 + loss_2) / 2.0

    def retrieval_scores(self, params, text: jnp.ndarray,
                         images: jnp.ndarray) -> jnp.ndarray:
        """Zero/few-shot retrieval windows (ref: clip.py:53-73).

        Args:
          text:   (W, E_t) — one text per window (the window's first item).
          images: (W, n_ways, E_i) — candidate images per window.
        Returns:
          (W,) float 1/0 — whether image 0 scored highest for its text.
        """
        def one(t, ims):
            sim = self.forward(params, t[None, :], ims)  # (1, n_ways)
            return (jnp.argmax(sim) == 0).astype(jnp.float32)
        return jax.vmap(one)(text, images)
