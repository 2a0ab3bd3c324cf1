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

    def forward(self, params, text: jnp.ndarray,
                image: jnp.ndarray) -> jnp.ndarray:
        """(Nt, E_t), (Ni, E_i) -> (Nt, Ni) cosine-similarity matrix
        (ref: clip.py:26-40)."""
        t = layers.linear(params["text_fc2"],
                          jax.nn.relu(layers.linear(params["text_fc"], text)))
        i = layers.linear(params["image_fc2"],
                          jax.nn.relu(layers.linear(params["image_fc"],
                                                    image)))
        t_norm = jnp.linalg.norm(t, axis=-1, keepdims=True)  # (Nt, 1)
        i_norm = jnp.linalg.norm(i, axis=-1, keepdims=True)  # (Ni, 1)
        sim = jnp.matmul(t, i.T, preferred_element_type=t.dtype)
        return sim / t_norm / i_norm.T

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
