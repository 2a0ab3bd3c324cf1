"""PureImageNetwork — the MAML base model.

An MLP over precomputed image embeddings: ReLU hidden stack + linear head to
``n_way`` logits (ref: fumi/models/maml.py:15-33). Params are an explicit
tuple-of-dicts pytree so the inner loop adapts them functionally (the JAX
replacement for torchmeta's MetaLinear/MetaSequential ``params=`` kwarg).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers


def init(key: jax.Array, im_embed_dim: int = 2048, n_way: int = 5,
         hidden_dims: Optional[Sequence[int]] = (256, 64)):
    """Params for [im_embed_dim, *hidden_dims, n_way] linear stack."""
    dims = [im_embed_dim, *(hidden_dims or ()), n_way]
    return layers.mlp_init(key, dims)


def apply(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Forward: ReLU between layers, raw logits out (ref: maml.py:24-33).

    ``compute_dtype``: matmul operand dtype (bf16 MXU path with fp32
    accumulation/activations — see layers.linear); None = pure fp32."""
    for p in params[:-1]:
        x = jax.nn.relu(layers.linear(p, x, compute_dtype))
    return layers.linear(params[-1], x, compute_dtype)
