"""Parameter initializers and primitive layers.

Pure functions over param pytrees (dicts of jnp arrays) — the JAX-native
replacement for the reference's ``nn.Module``/torchmeta ``MetaModule``
functional-forward machinery (ref: fumi/models/maml.py:8,25-33). Explicit
params make inner-loop adaptation a plain pytree update.

Initializers reproduce torch defaults so training dynamics match the
reference:
- ``nn.Linear``: weight ~ U(−1/√fan_in, 1/√fan_in) (kaiming_uniform with
  a=√5) and bias ~ U(−1/√fan_in, 1/√fan_in).
- ``nn.LSTM``: every param ~ U(−1/√hidden, 1/√hidden).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> Params:
    """torch ``nn.Linear`` default init. Weight stored (out, in) like torch."""
    bound = 1.0 / math.sqrt(in_dim)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (out_dim, in_dim), dtype,
                                minval=-bound, maxval=bound),
        "b": jax.random.uniform(bk, (out_dim,), dtype,
                                minval=-bound, maxval=bound),
    }


def linear(params: Params, x: jnp.ndarray,
           compute_dtype=None) -> jnp.ndarray:
    """y = x @ Wᵀ + b, with W shaped (out, in).

    ``compute_dtype=jnp.bfloat16`` runs the MATMUL in bf16 with fp32
    accumulation (``preferred_element_type``) — the ``--tpu_compute_dtype
    bfloat16`` mixed-precision policy: params, activations between layers,
    bias adds, losses, and every inner-loop SGD update stay fp32; only the
    dot operands are rounded. The cast's VJP casts cotangents back, so
    gradients leave fp32 too (bf16 backward dots, fp32 grads)."""
    w = params["w"]
    if compute_dtype is not None and w.dtype != jnp.dtype(compute_dtype):
        return jnp.matmul(
            x.astype(compute_dtype), w.T.astype(compute_dtype),
            preferred_element_type=jnp.float32) + params["b"]
    return jnp.matmul(x, w.T,
                      preferred_element_type=x.dtype) + params["b"]


def matmul_f32acc(a: jnp.ndarray, b: jnp.ndarray,
                  compute_dtype=None) -> jnp.ndarray:
    """``a @ b`` under the same mixed-precision policy as :func:`linear`
    (bf16 operands, fp32 accumulation) for non-layer matmuls (FuMI's
    generated head, CLIP similarity)."""
    if compute_dtype is not None and a.dtype != jnp.dtype(compute_dtype):
        return jnp.matmul(a.astype(compute_dtype), b.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, preferred_element_type=a.dtype)


def conv2d_f32acc(x: jnp.ndarray, w: jnp.ndarray, compute_dtype=None, *,
                  window_strides=(1, 1), padding="SAME",
                  keep_dtype: bool = False) -> jnp.ndarray:
    """NHWC/HWIO conv under the mixed-precision policy of :func:`linear`,
    shared by the conv4 and resnet12 backbones.

    bf16 path: operands AND conv output in bf16 (the MXU still
    accumulates f32 internally; an f32 ``preferred_element_type`` against
    bf16 operands breaks the conv's VJP — the transposed conv would see
    an f32 cotangent against bf16 operands), then cast straight back to
    f32 at the boundary so everything downstream (bias, norm,
    activations, grads via the casts' VJPs) stays f32.

    ``keep_dtype=True`` skips that cast-back and returns the bf16 conv
    output — the conv backbones' activation-storage policy: at raw-image
    geometry the path is HBM-bound on activation traffic (measured 2.8%
    MFU, docs/PERFORMANCE.md "Raw-image conv path"), so block-to-block
    tensors stay bf16 in HBM while every elementwise/norm computation
    still runs f32 inside the fused kernels that consume them."""
    cast_back = False
    if compute_dtype is not None and w.dtype != jnp.dtype(compute_dtype):
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        cast_back = not keep_dtype
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=window_strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    # named for the "save_convs" remat policy (inner_loop._maybe_remat):
    # under save_only_these_names("conv_out") the checkpointed inner step
    # stores exactly these conv outputs (pre-cast ⇒ bf16-sized on the
    # keep_dtype path) and recomputes only the cheap elementwise chains
    # between them. Identity under every other policy.
    y = jax.ad_checkpoint.checkpoint_name(y, "conv_out")
    return y.astype(jnp.float32) if cast_back else y


def dropout(key: jax.Array, x: jnp.ndarray, rate: float,
            train: bool) -> jnp.ndarray:
    """Inverted dropout, torch semantics (identity in eval mode)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mlp_init(key: jax.Array, dims: Sequence[int]) -> Tuple[Params, ...]:
    """Stack of linear params for dims [d0, d1, ..., dn]."""
    keys = jax.random.split(key, len(dims) - 1)
    return tuple(linear_init(k, dims[i], dims[i + 1])
                 for i, k in enumerate(keys))


def normc_init(key: jax.Array, shape: Tuple[int, ...], gain: float = 1.0,
               dtype=jnp.float32) -> jnp.ndarray:
    """Column-normalized normal init (ref: fumi/utils/hypernet_init.py:23-25).

    ``w ~ N(0,1); w *= gain / sqrt(sum(w², axis=1, keepdims=True))``.
    """
    w = jax.random.normal(key, shape, dtype)
    return w * gain / jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
