"""Conv4 — the standard few-shot raw-image backbone.

The reference leaves raw-image encoding as a TODO (its ``resnet`` branch is
also a Linear over precomputed embeddings, ref: fumi/models/am3.py:44-46),
and BASELINE.json's config list names "MAML image-only Conv4". This module
provides that capability TPU-natively: 4 blocks of
[Conv3×3(64) → batch-stat norm → ReLU → MaxPool2×2], flatten, linear head —
the classic Vinyals/Finn architecture as pure functions over a params
pytree, so the same inner-loop engine adapts it.

Normalization uses current-batch statistics at train AND eval (the standard
MAML convention — no running stats; equivalent to torch BatchNorm2d in
training mode), which keeps the function pure.

Layout is NHWC (TPU-native); convs lower onto the MXU. Under
``compute_dtype=bfloat16`` the blocks store their HBM-resident
activations in bf16 (the path is HBM-bandwidth bound — docs/PERFORMANCE.md
"Raw-image conv path") while all elementwise/statistics math runs f32
inside the fused kernels; features leave the backbone f32.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers

EPS = 1e-5


def conv_init(key: jax.Array, in_ch: int, out_ch: int,
              kh: int = 3, kw: int = 3) -> Dict[str, jnp.ndarray]:
    """torch ``nn.Conv2d`` default init: U(−1/√fan_in, 1/√fan_in) for both
    kernel and bias, fan_in = in_ch·kh·kw. Kernel stored HWIO."""
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (kh, kw, in_ch, out_ch), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(bk, (out_ch,), jnp.float32, -bound, bound),
        "gamma": jnp.ones((out_ch,), jnp.float32),
        "beta": jnp.zeros((out_ch,), jnp.float32),
    }


def _is_low_precision(compute_dtype) -> bool:
    return (compute_dtype is not None
            and jnp.dtype(compute_dtype) != jnp.float32)


# MaxPool2×2 implementation: "reshape" (default) and "slices" express the
# pool as an elementwise maximum over four views, which XLA fuses with the
# preceding normalize/affine/relu chain into ONE pass over the conv output
# — the reduce_window form materializes the full-size normalized tensor to
# HBM first, a full write + read the HBM-bound raw-image path pays for
# nothing (measured +19%: 28.1 → 33.4 eps/s conv4-bf16, which lands the
# path AT the HBM roofline — docs/PERFORMANCE.md "Raw-image conv path").
# "reduce_window" kept for A/B (scripts/exp_conv_bench.py --pool).
# "slices" (strided views instead of reshape) computes the same thing and
# wins identically in isolation, but deterministically CRASHES the TPU
# worker ("kernel fault") when its backward pass sits inside the chunked
# driver's outer lax.scan on this stack — kept only as the measured-fault
# record + CPU-parity pin (test_maxpool_impls_agree); do not default it.
# Tie-breaking note: reduce_window routes the gradient of a tied window to
# one element (torch convention); reshape/slices split it among the tied
# elements — both are valid subgradients, exact ties are rare off the
# relu-zero plateau, and the backbones are extensions (no torch twin).
POOL_IMPL = "reshape"


def maxpool2x2(y: jnp.ndarray) -> jnp.ndarray:
    """2×2/stride-2 VALID max-pool on NHWC (odd trailing row/col dropped,
    matching reduce_window VALID)."""
    if POOL_IMPL == "slices":
        h2, w2 = y.shape[1] // 2, y.shape[2] // 2
        y = y[:, : h2 * 2, : w2 * 2]
        a = jnp.maximum(y[:, 0::2, 0::2], y[:, 0::2, 1::2])
        b = jnp.maximum(y[:, 1::2, 0::2], y[:, 1::2, 1::2])
        return jnp.maximum(a, b)
    if POOL_IMPL == "reshape":
        n, h, w, c = y.shape
        h2, w2 = h // 2, w // 2
        y = y[:, : h2 * 2, : w2 * 2].reshape(n, h2, 2, w2, 2, c)
        return jnp.max(y, axis=(2, 4))
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def batch_stat_norm(y: jnp.ndarray, params: Dict[str, jnp.ndarray],
                    low_precision: bool) -> jnp.ndarray:
    """+bias → per-channel (N, H, W) batch-stat normalize → affine.

    The one normalization used by BOTH raw-image backbones (conv4 blocks
    and resnet12's conv+norm units — a numerics change here changes
    both). Returns f32 in both modes; callers apply their activation and
    cast back to the storage dtype on the low-precision path.

    fp32 (``low_precision=False``): classic two-pass (x−mean)² variance
    over the f32 conv output.
    low-precision: ``y`` is the storage dtype (bf16); one upcast, then
    the E[x²]−E[x]² form — both reductions read ``y`` independently, so
    XLA fuses them into ONE pass over the bf16 conv output (the two-pass
    form serializes var behind mean; measured +5% on conv4). f32
    accumulation; the clamp guards the subtraction's rounding."""
    # the per-channel statistics are NAMED so the save_convs remat
    # policy CAN checkpoint them (inner_loop.SAVE_CONVS_NAMES) — an A/B
    # that measured NEGATIVE on chip (the saved-stat boundary fences the
    # stats pass's fusion; numbers at inner_loop.SAVE_CONVS_NAMES), so
    # the shipped policy keeps conv outputs only and these names are
    # inert. Identity under every policy that doesn't list them.
    from jax.ad_checkpoint import checkpoint_name
    if not low_precision:
        y = y + params["b"]
        mean = checkpoint_name(
            jnp.mean(y, axis=(0, 1, 2), keepdims=True), "norm_stat")
        var = checkpoint_name(
            jnp.mean(jnp.square(y - mean), axis=(0, 1, 2), keepdims=True),
            "norm_stat")
        y = (y - mean) * jax.lax.rsqrt(var + EPS)
        return y * params["gamma"] + params["beta"]
    yb = y.astype(jnp.float32) + params["b"]
    mean = jnp.mean(yb, axis=(0, 1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(yb), axis=(0, 1, 2), keepdims=True)
    mean = checkpoint_name(mean, "norm_stat")
    var = checkpoint_name(jnp.maximum(m2 - jnp.square(mean), 0.0),
                          "norm_stat")
    yn = (yb - mean) * jax.lax.rsqrt(var + EPS)
    return yn * params["gamma"] + params["beta"]


def conv_block(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
               compute_dtype=None) -> jnp.ndarray:
    """Conv3×3 (SAME) → batch-stat norm → ReLU → MaxPool2×2 on NHWC.

    ``compute_dtype=jnp.bfloat16``: conv operands in bf16 AND the
    block's HBM-resident activations (conv output, normalized output,
    pooled output) stored bf16 — the raw-image path is HBM-bandwidth
    bound on exactly this traffic (docs/PERFORMANCE.md "Raw-image conv
    path"). Every elementwise/statistics computation still runs in f32
    INSIDE the fused kernels (the upcast fuses into each consumer), so
    storage rounding — plus the norm's variance FORMULATION (one-pass
    E[x²]−E[x]² vs the fp32 path's two-pass (x−mean)², see
    :func:`batch_stat_norm`) — are the only differences from the fp32
    path; norm statistics accumulate f32. Gradients re-enter fp32 at
    the param boundaries via the casts' VJPs."""
    low = _is_low_precision(compute_dtype)
    y = layers.conv2d_f32acc(x, params["w"], compute_dtype, keep_dtype=low)
    y = jax.nn.relu(batch_stat_norm(y, params, low))
    if low:
        y = y.astype(compute_dtype)
    return maxpool2x2(y)


def feature_dim(im_size: int, hidden: int = 64, blocks: int = 4) -> int:
    """Flattened feature size after `blocks` stride-2 pools."""
    s = im_size
    for _ in range(blocks):
        s = s // 2
    return s * s * hidden


def init(key: jax.Array, im_size: int = 84, in_channels: int = 3,
         hidden: int = 64, n_way: int = 5, blocks: int = 4):
    """Params: `blocks` conv blocks + linear head to n_way logits."""
    if feature_dim(im_size, hidden, blocks) <= 0:
        raise ValueError(
            f"im_size={im_size} collapses to zero spatial extent after "
            f"{blocks} 2x2 pools; need im_size >= {2 ** blocks}")
    keys = jax.random.split(key, blocks + 1)
    convs = []
    ch = in_channels
    for i in range(blocks):
        convs.append(conv_init(keys[i], ch, hidden))
        ch = hidden
    head = layers.linear_init(keys[-1], feature_dim(im_size, hidden, blocks),
                              n_way)
    return {"convs": tuple(convs), "head": head}


# Block-level rematerialization: wrap each conv_block in jax.checkpoint so
# reverse-mode saves only the block INPUTS (4× smaller than the conv
# outputs after each pool) and recomputes the block forward inside the
# backward. On the HBM-bound raw-image path this trades near-free MXU
# FLOPs (single-digit MFU) for residual traffic — A/B'd by
# scripts/exp_conv_bench.py --block_remat; measured numbers in
# docs/PERFORMANCE.md "Raw-image conv path".
BLOCK_REMAT = False


def backbone(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """(M, H, W, C) images → (M, F) flat features (always f32 — the bf16
    activation-storage policy ends at the backbone boundary, so heads,
    prototypes, and losses see fp32 features)."""
    block = (jax.checkpoint(conv_block, static_argnums=(2,)) if BLOCK_REMAT
             else conv_block)
    for p in params["convs"]:
        x = block(p, x, compute_dtype)
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def apply(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """(M, H, W, C) → (M, n_way) logits. MAML-adaptable end to end."""
    return layers.linear(params["head"], backbone(params, x, compute_dtype),
                         compute_dtype)
