"""ResNet-12 — the heavy-duty few-shot raw-image backbone.

The second rung of the raw-image ladder the reference leaves as a TODO
(ref: fumi/models/am3.py:44-46; conv4.py is the first): the standard
ResNet-12 of TADAM/MetaOptNet — 4 residual stages of 3×[conv3×3 →
batch-stat norm → leaky-ReLU] with a 1×1-projection shortcut and a 2×2
max-pool per stage, channels (64, 160, 320, 640), global average pool →
640-d features. Pure functions over a params pytree, so the same
inner-loop engine adapts it (MAML) and the same episode losses consume it
(AM3); select with ``--im_encoder resnet12``.

As in conv4.py, normalization uses current-batch statistics at train AND
eval (the standard MAML convention — no running stats), keeping every
function pure. Layout NHWC; convs lower onto the MXU, and the wide later
stages (320/640 channels) are exactly the shapes the ``mp`` mesh axis
exists for.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fumi_tpu.models import layers
from fumi_tpu.models.conv4 import EPS, conv_init, maxpool2x2

CHANNELS: Tuple[int, ...] = (64, 160, 320, 640)
LEAK = 0.1

# Stage-selective rematerialization — MEASURED NEGATIVE, experiment
# switch only (scripts/exp_conv_bench.py --stage_remat). The hypothesis
# was attractive: activation bytes are front-loaded (per image, bf16,
# default channels at 84x84 the four stages hold ~47/30/15/8% of the
# stored residuals) while recompute FLOPs are roughly uniform across
# stages, so checkpointing only the early high-res stages should buy
# whole-step remat's memory relief at a fraction of its recompute. On
# the chip it loses (bf16, 84x84, B=4, 5-step second-order MAML):
# whole-step remat 4.4 eps/s > stages 1100 4.0 > stages 1110 3.8;
# storing more (1000, or no remat at all) RESOURCE_EXHAUSTs the 16G
# chip even at bf16. The per-stage checkpoint boundaries force the
# boundary tensors to materialize in HBM on both passes and fence XLA's
# cross-stage fusion — costing more traffic than the skipped recompute
# saves. Numbers in docs/PERFORMANCE.md "Raw-image conv path";
# `--tpu_remat auto` therefore keeps whole-step remat for resnet12.
STAGE_REMAT_OVERRIDE: Optional[Tuple[bool, ...]] = None


def _conv_bn(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
             compute_dtype=None) -> jnp.ndarray:
    """conv (SAME) → batch-stat norm, NHWC. Kernel size from the params.

    ``compute_dtype=jnp.bfloat16``: conv operands in bf16 and the unit's
    HBM-resident activations stored bf16 (same activation-storage policy
    as conv4.conv_block — the raw-image path is HBM-bound on this
    traffic); statistics and all elementwise math still run f32 inside
    the fused kernels (conv4.batch_stat_norm, shared with conv4's
    blocks), so the differences from the fp32 path are storage rounding
    plus the norm's variance formulation (one-pass E[x²]−E[x]² vs
    two-pass (x−mean)² — batch_stat_norm documents both)."""
    from fumi_tpu.models.conv4 import _is_low_precision, batch_stat_norm
    low = _is_low_precision(compute_dtype)
    y = layers.conv2d_f32acc(x, params["w"], compute_dtype, keep_dtype=low)
    y = batch_stat_norm(y, params, low)
    return y.astype(compute_dtype) if low else y


def block_init(key: jax.Array, in_ch: int, out_ch: int) -> Dict:
    """One residual stage: three 3×3 conv+norm units and the 1×1
    projection shortcut (always projected — channel counts change at
    every stage)."""
    k1, k2, k3, ks = jax.random.split(key, 4)
    return {
        "c1": conv_init(k1, in_ch, out_ch),
        "c2": conv_init(k2, out_ch, out_ch),
        "c3": conv_init(k3, out_ch, out_ch),
        "sc": conv_init(ks, in_ch, out_ch, kh=1, kw=1),
    }


def res_block(params: Dict, x: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """3×[conv-norm(-leaky)] + projected shortcut → leaky → maxpool 2×2."""
    y = jax.nn.leaky_relu(_conv_bn(params["c1"], x, compute_dtype), LEAK)
    y = jax.nn.leaky_relu(_conv_bn(params["c2"], y, compute_dtype), LEAK)
    y = _conv_bn(params["c3"], y, compute_dtype)
    sc = _conv_bn(params["sc"], x, compute_dtype)
    y = jax.nn.leaky_relu(y + sc, LEAK)
    return maxpool2x2(y)


def feature_dim(im_size: int = 84,
                channels: Tuple[int, ...] = CHANNELS) -> int:
    """Global average pooling makes the feature dim spatial-size free."""
    if im_size < 2 ** len(channels):
        raise ValueError(
            f"im_size={im_size} collapses to zero spatial extent after "
            f"{len(channels)} 2x2 pools; need im_size >= "
            f"{2 ** len(channels)}")
    return channels[-1]


def init(key: jax.Array, im_size: int = 84, in_channels: int = 3,
         n_way: int = 5, channels: Tuple[int, ...] = CHANNELS):
    """Params: one residual stage per entry of ``channels`` + linear head
    (head omitted by FuMI-style headless consumers via params["blocks"])."""
    feature_dim(im_size, channels)  # validates the spatial budget
    keys = jax.random.split(key, len(channels) + 1)
    blocks = []
    ch = in_channels
    for i, out_ch in enumerate(channels):
        blocks.append(block_init(keys[i], ch, out_ch))
        ch = out_ch
    head = layers.linear_init(keys[-1], channels[-1], n_way)
    return {"blocks": tuple(blocks), "head": head}


def backbone(params, x: jnp.ndarray, compute_dtype=None,
             stage_remat: Optional[Tuple[bool, ...]] = None) -> jnp.ndarray:
    """(M, H, W, C) images → (M, channels[-1]) globally-pooled features
    (always f32 — the bf16 activation-storage policy ends here; the
    global-average reduction accumulates f32).

    ``stage_remat[i]`` wraps stage i in ``jax.checkpoint``: only the
    stage's INPUT is stored for the backward pass, the intra-stage
    conv/norm/relu residuals are recomputed. Measured negative vs
    whole-step remat (docs/PERFORMANCE.md "Stage-selective remat");
    driven only by the STAGE_REMAT_OVERRIDE experiment switch."""
    for i, p in enumerate(params["blocks"]):
        if (stage_remat is not None and i < len(stage_remat)
                and stage_remat[i]):
            x = jax.checkpoint(functools.partial(
                res_block, compute_dtype=compute_dtype))(p, x)
        else:
            x = res_block(p, x, compute_dtype)
    return jnp.mean(x, axis=(1, 2), dtype=jnp.float32)


def apply(params, x: jnp.ndarray, compute_dtype=None,
          stage_remat: Optional[Tuple[bool, ...]] = None) -> jnp.ndarray:
    """(M, H, W, C) → (M, n_way) logits. MAML-adaptable end to end."""
    from fumi_tpu.models import layers
    return layers.linear(params["head"],
                         backbone(params, x, compute_dtype, stage_remat),
                         compute_dtype)
