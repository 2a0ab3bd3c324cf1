"""Pallas TPU kernels for the episodic hot path.

The framework's per-step device work is (a) assembling episodes by gathering
rows from the HBM-resident embedding table and (b) small MXU matmul chains.
XLA already fuses (b) well at these shapes; the kernel opportunity is (a):

- :func:`gather_rows` — row gather ``table[indices]`` as a Pallas kernel:
  indices arrive via scalar prefetch (PrefetchScalarGridSpec) so the DMA
  engine can start copying HBM rows into the VMEM output block before the
  kernel body computes anything; each grid program issues its block's row
  copies back-to-back (many outstanding DMAs) and then waits — the
  "start-all, wait-all" variant of the double-buffering pattern.

Use :func:`gather_rows_reference` (``jnp.take``) interchangeably; the
sampler picks per a flag, and `bench_gather.py` measures which wins at the
deployed shapes. Gradients are not needed through the gather (the table is
data, not parameters), matching how episode tensors enter the loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_rows_reference(table: jnp.ndarray,
                          indices: jnp.ndarray) -> jnp.ndarray:
    """XLA gather baseline: (R, D)[(M,)] -> (M, D)."""
    return jnp.take(table, indices, axis=0)


def _gather_kernel(block_rows: int, idx_ref, table_ref, out_ref, sems):
    i = pl.program_id(0)
    base = i * block_rows

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[base + j]],
            out_ref.at[j],
            sems.at[j],
        )

    # issue every row copy for this block, then drain — the DMA engine
    # overlaps the copies; nothing blocks until the first wait
    for j in range(block_rows):
        dma(j).start()
    for j in range(block_rows):
        dma(j).wait()


def gather_rows(table: jnp.ndarray, indices: jnp.ndarray,
                block_rows: int = 32,
                interpret: bool = False) -> jnp.ndarray:
    """Pallas row gather: (R, D)[(M,)] -> (M, D).

    A single (1, D) row slice of a (8, 128)-tiled HBM buffer is not
    DMA-alignable, so the table is viewed as (R, 8, D/8) — a free row-major
    reshape that makes each logical row its own aligned (8, D/8) tile
    group, sliceable at ANY row index. Requires ``D % 8 == 0``.

    ``M`` must be a multiple of ``block_rows`` (callers pad; episode shapes
    B·N·K are static so padding is static too).
    """
    M = indices.shape[0]
    R, D = table.shape
    if M % block_rows != 0:
        raise ValueError(f"M={M} not a multiple of block_rows={block_rows}")
    if D % 8 != 0:
        raise ValueError(f"feature dim {D} must be a multiple of 8")

    table3 = table.reshape(R, 8, D // 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays HBM
        out_specs=pl.BlockSpec((block_rows, 8, D // 8),
                               lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block_rows,))],
    )
    fn = pl.pallas_call(
        functools.partial(_gather_kernel, block_rows),
        out_shape=jax.ShapeDtypeStruct((M, 8, D // 8), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return fn(indices.astype(jnp.int32), table3).reshape(M, D)
