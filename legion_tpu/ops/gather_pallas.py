"""Pallas TPU kernel: batched row gather from an HBM-resident table.

The hot data-movement op of the framework (the reference's
``zero_copy_with_aggregated_cache`` / ``get_feature_kernel``,
``src/Kernels.cu:662-748``, assigns one CUDA thread per feature element).
On TPU the same op is a stream of row DMAs HBM->VMEM; this kernel keeps
``NBUF`` row DMAs in flight so the fixed DMA latency overlaps across
rows, instead of relying on XLA's generic gather lowering.

Contract matches sampling.sampler.gather_features: ids < 0 produce zero
rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 8          # row DMAs kept in flight
BLOCK_ROWS = 256  # output rows handled per grid step


def _gather_kernel(ids_ref, table_hbm, out_ref, scratch, sems):
    """Grid dim 0 walks BLOCK_ROWS-row output tiles. ids are prefetched
    scalars (SMEM); table stays in HBM and is DMA'd row by row into a
    NBUF-deep VMEM ring."""
    tile = pl.program_id(0)
    base = tile * BLOCK_ROWS

    def row_dma(slot, r):
        rid = ids_ref[base + r]
        safe = jnp.maximum(rid, 0)
        return pltpu.make_async_copy(
            table_hbm.at[safe], scratch.at[slot], sems.at[slot])

    # prime the pipeline
    for s in range(NBUF):
        row_dma(s, s).start()

    def body(r, _):
        slot = jax.lax.rem(r, NBUF)
        row_dma(slot, r).wait()
        rid = ids_ref[base + r]
        val = jnp.where(rid >= 0, scratch[slot], 0.0)
        out_ref[r, :] = val

        nxt = r + NBUF

        @pl.when(nxt < BLOCK_ROWS)
        def _():
            row_dma(slot, nxt).start()

        return 0

    jax.lax.fori_loop(0, BLOCK_ROWS, body, 0)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def gather_rows_pallas(table: jnp.ndarray, ids: jnp.ndarray,
                       block_rows: int = BLOCK_ROWS) -> jnp.ndarray:
    """out[i] = table[ids[i]] (zeros for ids < 0). ids length must be a
    multiple of BLOCK_ROWS (pad with -1)."""
    m = ids.shape[0]
    d = table.shape[1]
    assert m % block_rows == 0, f"ids length {m} not multiple of {block_rows}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, d),
                               lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, d), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), table.dtype),
    )(ids, table)
