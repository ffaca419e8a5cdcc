"""Pallas TPU kernel: fused masked-mean over identity-layout blocks.

The last sampled hop is identity-appended (sampler.append_frontier): the
block's src rows for dst ``d`` are the contiguous feature rows
``x[off + d*f : off + (d+1)*f]``. The first model layer's neighbor
aggregation is then a grouped masked mean over consecutive rows.

The XLA formulation (slice -> reshape -> masked reduce, plus the
mask*convert pass in the fetch) executes as FOUR separate HBM passes
over the ~700MB gathered feature array at bench shapes — the (P*f, D)
-> (P, f, D) reshape re-tiles sublanes so none of them fuse
(xprof: multiply_convert_fusion 1.54ms + slice 0.97 + reshape.951 1.31
+ multiply_reduce 1.00 = 4.8ms/step). This kernel does the whole thing
in ONE pass: double-buffered DMA of the appended rows, slot-mask
multiply, and the grouped sum as an MXU contraction against an
iota-built block-diagonal summing matrix S[d, e] = (e // f == d).

No VJP is needed: input features carry no gradient (the reference
likewise never backprops into raw features), so the op sits on the
primal-only path of the train step.

Replaces (with ops.segment.fanout_gather_mean as the XLA fallback) the
aggregation the reference client delegates to DGL SpMM
(``pytorch_extension/legion_graphsage.py:37-64``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 128   # dst rows per grid step (MXU-sized)


def _kernel(x_hbm, mask_ref, out_ref, scratch, sems, *,
            prefix: int, fanout: int, tile_p: int, norm: str):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    tpf = tile_p * fanout

    def dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(prefix + idx * tpf, tpf), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()

    m = mask_ref[:].astype(jnp.float32)                   # (tp, f)
    cnt = jnp.sum(m, axis=1, keepdims=True)               # (tp, 1)
    # the summing matrix folds the slot mask in: S[d, k*f + j] is
    # m[d, j] on the block diagonal (k == d), 0 elsewhere, so
    # dot(S, rows)[d] = sum_j m[d, j] * rows[d*f + j]
    m_rep = jnp.tile(m, (1, tile_p))                      # (tp, tp*f)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_p, tpf), 0)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_p, tpf), 1)
    lo = d_iota * fanout
    band = (e_iota >= lo) & (e_iota < lo + fanout)
    s = jnp.where(band, m_rep, 0.0).astype(jnp.bfloat16)
    dma(i % 2, i).wait()
    rows = scratch[i % 2].astype(jnp.bfloat16)
    agg = jnp.dot(s, rows, preferred_element_type=jnp.float32)
    denom = jnp.maximum(cnt, 1.0)
    if norm == "mean":                      # SAGE mean aggregator
        agg = agg / denom
    elif norm == "sqrt":                    # GCN 'both' (src out-deg = 1)
        agg = agg * jax.lax.rsqrt(denom)
    out_ref[:] = agg.astype(out_ref.dtype)


# VMEM budget for the double-buffered row scratch (2 x TILE_P x f x D
# f32). v5e has ~16 MiB/core; leave room for the mask/S/out tiles.
_SCRATCH_VMEM_LIMIT = 8 << 20


def supported(x: jnp.ndarray, nbr_mask: jnp.ndarray,
              identity_offset: int) -> bool:
    p, f = nbr_mask.shape
    return (jax.default_backend() == "tpu"
            and x.dtype == jnp.float32
            and p % TILE_P == 0
            and x.shape[1] % 128 == 0
            and x.shape[0] >= identity_offset + p * f
            and 2 * TILE_P * f * x.shape[1] * 4 <= _SCRATCH_VMEM_LIMIT)


@functools.partial(jax.jit,
                   static_argnames=("identity_offset", "out_dtype",
                                    "norm", "interpret"))
def identity_masked_mean_pallas(x: jnp.ndarray, nbr_mask: jnp.ndarray,
                                identity_offset: int,
                                out_dtype=jnp.bfloat16,
                                norm: str = "mean",
                                interpret: bool = False) -> jnp.ndarray:
    """out[d] = reduce over valid slots j of x[identity_offset + d*f + j].

    norm: "mean" (SAGE), "sqrt" (GCN 'both': sum / sqrt(in-deg); the src
    1/sqrt(out-deg) factor is exactly 1 on identity blocks since every
    appended row carries at most one edge), or "sum".

    x: (F_cap, D) float32 (D % 128 == 0), nbr_mask: (P, f) bool with
    P % 128 == 0. Zero-in-degree rows yield 0 (cnt clamped), matching
    ops.segment.fanout_gather_mean / the GCN norm guards.
    """
    p, fanout = nbr_mask.shape
    d = x.shape[1]
    assert p % TILE_P == 0 and d % 128 == 0
    assert norm in ("mean", "sqrt", "sum")
    tpf = TILE_P * fanout

    return pl.pallas_call(
        functools.partial(_kernel, prefix=identity_offset,
                          fanout=fanout, tile_p=TILE_P, norm=norm),
        grid=(p // TILE_P,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays HBM
            pl.BlockSpec((TILE_P, fanout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_P, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tpf, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, nbr_mask)
