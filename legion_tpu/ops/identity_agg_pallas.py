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

# dst rows per grid step. 64 is the compatibility floor (every caller's
# row count is 64-aligned; used by the supported() checks). IN-STEP the
# 128 tile measured consistently faster on the identity path (r5 A/B,
# 3 interleaved pairs at bench shapes: 16.57-16.58 vs 16.62-16.65
# ms/step — fewer grid steps amortize the per-tile mask build), while
# the STANDALONE tile study preferred 64 (228 vs 180 GB/s,
# tools/bench_agg_tile.py) — dispatch overhead skews standalone numbers
# toward small tiles. The kernel therefore upgrades to 128 whenever the
# row count divides and the DMA ring fits VMEM (see _pick_tile);
# explicit tile_p / LEGION_AGG_TILE override both.
TILE_P = 64
_TILE_P_FAST = 128


def _kernel(x_hbm, mask_ref, out_ref, scratch, sems, band_ref, *,
            prefix: int, fanout: int, tile_p: int, norm: str,
            ring: int, nsteps: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    tpf = tile_p * fanout

    def dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(prefix + idx * tpf, tpf), :],
            scratch.at[slot], sems.at[slot])

    # ring-deep DMA pipeline: prime `ring` slabs at step 0, then keep
    # the ring full (slab i+ring-1 started at step i)
    @pl.when(i == 0)
    def _():
        for s in range(min(ring, nsteps)):
            dma(s % ring, s).start()

    @pl.when((i > 0) & (i + ring - 1 < n))
    def _():
        dma((i + ring - 1) % ring, i + ring - 1).start()

    # the block-diagonal band is IDENTICAL for every tile — build it
    # once into scratch instead of re-deriving two iotas + compares per
    # tile (the per-tile S-build was ~1/3 of kernel compute)
    @pl.when(i == 0)
    def _():
        d_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_p, tpf), 0)
        e_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_p, tpf), 1)
        lo = d_iota * fanout
        band_ref[:] = ((e_iota >= lo) & (e_iota < lo + fanout)
                       ).astype(jnp.bfloat16)

    m = mask_ref[:].astype(jnp.float32)                   # (tp, f)
    cnt = jnp.sum(m, axis=1, keepdims=True)               # (tp, 1)
    # the summing matrix folds the slot mask in: S[d, k*f + j] is
    # m[d, j] on the block diagonal (k == d), 0 elsewhere, so
    # dot(S, rows)[d] = sum_j m[d, j] * rows[d*f + j]
    m_rep = jnp.tile(m, (1, tile_p)).astype(jnp.bfloat16)  # (tp, tp*f)
    s = band_ref[:] * m_rep
    dma(i % ring, i).wait()
    rows = scratch[i % ring]
    if rows.dtype != jnp.bfloat16:
        rows = rows.astype(jnp.bfloat16)
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


def _pick_tile(p: int, fanout: int, d: int, itemsize: int,
               ring: int) -> int:
    """Fast tile when the row count divides and the ring fits VMEM;
    TILE_P (the compatibility floor callers' supported() checks assume)
    otherwise."""
    if (p % _TILE_P_FAST == 0
            and ring * _TILE_P_FAST * fanout * d * itemsize
            <= _SCRATCH_VMEM_LIMIT):
        return _TILE_P_FAST
    return TILE_P


def supported(x: jnp.ndarray, nbr_mask: jnp.ndarray,
              identity_offset: int) -> bool:
    p, f = nbr_mask.shape
    return (jax.default_backend() == "tpu"
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and p % TILE_P == 0
            and x.shape[1] % 128 == 0
            and x.shape[0] >= identity_offset + p * f
            and 2 * TILE_P * f * x.shape[1] * x.dtype.itemsize
            <= _SCRATCH_VMEM_LIMIT)


@functools.partial(jax.jit,
                   static_argnames=("identity_offset", "out_dtype",
                                    "norm", "interpret", "tile_p",
                                    "ring"))
def identity_masked_mean_pallas(x: jnp.ndarray, nbr_mask: jnp.ndarray,
                                identity_offset: int,
                                out_dtype=jnp.bfloat16,
                                norm: str = "mean",
                                interpret: bool = False,
                                tile_p: int | None = None,
                                ring: int | None = None) -> jnp.ndarray:
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
    # d MUST be a 128-lane multiple: Mosaic rejects HBM memref slices
    # whose minor dim is not tile-aligned ("Slice shape along dimension
    # 1 must be aligned to tiling (128), but is 47") — verified on-chip;
    # interpret mode does not catch it. Callers pad the lane dim before
    # the producing op (gathered_masked_mean pads h_t pre-gather).
    assert d % 128 == 0
    assert norm in ("mean", "sqrt", "sum")
    import os
    if ring is None:
        ring = int(os.environ.get("LEGION_AGG_RING", "3"))
    if tile_p is None:
        # A/B knob (like LEGION_AGG_RING): honored only when the row
        # count divides — the layer-2 gathered path (P = batch, not
        # 128-aligned) keeps the picked tile rather than losing the
        # kernel. An explicit tile_p argument bypasses both.
        env_tile = int(os.environ.get("LEGION_AGG_TILE", "0"))
        if env_tile > 0 and p % env_tile == 0:
            tile_p = env_tile
        else:
            tile_p = _pick_tile(p, fanout, d, x.dtype.itemsize, ring)
    assert p % tile_p == 0
    tpf = tile_p * fanout

    return pl.pallas_call(
        functools.partial(_kernel, prefix=identity_offset,
                          fanout=fanout, tile_p=tile_p, norm=norm,
                          ring=ring, nsteps=p // tile_p),
        grid=(p // tile_p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays HBM
            pl.BlockSpec((tile_p, fanout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ring, tpf, d), x.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((tile_p, tpf), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, nbr_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _masked_agg_rows(rows: jnp.ndarray, nbr_mask: jnp.ndarray,
                     norm: str = "mean",
                     interpret: bool = False) -> jnp.ndarray:
    """out[d] = norm-reduce over valid slots j of rows[d*f + j] — the
    fused kernel applied to an already-gathered (P*f, D) row array
    (prefix 0), made differentiable in ``rows``.

    Unlike the raw-feature identity path, gathered rows DO carry
    gradient (they are fc_neigh outputs); the backward of a grouped
    masked mean/sum is a broadcast — d_rows[d*f+j] = m[d,j] * d_out[d]
    (/ cnt[d] for mean) — i.e. a monotone row-repeat, NOT a scatter,
    and with no (P, f, D) re-tiling reshape on either pass (the XLA
    take+reshape formulation spends ~0.85 ms/step re-tiling sublanes at
    bench shapes, xprof reshape.782/784)."""
    return identity_masked_mean_pallas(
        rows, nbr_mask, 0, out_dtype=rows.dtype, norm=norm,
        interpret=interpret)


def _masked_agg_rows_fwd(rows, nbr_mask, norm, interpret):
    return _masked_agg_rows(rows, nbr_mask, norm, interpret), nbr_mask


def _masked_agg_rows_bwd(norm, interpret, nbr_mask, g):
    import numpy as np
    p, f = nbr_mask.shape
    scale = _bwd_scale(g, nbr_mask, norm)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (p * f, 1), 0)
           // f).squeeze(-1)
    d_rows = jnp.take(scale, idx, axis=0) * nbr_mask.reshape(-1)[:, None
                                                                 ].astype(g.dtype)
    return d_rows, np.zeros(nbr_mask.shape, jax.dtypes.float0)


_masked_agg_rows.defvjp(_masked_agg_rows_fwd, _masked_agg_rows_bwd)


def _bwd_scale(g, nbr_mask, norm):
    """Per-dst gradient rows of the masked norm-reduce: scale[d] is what
    every valid edge of dst d contributes to its src row."""
    cnt = jnp.sum(nbr_mask, axis=1, keepdims=True).astype(g.dtype)
    denom = jnp.maximum(cnt, 1)
    if norm == "mean":
        return g / denom
    if norm == "sqrt":
        return g * jax.lax.rsqrt(denom.astype(jnp.float32)).astype(g.dtype)
    return g                                                  # sum


def gathered_mean_supported(h_t: jnp.ndarray, nbr_mask: jnp.ndarray) -> bool:
    p, f = nbr_mask.shape
    dpad = (h_t.shape[1] + 127) // 128 * 128
    return (jax.default_backend() == "tpu"
            and h_t.dtype in (jnp.float32, jnp.bfloat16)
            and p % TILE_P == 0
            and 2 * TILE_P * f * dpad * h_t.dtype.itemsize
            <= _SCRATCH_VMEM_LIMIT)


def gathered_masked_mean(h_t: jnp.ndarray, nbr_pos: jnp.ndarray,
                         nbr_mask: jnp.ndarray, norm: str = "mean",
                         interpret: bool = False) -> jnp.ndarray:
    """Fanout aggregation of transformed activations:
    out[d] = norm-reduce_{valid j} h_t[nbr_pos[d, j]] with shape (P, D);
    norm: "mean" (SAGE), "sum" (GCN pre-norm), "sqrt".

    The row gather stays on XLA (its VJP is the unavoidable
    scatter-add transpose — a sorted-scatter reformulation riding the
    dedup's sort order was measured and LOSES: see
    tools/bench_scatter_bwd.py and the negative-results notes in
    docs/ARCHITECTURE.md); the masked reduce runs as the fused kernel,
    replacing take->(P,f,D) reshape->mask->reduce. The lane dim is
    padded to 128 before the gather: Mosaic rejects HBM slices with a
    sub-128 minor dim, so an unpadded (E, 47) input cannot be DMA'd
    (XLA may materialize the pad as its own pass — measured 0.17
    ms/step — but there is no Mosaic-legal way around it)."""
    d = h_t.shape[1]
    dpad = (d + 127) // 128 * 128
    if d != dpad:
        h_t = jnp.pad(h_t, ((0, 0), (0, dpad - d)))
    rows = jnp.take(h_t, nbr_pos.reshape(-1), axis=0)
    out = _masked_agg_rows(rows, nbr_mask, norm, interpret)
    return out[:, :d]
