"""Pallas TPU kernel: per-row lane select for windowed neighbor sampling.

Computes ``out[p, f] = win[p, off[p, f]]`` for ``win: (P, LANES) int32``
adjacency windows (two 512B HBM lines per frontier node) and per-slot
draw offsets ``off: (P, F) int32`` with ``0 <= off < LANES``.

Why a kernel: the XLA formulation (one-hot + einsum, see
``sampling.sampler._select_lanes``) materializes the (P, F, LANES)
one-hot through HBM — 5.4ms at hop-2 bench shapes (142k x f10 x 256),
measured independent of contraction count or dtype (tools/
bench_select.py), i.e. bound by that materialization, not MXU math.
Here each window tile is read into VMEM once and every slot's lane is
selected by a masked sum entirely on-chip, so total HBM traffic is one
pass over ``win`` + the tiny ``off``/``out`` arrays (~145MB at the
bench shape == ~0.2ms of stream time).

Replaces the lane-select half of the reference's per-edge sampled reads
(``src/Kernels.cu:399-411``); the line fetch half stays on XLA's take
(descriptor-rate-bound, tools/bench_gather.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 512  # window rows per grid step; VMEM use = TILE_P*LANES*4B


def _select_kernel(win_ref, off_ref, out_ref, *, fanout):
    win = win_ref[:]                                  # (TP, LANES) int32
    lanes = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    cols = []
    for f in range(fanout):
        o = off_ref[:, f][:, None]                    # (TP, 1)
        v = jnp.sum(jnp.where(lanes == o, win, 0), axis=1)
        cols.append(v)
    out_ref[:] = jnp.stack(cols, axis=1)              # (TP, F)


@functools.partial(jax.jit, static_argnames=("tile_p",))
def select_lanes_pallas(win: jnp.ndarray, off: jnp.ndarray,
                        tile_p: int = TILE_P) -> jnp.ndarray:
    """out[p, f] = win[p, off[p, f]]. P is padded to the tile size
    internally; callers on the hot path pass 128-aligned P (frontier
    caps are 128-aligned by construction)."""
    p, lanes = win.shape
    fanout = off.shape[1]
    assert off.shape[0] == p
    if p % tile_p != 0:
        pp = (p + tile_p - 1) // tile_p * tile_p
        win = jnp.pad(win, ((0, pp - p), (0, 0)))
        off = jnp.pad(off, ((0, pp - p), (0, 0)))
        return select_lanes_pallas(win, off, tile_p)[:p]

    return pl.pallas_call(
        functools.partial(_select_kernel, fanout=fanout),
        grid=(p // tile_p,),
        in_specs=[
            pl.BlockSpec((tile_p, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, fanout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, fanout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, fanout), jnp.int32),
    )(win, off)
