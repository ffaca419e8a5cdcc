#!/usr/bin/env python
"""Microbenchmark: per-row lane select variants for windowed sampling.

The windowed sampler needs out[p, f] = win[p, off[p, f]] with
win: (P, 256) int32 node-adjacency windows and off < 256. This is the
dominant cost of the sampling hop (6.3ms at hop-2 shapes with the f32
one-hot einsum), well above the 512B-line fetch it rides on — so the
select formulation decides the sampler's distance from the descriptor
roof (tools/bench_roofline.py).

Variants:
  f32x2     : current — one-hot f32 einsum; ids >= 2^24 split into two
              12-bit halves (2 f32 contractions).
  f32x1     : one f32 contraction (only exact for ids < 2^24).
  bf16x3    : ids as three 8-bit limbs, one-hot in bf16, MXU bf16 rate.
              Exact: limb values < 256 are exact in bf16, one-hot rows
              have a single nonzero so accumulation is exact.
  int8      : one-hot int8 x limbs int8 -> int32 dot_general.
  mux128+*  : halve the contraction: select the 128-lane line with a
              where() mux, then one-hot over 128 lanes.
  take      : jnp.take_along_axis baseline.

Run on the real chip: python tools/bench_select.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

P = int(os.environ.get("BS_P", 142_080))
F = int(os.environ.get("BS_F", 10))
LANES = int(os.environ.get("BS_LANES", 256))
MAXID = 2_449_029  # products-scale: needs >= 22 bits


def sync(x):
    np.asarray(x.ravel()[0])


def timeit(fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def sel_f32x2(win, off):
    oh = jax.nn.one_hot(off, win.shape[1], dtype=jnp.float32)
    hi = (win >> 12).astype(jnp.float32)
    lo = (win & 0xFFF).astype(jnp.float32)
    vhi = jnp.einsum("pk,pfk->pf", hi, oh).astype(jnp.int32)
    vlo = jnp.einsum("pk,pfk->pf", lo, oh).astype(jnp.int32)
    return (vhi << 12) | vlo


def sel_f32x1(win, off):
    oh = jax.nn.one_hot(off, win.shape[1], dtype=jnp.float32)
    return jnp.einsum("pk,pfk->pf", win.astype(jnp.float32), oh).astype(jnp.int32)


def _limbs(win, nbits, count):
    mask = (1 << nbits) - 1
    return [((win >> (i * nbits)) & mask) for i in range(count)]


def sel_bf16x3(win, off):
    oh = jax.nn.one_hot(off, win.shape[1], dtype=jnp.bfloat16)
    out = jnp.zeros(off.shape, jnp.int32)
    for i, limb in enumerate(_limbs(win, 8, 3)):
        v = jnp.einsum("pk,pfk->pf", limb.astype(jnp.bfloat16), oh,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        out = out | (v << (8 * i))
    return out


def sel_int8x3(win, off):
    oh = jax.nn.one_hot(off, win.shape[1], dtype=jnp.int8)
    out = jnp.zeros(off.shape, jnp.int32)
    for i, limb in enumerate(_limbs(win, 8, 3)):
        v = jax.lax.dot_general(
            limb.astype(jnp.int8), oh,
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        out = out | (v << (8 * i))
    return out


def _mux128(win, off):
    w = win.reshape(win.shape[0], 2, 128)
    line = (off >> 7)[:, :, None]                       # (P, F, 1)
    lo, hi = w[:, 0, :][:, None, :], w[:, 1, :][:, None, :]
    return jnp.where(line == 0, lo, hi), off & 127      # (P, F, 128)


def sel_mux128_f32(win, off):
    sel, o = _mux128(win, off)
    oh = jax.nn.one_hot(o, 128, dtype=jnp.float32)
    hi = (sel >> 12).astype(jnp.float32)
    lo = (sel & 0xFFF).astype(jnp.float32)
    vhi = jnp.einsum("pfk,pfk->pf", hi, oh).astype(jnp.int32)
    vlo = jnp.einsum("pfk,pfk->pf", lo, oh).astype(jnp.int32)
    return (vhi << 12) | vlo


def sel_mux128_bf16(win, off):
    sel, o = _mux128(win, off)
    oh = jax.nn.one_hot(o, 128, dtype=jnp.bfloat16)
    out = jnp.zeros(off.shape, jnp.int32)
    for i in range(3):
        limb = ((sel >> (8 * i)) & 0xFF).astype(jnp.bfloat16)
        v = jnp.einsum("pfk,pfk->pf", limb, oh,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        out = out | (v << (8 * i))
    return out


def sel_where_sum(win, off):
    """Pure-VPU: integer compare + select + sum-reduce over lanes — no
    float one-hot, no MXU contraction; exact at any id width."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, win.shape[1]), 2)
    return jnp.sum(jnp.where(lane == off[:, :, None], win[:, None, :], 0),
                   axis=-1)


def sel_where_max(win, off):
    """Like where_sum but max-reduce (single nonzero, ids >= 0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, win.shape[1]), 2)
    return jnp.max(jnp.where(lane == off[:, :, None], win[:, None, :], 0),
                   axis=-1)


def sel_take(win, off):
    return jnp.take_along_axis(win, off, axis=1)


def sel_pallas(win, off):
    from legion_tpu.ops.select_pallas import select_lanes_pallas
    return select_lanes_pallas(win, off)


def sel_pallas_t256(win, off):
    from legion_tpu.ops.select_pallas import select_lanes_pallas
    return select_lanes_pallas(win, off, tile_p=256)


def sel_pallas_t1024(win, off):
    from legion_tpu.ops.select_pallas import select_lanes_pallas
    return select_lanes_pallas(win, off, tile_p=1024)


def main():
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(0, MAXID, (P, LANES), dtype=np.int32))
    off = jnp.asarray(rng.integers(0, LANES, (P, F), dtype=np.int32))

    ref = np.asarray(jax.jit(sel_take)(win, off))
    variants = [
        ("f32x2 (current)", sel_f32x2),
        ("f32x1", sel_f32x1),
        ("bf16x3", sel_bf16x3),
        ("int8x3", sel_int8x3),
        ("mux128+f32x2", sel_mux128_f32),
        ("mux128+bf16x3", sel_mux128_bf16),
        ("where_sum (vpu)", sel_where_sum),
        ("where_max (vpu)", sel_where_max),
        ("take_along_axis", sel_take),
        ("pallas t512", sel_pallas),
        ("pallas t256", sel_pallas_t256),
        ("pallas t1024", sel_pallas_t1024),
    ]
    print(f"select {P} x f{F} from {LANES} lanes, ids < {MAXID}")
    for name, fn in variants:
        try:
            got = np.asarray(jax.jit(fn)(win, off))
            exact = bool((got == ref).all())
            dt = timeit(fn, win, off)
            print(f"  {name:18s} {dt * 1e3:7.2f} ms   exact={exact}   "
                  f"{P * F / dt / 1e6:7.1f} Msel/s")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:18s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
