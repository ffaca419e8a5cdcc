#!/usr/bin/env python
"""Microbenchmark: random row gather from HBM (the framework's hot op).

Sweeps row width / dtype / index locality to pin the regime of XLA's
take lowering on this chip: descriptor-rate-bound (GB/s grows with row
width, rows/s flat) vs byte-bound (GB/s flat). Informs the aggregation
kernel design (transform-first reordering, dtype of the feature table,
whether a Pallas gather can win).

Also times the two aggregation formulations at bench shapes:
  fanout gather+mean (jnp.take) and its grad (scatter-add vs sort).

Run on the real chip: python tools/bench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, reps=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def bench_take(n_rows, width, dtype, n_ids, sorted_ids=False, reps=10):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n_rows, width)), dtype)
    ids_np = rng.integers(0, n_rows, size=n_ids).astype(np.int32)
    if sorted_ids:
        ids_np = np.sort(ids_np)
    ids = jnp.asarray(ids_np)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(lambda: f(table, ids), reps)
    nbytes = n_ids * width * jnp.dtype(dtype).itemsize
    return dt, nbytes / dt / 2**30, n_ids / dt / 1e6


def main():
    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}")
    n_rows, n_ids = 700_000, 2_000_000
    print(f"\n== jnp.take: {n_ids/1e6:.1f}M random ids into {n_rows} rows ==")
    print(f"{'width':>6} {'dtype':>9} {'sorted':>6} {'ms':>8} {'GiB/s':>8} {'Mrows/s':>9}")
    for width in (100, 128, 256, 512):
        for dtype in (jnp.float32, jnp.bfloat16):
            for srt in (False, True):
                dt, gbs, mrows = bench_take(n_rows, width, dtype, n_ids, srt)
                print(f"{width:>6} {jnp.dtype(dtype).name:>9} {str(srt):>6} "
                      f"{dt*1e3:>8.2f} {gbs:>8.1f} {mrows:>9.1f}", flush=True)

    # grad formulations: scatter-add vs sort-based segment-sum
    print("\n== aggregation grad: scatter-add vs resort (2M edges, width 100) ==")
    rng = np.random.default_rng(1)
    s, width, m = 700_000, 100, 2_000_000
    pos = jnp.asarray(rng.integers(0, s, size=m).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((m, width)), jnp.float32)

    def scatter_add(pos, g):
        return jnp.zeros((s, width), jnp.float32).at[pos].add(g)

    def sort_segsum(pos, g):
        sp, order = jax.lax.sort([pos, jnp.arange(m, dtype=jnp.int32)],
                                 num_keys=1)
        gs = jnp.take(g, order, axis=0)
        return jax.ops.segment_sum(gs, sp, num_segments=s)

    for name, f in (("scatter_add", scatter_add), ("sort_segsum", sort_segsum)):
        dt = timeit(lambda f=f: jax.jit(f)(pos, g), reps=5)
        print(f"{name:>12}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
