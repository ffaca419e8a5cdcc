#!/usr/bin/env python
"""A/B the two dedup strategies on the real chip:
  sort   — jnp.unique-based (grow_frontier)
  scatter— dense position map + stamps (grow_frontier_scatter)
Run: python tools/bench_sampler.py [batch] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.data.format import load_dataset
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.sampler import (
    DeviceGraph, sample_batch, sample_batch_scatter)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
FANOUTS = (25, 10)


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".bench_cache")
    data = load_dataset(os.path.join(cache, "synth_2449029_50"), mmap=False)
    capf = os.path.join(cache, f"caps_2449029_50_{BATCH}.json")
    caps = (tuple(json.load(open(capf))) if os.path.exists(capf)
            else frontier_caps(BATCH, FANOUTS))
    print(f"batch={BATCH} caps={caps}", flush=True)

    graph = DeviceGraph.from_host(data.indptr, data.indices)
    n = data.num_nodes
    seeds = jnp.asarray(np.random.default_rng(0).permutation(
        np.asarray(data.train_ids))[:BATCH].astype(np.int32))
    nb = jnp.full((), BATCH, jnp.int32)
    labels = jnp.zeros((BATCH,), jnp.int32)

    sb = jax.jit(sample_batch, static_argnums=(5, 6))
    out = sb(jax.random.PRNGKey(0), graph, seeds, nb, labels, FANOUTS, caps)
    _ = int(out.num_frontier)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = sb(jax.random.PRNGKey(i), graph, seeds, nb, labels,
                 FANOUTS, caps)
    nf = int(out.num_frontier)
    dt = (time.perf_counter() - t0) / REPS
    print(f"sort dedup:    {dt*1e3:8.2f} ms  (frontier {nf})", flush=True)

    pos_map = jnp.zeros((n,), jnp.int32)
    stamp = jnp.zeros((n,), jnp.int32)
    sc = jax.jit(sample_batch_scatter, static_argnums=(5, 6),
                 donate_argnums=(7, 8))
    out2, pos_map, stamp = sc(jax.random.PRNGKey(0), graph, seeds, nb,
                              labels, FANOUTS, caps, pos_map, stamp,
                              jnp.int32(1))
    _ = int(out2.num_frontier)
    t0 = time.perf_counter()
    for i in range(REPS):
        out2, pos_map, stamp = sc(jax.random.PRNGKey(i), graph, seeds, nb,
                                  labels, FANOUTS, caps, pos_map, stamp,
                                  jnp.int32(i + 2))
    nf2 = int(out2.num_frontier)
    dt2 = (time.perf_counter() - t0) / REPS
    print(f"scatter dedup: {dt2*1e3:8.2f} ms  (frontier {nf2})", flush=True)
    print(f"speedup sort/scatter: {dt/dt2:.2f}x", flush=True)


if __name__ == "__main__":
    main()

# appended: fast (sorted-view) variant timing — run via main2()
def main2():
    import json as _json
    from legion_tpu.sampling.sampler import sample_batch_fast
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".bench_cache")
    data = load_dataset(os.path.join(cache, "synth_2449029_50"), mmap=False)
    capf = os.path.join(cache, f"caps_2449029_50_{BATCH}.json")
    caps = (tuple(_json.load(open(capf))) if os.path.exists(capf)
            else frontier_caps(BATCH, FANOUTS))
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    seeds = jnp.asarray(np.random.default_rng(0).permutation(
        np.asarray(data.train_ids))[:BATCH].astype(np.int32))
    nb = jnp.full((), BATCH, jnp.int32)
    labels = jnp.zeros((BATCH,), jnp.int32)
    for name, fn in [("sort(unique)", sample_batch),
                     ("fast(sorted-view)", sample_batch_fast)]:
        jf = jax.jit(fn, static_argnums=(5, 6))
        out = jf(jax.random.PRNGKey(0), graph, seeds, nb, labels, FANOUTS, caps)
        _ = int(out.num_frontier)
        t0 = time.perf_counter()
        for i in range(REPS):
            out = jf(jax.random.PRNGKey(i), graph, seeds, nb, labels,
                     FANOUTS, caps)
        nf = int(out.num_frontier)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:20s} {dt*1e3:8.2f} ms (frontier {nf})", flush=True)
