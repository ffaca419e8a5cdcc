#!/usr/bin/env python
"""Roofline microbenchmarks: each framework primitive vs its hardware
speed-of-light on this chip.

Speeds of light are MEASURED, not quoted: HBM bandwidth from a dense
elementwise pass, MXU FLOP/s from a large bf16/f32 matmul, and the
random-row descriptor rate from the best-case 512B-row gather. Each
pipeline primitive is then expressed as a fraction of the roof that
binds it (SURVEY.md §7 stage 3: ">=90% SoL" target for the regular
data-path ops; random-access ops are bound by the descriptor roof, not
bytes).

Run on the real chip: python tools/bench_roofline.py [--json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


_OVERHEAD = 0.0


def timeit(fn, reps=10, raw=False):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best if raw else max(best - _OVERHEAD, 1e-9)


def calibrate_overhead():
    """Per-dispatch overhead of the device/tunnel stack, measured on a
    trivially small op and subtracted from every measurement."""
    global _OVERHEAD
    t = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    _OVERHEAD = timeit(lambda: f(t), reps=20, raw=True)
    return _OVERHEAD


def main():
    emit_json = "--json" in sys.argv
    rows = []

    def add(name, value, unit, roof_name, frac):
        rows.append({"name": name, "value": value, "unit": unit,
                     "roof": roof_name, "of_roof": frac})
        if not emit_json:
            print(f"{name:38s} {value:10.1f} {unit:9s} "
                  f"{frac*100:5.1f}% of {roof_name}", flush=True)

    rng = np.random.default_rng(0)

    oh = calibrate_overhead()
    if not emit_json:
        print(f"per-dispatch overhead (subtracted): {oh*1e3:.2f} ms")

    # ---- roofs -------------------------------------------------------------
    n = 256 * 1024 * 1024  # 1GB f32
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f_copy = jax.jit(lambda a: a * 1.0001 + 1.0)
    dt = timeit(lambda: f_copy(a), reps=5)
    hbm_gbs = 2 * n * 4 / dt / 2**30  # read + write
    add("HBM stream (axpy 1GB)", hbm_gbs, "GiB/s", "HBM", 1.0)

    m = 8192
    wb = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32)).astype(jnp.bfloat16)
    f_mm = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
    dt = timeit(lambda: f_mm(wb, wb), reps=5)
    mxu_tf = 2 * m**3 / dt / 1e12
    add(f"MXU bf16 matmul {m}^3", mxu_tf, "TFLOP/s", "MXU", 1.0)

    tbl = jnp.asarray(rng.standard_normal((700_000, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 700_000, 2_000_000).astype(np.int32))
    f_tk = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(lambda: f_tk(tbl, ids))
    desc_roof = 2_000_000 / dt / 1e6
    add("random 512B-row gather (take)", desc_roof, "Mrows/s", "descriptor", 1.0)

    # ---- pipeline primitives vs roofs --------------------------------------
    from legion_tpu.data.format import pad_feature_dim
    from legion_tpu.data.synthetic import bench_graph
    from legion_tpu.data.format import load_dataset, save_dataset
    from legion_tpu.sampling.sampler import (
        DeviceGraph, gather_features, grow_frontier, sample_batch,
        sample_neighbors)

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".bench_cache", "synth_2449029_50")
    if os.path.exists(os.path.join(cache, "meta.json")):
        data = load_dataset(cache, mmap=False)
    else:
        data = bench_graph(num_nodes=2_449_029, avg_degree=50)
        save_dataset(data, cache)
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    feats = jnp.asarray(pad_feature_dim(np.asarray(data.features)))

    p = 142464
    deg_all = np.diff(data.indptr)
    fr = jnp.asarray(rng.choice(len(deg_all), size=p,
                                p=deg_all / deg_all.sum()).astype(np.int32))
    key = jax.random.PRNGKey(0)

    # windowed sampling: roof = per-node line descriptors (2 per node)
    f_sn = jax.jit(sample_neighbors, static_argnames=("fanout",))
    dt = timeit(lambda: f_sn(key, graph, fr, fanout=10))
    rate = p / dt / 1e6
    add("windowed sample 142k nodes x f10", rate, "Mnodes/s", "descriptor",
        rate * 2 / desc_roof)

    # feature gather: roof = descriptor rate
    frontier = jnp.asarray(rng.integers(0, data.num_nodes,
                                        1_567_104).astype(np.int32))
    f_gf = jax.jit(gather_features)
    dt = timeit(lambda: f_gf(feats, frontier))
    rate = 1_567_104 / dt / 1e6
    add("feature gather 1.57M x 512B rows", rate, "Mrows/s", "descriptor",
        rate / desc_roof)

    # dedup (stable sort + scans): reported against a LOOSE single-HBM-pass
    # bound (32B/key: key+payload, read+write once). A bitonic sort makes
    # O(log^2 n) passes, so a low fraction here is structural — it is WHY
    # the last hop elides dedup (sampler.append_frontier).
    nbrs = f_sn(key, graph, fr, fanout=10)
    f_gr = jax.jit(grow_frontier, static_argnames=("cap_new",))
    dt = timeit(lambda: f_gr(fr, jnp.full((), p, jnp.int32), nbrs,
                             cap_new=1_567_104))
    keys_m = (p + p * 10) / dt / 1e6
    add("dedup/renumber 1.57M keys", keys_m, "Mkeys/s", "HBM 1-pass",
        keys_m * 1e6 * 32 / (hbm_gbs * 2**30))

    # identity aggregation (reshape mean): roof = HBM read of the rows
    x2 = jnp.asarray(rng.standard_normal((p * 10, 128)).astype(np.float32))
    mask = jnp.asarray(rng.random((p, 10)) > 0.1)
    f_ag = jax.jit(lambda x, m: jnp.sum(
        (x * m.reshape(-1)[:, None]).reshape(p, 10, 128), axis=1)
        / jnp.maximum(jnp.sum(m, 1, keepdims=True).astype(jnp.float32), 1))
    dt = timeit(lambda: f_ag(x2, mask))
    gbs = p * 10 * 128 * 4 / dt / 2**30
    add("identity agg mean 1.42Mx128", gbs, "GiB/s", "HBM", gbs / hbm_gbs)

    if emit_json:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
