#!/usr/bin/env python
"""On-chip microbenchmark of the dedup chain (grow_frontier) at bench
shapes — the largest remaining non-floor step cost (~1.8 ms in-step,
VERDICT r3 next #3). Times the full chain and each sub-stage so the
attack picks the right target, plus XLA sort throughput vs size (is the
sort pass-bound?).

Run: python tools/bench_dedup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.sampling.sampler import SENTINEL, grow_frontier


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            ".bench_cache", "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    # bench shapes: hop-1 dedup of batch 8000 (seed cap 8448) x f25
    prev_cap, fanout, cap_new, n_nodes = 8448, 25, 124544, 2_449_029
    rng = np.random.default_rng(0)
    prev = np.full(prev_cap, -1, np.int32)
    prev[:8000] = rng.choice(n_nodes, 8000, replace=False)
    nbrs = rng.integers(0, n_nodes, (prev_cap, fanout)).astype(np.int32)
    nbrs[rng.random(nbrs.shape) < 0.05] = -1
    nbrs[8000:] = -1
    prevj = jnp.asarray(prev)
    nbrsj = jnp.asarray(nbrs)
    num_prev = jnp.full((), 8000, jnp.int32)

    total = prev_cap + prev_cap * fanout

    gf = jax.jit(grow_frontier, static_argnums=(3,))
    ms = timeit(lambda: gf(prevj, num_prev, nbrsj, cap_new))
    print(f"grow_frontier full chain          {ms:8.3f} ms "
          f"({total/ms*1e3/1e6:.1f} Mkeys/s)")

    # -- sub-stages as standalone programs --------------------------------
    def stage_sort1(prev_s, nbr_s):
        cat = jnp.concatenate([prev_s, nbr_s.reshape(-1)])
        orig = jnp.arange(total, dtype=jnp.int32)
        return jax.lax.sort([cat, orig], num_keys=1, is_stable=True)

    s1 = jax.jit(stage_sort1)
    ms1 = timeit(lambda: s1(prevj, nbrsj))
    print(f"  sort1 (219k stable 2-operand)   {ms1:8.3f} ms")

    s, sorig = s1(prevj, nbrsj)

    def stage_scan(s, sorig):
        valid_s = s != SENTINEL
        first = valid_s & jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]])
        old_first = first & (sorig < prev_cap)
        new_first = first & (sorig >= prev_cap)
        new_rank = jnp.cumsum(new_first.astype(jnp.int32)) - 1
        pos_at_first = jnp.where(old_first, sorig,
                                 8000 + new_rank).astype(jnp.int32)

        def seg_copy(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av), af | bf

        pos_sorted, _ = jax.lax.associative_scan(
            seg_copy, (jnp.where(first, pos_at_first, 0), first))
        return pos_sorted, first, pos_at_first

    sc = jax.jit(stage_scan)
    ms2 = timeit(lambda: sc(s, sorig))
    print(f"  flags+cumsum+assoc_scan         {ms2:8.3f} ms")

    pos_sorted, first, pos_at_first = sc(s, sorig)

    def stage_unsort(sorig, pos_sorted):
        return jax.lax.sort([sorig, pos_sorted], num_keys=1)

    us = jax.jit(stage_unsort)
    ms3 = timeit(lambda: us(sorig, pos_sorted))
    print(f"  unsort (KV sort by orig)        {ms3:8.3f} ms")

    def stage_frontier(first, pos_at_first, s):
        target = jnp.where(first & (pos_at_first < cap_new),
                           pos_at_first, cap_new)
        fval = jnp.where(target < cap_new, s, -1)
        _, frontier_new = jax.lax.sort([target, fval], num_keys=1)
        return frontier_new[:cap_new]

    fb = jax.jit(stage_frontier)
    ms4 = timeit(lambda: fb(first, pos_at_first, s))
    print(f"  frontier build (KV sort)        {ms4:8.3f} ms")
    print(f"  stage sum                       {ms1+ms2+ms3+ms4:8.3f} ms")

    # -- XLA sort scaling: pass-bound? ------------------------------------
    print("\nXLA sort scaling (1-operand s32 / 2-operand KV):")
    for lg in (15, 16, 17, 18, 19, 20):
        n = 1 << lg
        x = jnp.asarray(rng.integers(0, 2 ** 30, n).astype(np.int32))
        v = jnp.arange(n, dtype=jnp.int32)
        f1 = jax.jit(lambda a: jax.lax.sort([a], num_keys=1)[0])
        f2 = jax.jit(lambda a, b: jax.lax.sort(
            [a, b], num_keys=1, is_stable=True))
        t1 = timeit(lambda: f1(x))
        t2 = timeit(lambda: f2(x, v))
        print(f"  2^{lg} ({n:>8}): 1-op {t1:7.3f} ms  "
              f"({n/t1*1e3/1e6:6.1f} Mk/s)   KV {t2:7.3f} ms "
              f"({n/t2*1e3/1e6:6.1f} Mk/s)")


if __name__ == "__main__":
    main()
