#!/usr/bin/env python
"""Tile-size sweep for identity_masked_mean_pallas (VERDICT r3 item 4):
the kernel streams the ~700MB appended-row array once; at TILE_P=128 it
runs at ~410 GB/s (1.7 ms/step) vs the ~820 GB/s HBM stream roof.
Larger tiles mean bigger contiguous DMAs and fewer grid steps.

Run on the real chip after bench.py shapes are cached."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

P = int(os.environ.get("BA_P", 124544 // 512 * 512))
F = int(os.environ.get("BA_F", 11))
D = int(os.environ.get("BA_D", 128))
OFF = int(os.environ.get("BA_OFF", 124544))


def sync(x):
    np.asarray(x.ravel()[0])


def timeit(fn, reps=20):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
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
    from legion_tpu.ops.identity_agg_pallas import identity_masked_mean_pallas
    rng = np.random.default_rng(0)
    x = rng.standard_normal((OFF + P * F, D)).astype(np.float32)
    mask = rng.random((P, F)) > 0.15
    want = (x[OFF:OFF + P * F].reshape(P, F, D) * mask[:, :, None]).sum(1)
    want = want / np.maximum(mask.sum(1), 1)[:, None]
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    gb = (P * F * D * 4) / 2**30
    for tile_p in (64, 128, 256):
        if P % tile_p:
            continue
        fn = jax.jit(lambda a, m, t=tile_p: identity_masked_mean_pallas(
            a, m, OFF, tile_p=t))
        out = np.asarray(fn(xj, mj)).astype(np.float32)
        ok = np.allclose(out, want, rtol=3e-2, atol=3e-2)
        ms = timeit(lambda: fn(xj, mj))
        print(f"tile_p={tile_p:4d} {'OK ' if ok else 'FAIL'} {ms:7.3f} ms "
              f"({gb / (ms / 1e3):.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
