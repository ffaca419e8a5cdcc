"""Hybrid device/host sampling for graphs whose CSR exceeds HBM.

The reference reads the full CSR zero-copy from pinned host memory in
GPU threads and short-circuits hot rows to a device sub-CSR
(``kernel_random_sampler_2``'s partition branch, ``src/Kernels.cu:
387-397`` + GraphCache). TPUs cannot load from host memory inside a
kernel, so the split is explicit per hop:

  device: sample hot frontier nodes from the HBM sub-CSR (TopoCache)
  host:   sample the misses from the mmap'd CSR (C++ runtime, threaded)
  device: merge + dedup/renumber (grow_frontier)

The host leg costs one device->host fetch of (frontier, hit) and one
host->device staging of the cold draws per hop — the PCIe-zero-copy
analog, explicit and byte-metered. Hotness caching keeps the host leg
small (that is the whole point of the topology cache's cost-model
share).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.cache.topo_cache import TopoCache
from legion_tpu.sampling.block import SampledBatch
from legion_tpu.sampling.sampler import grow_frontier


class HybridSampler:
    def __init__(self, topo: TopoCache, host_indptr: np.ndarray,
                 host_indices: np.ndarray, fanouts: Sequence[int],
                 caps: Sequence[int]):
        self.topo = topo
        self.host_indptr = np.ascontiguousarray(host_indptr, np.int64)
        self.host_indices = np.ascontiguousarray(host_indices, np.int32)
        self.fanouts = tuple(fanouts)
        self.caps = tuple(caps)
        self.stats = {"hot": 0, "cold": 0, "host_bytes": 0}

        # TopoCache is a NamedTuple pytree: pass it as a traced ARGUMENT
        # (jitting the bound method would bake the sub-CSR arrays into
        # the program as literal constants — GBs for large caches).
        self._jit_hot = jax.jit(TopoCache.sample_hot, static_argnums=(3,))
        self._jit_grow = jax.jit(grow_frontier, static_argnums=(3,))
        self._jit_merge = jax.jit(
            lambda hot, cold, hit: jnp.where(hit[:, None], hot, cold))

    def sample_batch(self, key: jax.Array, seeds: jnp.ndarray,
                     num_seeds, labels: jnp.ndarray,
                     host_seed: int = 0) -> SampledBatch:
        caps = self.caps
        frontier = jnp.full((caps[0],), -1, jnp.int32).at[
            : seeds.shape[0]].set(seeds)
        num = jnp.asarray(num_seeds, jnp.int32)
        blocks = []
        for k, fanout in enumerate(self.fanouts):
            key, sub = jax.random.split(key)
            nbrs_hot, hit = self._jit_hot(self.topo, sub, frontier, fanout)
            # host leg for the cache misses
            hit_np = np.asarray(hit)
            frontier_np = np.asarray(frontier)
            miss_ids = np.where(~hit_np & (frontier_np >= 0),
                                frontier_np, -1).astype(np.int32)
            from legion_tpu import runtime
            cold = runtime.sample_neighbors(
                self.host_indptr, self.host_indices, miss_ids, fanout,
                seed=host_seed * 1_000_003 + k)
            self.stats["hot"] += int(hit_np.sum())
            ncold = int((miss_ids >= 0).sum())
            self.stats["cold"] += ncold
            self.stats["host_bytes"] += ncold * fanout * 4
            nbrs = self._jit_merge(nbrs_hot, jnp.asarray(cold), hit)
            frontier, num, blk = self._jit_grow(frontier, num, nbrs,
                                                caps[k + 1])
            blocks.append(blk)

        return SampledBatch(
            seeds=seeds, labels=labels,
            num_seeds=jnp.asarray(num_seeds, jnp.int32),
            frontier=frontier, num_frontier=num, blocks=tuple(blocks))

    def hot_fraction(self) -> float:
        t = self.stats["hot"] + self.stats["cold"]
        return self.stats["hot"] / t if t else float("nan")
