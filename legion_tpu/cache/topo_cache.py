"""Topology cache: compacted sub-CSR of hot nodes in HBM.

Replaces the reference's GraphCache path (``GPUMemoryGraphStorage::
GraphCache``, ``src/GPU_Memory_Graph_Storage.cu:98-133``): neighbor
counts of the hot set are prefix-scanned into a sub-index and their
adjacency copied into device memory; at sampling time a per-node lookup
decides cached-CSR vs zero-copy-host-CSR (``kernel_random_sampler_2``'s
``part_id`` branch, ``src/Kernels.cu:387-397``). The BGHT id->offset
hash maps become a sorted-hot-id array + searchsorted.

Used when the full graph exceeds device HBM (topology_placement="host"):
the device samples hot nodes from the sub-CSR; cold rows are sampled on
host (numpy/C++ runtime) and merged — the hybrid analog of GPU-kernel +
zero-copy-PCIe reads.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TopoCache(NamedTuple):
    hot_ids: jnp.ndarray      # (C,) int32 sorted ascending
    sub_indptr: jnp.ndarray   # (C+1,) int32
    sub_indices: jnp.ndarray  # (E_hot,) int32

    @classmethod
    def build(cls, indptr: np.ndarray, indices: np.ndarray,
              hot_order: np.ndarray, capacity: int) -> "TopoCache":
        capacity = int(min(capacity, len(hot_order)))
        hot = np.sort(np.asarray(hot_order[:capacity], np.int64))
        degs = (np.asarray(indptr)[hot + 1] - np.asarray(indptr)[hot])
        sub_indptr = np.zeros(capacity + 1, np.int64)
        np.cumsum(degs, out=sub_indptr[1:])
        assert sub_indptr[-1] < 2 ** 31, "hot sub-CSR exceeds int32 addressing"
        total = int(sub_indptr[-1])
        # vectorized adjacency copy: src[j] walks each hot run in order
        within = np.arange(total, dtype=np.int64) - np.repeat(
            sub_indptr[:-1], degs)
        src = np.repeat(np.asarray(indptr)[hot], degs) + within
        sub_indices = np.asarray(indices)[src].astype(np.int32)
        return cls(hot_ids=jnp.asarray(hot.astype(np.int32)),
                   sub_indptr=jnp.asarray(sub_indptr.astype(np.int32)),
                   sub_indices=jnp.asarray(sub_indices))

    def lookup(self, ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(hit_mask, sub_row) for global ids (-1 padded). Jit-safe."""
        c = self.hot_ids.shape[0]
        valid = ids >= 0
        safe = jnp.where(valid, ids, 0)
        pos = jnp.clip(jnp.searchsorted(self.hot_ids, safe).astype(jnp.int32),
                       0, max(c - 1, 0))
        hit = valid & (self.hot_ids[pos] == safe) if c > 0 else \
            jnp.zeros_like(valid)
        return hit, pos

    def sample_hot(self, key: jax.Array, frontier: jnp.ndarray,
                   fanout: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample one hop for the cache-hit subset of the frontier.

        Returns (neighbors (P, fanout) with -1 for invalid-or-miss,
        hit_mask (P,)). Miss nodes must be sampled by the host path and
        merged (see cache.pipeline.HybridSampler).
        """
        p = frontier.shape[0]
        hit, row = self.lookup(frontier)
        start = self.sub_indptr[row]
        deg = self.sub_indptr[row + 1] - start

        u = jax.random.uniform(key, (p, fanout), dtype=jnp.float32)
        off = jnp.minimum((u * deg[:, None].astype(jnp.float32))
                          .astype(jnp.int32),
                          jnp.maximum(deg[:, None] - 1, 0))
        addr = jnp.clip(start[:, None] + off, 0,
                        max(self.sub_indices.shape[0] - 1, 0))
        nbr = self.sub_indices[addr]
        slot = jax.lax.broadcasted_iota(jnp.int32, (p, fanout), 1)
        ok = hit[:, None] & (slot < deg[:, None]) & (deg[:, None] > 0)
        return jnp.where(ok, nbr, -1), hit


def host_sample_cold(indptr: np.ndarray, indices: np.ndarray,
                     ids: np.ndarray, fanout: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Host-side uniform-with-replacement sampling for cache-miss nodes
    (numpy fallback; the C++ runtime provides the threaded fast path).
    ids: (M,) global ids with -1 for entries to skip."""
    m = ids.shape[0]
    out = np.full((m, fanout), -1, np.int32)
    valid = ids >= 0
    vids = ids[valid].astype(np.int64)
    deg = (np.asarray(indptr)[vids + 1] - np.asarray(indptr)[vids]).astype(np.int64)
    starts = np.asarray(indptr)[vids]
    u = rng.random((vids.shape[0], fanout))
    off = np.minimum((u * deg[:, None]).astype(np.int64),
                     np.maximum(deg[:, None] - 1, 0))
    addr = starts[:, None] + off
    nbr = np.asarray(indices)[np.clip(addr, 0, len(indices) - 1)]
    slot = np.arange(fanout)[None, :]
    ok = (slot < deg[:, None]) & (deg[:, None] > 0)
    res = np.where(ok, nbr, -1).astype(np.int32)
    out[valid] = res
    return out
