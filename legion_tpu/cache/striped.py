"""Kg-striped hot feature cache: hot rows interleaved across the chips
of a cache group, hits served by ICI collectives, misses staged from
host.

This is the reference's signature scaling mechanism made TPU-native. In
Legion, the hot feature rows selected by the cost model are interleaved
round-robin across the ``Kg`` GPUs of an NVLink clique — hot rank
``idx`` lives on GPU ``idx % Kg`` at local slot ``idx / Kg``
(``InitPair`` value ``(idx % Kg) * cap + idx / Kg``,
``src/GPUCache.cu:103-108``; fill ``FeatFillUp`` ``:128-141``) — and the
gather kernel reads remote stripes through peer P2P pointer tables,
falling back to pinned host memory on misses
(``zero_copy_with_aggregated_cache``, ``src/Kernels.cu:662-702``).

TPU chips cannot load from a peer's HBM, so the same striping is served
by collectives over the ``cache`` mesh axis: the (tiny, int32) sorted
hot-id array is replicated per chip (the BGHT id->slot map analog, which
Legion also replicates per GPU, ``src/GPUCache.cu:84-86``), each chip
holds stripe ``me`` of the hot rows, and a hit lookup is

    all_gather(hit ranks) -> local gather of the ranks I own
    -> psum_scatter returns each chip its own rows

(see parallel.feature_exchange.sharded_row_fetch — the identical
exchange, here applied to the HOT SUBSET instead of the full table, which
is what makes the cache useful when features exceed aggregate HBM).
Misses are compacted per chip and staged from host RAM exactly as in the
single-chip FeatureCache; both legs are byte-metered.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.cache.feature_cache import CachePlan, FeatureCache
from legion_tpu.parallel.feature_exchange import shard_rows, sharded_row_fetch


class StripedFeatureCache(NamedTuple):
    """Mesh-placed striped hot cache.

    hot_ids: (C,) int32 sorted global ids, REPLICATED on every chip.
    rows: (K*cap, D) hot rows flattened stripe-major, sharded
        ``P('cache')`` — chip j of each cache group holds stripe j =
        hot rows with rank % K == j (rank = index into hot_ids).
    miss_cap: per-chip staging capacity (rows per step).
    """

    hot_ids: jnp.ndarray
    rows: jnp.ndarray
    miss_cap: int
    group_size: int

    @property
    def capacity(self) -> int:
        return int(self.hot_ids.shape[0])

    @classmethod
    def build(cls, host_features: np.ndarray, hot_order: np.ndarray,
              capacity: int, miss_cap: int, mesh,
              dtype=np.float32) -> "StripedFeatureCache":
        """Select the top-``capacity`` hot rows (whole cache group's
        capacity — the cost model's ``group_size``-multiplied budget) and
        stripe them over the mesh's ``cache`` axis.

        The per-chip HBM cost is ``capacity/K`` rows plus the replicated
        ``capacity`` int32 hot-id array."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        k = mesh.shape["cache"]
        capacity = int(min(capacity, len(hot_order)))
        hot = np.sort(np.asarray(hot_order[:capacity], np.int32))
        table = np.ascontiguousarray(host_features[hot]).astype(dtype)
        striped = shard_rows(table, k)                    # (K, cap, D)
        flat = striped.reshape(k * striped.shape[1], striped.shape[2])
        rows = jax.device_put(flat, NamedSharding(mesh, P("cache")))
        hot_ids = jax.device_put(
            jnp.asarray(hot), NamedSharding(mesh, P()))
        return cls(hot_ids=hot_ids, rows=rows, miss_cap=int(miss_cap),
                   group_size=int(k))

    # -- jit/shard_map pieces -------------------------------------------
    #
    # Pure functions; cache arrays are ARGUMENTS (never closures — see
    # FeatureCache's jit discipline note). All of them must run INSIDE
    # shard_map with the `cache` axis mapped.

    @staticmethod
    def plan_ids(hot_ids: jnp.ndarray, frontier: jnp.ndarray,
                 miss_cap: int) -> CachePlan:
        """Per-chip hit/miss classification. plan.slot is the hot RANK
        (owner = rank % K, local slot = rank // K). Identical math to
        the single-chip plan — reused directly."""
        return FeatureCache.plan_ids(hot_ids, frontier, miss_cap)

    @staticmethod
    def combine_rows(rows_local: jnp.ndarray, plan: CachePlan,
                     staged: jnp.ndarray, frontier: jnp.ndarray,
                     axis: str = "cache") -> jnp.ndarray:
        """Merge collective-fetched hit rows and host-staged miss rows
        into the frontier's feature matrix (the striped twin of
        FeatureCache.combine_rows; identical output given the same hot
        set). Must run inside shard_map with `axis` mapped.

        rows_local: (cap, D) this chip's stripe. staged: (miss_cap, D)
        this chip's staged miss rows."""
        req = jnp.where(plan.hit, plan.slot, -1)
        hit_rows = sharded_row_fetch(rows_local, req, axis)   # (M, D)
        cap = staged.shape[0]
        in_range = plan.miss_idx < cap
        missed = jnp.take(staged, jnp.clip(plan.miss_idx, 0, cap - 1),
                          axis=0)
        missed = missed * in_range[:, None].astype(missed.dtype)
        x = jnp.where(plan.hit[:, None], hit_rows.astype(missed.dtype),
                      missed)
        return x * (frontier >= 0)[:, None].astype(x.dtype)

    # -- host piece -------------------------------------------------------

    def np_dtype(self):
        import ml_dtypes
        return (ml_dtypes.bfloat16 if self.rows.dtype == jnp.bfloat16
                else np.float32)
