"""Striped feature storage + cross-chip row exchange over a mesh axis.

Replaces the reference's NVLink clique cache reads: there, hot feature
rows are interleaved round-robin across the Kg GPUs of a clique
(``InitPair`` value ``(idx % Kg) * cap + idx / Kg``,
``src/GPUCache.cu:103-108``) and remote rows are read through peer P2P
pointer tables (``zero_copy_with_aggregated_cache``,
``src/Kernels.cu:695-699``). TPUs have no cross-chip load/store, so the
same striping is served by collectives over the ``cache`` mesh axis.

v1 exchange = all_gather(ids) + local gather + psum_scatter(rows): each
chip gathers every peer's requested ids (tiny), reads the rows it owns,
and a reduce-scatter sums the one-hot contributions so each chip
receives exactly its own requests. Volume is K x ideal but purely
ICI-resident, contention-free, and fully static-shape. A
ragged-all-to-all variant is the planned upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def shard_rows(table: np.ndarray, k: int) -> np.ndarray:
    """Stripe rows round-robin: global row r -> shard r % k, slot r // k.

    Returns (k, ceil(N/k), D); feed shard i to mesh position i along the
    cache axis. Same interleave as the reference's InitPair/FeatFillUp
    (src/GPUCache.cu:103-108, :128-141).
    """
    n, d = table.shape
    cap = -(-n // k)
    out = np.zeros((k, cap, d), dtype=table.dtype)
    for i in range(k):
        rows = table[i::k]
        out[i, : rows.shape[0]] = rows
    return out


def sharded_row_fetch(table_local: jnp.ndarray, ids: jnp.ndarray,
                      axis: str) -> jnp.ndarray:
    """Fetch global rows `ids` from a round-robin-striped table.

    Must run inside shard_map with `axis` mapped. table_local: (cap, D)
    this chip's stripe. ids: (M,) int32 global row ids, -1 = padding
    (returns zeros). Returns (M, D).
    """
    k = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)

    all_ids = jax.lax.all_gather(ids, axis)              # (K, M)
    valid = all_ids >= 0
    safe = jnp.where(valid, all_ids, 0)
    owner = safe % k
    slot = safe // k
    mine = valid & (owner == me)

    rows = jnp.take(table_local, jnp.clip(slot, 0, table_local.shape[0] - 1),
                    axis=0)                              # (K, M, D)
    rows = rows * mine[..., None].astype(rows.dtype)
    flat = rows.reshape(k * ids.shape[0], -1)
    # reduce-scatter over the cache axis: shard me receives tile me,
    # i.e. the summed responses for ITS requested ids.
    return jax.lax.psum_scatter(flat, axis, scatter_dimension=0, tiled=True)
