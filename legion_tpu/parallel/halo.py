"""Edge-partitioned multi-host training: remote sampling + halo feature
exchange.

Beyond-reference capability (the reference is single-node, ≤8 GPUs,
``MAX_DEVICE 8``): the graph is k-way partitioned (data/partition.py,
replacing XtraPulp), every host owns its partition's CSR rows, feature
rows and train-id shard, and the two cross-host needs of mini-batch GNN
training both become mesh collectives:

* **remote neighbor expansion**: a hop's frontier contains nodes owned
  by other hosts; their adjacency rows live there. Each host gathers
  every peer's frontier (`all_gather` of ids — tiny), draws samples for
  the requests it owns from its local sub-CSR, and a `psum_scatter`
  returns each host exactly its own frontier's samples. This replaces
  nothing in the reference (it cannot do this) and is the graph-domain
  "context parallelism" slot of SURVEY.md §5.
* **halo (boundary) feature fetch**: identical exchange over feature
  rows — the multi-host generalization of the NVLink-clique cache reads.

Owned rows are stored compactly, sorted by global id, with
`searchsorted` as the global->local map (no (N,) owner table needed).
On a real multi-host mesh the same code runs with the `data` axis laid
across DCN; here it is validated on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HostShard(NamedTuple):
    """One host's partition of the graph (device-resident, compact)."""
    owned_ids: jnp.ndarray     # (C,) int32 global ids, sorted ascending
    sub_indptr: jnp.ndarray    # (C+1,) int32 CSR over owned rows
    sub_indices: jnp.ndarray   # (E_local,) int32 global neighbor ids
    feat_rows: jnp.ndarray     # (C, D) float32 features of owned nodes

    @staticmethod
    def part_shapes(indptr, partition: np.ndarray, num_parts: int):
        """Per-part (row_count, edge_count) WITHOUT materializing any
        adjacency — every process can agree on the padded global shapes
        from the partition vector alone (the per-process loading math of
        the jax.distributed launch path)."""
        deg = np.diff(np.asarray(indptr)).astype(np.int64)
        rows = np.bincount(partition, minlength=num_parts).astype(np.int64)
        edges = np.bincount(partition, weights=deg,
                            minlength=num_parts).astype(np.int64)
        return rows, edges

    @staticmethod
    def build_one(indptr, indices, features, partition: np.ndarray,
                  p: int, pad_rows: int, pad_edges: int):
        """Build ONE part's padded shard (numpy). In a multi-process
        launch each host calls this only for the parts its local devices
        own — it never touches other parts' adjacency or feature rows.
        Vectorized adjacency copy (same construction as TopoCache.build;
        the per-node Python loop it replaced would not survive
        papers100M-scale shards)."""
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        features = np.asarray(features)
        owned = np.nonzero(partition == p)[0].astype(np.int32)
        degs = (indptr[owned + 1] - indptr[owned]).astype(np.int64)
        sp = np.zeros(len(owned) + 1, np.int64)
        np.cumsum(degs, out=sp[1:])
        total = int(sp[-1])
        within = np.arange(total, dtype=np.int64) - np.repeat(sp[:-1], degs)
        src = np.repeat(indptr[owned].astype(np.int64), degs) + within
        si = indices[src].astype(np.int32)

        c, d = len(owned), features.shape[1]
        owned_p = np.full(pad_rows, np.iinfo(np.int32).max, np.int32)
        owned_p[:c] = owned
        sp_p = np.full(pad_rows + 1, sp[-1], np.int64)
        sp_p[:c + 1] = sp
        si_p = np.full(pad_edges, -1, np.int32)
        si_p[:total] = si
        fr_p = np.zeros((pad_rows, d), np.float32)
        fr_p[:c] = features[owned]
        return owned_p, sp_p.astype(np.int32), si_p, fr_p

    @staticmethod
    def build(indptr, indices, features, partition: np.ndarray,
              num_parts: int, pad_to: Tuple[int, int] | None = None):
        """Split a host graph into per-part compact shards (numpy).

        Returns a list of HostShard-ready numpy tuples, each padded to
        the max (row, edge) counts across parts so shapes are uniform
        for shard_map. Single-process convenience over build_one."""
        rows, edges = HostShard.part_shapes(indptr, partition, num_parts)
        max_c, max_e = int(rows.max()), max(int(edges.max()), 1)
        if pad_to:
            max_c, max_e = max(max_c, pad_to[0]), max(max_e, pad_to[1])
        return [HostShard.build_one(indptr, indices, features, partition,
                                    p, max_c, max_e)
                for p in range(num_parts)]


def _local_lookup(owned_ids: jnp.ndarray, ids: jnp.ndarray):
    """(is_mine, local_row) for global ids; padding (<0) never matches.
    owned_ids padding is INT32_MAX so searchsorted stays in range."""
    c = owned_ids.shape[0]
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    pos = jnp.clip(jnp.searchsorted(owned_ids, safe).astype(jnp.int32),
                   0, c - 1)
    mine = valid & (owned_ids[pos] == safe)
    return mine, pos


def partitioned_sample_hop(shard: HostShard, key: jax.Array,
                           frontier: jnp.ndarray, fanout: int,
                           axis: str) -> jnp.ndarray:
    """One sampling hop over an edge-partitioned graph, inside shard_map.

    frontier: (M,) this host's padded frontier (global ids, -1 pad).
    Returns (M, fanout) sampled neighbor global ids, -1 sentinel rules
    identical to the single-host sampler.
    """
    k = jax.lax.axis_size(axis)
    m = frontier.shape[0]

    all_ids = jax.lax.all_gather(frontier, axis)          # (K, M)
    flat = all_ids.reshape(-1)
    mine, row = _local_lookup(shard.owned_ids, flat)
    start = shard.sub_indptr[row]
    deg = jnp.where(mine, shard.sub_indptr[row + 1] - start, 0)

    # Sample for every request I own. Key folding is by (flat request
    # slot) so all hosts agree on the draw a given request receives.
    u = jax.random.uniform(key, (k * m, fanout), dtype=jnp.float32)
    off = jnp.minimum((u * deg[:, None].astype(jnp.float32)).astype(jnp.int32),
                      jnp.maximum(deg[:, None] - 1, 0))
    addr = jnp.clip(start[:, None] + off, 0, shard.sub_indices.shape[0] - 1)
    nbr = shard.sub_indices[addr]

    slot = jax.lax.broadcasted_iota(jnp.int32, (k * m, fanout), 1)
    ok = mine[:, None] & (slot < deg[:, None]) & (deg[:, None] > 0)
    # encode so psum of one-hot contributions reconstructs ids incl. -1:
    # owners contribute (nbr + 1), non-owners 0; subtract 1 after sum.
    contrib = jnp.where(ok, nbr + 1, 0)
    summed = jax.lax.psum_scatter(contrib, axis, scatter_dimension=0,
                                  tiled=True)                 # (M, fanout)
    return summed - 1


def partitioned_row_fetch(shard: HostShard, ids: jnp.ndarray,
                          axis: str) -> jnp.ndarray:
    """Halo feature fetch: rows of global `ids` from partition-owned
    feature shards (zeros for -1). Inside shard_map."""
    all_ids = jax.lax.all_gather(ids, axis)                # (K, M)
    flat = all_ids.reshape(-1)
    mine, row = _local_lookup(shard.owned_ids, flat)
    rows = jnp.take(shard.feat_rows, row, axis=0)
    rows = rows * mine[:, None].astype(rows.dtype)
    return jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=True)
