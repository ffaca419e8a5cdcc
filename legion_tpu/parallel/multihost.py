"""Full multi-host training step over an edge-partitioned graph.

The flagship beyond-reference configuration (BASELINE.json config #5:
"GraphSAGE on ogbn-papers100M, edge-partitioned across N>=2 hosts with
halo exchange"): no host holds the whole graph or feature table; each
hop interleaves remote neighbor expansion (partitioned_sample_hop) with
local dedup/renumber, features arrive via halo exchange, and gradients
pmean across hosts. On a real pod slice the `data` axis spans hosts
(collectives ride ICI intra-host, DCN inter-host); tests run the same
program on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legion_tpu.config import Config
from legion_tpu.parallel.halo import (
    HostShard, partitioned_row_fetch, partitioned_sample_hop)
from legion_tpu.sampling.block import SampledBatch
from legion_tpu.sampling.sampler import grow_frontier
from legion_tpu.train.loop import lp_logsigmoid_loss, masked_softmax_ce
from legion_tpu.train.train_state import TrainState

AXIS = "data"


def sample_batch_partitioned(shard: HostShard, key: jax.Array,
                             seeds: jnp.ndarray, num_seeds: jnp.ndarray,
                             labels: jnp.ndarray, fanouts: Sequence[int],
                             caps: Sequence[int]) -> SampledBatch:
    """Multi-hop sampling where each hop's neighbor expansion is served
    by the partition owners (inside shard_map). Dedup/renumbering stays
    host-local — frontier numbering is per-host, exactly as each
    reference GPU runner numbers its own batch."""
    caps = tuple(caps)
    frontier = jnp.full((caps[0],), -1, jnp.int32).at[: seeds.shape[0]].set(seeds)
    num = num_seeds.astype(jnp.int32)
    blocks = []
    for k, fanout in enumerate(fanouts):
        key, sub = jax.random.split(key)
        nbrs = partitioned_sample_hop(shard, sub, frontier, fanout, AXIS)
        frontier, num, blk = grow_frontier(frontier, num, nbrs, caps[k + 1])
        blocks.append(blk)
    return SampledBatch(seeds=seeds, labels=labels,
                        num_seeds=num_seeds.astype(jnp.int32),
                        frontier=frontier, num_frontier=num,
                        blocks=tuple(blocks))


def make_partitioned_train_step(cfg: Config, model, caps, mesh: Mesh):
    """Returns (jitted_step, put_shards).

    jitted_step(state, owned, sub_indptr, sub_indices, feat_rows,
                seeds, num_seeds, labels) -> (state, metrics)
    with the shard arrays stacked (K, ...) and sharded over `data`.
    """
    fanouts = tuple(cfg.sampler.fanouts)
    is_lp = cfg.model.arch == "lp_sage"

    def step(state: TrainState, owned, sp, si, fr, seeds, num_seeds, labels):
        shard = HostShard(owned_ids=owned[0], sub_indptr=sp[0],
                          sub_indices=si[0], feat_rows=fr[0])
        ns = num_seeds[0]  # (K,)-sharded: this host's valid seed count
        key = jax.random.fold_in(state.rng, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        skey, dkey = jax.random.split(key)
        batch = sample_batch_partitioned(shard, skey, seeds, ns,
                                         labels, fanouts, caps)
        x = partitioned_row_fetch(shard, batch.frontier, AXIS)

        def loss_fn(params):
            blocks = tuple(reversed(batch.blocks))
            out = model.apply({"params": params}, blocks, x,
                              deterministic=False, rngs={"dropout": dkey})
            out = out[: batch.seed_cap]
            mask = batch.seed_mask()
            if is_lp:
                return lp_logsigmoid_loss(out, mask)
            return masked_softmax_ce(out, batch.labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, AXIS)
        loss = jax.lax.pmean(loss, AXIS)
        state = state.apply_gradients(grads)
        edges = jax.lax.psum(sum(b.num_edges() for b in batch.blocks), AXIS)
        return state, {"loss": loss, "edges": edges}

    # num_seeds: (K,) int32, one valid-count per host (short shards pad
    # their seed batch with -1 — the Coordinate lockstep rule).
    specs = (P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
             P(AXIS), P(AXIS), P(AXIS))
    jitted = jax.jit(
        jax.shard_map(step, mesh=mesh, in_specs=specs,
                      out_specs=(P(), P())),
        donate_argnums=(0,))

    def put_shards(indptr, indices, features, partition: np.ndarray):
        k = mesh.shape[AXIS]
        parts = HostShard.build(indptr, indices, features, partition, k)
        stacked = [np.stack([p[i] for p in parts]) for i in range(4)]
        sh = NamedSharding(mesh, P(AXIS))
        return tuple(jax.device_put(jnp.asarray(a), sh) for a in stacked)

    return jitted, put_shards
