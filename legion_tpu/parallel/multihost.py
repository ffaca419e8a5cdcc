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


def _partitioned_step_fns(cfg: Config, model, caps):
    """Pure per-shard step functions (inside shard_map over AXIS)."""
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
        # already psummed across hosts by the vma transpose (see
        # train.loop.train_step); divide for the DDP mean
        grads = jax.tree.map(lambda g: g / jax.lax.axis_size(AXIS), grads)
        loss = jax.lax.pmean(loss, AXIS)
        state = state.apply_gradients(grads)
        edges = jax.lax.psum(sum(b.num_edges() for b in batch.blocks), AXIS)
        return state, {"loss": loss, "edges": edges}

    def eval_step(params, owned, sp, si, fr, seeds, ns, labels, key):
        # ns: () this host's valid seed count for the step
        shard = HostShard(owned_ids=owned[0], sub_indptr=sp[0],
                          sub_indices=si[0], feat_rows=fr[0])
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        batch = sample_batch_partitioned(shard, key, seeds, ns,
                                         labels, fanouts, caps)
        x = partitioned_row_fetch(shard, batch.frontier, AXIS)
        out = model.apply({"params": params},
                          tuple(reversed(batch.blocks)), x,
                          deterministic=True)
        out = out[: batch.seed_cap]
        mask = batch.seed_mask()
        if is_lp:
            # (mean LP loss, 1) per shard-step: the driver's c/n then
            # averages over shards x steps (see train.loop.eval_step —
            # dividing by sum(mask) would report ~loss/batch).
            a, b = lp_logsigmoid_loss(out, mask), jnp.ones((), jnp.int32)
        else:
            pred = jnp.argmax(out, axis=-1)
            a, b = jnp.sum((pred == batch.labels) & mask), jnp.sum(mask)
        return (jax.lax.psum(a.astype(jnp.float32), AXIS),
                jax.lax.psum(b.astype(jnp.float32), AXIS))

    def epoch_scan(state, owned, sp, si, fr, seeds_epoch, num_seeds,
                   labels_epoch):
        """Whole partitioned epoch as one program (steps on the leading
        axis of seeds/labels)."""
        def body(st, xs):
            seeds, labels = xs
            st, m = step(st, owned, sp, si, fr, seeds, num_seeds, labels)
            return st, (m["loss"], m["edges"])

        state, (losses, edges) = jax.lax.scan(
            body, state, (seeds_epoch, labels_epoch))
        return state, losses, jnp.sum(edges)

    def eval_scan(params, owned, sp, si, fr, seeds_epoch, counts,
                  labels_epoch, key):
        def body(carry, xs):
            a_s, b_s = carry
            seeds, nb, labels, k = xs
            a, b = eval_step(params, owned, sp, si, fr, seeds, nb,
                             labels, k)
            return (a_s + a, b_s + b), None

        steps = seeds_epoch.shape[0]
        keys = jax.random.split(key, steps)
        (a, b), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            (seeds_epoch, counts[:, 0], labels_epoch, keys))
        return a, b

    return step, eval_step, epoch_scan, eval_scan


def make_partitioned_train_step(cfg: Config, model, caps, mesh: Mesh):
    """Returns (jitted_step, put_shards).

    jitted_step(state, owned, sub_indptr, sub_indices, feat_rows,
                seeds, num_seeds, labels) -> (state, metrics)
    with the shard arrays stacked (K, ...) and sharded over `data`.
    """
    step, *_ = _partitioned_step_fns(cfg, model, caps)

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


def make_partitioned_epoch_fns(cfg: Config, model, caps, mesh: Mesh,
                               eval_caps=None):
    """Whole-epoch partitioned programs: (jit_epoch, jit_eval_scan).

    jit_epoch(state, owned, sp, si, fr, seeds_epoch, num_seeds,
              labels_epoch) -> (state, losses, edges)
      seeds/labels: (steps, K*batch) sharded on the batch dim;
      num_seeds: (K,) per-host valid counts (full batches: drop-last).
    jit_eval_scan(params, ..., seeds, counts, labels, key) ->
      (correct, total); counts: (steps, K) per-host per-step counts.
    """
    _, _, epoch_scan, _ = _partitioned_step_fns(cfg, model, caps)
    _, _, _, eval_scan = _partitioned_step_fns(cfg, model,
                                               eval_caps or caps)
    ax = P(AXIS)
    ep_specs = (P(), ax, ax, ax, ax, P(None, AXIS), ax, P(None, AXIS))
    jit_epoch = jax.jit(
        jax.shard_map(epoch_scan, mesh=mesh, in_specs=ep_specs,
                      out_specs=(P(), P(), P())),
        donate_argnums=(0,))
    ev_specs = (P(), ax, ax, ax, ax, P(None, AXIS), P(None, AXIS),
                P(None, AXIS), P())
    jit_eval = jax.jit(
        jax.shard_map(eval_scan, mesh=mesh, in_specs=ev_specs,
                      out_specs=(P(), P())))
    return jit_epoch, jit_eval
