"""Mesh-parallel cached training: DP sampling per chip + Kg-striped hot
cache served over ICI + per-chip host miss staging, double-buffered.

The multi-chip twin of cache.pipeline.CachedTrainer and the integration
point of the reference's whole runtime architecture: every chip is an
independent sampler+trainer (the per-GPU GPURunner,
``src/Server.cu:167-368``), the hot feature rows are striped across the
``cache`` mesh axis of its clique (``src/GPUCache.cu:103-141``) with hit
rows exchanged by collectives and misses staged from host
(``src/Kernels.cu:662-702``), and gradients are pmean'd across the whole
mesh (DDP, ``legion_graphsage.py:140-141``).

Step structure (two shard_mapped XLA programs + one host exchange):

  [device] sample + dedup + cache plan per chip  -> packed stats+miss ids
  [host]   ONE fetch; gather miss rows per chip  -> staged (n, miss_cap, D)
  [device] collective hit fetch + combine + train step, grads pmean'd

with sample+plan for future steps dispatched ahead (PIPELINE_DEPTH
analog) so host staging overlaps device compute.

Value-exactness contract (tested): on a 1x1 mesh this trainer matches
the single-chip CachedTrainer (same keys, same feature values — params
agree to float rounding; bit-for-bit held through r3 when the op
sequences were identical, the r4 exact exchange re-orders ops); across
group sizes (replicated K=1 vs striped K=2/4 with the same hot set)
the losses match, because the striped exchange returns exactly the
rows the local cache would have (over-cap hits are host-staged with
identical values).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from legion_tpu.cache.striped import StripedFeatureCache
from legion_tpu.config import Config
from legion_tpu.sampling.sampler import DeviceGraph, sample_batch
from legion_tpu.train.loop import (lp_logsigmoid_loss, lp_logsigmoid_sum,
                                   masked_softmax_ce)
from legion_tpu.train.train_state import TrainState

MESH_AXES = ("data", "cache")


def _flat_index():
    return (jax.lax.axis_index("data") * jax.lax.axis_size("cache")
            + jax.lax.axis_index("cache"))


class StripedCachedTrainer:
    """Train on a (data x cache) mesh with host-resident features behind
    a striped hot cache.

    seeds/labels per step: (n_shards * batch,) int32 sharded over the
    flattened mesh — each chip trains its own sub-batch (per-GPU batch =
    cfg.sampler.batch_size, the reference's per-partition batch rule).
    """

    def __init__(self, cfg: Config, model, caps, graph: DeviceGraph,
                 cache: StripedFeatureCache, mesh, host_stage=None):
        self.cfg = cfg
        self.model = model
        self.caps = tuple(caps)
        self.cache = cache
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        # every jit argument must live on (or be uncommitted w.r.t.) the
        # same device set; replicate the graph and all small inputs onto
        # the mesh explicitly (the cache arrays are mesh-committed by
        # build()).
        self._rep = NamedSharding(mesh, P())
        self.graph = jax.device_put(graph, self._rep)
        # fail at construction, not mid-epoch: unlike the single-chip
        # CachedTrainer (which falls back to cache.stage),
        # StripedFeatureCache has no host-side stage to fall back to
        assert host_stage is not None, (
            "StripedCachedTrainer needs host_stage (the host-RAM miss "
            "stager, e.g. FeatureCache.stage) — StripedFeatureCache "
            "has no fallback")
        self.host_stage = host_stage
        self.is_lp = cfg.model.arch == "lp_sage"
        fanouts = tuple(cfg.sampler.fanouts)
        n = self.n_shards
        miss_cap = cache.miss_cap
        # per-owner exchange cap: probed by the driver (~1.05x observed
        # per-owner maxima) or the static 2x fallback; the SAME value
        # feeds the plan's demotion mask and the fetch routing.
        ocap = cache.owner_cap_rows
        shard = NamedSharding(mesh, P(MESH_AXES))
        self._shard = shard

        def fold_shard(key):
            # skip the fold on a 1-chip mesh so the step is bit-identical
            # to the single-chip CachedTrainer (same key derivation)
            if n > 1:
                key = jax.random.fold_in(key, _flat_index())
            return key

        def sample_plan(key, graph, hot_ids, seeds, num_seeds, labels):
            key = fold_shard(key)
            batch = sample_batch(key, graph, seeds, num_seeds[0], labels,
                                 fanouts, self.caps, dedup_last=True)
            base = StripedFeatureCache.plan_ids(hot_ids, batch.frontier,
                                                miss_cap)
            # hits beyond the exact exchange's per-owner cap are DEMOTED
            # to host-staged misses (correct under any owner skew — see
            # StripedFeatureCache.plan_ids); the demoted count is the
            # exchange-pressure stat (persistent nonzero => raise
            # owner_cap slack)
            kx = jax.lax.axis_size("cache")
            plan = (StripedFeatureCache.demote_overflow(
                base, batch.frontier, miss_cap, kx, cap=ocap)
                if kx > 1 else base)
            xov = base.num_hit - plan.num_hit
            edges = sum(b.num_edges() for b in batch.blocks)
            packed = jnp.concatenate([
                jnp.stack([plan.num_hit, plan.num_miss, plan.num_valid,
                           plan.overflow(), edges.astype(jnp.int32), xov]),
                plan.miss_ids])
            # leading per-chip axis so the pytrees stay sharded between
            # the two programs (stripped back off in train_from)
            lift = lambda t: jax.tree.map(lambda a: a[None], t)  # noqa: E731
            return lift(batch), lift(plan), packed

        def train_from(state: TrainState, rows_local, batch, plan, staged):
            batch = jax.tree.map(lambda a: a[0], batch)
            plan = jax.tree.map(lambda a: a[0], plan)
            staged = staged[0]

            def loss_fn(params, dkey):
                x = StripedFeatureCache.combine_rows(
                    rows_local, plan, staged, batch.frontier,
                    axis="cache", cap=ocap)
                blocks = tuple(reversed(batch.blocks))
                out = model.apply({"params": params}, blocks, x,
                                  deterministic=False,
                                  rngs={"dropout": dkey})
                out = out[: batch.seed_cap]
                mask = batch.seed_mask()
                if self.is_lp:
                    return lp_logsigmoid_loss(out, mask)
                return masked_softmax_ce(out, batch.labels, mask)

            key = fold_shard(jax.random.fold_in(state.rng, state.step))
            _, dkey = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, dkey)
            # grads arrive ALREADY psummed across shards (jax-0.9
            # shard_map vma transpose — see train.loop.train_step);
            # divide for the DDP mean instead of a second all-reduce.
            # On a 1x1 mesh this is /1: bit-identical to CachedTrainer.
            grads = jax.tree.map(lambda g: g / n, grads)
            loss = jax.lax.pmean(loss, MESH_AXES)
            state = state.apply_gradients(grads)
            return state, loss

        def eval_from(params, rows_local, batch, plan, staged):
            batch = jax.tree.map(lambda a: a[0], batch)
            plan = jax.tree.map(lambda a: a[0], plan)
            staged = staged[0]
            x = StripedFeatureCache.combine_rows(
                rows_local, plan, staged, batch.frontier,
                axis="cache", cap=ocap)
            blocks = tuple(reversed(batch.blocks))
            out = model.apply({"params": params}, blocks, x,
                              deterministic=True)
            out = out[: batch.seed_cap]
            mask = batch.seed_mask()
            if self.is_lp:
                # (loss SUM, valid-pair count): a/b after the psum is
                # the pair-weighted mean across shards AND steps
                a, b = lp_logsigmoid_sum(out, mask)
            else:
                pred = jnp.argmax(out, axis=-1)
                a, b = jnp.sum((pred == batch.labels) & mask), jnp.sum(mask)
            a = jax.lax.psum(a.astype(jnp.float32), MESH_AXES)
            b = jax.lax.psum(b.astype(jnp.float32), MESH_AXES)
            return a, b

        ax = P(MESH_AXES)
        self.jit_sample_plan = jax.jit(jax.shard_map(
            sample_plan, mesh=mesh,
            in_specs=(P(), P(), P(), ax, ax, ax),
            out_specs=(ax, ax, ax)))
        self.jit_train_from = jax.jit(jax.shard_map(
            train_from, mesh=mesh,
            in_specs=(P(), P("cache"), ax, ax, ax),
            out_specs=(P(), P())), donate_argnums=(0,))
        self.jit_eval_from = jax.jit(jax.shard_map(
            eval_from, mesh=mesh,
            in_specs=(P(), P("cache"), ax, ax, ax),
            out_specs=(P(), P())))

    # -- host staging -------------------------------------------------------

    def _stage(self, packed: np.ndarray):
        """packed: (n, 6+miss_cap). Returns (stats (n,6) =
        [hit, miss, valid, overflow, edges, exchange_overflow] per chip,
        staged device array (n, miss_cap, D) sharded per chip)."""
        n = self.n_shards
        stats = packed[:, :6]
        ids = packed[:, 6:].reshape(-1)            # (n*miss_cap,)
        rows = self.host_stage(ids)                # (n*miss_cap, D)
        staged = rows.reshape(n, self.cache.miss_cap, -1)
        return stats, jax.device_put(staged, self._shard)

    def _placed(self, a: np.ndarray):
        return jax.device_put(jnp.asarray(a), self._shard)

    # -- epoch loops --------------------------------------------------------

    def run_epoch(self, state: TrainState, seeds_epoch: np.ndarray,
                  labels_epoch: np.ndarray,
                  depth: Optional[int] = None) -> Dict:
        """seeds_epoch/labels_epoch: (steps, n_shards*batch) int32 —
        shard s's sub-batch at columns [s*b, (s+1)*b)."""
        depth = depth or self.cfg.train.pipeline_depth
        steps = seeds_epoch.shape[0]
        n = self.n_shards
        b = seeds_epoch.shape[1] // n
        nb = self._placed(np.full((n,), b, np.int32))
        state = jax.device_put(state, self._rep)
        key = jax.random.fold_in(state.rng, int(jax.device_get(state.epoch)))

        t0 = time.perf_counter()
        inflight = []
        losses = []
        hits = misses = valid = overflow = edges = xoverflow = 0
        host_bytes = 0
        itemsize = np.dtype(self.cache.np_dtype()).itemsize
        dim = self.cache.rows.shape[1]

        def dispatch(i):
            k = jax.device_put(jax.random.fold_in(key, i), self._rep)
            inflight.append(self.jit_sample_plan(
                k, self.graph, self.cache.hot_ids,
                self._placed(seeds_epoch[i]), nb,
                self._placed(labels_epoch[i])))

        for i in range(min(depth, steps)):
            dispatch(i)
        for i in range(steps):
            batch, plan, packed = inflight.pop(0)
            stats, staged = self._stage(
                np.asarray(packed).reshape(n, -1))
            state, loss = self.jit_train_from(state, self.cache.rows,
                                              batch, plan, staged)
            if i + depth < steps:
                dispatch(i + depth)
            losses.append(loss)
            s = stats.sum(axis=0)
            hits += int(s[0]); misses += int(s[1])
            valid += int(s[2]); overflow += int(s[3])
            edges += int(s[4]); xoverflow += int(s[5])
            host_bytes += int(np.minimum(stats[:, 1],
                                         self.cache.miss_cap).sum()
                              ) * dim * itemsize
            from legion_tpu.train.train_state import maybe_checkpoint_step
            maybe_checkpoint_step(self.cfg.train, state, i)

        last_loss = float(jax.device_get(losses[-1])) if losses else float("nan")
        dt = time.perf_counter() - t0
        return {
            "state": state, "steps": steps, "seconds": dt,
            "loss": last_loss,
            "cache_hit_rate": hits / max(valid, 1),
            "host_gb": host_bytes / 2 ** 30,
            "staging_overflow": overflow,
            "exchange_overflow": xoverflow,
            "edges": edges,
            "edges_per_s": edges / max(dt, 1e-9),
        }

    def eval_epoch(self, params, seeds: np.ndarray, counts: np.ndarray,
                   labels: np.ndarray, key=None,
                   depth: Optional[int] = None) -> float:
        """seeds: (steps, n*eval_cap) -1-padded; counts: (steps, n).

        Pipelined like run_epoch (VERDICT r2 weak #4: eval used to
        dispatch step t+1 only after step t's host staging): sample+plan
        for up to `depth` future steps is in flight while the current
        step stages, so the per-step host staging overlaps device eval.
        """
        key = key if key is not None else jax.random.PRNGKey(4242)
        depth = depth or self.cfg.train.pipeline_depth
        n = self.n_shards
        steps = seeds.shape[0]
        params = jax.device_put(params, self._rep)

        inflight = []

        def dispatch(t):
            sub = jax.device_put(jax.random.fold_in(key, t), self._rep)
            inflight.append(self.jit_sample_plan(
                sub, self.graph, self.cache.hot_ids,
                self._placed(seeds[t]),
                self._placed(counts[t].astype(np.int32)),
                self._placed(np.zeros_like(seeds[t])
                             if labels is None else labels[t])))

        # accumulate on device (in eval_from's own output sharding); ONE
        # fetch at the end (per-step scalar fetches cost ~100ms each
        # over the tunnel, CLAUDE.md)
        a_acc = b_acc = None
        for t in range(min(depth, steps)):
            dispatch(t)
        for t in range(steps):
            batch, plan, packed = inflight.pop(0)
            _, staged = self._stage(np.asarray(packed).reshape(n, -1))
            a, b = self.jit_eval_from(params, self.cache.rows, batch,
                                      plan, staged)
            if t + depth < steps:
                dispatch(t + depth)
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            a_acc = a if a_acc is None else a_acc + a
            b_acc = b if b_acc is None else b_acc + b
        # LP (pair-loss sum / pair count) and accuracy (correct / seen)
        # aggregate identically — a/b weights every batch by its real
        # contents (partial finals, exhausted shards included)
        a_sum = float(jax.device_get(a_acc))
        return a_sum / max(float(jax.device_get(b_acc)), 1.0)
