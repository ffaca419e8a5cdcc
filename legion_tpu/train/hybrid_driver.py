"""Hybrid-placement training driver: host CSR + HBM hot sub-CSR + host
features behind a FeatureCache.

The uk2014/clueweb-class placement (``topology_placement="host"``,
SURVEY.md placement matrix): topology exceeds device HBM, so the device
samples only cache-HIT frontier nodes from the compacted sub-CSR
(cache.topo_cache) while misses are sampled by the threaded C++ host
sampler and merged — the TPU analog of the reference's GPU threads
reading the pinned-host zero-copy CSR (``src/Kernels.cu:468-564``).
Features are host-resident behind the hotness feature cache exactly as
in the cached driver.

Presampling runs entirely on the host (the reference's pre-sampler also
reads the host CSR, ``kernel_pre_sampler_optimized``): hotness
histograms via the C++ runtime, realized frontier maxima for cap
sizing.
"""

from __future__ import annotations

import time
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.cache.cost_model import solve_cost_model
from legion_tpu.cache.feature_cache import FeatureCache, cache_dtype_for
from legion_tpu.cache.hotness import observed_caps
from legion_tpu.cache.hybrid import HybridSampler
from legion_tpu.cache.pipeline import make_cache_step_fns
from legion_tpu.cache.topo_cache import TopoCache
from legion_tpu.config import Config
from legion_tpu.data.format import GraphData
from legion_tpu.models import build_model
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.seeds import epoch_train_seeds, make_seed_plan, shard_node_set
from legion_tpu.train.train_state import create_train_state


def presample_hotness_host(indptr: np.ndarray, indices: np.ndarray,
                           seeds_epoch: np.ndarray,
                           fanouts: Sequence[int], num_nodes: int,
                           seed: int) -> Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Host presampling epoch: per-node feature/topology hotness
    histograms + realized per-level frontier maxima. Mirrors
    cache.hotness.presample_hotness's semantics on the host CSR."""
    from legion_tpu import runtime
    node_hot = np.zeros(num_nodes, np.int64)
    edge_hot = np.zeros(num_nodes, np.int64)
    max_per_hop = np.zeros(len(fanouts) + 1, np.int64)
    for t in range(seeds_epoch.shape[0]):
        row = seeds_epoch[t]
        frontier = np.unique(row[row >= 0]).astype(np.int32)
        counts = [len(frontier)]
        for k, f in enumerate(fanouts):
            runtime.accumulate_hist(edge_hot, frontier)  # rows read
            nbrs = runtime.sample_neighbors(
                indptr, indices, frontier, f,
                seed=seed * 1_000_003 + t * 31 + k)
            new = nbrs[nbrs >= 0]
            frontier = np.unique(np.concatenate([frontier, new])
                                 ).astype(np.int32)
            counts.append(len(frontier))
        runtime.accumulate_hist(node_hot, frontier)      # rows gathered
        max_per_hop = np.maximum(max_per_hop, counts)
    return node_hot, edge_hot, max_per_hop


def run_hybrid_training(cfg: Config, data: GraphData, log=print) -> Dict:
    """Initialize -> PreSc(host) -> Run for the host-topology placement."""
    indptr = np.ascontiguousarray(np.asarray(data.indptr), np.int64)
    indices = np.ascontiguousarray(np.asarray(data.indices), np.int32)
    num_classes = cfg.dataset.num_classes or data.num_classes
    b = cfg.sampler.batch_size
    fanouts = tuple(cfg.sampler.fanouts)

    shards = shard_node_set(np.asarray(data.train_ids), 1)
    plan = make_seed_plan([len(shards[0])], [max(len(data.valid_ids), 1)],
                          [max(len(data.test_ids), 1)], b,
                          cfg.sampler.eval_batch_size)
    rng = np.random.default_rng(cfg.train.seed)
    seeds, _ = epoch_train_seeds(rng, shards, plan)

    # ---- presampling (host CSR) --------------------------------------------
    t0 = time.perf_counter()
    steps = cfg.cache.presample_steps or plan.train_steps
    node_hot, edge_hot, max_per_hop = presample_hotness_host(
        indptr, indices, seeds[0][:steps], fanouts, data.num_nodes,
        cfg.train.seed)
    log(f"host presampling: {steps} steps in {time.perf_counter()-t0:.1f}s")

    # ---- cost model: split budget between feature + topo caches ------------
    cache_dtype, row_bytes = cache_dtype_for(cfg.model.dtype,
                                             data.feature_dim)
    cost = solve_cost_model(node_hot, edge_hot, data.degrees(),
                            cfg.cache.budget_bytes,
                            feat_row_bytes=row_bytes,
                            group_size=cfg.cache.group_size,
                            granularity=cfg.cache.cost_model_granularity)
    log(f"cost model: alpha={cost.alpha:.2f} feat_cap={cost.feat_capacity} "
        f"topo_cap={cost.topo_capacity}")
    caps = observed_caps(max_per_hop, cfg.sampler.observed_cap_slack)

    topo = TopoCache.build(indptr, indices, cost.topo_order,
                           cost.topo_capacity)
    miss_cap = int(min(caps[-1], (caps[-1] // 16 + 1024 + 127) // 128 * 128))
    cache = FeatureCache.build(np.asarray(data.features), cost.feat_order,
                               cost.feat_capacity, miss_cap=miss_cap,
                               dtype=cache_dtype)
    hs = HybridSampler(topo, indptr, indices, fanouts, caps)

    # ---- model/state -------------------------------------------------------
    model = build_model(cfg.model.arch, cfg.model.hidden_dim, num_classes,
                        cfg.model.num_layers, cfg.model.dropout,
                        dtype=cfg.model.dtype)
    key = jax.random.PRNGKey(cfg.train.seed)
    batch0 = hs.sample_batch(key, jnp.asarray(seeds[0][0]), b,
                             jnp.zeros((b,), jnp.int32))
    x0 = jnp.zeros((caps[-1], data.feature_dim), jnp.float32)
    params = model.init(key, tuple(reversed(batch0.blocks)), x0,
                        deterministic=True)["params"]
    state = create_train_state(params, cfg.train.learning_rate,
                               cfg.train.seed)

    train_from, eval_from = make_cache_step_fns(cfg, model)
    jit_plan = jax.jit(FeatureCache.plan_ids, static_argnums=(2,))
    jit_train = jax.jit(train_from, donate_argnums=(0,))
    from legion_tpu.runtime import gather_rows
    host_feats = np.asarray(data.features)
    labels_all = np.asarray(data.labels)

    # ---- training ----------------------------------------------------------
    history = []
    for epoch in range(cfg.train.epochs):
        ep_rng = np.random.default_rng(cfg.train.seed * 100003 + epoch)
        s, _ = epoch_train_seeds(ep_rng, shards, plan)
        t0 = time.perf_counter()
        losses = []
        # The per-step hit RATE accumulates as an f32 DEVICE scalar
        # (dispatch, no fetch): per-step int() fetches are full
        # round-trips — ruinous on a tunneled TPU (see cache/pipeline.py)
        # — and int32 count accumulators would wrap at uk-scale epochs
        # (~1.5M valid/step x 1400+ steps > 2^31).
        rate_sum = jnp.zeros((), jnp.float32)
        steps = s[0].shape[0]
        for i in range(steps):
            key, sub = jax.random.split(key)
            batch = hs.sample_batch(sub, jnp.asarray(s[0][i]), b,
                                    jnp.asarray(labels_all[s[0][i]]),
                                    host_seed=epoch * 100003 + i)
            cp = jit_plan(cache.hot_ids, batch.frontier, cache.miss_cap)
            staged = gather_rows(host_feats,
                                 np.asarray(cp.miss_ids)).astype(cache_dtype)
            state, loss = jit_train(state, cache.rows, batch, cp,
                                    jnp.asarray(staged))
            losses.append(loss)
            rate_sum = rate_sum + (cp.num_hit.astype(jnp.float32)
                                   / jnp.maximum(cp.num_valid, 1)
                                   .astype(jnp.float32))
        dt = time.perf_counter() - t0
        rec = {"epoch": epoch, "seconds": dt,
               "loss": float(jax.device_get(losses[-1])),
               "feat_hit_rate": float(jax.device_get(rate_sum))
               / max(steps, 1),
               "topo_hot_fraction": hs.hot_fraction(),
               "host_topo_gb": hs.stats["host_bytes"] / 2**30}
        history.append(rec)
        log(f"Epoch:{epoch}, Cost:{dt:.3f} s, Loss:{rec['loss']:.4f}, "
            f"feat_hit:{rec['feat_hit_rate']:.3f}, "
            f"topo_hot:{rec['topo_hot_fraction']:.3f}")
    return {"state": state, "history": history, "cost": cost,
            "sampler": hs}
