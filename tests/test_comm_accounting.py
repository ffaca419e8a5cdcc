"""Quantitative comm accounting (VERDICT r3 next #5): the closed-form
per-step collective volumes are asserted against the collectives
ACTUALLY PRESENT in the compiled HLO of each exchange/step program —
converting the core-starved virtual-mesh scaling study into checkable
evidence. If a change silently adds, removes, or inflates a collective,
these assertions name it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legion_tpu.parallel.feature_exchange import (
    owner_cap, shard_rows, sharded_row_fetch_psum, sharded_row_fetch_stats)
from legion_tpu.utils.comm import (
    exact_exchange_bytes, hlo_collective_bytes, link_bytes,
    psum_exchange_bytes)

K, N, D, M = 4, 1000, 16, 96


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:K]).reshape(K), ("cache",))


def _compiled(mesh, fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def _striped_args(mesh):
    table = np.zeros((N, D), np.float32)
    rows = jax.device_put(shard_rows(table, K).reshape(-1, D),
                          NamedSharding(mesh, P("cache")))
    ids = jax.device_put(jnp.zeros(K * M, jnp.int32),
                         NamedSharding(mesh, P("cache")))
    return rows, ids


def test_exact_exchange_hlo_matches_formula(mesh):
    rows, ids = _striped_args(mesh)

    def ex(rl, il):
        o, ov = sharded_row_fetch_stats(rl, il, "cache")
        return o, ov[None]

    txt = _compiled(mesh, jax.shard_map(
        ex, mesh=mesh, in_specs=(P("cache"), P("cache")),
        out_specs=(P("cache"), P("cache"))), rows, ids)
    got = hlo_collective_bytes(txt)
    want = exact_exchange_bytes(M, K, D, itemsize=4)
    assert got == want, (got, want)
    # the exact path must NOT smuggle in gathers/reduce-scatters
    assert "all-gather" not in got and "reduce-scatter" not in got


def test_psum_exchange_hlo_matches_formula(mesh):
    rows, ids = _striped_args(mesh)
    txt = _compiled(mesh, jax.shard_map(
        lambda rl, il: sharded_row_fetch_psum(rl, il, "cache"),
        mesh=mesh, in_specs=(P("cache"), P("cache")),
        out_specs=P("cache")), rows, ids)
    got = hlo_collective_bytes(txt)
    want = psum_exchange_bytes(M, K, D, itemsize=4)
    assert got == want, (got, want)


def test_exact_exchange_cuts_link_volume_by_k_over_slack(mesh):
    """The headline of the round: exchange traffic drops from ~K x the
    requested rows to ~owner_cap_slack x (reference bar: P2P reads move
    exactly the requested bytes, src/Kernels.cu:695-699)."""
    exact = link_bytes(exact_exchange_bytes(M, K, D), K)
    psum = link_bytes(psum_exchange_bytes(M, K, D), K)
    cap = owner_cap(M, K)
    slack = cap * K / M
    assert exact < psum / (K / slack) * 1.1, (exact, psum)
    # and in absolute terms the response rows dominate: exact ~ slack*M*D
    assert exact <= slack * M * (D * 4 + 4) * 1.1


def test_striped_topo_sample_hot_hlo(mesh):
    """sample_hot's routed exchange: three all_to_alls (ids + draw-index
    payload + fanout-wide draws), no psum_scatter."""
    from legion_tpu.cache.striped import StripedTopoCache
    fanout = 5
    cap = owner_cap(M, K)
    hot = jax.device_put(jnp.arange(64, dtype=jnp.int32),
                         NamedSharding(mesh, P()))
    sp = jax.device_put(jnp.zeros((K, 17), jnp.int32),
                        NamedSharding(mesh, P("cache")))
    si = jax.device_put(jnp.zeros((K, 32), jnp.int32),
                        NamedSharding(mesh, P("cache")))
    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    fr = jax.device_put(jnp.zeros(K * M, jnp.int32),
                        NamedSharding(mesh, P("cache")))

    def f(hot, sp, si, key, fr):
        nbr, hit = StripedTopoCache.sample_hot(hot, sp, si, key, fr,
                                               fanout)
        return nbr, hit

    txt = _compiled(mesh, jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), P("cache"), P("cache"), P(), P("cache")),
        out_specs=(P("cache"), P("cache"))), hot, sp, si, key, fr)
    got = hlo_collective_bytes(txt)
    want = {"all-to-all": K * cap * 4 * 2 + K * cap * fanout * 4}
    assert got == want, (got, want)


def _dp_fixture(small_graph):
    from legion_tpu.config import (Config, DatasetConfig, ModelConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.models import build_model
    from legion_tpu.parallel.dp import make_dp_train_step
    from legion_tpu.parallel.mesh import make_mesh
    from legion_tpu.sampling.block import frontier_caps
    from legion_tpu.sampling.sampler import (DeviceGraph, gather_features,
                                             sample_batch)
    from legion_tpu.train.train_state import create_train_state

    cfg = Config(
        dataset=DatasetConfig(num_classes=small_graph.num_classes),
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=32),
        model=ModelConfig(arch="sage", hidden_dim=16, num_layers=2,
                          dropout=0.0),
        train=TrainConfig(learning_rate=0.01, seed=0))
    mesh4 = make_mesh(4, cache_group_size=1)
    graph = DeviceGraph.from_host(small_graph.indptr, small_graph.indices)
    caps = frontier_caps(32, (4, 3))
    model = build_model("sage", 16, small_graph.num_classes, 2, 0.0)
    feats = jnp.asarray(np.asarray(small_graph.features))
    rng = np.random.default_rng(7)
    seeds = jnp.asarray(rng.permutation(
        np.asarray(small_graph.train_ids))[: 4 * 32].astype(np.int32))
    labels = jnp.asarray(np.asarray(small_graph.labels)[seeds])
    b = sample_batch(jax.random.PRNGKey(0), graph, seeds[:32],
                     jnp.full((), 32, jnp.int32), labels[:32], (4, 3),
                     caps)
    x = gather_features(feats, b.frontier)
    params = model.init(jax.random.PRNGKey(0),
                        tuple(reversed(b.blocks)), x,
                        deterministic=True)["params"]
    state = create_train_state(params, 0.01, 0)
    step, _ = make_dp_train_step(cfg, model, caps, mesh4)
    return cfg, mesh4, graph, caps, model, feats, seeds, labels, \
        params, state, step


def test_dp_grad_allreduce_bytes(small_graph):
    """The DP step's all-reduce volume is the parameter bytes ONCE (+
    small scalar psums) — the NCCL-DDP analog, now pinned. Guards
    against the double all-reduce of pmean-after-auto-psum (jax-0.9
    shard_map vma already sums grads at the pvary transpose)."""
    from legion_tpu.utils.comm import param_bytes
    (cfg, mesh4, graph, caps, model, feats, seeds, labels, params,
     state, step) = _dp_fixture(small_graph)
    txt = step.lower(state, graph, feats, seeds,
                     jnp.full((), 32, jnp.int32), labels).compile(
                     ).as_text()
    got = hlo_collective_bytes(txt)
    pb = param_bytes(params)
    assert "all-to-all" not in got and "reduce-scatter" not in got
    assert pb <= got.get("all-reduce", 0) <= pb + 256, (got, pb)


def test_striped_cached_step_collective_composition(small_graph):
    """The FULL striped-cached train step (Kg=2) contains exactly: the
    exact exchange's two all_to_alls at the closed-form bytes, one
    param-sized gradient all-reduce (+ scalar loss), and NOTHING else —
    and the sample+plan program contains NO collectives at all. A
    regression that reintroduces the psum exchange or a second gradient
    all-reduce fails here by name."""
    from legion_tpu.cache.feature_cache import FeatureCache
    from legion_tpu.cache.striped import StripedFeatureCache
    from legion_tpu.cache.striped_pipeline import StripedCachedTrainer
    from legion_tpu.config import (CacheConfig, Config, DatasetConfig,
                                   ModelConfig, SamplerConfig,
                                   TrainConfig)
    from legion_tpu.models import build_model
    from legion_tpu.parallel.mesh import make_mesh
    from legion_tpu.sampling.block import frontier_caps
    from legion_tpu.sampling.sampler import DeviceGraph
    from legion_tpu.train.train_state import create_train_state
    from legion_tpu.utils.comm import param_bytes

    mesh2 = make_mesh(2, cache_group_size=2)
    cfg = Config(
        dataset=DatasetConfig(num_classes=small_graph.num_classes,
                              feature_placement="host"),
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=32,
                              probe_caps=False),
        model=ModelConfig(arch="sage", hidden_dim=16, num_layers=2,
                          dropout=0.0),
        train=TrainConfig(learning_rate=0.01, seed=0),
        cache=CacheConfig(enabled=True, budget_bytes=1 << 18,
                          group_size=2, presample_steps=2))
    caps = frontier_caps(32, (4, 3))
    graph = DeviceGraph.from_host(small_graph.indptr, small_graph.indices)
    feats = np.asarray(small_graph.features)
    order = np.arange(feats.shape[0], dtype=np.int32)
    miss_cap = caps[-1]
    sc = StripedFeatureCache.build(feats, order, 700, miss_cap, mesh2)
    fc = FeatureCache.build(feats, order, 700, miss_cap=miss_cap)
    model = build_model("sage", 16, small_graph.num_classes, 2, 0.0)
    tr = StripedCachedTrainer(cfg, model, caps, graph, sc, mesh2,
                              host_stage=fc.stage)

    n = 2
    rep = NamedSharding(mesh2, P())
    shard = NamedSharding(mesh2, P(("data", "cache")))
    key = jax.device_put(jax.random.PRNGKey(0), rep)
    seeds = jax.device_put(
        jnp.arange(n * 32, dtype=jnp.int32), shard)
    nb = jax.device_put(jnp.full((n,), 32, jnp.int32), shard)
    labels = jax.device_put(jnp.zeros((n * 32,), jnp.int32), shard)

    sp_txt = tr.jit_sample_plan.lower(
        key, tr.graph, sc.hot_ids, seeds, nb, labels).compile().as_text()
    assert hlo_collective_bytes(sp_txt) == {}, (
        "sample+plan must be collective-free (per-chip work only)")

    batch, plan, packed = tr.jit_sample_plan(
        key, tr.graph, sc.hot_ids, seeds, nb, labels)
    _, staged = tr._stage(np.asarray(packed).reshape(n, -1))

    # init a state on the mesh (shapes only)
    import jax.random as jr
    from legion_tpu.sampling.sampler import gather_features, sample_batch
    b0 = sample_batch(jr.PRNGKey(0), graph,
                      jnp.arange(32, dtype=jnp.int32),
                      jnp.full((), 32, jnp.int32),
                      jnp.zeros((32,), jnp.int32), (4, 3), caps,
                      dedup_last=True)
    x0 = gather_features(jnp.asarray(feats), b0.frontier)
    params = model.init(jr.PRNGKey(0), tuple(reversed(b0.blocks)), x0,
                        deterministic=True)["params"]
    state = jax.device_put(create_train_state(params, 0.01, 0), rep)

    txt = tr.jit_train_from.lower(state, sc.rows, batch, plan,
                                  staged).compile().as_text()
    got = hlo_collective_bytes(txt)
    m = caps[-1]
    d = sc.rows.shape[1]
    want_a2a = exact_exchange_bytes(
        m, 2, d, itemsize=sc.rows.dtype.itemsize)["all-to-all"]
    pb = param_bytes(params)
    assert got.get("all-to-all", 0) == want_a2a, (got, want_a2a)
    assert "all-gather" not in got and "reduce-scatter" not in got, got
    assert pb <= got.get("all-reduce", 0) <= pb + 64, (got, pb)


def test_dp_grads_are_mean_of_shard_grads(small_graph):
    """DDP semantics pin: the mesh step's applied gradient must equal
    the MEAN over shards of the per-shard gradients (computed here
    shard by shard on one chip with the identical key schedule). Before
    round 4 the mesh trainers applied the SUM — the auto-psum of the
    vma transpose followed by pmean-of-identical-sums — silently
    scaling the effective lr by the device count."""
    from legion_tpu.sampling.sampler import gather_features, sample_batch
    from legion_tpu.train.loop import masked_softmax_ce
    from legion_tpu.train.train_state import create_train_state
    (cfg, mesh4, graph, caps, model, feats, seeds, labels, params,
     state, step) = _dp_fixture(small_graph)
    # the jitted step donates its state buffers — keep an owned copy
    params = jax.tree_util.tree_map(jnp.copy, params)

    state2, metrics = step(state, graph, feats, seeds,
                           jnp.full((), 32, jnp.int32), labels)

    # reference: replay each shard's exact sampling/dropout keys
    st = create_train_state(params, cfg.train.learning_rate,
                            cfg.train.seed)
    base = jax.random.fold_in(st.rng, st.step)
    acc = None
    for c in range(4):
        key = jax.random.fold_in(base, jnp.int32(c))
        skey, dkey = jax.random.split(key)
        bc = sample_batch(skey, graph, seeds[c * 32:(c + 1) * 32],
                          jnp.full((), 32, jnp.int32),
                          labels[c * 32:(c + 1) * 32],
                          tuple(cfg.sampler.fanouts), caps,
                          dedup_last=cfg.sampler.dedup_last)

        def lf(p):
            x = gather_features(feats, bc.frontier, mask_invalid=False)
            out = model.apply({"params": p},
                              tuple(reversed(bc.blocks)), x,
                              deterministic=False,
                              rngs={"dropout": dkey})
            out = out[: bc.seed_cap]
            return masked_softmax_ce(out, bc.labels, bc.seed_mask())

        g = jax.grad(lf)(params)
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
    gmean = jax.tree.map(lambda a: a / 4.0, acc)
    want = st.apply_gradients(gmean)
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
