#!/usr/bin/env python
"""Headline benchmark: GraphSAGE mini-batch training throughput (edges/s)
on a products-scale synthetic graph, single chip.

Matches the reference's headline workload shape (GraphSAGE, hidden 256,
fanout [25,10], ~123M-edge / 2.45M-node graph with 100-dim features —
``legion_server.py:6-13,77-83``; batch here 8000 = the reference default).
The full pipeline is measured: seed batching, on-device neighbor
sampling, dedup/renumber, feature gather, forward/backward, Adam.

vs_baseline = speedup over the scatter-based DGL-style SpMM formulation
(segment_sum over the COO edge list) running the identical pipeline —
i.e. what a direct port of the reference's aggregation would do on TPU.

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.config import Config, DatasetConfig, ModelConfig, SamplerConfig, TrainConfig
from legion_tpu.data.synthetic import bench_graph
from legion_tpu.models import build_model
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.sampler import DeviceGraph
from legion_tpu.train.loop import make_step_fns
from legion_tpu.train.train_state import create_train_state

BATCH = int(os.environ.get("BENCH_BATCH", 8000))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
NODES = int(os.environ.get("BENCH_NODES", 2_449_029))
DEG = int(os.environ.get("BENCH_DEG", 50))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_variant(agg, graph, feats, data, cfg, caps, seeds, labels):
    model = build_model("sage", cfg.model.hidden_dim,
                        cfg.dataset.num_classes, cfg.model.num_layers,
                        cfg.model.dropout)
    if agg != "fanout":
        from legion_tpu.models.sage import SAGE
        model = SAGE(hidden_dim=cfg.model.hidden_dim,
                     out_dim=cfg.dataset.num_classes,
                     num_layers=cfg.model.num_layers,
                     dropout=cfg.model.dropout, agg=agg)
    _, _, epoch_scan = make_step_fns(cfg, model, caps)

    # init params via one jitted sample
    from legion_tpu.sampling.sampler import gather_features, sample_batch
    key = jax.random.PRNGKey(0)
    batch = jax.jit(sample_batch, static_argnums=(5, 6))(
        key, graph, seeds[0], jnp.full((), BATCH, jnp.int32), labels[0],
        tuple(cfg.sampler.fanouts), caps)
    x = jax.jit(gather_features)(feats, batch.frontier)
    params = model.init(key, tuple(reversed(batch.blocks)), x,
                        deterministic=True)["params"]
    state = create_train_state(params, cfg.train.learning_rate, 0)

    jepoch = jax.jit(epoch_scan, donate_argnums=(0,))
    # warmup/compile on 2 steps
    state, _, _ = jax.block_until_ready(
        jepoch(state, graph, feats, seeds[:2], labels[:2]))
    t0 = time.perf_counter()
    state, losses, edges = jax.block_until_ready(
        jepoch(state, graph, feats, seeds[2:], labels[2:]))
    dt = time.perf_counter() - t0
    eps = float(edges) / dt
    log(f"[{agg}] {STEPS - 2} steps in {dt:.3f}s -> {eps:.3e} edges/s "
        f"(loss {float(losses[-1]):.3f})")
    return eps


def main():
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache", f"synth_{NODES}_{DEG}")
    if os.path.exists(os.path.join(cache, "meta.json")):
        from legion_tpu.data.format import load_dataset
        data = load_dataset(cache, mmap=False)
        log(f"graph loaded from cache {time.time() - t0:.1f}s")
    else:
        log(f"generating {NODES} nodes x deg {DEG} graph ...")
        data = bench_graph(num_nodes=NODES, avg_degree=DEG)
        from legion_tpu.data.format import save_dataset
        save_dataset(data, cache)
        log(f"graph gen {time.time() - t0:.1f}s; edges={data.num_edges}")

    cfg = Config(
        dataset=DatasetConfig(num_classes=47),
        sampler=SamplerConfig(fanouts=(25, 10), batch_size=BATCH),
        model=ModelConfig(arch="sage", hidden_dim=256, num_layers=2,
                          dropout=0.5),
        train=TrainConfig(learning_rate=0.003),
    )
    caps = frontier_caps(BATCH, cfg.sampler.fanouts)
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    feats = jnp.asarray(np.asarray(data.features))

    rng = np.random.default_rng(0)
    ids = np.asarray(data.train_ids)
    seeds_np = np.stack([rng.permutation(ids)[:BATCH] for _ in range(STEPS)])
    labels_np = np.asarray(data.labels)[seeds_np]
    seeds = jnp.asarray(seeds_np.astype(np.int32))
    labels = jnp.asarray(labels_np.astype(np.int32))

    eps_fanout = run_variant("fanout", graph, feats, data, cfg, caps,
                             seeds, labels)
    eps_coo = run_variant("coo_segment", graph, feats, data, cfg, caps,
                          seeds, labels)

    print(json.dumps({
        "metric": "train_edges_per_s",
        "value": round(eps_fanout, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps_fanout / eps_coo, 3),
    }))


if __name__ == "__main__":
    main()
