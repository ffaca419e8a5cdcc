#!/usr/bin/env python
"""Stage-level timing of the training step on the real chip.

Times each pipeline stage as a separate jitted function (value-fetch
timing — block_until_ready is unreliable over the TPU tunnel):
  sample hops (per-hop sample_neighbors vs grow_frontier split),
  feature gather, forward, forward+backward+adam.
Run: python tools/profile_step.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.config import Config, DatasetConfig, ModelConfig, SamplerConfig, TrainConfig
from legion_tpu.data.format import load_dataset
from legion_tpu.models.sage import SAGE
from legion_tpu.sampling.block import frontier_caps
from legion_tpu.sampling.sampler import (
    DeviceGraph, gather_features, grow_frontier, sample_batch, sample_neighbors)
from legion_tpu.train.loop import make_step_fns
from legion_tpu.train.train_state import create_train_state

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
FANOUTS = (25, 10)


def _sync(out):
    """Force completion: fetch one scalar from the last dispatched call
    (single device stream => implies all queued work done)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(name, fn):
    out = fn()                 # compile
    _sync(out)
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".bench_cache")
    data = load_dataset(os.path.join(cache, "synth_2449029_50"), mmap=False)
    capf = os.path.join(cache, f"caps_nd_2449029_50_{BATCH}.json")
    caps = (tuple(json.load(open(capf))) if os.path.exists(capf)
            else frontier_caps(BATCH, FANOUTS))
    print(f"batch={BATCH} caps={caps}")

    from legion_tpu.data.format import pad_feature_dim
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    feats = jnp.asarray(pad_feature_dim(np.asarray(data.features)))
    cfg = Config(dataset=DatasetConfig(num_classes=47),
                 sampler=SamplerConfig(fanouts=FANOUTS, batch_size=BATCH),
                 model=ModelConfig(arch="sage", hidden_dim=256, num_layers=2,
                                   dropout=0.5),
                 train=TrainConfig(learning_rate=0.003))

    seeds = jnp.asarray(np.random.default_rng(0).permutation(
        np.asarray(data.train_ids))[:BATCH].astype(np.int32))
    labels = jnp.zeros((BATCH,), jnp.int32)
    nb = jnp.full((), BATCH, jnp.int32)
    key = jax.random.PRNGKey(0)

    # full fused step (dedup_last per config: identity-append last hop)
    import functools
    model = SAGE(hidden_dim=256, out_dim=47, num_layers=2, dropout=0.5)
    fns = make_step_fns(cfg, model, caps)
    batch = jax.jit(functools.partial(
        sample_batch, dedup_last=cfg.sampler.dedup_last),
        static_argnums=(5, 6))(
        key, graph, seeds, nb, labels, FANOUTS, caps)
    x = jax.jit(gather_features)(feats, batch.frontier)
    params = model.init(key, tuple(reversed(batch.blocks)), x,
                        deterministic=True)["params"]

    # stage: sampling hops split into draw vs dedup
    f0 = jnp.full((caps[0],), -1, jnp.int32).at[:BATCH].set(seeds)
    sn = jax.jit(sample_neighbors, static_argnames=("fanout",))
    nbrs1, _ = timed("hop1 sample_neighbors", lambda: sn(key, graph, f0, fanout=25))
    gf = jax.jit(grow_frontier, static_argnames=("cap_new",))
    (f1, n1, blk1), _ = timed("hop1 grow_frontier (dedup)",
                              lambda: gf(f0, nb, nbrs1, cap_new=caps[1]))
    nbrs2, _ = timed("hop2 sample_neighbors", lambda: sn(key, graph, f1, fanout=10))
    _, _ = timed("hop2 grow_frontier (dedup)",
                 lambda: gf(f1, n1, nbrs2, cap_new=caps[2]))
    sb = jax.jit(sample_batch, static_argnums=(5, 6))
    batch, t_sample = timed("sample_batch (all hops)",
                            lambda: sb(key, graph, seeds, nb, labels,
                                       FANOUTS, caps))
    xj, t_gather = timed("feature gather",
                         lambda: jax.jit(gather_features)(feats, batch.frontier))

    fwd = jax.jit(lambda p, b, x: model.apply(
        {"params": p}, tuple(reversed(b.blocks)), x, deterministic=True))
    _, t_fwd = timed("forward", lambda: fwd(params, batch, xj))

    state = create_train_state(params, 0.003, 0)
    jstep = jax.jit(fns.train_step)
    def full():
        st, m = jstep(state, graph, feats, seeds, nb, labels)
        return m["loss"]
    _, t_full = timed("FULL train step", full)
    print(f"\nbreakdown: sample {t_sample*1e3:.1f} + gather {t_gather*1e3:.1f}"
          f" + fwd {t_fwd*1e3:.1f} (bwd+opt = rest) | full {t_full*1e3:.1f}")


if __name__ == "__main__":
    main()
