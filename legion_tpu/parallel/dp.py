"""Multi-chip training step: DP over the full mesh, features optionally
striped over the ``cache`` axis.

Maps the reference's runtime parallelism (SURVEY.md §2 checklist) onto a
mesh: every chip is an independent sampler+trainer (the per-GPU
GPURunner, ``src/Server.cu:167-368``), gradients are pmean'd across the
whole mesh (DDP/NCCL, ``legion_graphsage.py:140-141``), and feature rows
can be striped across the ``cache`` axis with collective row exchange
(the NVLink Kg clique, ``src/GPUCache.cu:103-108`` — see
feature_exchange).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legion_tpu.config import Config
from legion_tpu.parallel.feature_exchange import shard_rows, sharded_row_fetch
from legion_tpu.train.loop import make_step_fns

MESH_AXES = ("data", "cache")


def put_striped_features(features: np.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Round-robin-stripe the feature table over the cache axis and place
    it: returns a (K*cap, D) global array sharded P('cache') whose local
    shard on chip j is stripe j (rows with id % K == j)."""
    k = mesh.shape["cache"]
    striped = shard_rows(np.asarray(features), k)         # (K, cap, D)
    flat = striped.reshape(k * striped.shape[1], striped.shape[2])
    sharding = NamedSharding(mesh, P("cache"))
    return jax.device_put(flat, sharding)


def make_dp_train_step(cfg: Config, model, caps, mesh: Mesh,
                       sharded_features: bool = False):
    """Returns (jitted_step, shardings) where jitted_step(state, graph,
    feats, seeds, num_seeds, labels) -> (state, metrics).

    seeds/labels: (total_batch,) sharded over (data, cache) — every chip
    trains on its own slice; num_seeds: per-shard valid count
    (replicated scalar).
    """
    fetch = None
    if sharded_features:
        fetch = lambda feats, frontier: sharded_row_fetch(  # noqa: E731
            feats, frontier, "cache")
    train_step, eval_step, *_ = make_step_fns(
        cfg, model, caps, feature_fetch=fetch, shard_axes=MESH_AXES)

    feats_spec = P("cache") if sharded_features else P()
    in_specs = (P(), P(), feats_spec, P(MESH_AXES), P(), P(MESH_AXES))
    step = jax.jit(
        jax.shard_map(train_step, mesh=mesh, in_specs=in_specs,
                      out_specs=(P(), P())),
        donate_argnums=(0,))

    eval_specs = (P(), P(), feats_spec, P(MESH_AXES), P(), P(MESH_AXES), P())
    ev = jax.jit(
        jax.shard_map(eval_step, mesh=mesh, in_specs=eval_specs,
                      out_specs=(P(), P())))
    return step, ev
