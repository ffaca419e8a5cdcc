#!/usr/bin/env python
"""Headline benchmark: GraphSAGE mini-batch training throughput (edges/s)
on a products-scale synthetic graph, single chip.

Matches the reference's headline workload shape (GraphSAGE, hidden 256,
fanout [25,10], ~122M-edge / 2.45M-node graph with 100-dim features —
``legion_server.py:6-13,77-83``; batch 8000 = the reference default).
The full pipeline is measured: seed batching, on-device neighbor
sampling, dedup/renumber, feature gather, forward/backward, Adam.

Stage 1 probes realized frontier sizes and tightens the static caps
(the reference's 1.2 x observed MaxIdNum buffer sizing,
``src/Server.cu:273-282``); stage 2 times an epoch scan at tight caps.

vs_baseline = speedup over the scatter-based DGL-style SpMM formulation
(segment_sum over the COO edge list) running the identical pipeline —
i.e. what a direct port of the reference's aggregation would do on TPU.

Model compute defaults to bfloat16 mixed precision (f32 params/reduce —
the TPU-idiomatic training dtype; convergence parity vs f32 is tested
in tests/test_bf16.py and losses match to 3 decimals at bench scale).
BENCH_DTYPE=float32 reproduces the f32 measurement; the baseline is
always measured at the same dtype (memo key includes it).

Prints exactly ONE JSON line on stdout.
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
from legion_tpu.sampling.sampler import DeviceGraph, gather_features, sample_batch
from legion_tpu.train.loop import make_step_fns
from legion_tpu.train.train_state import create_train_state

BATCH = int(os.environ.get("BENCH_BATCH", 8000))
# Measurement window. A real epoch at batch 8000 on this graph is ~245
# steps; the scan carries a fixed ~50ms of tunnel dispatch + final-fetch
# overhead per call, so too short a window under-reports sustained
# throughput (20 steps: -12%; 40 steps: ~0.7 ms/step of overhead still
# charged). 160 approximates a real epoch while keeping a trial under
# 3s. FULL DISCLOSURE for cross-round comparisons: rounds 1-3 recorded
# 40-step numbers; same-code A/B 2026-08-21: 40-step 7.62e7 vs 160-step
# 7.82e7 (pre-unroll) — the window accounts for ~+2.6%, the rest of any
# round-over-round delta is real. The baseline is always measured at
# the SAME window (memo key includes it), so vs_baseline is unaffected.
STEPS = int(os.environ.get("BENCH_STEPS", 160))
NODES = int(os.environ.get("BENCH_NODES", 2_449_029))
DEG = int(os.environ.get("BENCH_DEG", 50))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# Slack multiplier over observed per-hop frontier maxima (the reference
# uses 1.2, src/Server.cu:275; per-hop unique counts concentrate tightly
# at batch 8000 so small slacks hold). Every step's frontier sizes are
# checked and the epoch asserts ZERO cap overflow, so a too-tight slack
# fails loudly rather than silently thinning neighborhoods. History:
# 1.2 -> 1.05 cut the dominant feature gather by 13% (3.93e7 -> 4.83e7
# edges/s); 1.05 -> 1.03 (r4) measured 7.94e7 -> 8.32e7 with zero
# overflow across 2x160 steps (probe max 118610 vs hop-1 cap 122240).
SLACK = float(os.environ.get("BENCH_SLACK", 1.03))
# PRNG impl changes the draws, hence observed frontier maxima -> it is
# part of the caps/baseline memo keys.
PRNG = os.environ.get("BENCH_PRNG", "rbg")
FANOUTS = (25, 10)
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def shared_code_hash():
    """Content hash of every module on the baseline variant's code path.

    The baseline memo must invalidate itself when shared code changes
    (previously a manual delete documented in CLAUDE.md — a footgun:
    a stale baseline silently skews vs_baseline)."""
    import hashlib
    root = os.path.dirname(os.path.abspath(__file__))
    shared = [
        "legion_tpu/sampling/sampler.py",
        "legion_tpu/sampling/block.py",
        "legion_tpu/train/loop.py",
        "legion_tpu/models/sage.py",
        "legion_tpu/ops/segment.py",
        "legion_tpu/ops/identity_agg_pallas.py",
        "legion_tpu/ops/select_pallas.py",
        "legion_tpu/cache/hotness.py",
    ]
    h = hashlib.sha256()
    for rel in shared:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def load_or_gen():
    t0 = time.time()
    cache = os.path.join(CACHE_DIR, f"synth_{NODES}_{DEG}")
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
    return data


def probe_caps(graph, seeds, labels):
    """Measure realized per-hop frontier sizes, with disk memoization.

    Intermediate hops are tightened from observation (they dedup); the
    last cap is the exact identity-append extent (dedup_last=False)."""
    memo = os.path.join(
        CACHE_DIR, f"caps_nd_{NODES}_{DEG}_{BATCH}_s{SLACK}"
        + ("" if PRNG == "rbg" else f"_{PRNG}") + ".json")
    if os.path.exists(memo):
        caps = tuple(json.load(open(memo)))
        log(f"observed caps from cache: {caps}")
        return caps
    loose = frontier_caps(BATCH, FANOUTS)
    t0 = time.time()
    sb = jax.jit(sample_batch, static_argnums=(5, 6))
    mx = np.zeros(len(FANOUTS) + 1, np.int64)
    for i in range(3):
        b = sb(jax.random.PRNGKey(100 + i), graph, seeds[i],
               jnp.full((), BATCH, jnp.int32), labels[i], FANOUTS, loose)
        counts = [int(b.num_seeds)] + [int(blk.num_src) for blk in b.blocks]
        mx = np.maximum(mx, counts)
    from legion_tpu.cache.hotness import observed_caps
    caps = observed_caps(mx, slack=SLACK, align=128,
                         last_exact_fanout=FANOUTS[-1])
    log(f"cap probe {time.time() - t0:.1f}s: observed {mx.tolist()} "
        f"-> caps {caps} (loose {loose})")
    json.dump(list(caps), open(memo, "w"))
    return caps


def run_variant(agg, graph, feats, cfg, caps, seeds, labels):
    from legion_tpu.models.sage import SAGE
    model = SAGE(hidden_dim=cfg.model.hidden_dim,
                 out_dim=cfg.dataset.num_classes,
                 num_layers=cfg.model.num_layers,
                 dropout=cfg.model.dropout, agg=agg,
                 dtype=jnp.dtype(cfg.model.dtype))
    epoch_scan = make_step_fns(cfg, model, caps).epoch_scan

    import functools
    key = jax.random.PRNGKey(0)
    batch = jax.jit(functools.partial(sample_batch, dedup_last=False),
                    static_argnums=(5, 6))(
        key, graph, seeds[0], jnp.full((), BATCH, jnp.int32), labels[0],
        tuple(cfg.sampler.fanouts), caps)
    x = jax.jit(gather_features)(feats, batch.frontier)
    params = model.init(key, tuple(reversed(batch.blocks)), x,
                        deterministic=True)["params"]
    state = create_train_state(params, cfg.train.learning_rate, 0)

    jepoch = jax.jit(epoch_scan, donate_argnums=(0,))
    # warmup MUST use the same scan length (different leading dim =
    # recompile), and timing MUST fetch values — block_until_ready does
    # not reliably block on the tunneled TPU platform. The fetch is ONE
    # packed 3-scalar array: separate float(edges)/float(losses[-1])
    # fetches each cost a full tunnel round-trip (~50ms) INSIDE the
    # timed window, charging per-call harness overhead (absent in a
    # real 245-step epoch, which fetches once) against sustained
    # throughput.
    t0 = time.perf_counter()
    state, losses, _ = jepoch(state, graph, feats, seeds, labels)
    _ = float(losses[-1])
    log(f"[{agg}] compile+warmup {time.perf_counter() - t0:.1f}s")
    best = None
    for _trial in range(2):
        t0 = time.perf_counter()
        state, losses, (edges, overflow) = jepoch(state, graph, feats,
                                                  seeds, labels)
        # edges is PER-STEP (steps,) int32 (int64-safe epoch totals,
        # see train.loop.sum_edge_counts); each count < 2^24 so the f32
        # ride through the packed transfer is exact — summed on host.
        packed = np.asarray(jnp.concatenate(
            [jnp.stack([losses[-1].astype(jnp.float32),
                        overflow.astype(jnp.float32)]),
             edges.astype(jnp.float32)]))
        dt = time.perf_counter() - t0
        l, overflow = float(packed[0]), packed[1]
        e = float(np.asarray(packed[2:], np.int64).sum())
        best = min(best, dt) if best else dt
        assert float(overflow) == 0, (
            f"frontier cap overflow ({overflow} ids dropped): "
            "loosen observed_cap_slack")
    eps = e / best
    log(f"[{agg}] {STEPS} steps in {best:.3f}s -> {eps:.3e} edges/s "
        f"(loss {l:.3f})")
    return eps, best / STEPS * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE_DIR, "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")
    # TPU hardware RNG for dropout masks + sampling draws (same
    # distributions, different stream): threefry is VPU-heavy at
    # (frontier x hidden) dropout shapes — measured -0.7 ms/step.
    try:
        jax.config.update("jax_default_prng_impl", PRNG)
    except Exception as e:
        log(f"prng impl pin unavailable: {e}")

    data = load_or_gen()
    cfg = Config(
        dataset=DatasetConfig(num_classes=47),
        sampler=SamplerConfig(fanouts=FANOUTS, batch_size=BATCH),
        model=ModelConfig(arch="sage", hidden_dim=256, num_layers=2,
                          dropout=0.5, dtype=DTYPE),
        train=TrainConfig(learning_rate=0.003),
    )
    from legion_tpu.data.format import pad_feature_dim
    graph = DeviceGraph.from_host(
        data.indptr, data.indices,
        layout=os.environ.get("BENCH_LAYOUT", "auto"))
    feats = jnp.asarray(pad_feature_dim(np.asarray(data.features)))

    rng = np.random.default_rng(0)
    ids = np.asarray(data.train_ids)
    seeds_np = np.stack([rng.permutation(ids)[:BATCH] for _ in range(STEPS)])
    labels_np = np.asarray(data.labels)[seeds_np]
    seeds = jnp.asarray(seeds_np.astype(np.int32))
    labels = jnp.asarray(labels_np.astype(np.int32))

    caps = probe_caps(graph, seeds, labels)

    eps_fanout, step_ms = run_variant("fanout", graph, feats, cfg, caps,
                                      seeds, labels)

    # whole-step speed-of-light accounting (VERDICT r4 #7): compose
    # per-stage roofs from independently measured device rates and
    # report measured-vs-roof (tools/sol_model.py documents every rate
    # and stage; the composition is in docs/ARCHITECTURE.md).
    try:
        from tools.sol_model import sol_fraction, step_roof_ms
        roof = step_roof_ms(BATCH, caps, FANOUTS, cfg.model.hidden_dim,
                            feats.shape[1], cfg.dataset.num_classes,
                            bf16=(DTYPE == "bfloat16"))
        sol = sol_fraction(step_ms, roof)
        log("roof model [ms]: " + ", ".join(
            f"{k}={v:.2f}" for k, v in roof.items())
            + f"; measured {step_ms:.2f} -> sol_frac {sol:.2f}")
    except Exception as exc:  # never lose the headline to the roof
        # None (-> JSON null), NOT float('nan'): json.dumps emits the
        # token `NaN`, which strict JSON consumers reject — corrupting
        # the whole one-line artifact the guard exists to protect.
        roof, sol = {"total": None}, None
        log(f"roof model errored: {exc}")

    # Baseline (scatter-SpMM port) is deterministic given shapes; its
    # measurement is memoized so the default bench needs one compile —
    # the remote compile service's latency varies 50s..510s per program.
    # Delete .bench_cache/baseline_*.json to force a re-measure.
    memo = os.path.join(
        CACHE_DIR, f"baseline_{NODES}_{DEG}_{BATCH}_{DTYPE}_s{SLACK}"
        + ("" if PRNG == "rbg" else f"_{PRNG}")
        + (f"_n{STEPS}" if STEPS != 20 else "")
        + f"_h{shared_code_hash()}" + ".json")
    if os.path.exists(memo):
        eps_coo = json.load(open(memo))["edges_per_s"]
        log(f"[coo_segment] baseline from cache: {eps_coo:.3e} edges/s")
    else:
        eps_coo, _ = run_variant("coo_segment", graph, feats, cfg, caps,
                                 seeds, labels)
        json.dump({"edges_per_s": eps_coo}, open(memo, "w"))

    # Mosaic regression gate (VERDICT r2 weak #7): compile + verify every
    # production Pallas kernel on the chip and record pass/fail in the
    # bench artifact — CI only runs kernels in interpret mode, so this is
    # the round's only automatic Mosaic check. Compiles are cached.
    kernels = []
    try:
        from tools.bench_kernels import run_gate
        gate = run_gate(quick=True, log=log)
        kernel_gate = ("pass" if not gate["failures"]
                       else "FAIL:" + ",".join(gate["failures"]))
        # per-kernel ok list in the artifact so a future FAIL names the
        # kernel (quick mode: ms is null = compile+oracle only, untimed)
        kernels = [{"kernel": k["kernel"], "ok": k["ok"]}
                   for k in gate["kernels"]]
    except Exception as e:  # never lose the headline number to the gate
        kernel_gate = f"ERROR:{type(e).__name__}:{e}"
        log(f"kernel gate errored: {e}")

    print(json.dumps({
        "metric": "train_edges_per_s",
        "value": round(eps_fanout, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps_fanout / eps_coo, 3),
        "step_ms": round(step_ms, 2),
        "roof_ms": (None if roof["total"] is None
                    else round(float(roof["total"]), 2)),
        "sol_frac": None if sol is None else round(float(sol), 3),
        # per-stage roof (ms) so a sol_frac regression is attributable
        # from the artifact alone (stage rates: tools/sol_model.py)
        "roof_stages_ms": {k: round(float(v), 2) for k, v in roof.items()
                           if k != "total"},
        "kernel_gate": kernel_gate,
        "kernels": kernels,
    }))


if __name__ == "__main__":
    main()
