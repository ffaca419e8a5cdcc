#!/usr/bin/env python
"""Capture + summarize a device profile of the fused train step.

The framework's op-level observability tool (SURVEY.md §5 "tracing":
replaces the reference's Intel-PCM counters + nsys-by-hand with JAX
profiler traces): runs the real jitted epoch scan at bench shapes,
captures an xplane trace, and prints per-HLO-op self-times so "where
does the step spend its time" is one command.

Run:  python tools/profile_hlo.py [batch=8000] [steps=20]
Requires the bench dataset/caps memos (run bench.py once first).
"""

import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CACHE = os.path.join(ROOT, ".bench_cache")


def capture(trace_dir):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from legion_tpu.config import (Config, DatasetConfig, ModelConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.data.format import load_dataset, pad_feature_dim
    from legion_tpu.models.sage import SAGE
    from legion_tpu.sampling.sampler import (DeviceGraph, gather_features,
                                             sample_batch)
    from legion_tpu.train.loop import make_step_fns
    from legion_tpu.train.train_state import create_train_state

    jax.config.update("jax_default_prng_impl", "rbg")
    data = load_dataset(os.path.join(CACHE, "synth_2449029_50"), mmap=False)
    capf = sorted(glob.glob(os.path.join(
        CACHE, f"caps_nd_2449029_50_{BATCH}_s*.json")))
    assert capf, "run bench.py once to create the caps memo"
    caps = tuple(json.load(open(capf[-1])))

    cfg = Config(dataset=DatasetConfig(num_classes=47),
                 sampler=SamplerConfig(fanouts=(25, 10), batch_size=BATCH),
                 model=ModelConfig(arch="sage", hidden_dim=256,
                                   num_layers=2, dropout=0.5,
                                   dtype="bfloat16"),
                 train=TrainConfig(learning_rate=0.003))
    model = SAGE(hidden_dim=256, out_dim=47, num_layers=2, dropout=0.5,
                 agg="fanout", dtype=jnp.bfloat16)
    graph = DeviceGraph.from_host(data.indptr, data.indices)
    feats = jnp.asarray(pad_feature_dim(np.asarray(data.features)))
    rng = np.random.default_rng(0)
    ids = np.asarray(data.train_ids)
    seeds = jnp.asarray(np.stack([rng.permutation(ids)[:BATCH]
                                  for _ in range(STEPS)]).astype(np.int32))
    labels = jnp.asarray(np.asarray(data.labels)[np.asarray(seeds)]
                         .astype(np.int32))
    key = jax.random.PRNGKey(0)
    b0 = jax.jit(functools.partial(sample_batch, dedup_last=False),
                 static_argnums=(5, 6))(
        key, graph, seeds[0], jnp.full((), BATCH, jnp.int32), labels[0],
        (25, 10), caps)
    x0 = jax.jit(gather_features)(feats, b0.frontier)
    params = model.init(key, tuple(reversed(b0.blocks)), x0,
                        deterministic=True)["params"]
    state = create_train_state(params, 0.003, 0)
    jepoch = jax.jit(make_step_fns(cfg, model, caps).epoch_scan)
    st, losses, _ = jepoch(state, graph, feats, seeds, labels)
    _ = float(losses[-1])                     # compile outside the trace
    with jax.profiler.trace(trace_dir):
        st, losses, _ = jepoch(state, graph, feats, seeds, labels)
        _ = float(losses[-1])


def summarize(trace_dir, top=25):
    from xprof.convert import raw_to_tool_data as r2t
    path = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))[-1]
    data, _ = r2t.xspace_to_tool_data([path], "hlo_stats", {})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    tab = obj[0] if isinstance(obj, list) else obj
    idx = {c["label"]: i for i, c in enumerate(tab["cols"])}

    def val(r, name):
        return r["c"][idx[name]]["v"]

    rows = tab["rows"]
    tkey = "Total self time (us)"
    total = sum(float(val(r, tkey)) for r in rows)
    print(f"device total: {total/1e3:.1f} ms over {STEPS} steps "
          f"= {total/STEPS/1e3:.2f} ms/step")
    rows.sort(key=lambda r: -float(val(r, tkey)))
    for r in rows[:top]:
        ms = float(val(r, tkey)) / STEPS / 1e3
        print(f"{ms:7.3f} ms/step | {str(val(r, 'HLO op name'))[:36]:36s} "
              f"| {str(val(r, 'HLO op text'))[:90]}")


def main():
    trace_dir = tempfile.mkdtemp(prefix="legion_tpu_xprof_")
    capture(trace_dir)
    print(f"trace: {trace_dir}")
    summarize(trace_dir)


if __name__ == "__main__":
    main()
