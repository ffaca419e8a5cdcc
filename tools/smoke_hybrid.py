#!/usr/bin/env python
"""Host-topology (hybrid) placement smoke on the real chip.

Validates the uk2014/clueweb placement row (SURVEY.md §2 #7: topology
too big for HBM) end-to-end at products scale: host CSR + HBM hot
sub-CSR (cost-model topo budget), device sampling for hot frontier
nodes merged with C++ host sampling for cold ones, host features behind
the bf16 hotness cache.

Run:  python tools/smoke_hybrid.py [steps=8] [budget_gb=0.3]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
BATCH = 8000
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".bench_cache", "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from legion_tpu.config import (CacheConfig, Config, DatasetConfig,
                                   ModelConfig, SamplerConfig, TrainConfig)
    from legion_tpu.data.format import load_dataset
    from legion_tpu.train.hybrid_driver import run_hybrid_training

    data = load_dataset(os.path.join(ROOT, ".bench_cache",
                                     "synth_2449029_50"), mmap=False)
    data = dataclasses.replace(
        data, train_ids=np.asarray(data.train_ids)[: STEPS * BATCH],
        # keep the (batch-8000-shaped) eval pass short: the smoke's job
        # is ms/step + a Val Acc sanity figure, not full-set accuracy
        valid_ids=np.asarray(data.valid_ids)[:1024],
        test_ids=np.asarray(data.test_ids)[:1024])
    cfg = Config(
        dataset=DatasetConfig(num_classes=47, feature_placement="host",
                              topology_placement="host"),
        sampler=SamplerConfig(fanouts=(25, 10), batch_size=BATCH,
                              dedup_last=True),
        model=ModelConfig(arch="sage", hidden_dim=256, num_layers=2,
                          dropout=0.5, dtype="bfloat16"),
        train=TrainConfig(learning_rate=0.003, epochs=1),
        cache=CacheConfig(enabled=True,
                          budget_bytes=int(BUDGET * 2 ** 30),
                          presample_steps=4),
    )
    t0 = time.time()
    res = run_hybrid_training(cfg, data)
    h = res["history"][-1]
    print(f"hybrid smoke OK: total {time.time()-t0:.0f}s, "
          f"{STEPS} steps x {h['seconds']/STEPS*1e3:.0f} ms, "
          f"feat_hit {h['feat_hit_rate']:.3f}, "
          f"topo_hot {h['topo_hot_fraction']:.3f}, "
          f"host_topo_gb {h['host_topo_gb']:.3f}, loss {h['loss']:.3f}, "
          f"fetches/step {h['fetches']/max(h['steps'],1):.1f}, "
          f"Val Acc {h['valid']:.4f}, Test Acc {res['test_acc']:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
