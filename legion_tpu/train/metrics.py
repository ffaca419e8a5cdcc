"""Step metrics + exact byte-movement accounting.

The reference measures PCIe transactions with Intel PCM hardware counters
(``src/Server.h:54-135``, root + msr required) and prints cache hit rate
every 500 iters (``src/GPUCache.cu:414-425``). On TPU we know exactly what
every stage moves, so bytes are *computed*, not sampled: framework-native
counters with zero overhead and no privileges.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List


@dataclasses.dataclass
class StepMetrics:
    loss: float = 0.0
    num_edges: int = 0          # valid sampled edges this step
    num_frontier: int = 0       # unique nodes gathered
    cache_hits: int = 0
    cache_lookups: int = 0
    feature_bytes: int = 0      # bytes of feature rows gathered
    host_bytes: int = 0         # bytes staged host->device


class MetricsLog:
    """Accumulates per-step metrics and derives rates."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()
        self.steps: List[StepMetrics] = []

    def add(self, m: StepMetrics) -> None:
        self.steps.append(m)

    def summary(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        edges = sum(s.num_edges for s in self.steps)
        lookups = sum(s.cache_lookups for s in self.steps)
        hits = sum(s.cache_hits for s in self.steps)
        return {
            "steps": len(self.steps),
            "seconds": dt,
            "edges_per_s": edges / dt,
            "loss": self.steps[-1].loss if self.steps else float("nan"),
            "cache_hit_rate": hits / lookups if lookups else float("nan"),
            "feature_gb": sum(s.feature_bytes for s in self.steps) / 2**30,
            "host_gb": sum(s.host_bytes for s in self.steps) / 2**30,
        }
