"""K-way graph partitioning for multi-host training.

The reference delegates partitioning to XtraPulp over MPI offline
(``prepare_dataset.sh:44``) and falls back to ``id % K`` when no
partition file exists (``src/GPUGraphStore.cu:334-343``). Here both
modes are built in:

* ``hash``  — id % K (the fallback; zero cost, poor locality);
* ``greedy``— linear-time label-propagation-flavored greedy: nodes are
  visited in degree-descending order and assigned to the partition
  holding most of their already-assigned neighbors, subject to a
  balance cap. One pass over the edges, no MPI, good-enough edge
  locality for the halo-exchange path.
"""

from __future__ import annotations

import numpy as np

from legion_tpu.data.format import GraphData


def partition_graph(g: GraphData, k: int, mode: str = "greedy",
                    balance_slack: float = 1.05) -> np.ndarray:
    if k <= 1:
        return np.zeros(g.num_nodes, np.int32)
    if mode == "hash":
        return (np.arange(g.num_nodes) % k).astype(np.int32)
    if mode != "greedy":
        raise ValueError(f"unknown partition mode {mode!r}")

    n = g.num_nodes
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    part = np.full(n, -1, np.int32)
    sizes = np.zeros(k, np.int64)
    cap = int(n / k * balance_slack) + 1

    order = np.argsort(-np.diff(indptr), kind="stable")
    counts = np.zeros(k, np.int64)
    for v in order:
        s, e = indptr[v], indptr[v + 1]
        nbrs = indices[s:e]
        counts[:] = 0
        assigned = part[nbrs]
        ok = assigned >= 0
        if ok.any():
            np.add.at(counts, assigned[ok], 1)
        counts[sizes >= cap] = -1
        best = int(np.argmax(counts))
        if counts[best] <= 0:
            best = int(np.argmin(sizes))
        part[v] = best
        sizes[best] += 1
    return part


def edge_cut_fraction(g: GraphData, part: np.ndarray) -> float:
    """Fraction of edges crossing partitions (partition quality metric)."""
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    dst = np.repeat(np.arange(g.num_nodes), np.diff(indptr))
    cross = part[indices] != part[dst]
    return float(cross.mean()) if len(cross) else 0.0
