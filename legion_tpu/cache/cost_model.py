"""Cache cost model: split one HBM budget between feature + topology
caches to maximize saved host<->device traffic.

Pure-numpy re-derivation of ``GPUCache::CostModel``
(``src/GPUCache.cu:661-767``), with the Intel-PCM PCIe counters replaced
by exact byte accounting (we know precisely what each miss moves):

* candidate orders = hotness-descending (CandidateSelection,
  ``:578-659``, thrust::sort_by_key);
* topology bytes per cached node = 8 + 4*degree (GetEdgeMem analog);
* sweep the budget split in ``granularity`` steps; saved traffic of a
  prefix = total traffic x (prefix hotness share); pick the split
  maximizing feature + topology savings (``:744-761``);
* capacities are per cache group and divided across its ``group_size``
  chips at fill time (Kg striping).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class CachePlanResult:
    feat_order: np.ndarray       # node ids, feature-hotness descending
    topo_order: np.ndarray       # node ids, topology-hotness descending
    feat_capacity: int           # nodes cached (whole cache group)
    topo_capacity: int
    alpha: float                 # fraction of budget given to topology
    saved_feat_bytes: float
    saved_topo_bytes: float


def solve_cost_model(node_hot: np.ndarray, edge_hot: np.ndarray,
                     degrees: np.ndarray, budget_bytes: int,
                     feat_row_bytes: int, group_size: int = 1,
                     granularity: float = 0.01,
                     feat_cacheable: bool = True,
                     topo_cacheable: bool = True) -> CachePlanResult:
    """``feat_cacheable`` / ``topo_cacheable`` encode PLACEMENT: a cache
    only saves host<->device bytes for data that would otherwise cross
    the host boundary. When topology is already HBM-resident
    (``topology_placement == "hbm"``) a topo cache saves nothing, so it
    must get zero budget (alpha = 0) no matter how hot the edges are —
    the reference never faces this because its topo cache always fronts
    real PCIe reads (``src/GPUCache.cu:661-767`` maximizes *realized*
    PCIe savings). Symmetric for HBM-resident features."""
    node_hot = np.asarray(node_hot, np.int64)
    edge_hot = np.asarray(edge_hot, np.int64)
    n = node_hot.shape[0]
    total = int(budget_bytes) * group_size

    # hotness-descending candidate orders (stable so ties are by id)
    feat_order = np.argsort(-node_hot, kind="stable").astype(np.int32)
    topo_order = np.argsort(-edge_hot, kind="stable").astype(np.int32)

    # total moved bytes if nothing were cached
    feat_hot_sorted = node_hot[feat_order].astype(np.float64)
    total_feat_bytes = float(feat_hot_sorted.sum()) * feat_row_bytes
    topo_hot_sorted = edge_hot[topo_order].astype(np.float64)
    row_bytes = (8.0 + 4.0 * np.asarray(degrees, np.float64))
    total_topo_bytes = float((edge_hot * row_bytes).sum())

    feat_prefix = np.concatenate([[0.0], np.cumsum(feat_hot_sorted)])
    topo_prefix = np.concatenate([[0.0], np.cumsum(topo_hot_sorted)])
    topo_mem_prefix = np.concatenate(
        [[0.0], np.cumsum(row_bytes[topo_order])])

    feat_total_hot = max(feat_prefix[-1], 1.0)
    topo_total_hot = max(topo_prefix[-1], 1.0)

    steps = max(int(round(1.0 / granularity)), 1)
    # Placement-restricted sweep: uncacheable sides save zero bytes AND
    # take zero budget (a single pinned alpha, not just zeroed savings —
    # otherwise ties could still strand budget on the dead side).
    if not feat_cacheable and not topo_cacheable:
        # both sides HBM-resident: nothing to cache, zero budget to both
        # (the single-side branches below would otherwise hand the full
        # budget to the feature side and report phantom savings)
        return CachePlanResult(
            feat_order=feat_order, topo_order=topo_order,
            feat_capacity=0, topo_capacity=0, alpha=0.0,
            saved_feat_bytes=0.0, saved_topo_bytes=0.0)
    if not topo_cacheable:
        total_topo_bytes = 0.0
        alphas = [0]
    elif not feat_cacheable:
        total_feat_bytes = 0.0
        alphas = [steps]
    else:
        alphas = range(steps + 1)
    best = (-1.0, 0, 0, 0.0, 0.0, 0.0)
    for s in alphas:
        alpha = s / steps
        topo_mem = alpha * total
        feat_mem = total - topo_mem
        n_topo = int(np.searchsorted(topo_mem_prefix, topo_mem,
                                     side="right")) - 1
        n_topo = min(max(n_topo, 0), n)
        n_feat = min(int(feat_mem // max(feat_row_bytes, 1)), n)
        saved_t = total_topo_bytes * (topo_prefix[n_topo] / topo_total_hot)
        saved_f = total_feat_bytes * (feat_prefix[n_feat] / feat_total_hot)
        if saved_t + saved_f > best[0]:
            best = (saved_t + saved_f, n_feat, n_topo, alpha, saved_f, saved_t)

    _, n_feat, n_topo, alpha, saved_f, saved_t = best
    return CachePlanResult(
        feat_order=feat_order, topo_order=topo_order,
        feat_capacity=n_feat, topo_capacity=n_topo, alpha=alpha,
        saved_feat_bytes=saved_f, saved_topo_bytes=saved_t)
