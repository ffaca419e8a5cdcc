"""Pure-numpy oracles for model parity (SURVEY.md §4: per-layer
activation parity). These re-implement DGL SAGEConv('mean') /
GraphConv(norm='both') semantics on a decoded edge list, independently of
the JAX code paths under test."""

import numpy as np


def decode_block(batch, blk):
    """Return (edges list of (src_pos, dst_pos), num_src, num_dst)."""
    pos = np.asarray(blk.nbr_pos)
    mask = np.asarray(blk.nbr_mask)
    edges = [(int(pos[d, f]), d)
             for d in range(pos.shape[0]) for f in range(pos.shape[1])
             if mask[d, f]]
    return edges, int(blk.num_src), int(blk.num_dst)


def sage_conv_np(h_src, edges, dst_cap, w_self, b_self, w_neigh):
    agg = np.zeros((dst_cap, h_src.shape[1]), np.float32)
    cnt = np.zeros((dst_cap,), np.float32)
    for s, d in edges:
        agg[d] += h_src[s]
        cnt[d] += 1
    agg /= np.maximum(cnt, 1)[:, None]
    return h_src[:dst_cap] @ w_self + b_self + agg @ w_neigh


def gcn_conv_np(h_src, edges, src_cap, dst_cap, w, b):
    out_deg = np.zeros((src_cap,), np.float32)
    in_deg = np.zeros((dst_cap,), np.float32)
    for s, d in edges:
        out_deg[s] += 1
        in_deg[d] += 1
    h = h_src * (1.0 / np.sqrt(np.maximum(out_deg, 1)))[:, None]
    agg = np.zeros((dst_cap, h.shape[1]), np.float32)
    for s, d in edges:
        agg[d] += h[s]
    agg *= (1.0 / np.sqrt(np.maximum(in_deg, 1)))[:, None]
    return agg @ w + b
