"""GraphSAGE (mean aggregator) over sampled blocks.

Numerics mirror the reference client model — a DGL ``SAGEConv('mean')``
stack (``pytorch_extension/legion_graphsage.py:37-64``): per layer
``h' = W_self h_dst + W_neigh mean_{u in sampled N(dst)} h_u + b`` with
bias on the self path only (DGL convention), ReLU + dropout between
layers, none after the last.

Blocks arrive in model order (outermost hop first); the dst nodes of each
block are the first ``dst_cap`` rows of the src activations (prefix
invariant, see sampling.block).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from legion_tpu.ops.segment import fanout_gather_mean, segment_mean_coo
from legion_tpu.sampling.block import Block

# Aggregator registry: "fanout" is the TPU-native gather+reduce path;
# "coo_segment" is the scatter-based DGL-style SpMM kept as benchmark
# baseline and cross-check (same numerics).
AGGREGATORS = {"fanout": fanout_gather_mean, "coo_segment": segment_mean_coo}


class SAGEConv(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    agg: str = "fanout"

    @nn.compact
    def __call__(self, block: Block, h_src: jnp.ndarray) -> jnp.ndarray:
        h_dst = h_src[: block.dst_cap]
        fc_neigh = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                            name="fc_neigh")
        # fc_neigh has no bias and mean is linear, so it commutes with
        # aggregation exactly. When it NARROWS (out < in) and the block
        # gathers (non-identity layout), transforming src activations
        # first shrinks both the forward row gather and the backward
        # scatter-add by in/out (e.g. 256->47: ~5x less random-access
        # HBM traffic) for a few cheap extra MXU FLOPs. Identity-layout
        # blocks aggregate via a fused reshape (no gather), where
        # transform-first would only inflate the dense work.
        narrower = self.out_dim < jnp.shape(h_src)[-1]
        if self.agg == "fanout" and block.identity_offset is not None:
            from legion_tpu.ops.identity_agg_pallas import (
                identity_masked_mean_pallas, supported)
            if (self.dtype == jnp.bfloat16
                    and supported(h_src, block.nbr_mask,
                                  block.identity_offset)):
                # fused single-HBM-pass kernel (mask + grouped mean +
                # bf16 cast); XLA's formulation spends 4 passes
                agg = identity_masked_mean_pallas(
                    h_src, block.nbr_mask, block.identity_offset,
                    out_dtype=jnp.bfloat16)
            else:
                agg = AGGREGATORS[self.agg](h_src, block)
            h_neigh = fc_neigh(agg)
        elif (self.agg == "fanout" and block.identity_offset is None
                and narrower):
            from legion_tpu.ops.identity_agg_pallas import (
                gathered_mean_supported, gathered_masked_mean)
            h_t = fc_neigh(h_src)
            if (self.dtype == jnp.bfloat16
                    and gathered_mean_supported(h_t, block.nbr_mask)):
                # fused masked mean on the gathered rows: no (P, f, D)
                # re-tiling reshape fwd or bwd (the gather's scatter-add
                # transpose stays on XLA)
                h_neigh = gathered_masked_mean(h_t, block.nbr_pos,
                                               block.nbr_mask)
            else:
                h_neigh = AGGREGATORS[self.agg](h_t, block)
        else:
            h_neigh = fc_neigh(AGGREGATORS[self.agg](h_src, block))
        out = (nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype,
                        name="fc_self")(h_dst)
               + h_neigh)
        return out


class SAGE(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    agg: str = "fanout"

    @nn.compact
    def __call__(self, blocks: Sequence[Block], x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        assert len(blocks) == self.num_layers
        # With an identity-layout first block the fused aggregation
        # kernel consumes raw f32 features (casting only what it emits),
        # so skip the whole-array cast — it is a full extra HBM pass
        # over the largest tensor in the step. Dense layers cast their
        # own (much smaller) prefix inputs.
        if (self.agg == "fanout" and blocks
                and blocks[0].identity_offset is not None):
            h = x
        else:
            h = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            dim = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            h = SAGEConv(dim, dtype=self.dtype, agg=self.agg,
                         name=f"layer_{i}")(block, h)
            if i != self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
