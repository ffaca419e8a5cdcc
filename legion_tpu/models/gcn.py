"""GCN over sampled blocks.

Mirrors the reference client — a DGL ``GraphConv`` stack with
``allow_zero_in_degree=True`` (``pytorch_extension/legion_gcn.py:68-96``):
symmetric 'both' normalization computed on the block,
``h' = D_dst^{-1/2} A (D_src^{-1/2} h) W + b``, with activation inside
every layer but the last, and dropout before every layer but the first.
Zero-in-degree dst rows produce 0 (no NaN), matching allow_zero_in_degree.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from legion_tpu.ops.segment import block_dst_degree, block_src_out_degree, fanout_gather_sum
from legion_tpu.sampling.block import Block


class GraphConvLayer(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, block: Block, h_src: jnp.ndarray) -> jnp.ndarray:
        dense = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                         name="dense")
        if block.identity_offset is not None:
            # Identity blocks: every appended src row carries at most one
            # edge, so the src 1/sqrt(out-deg) factor is exactly 1 and
            # 'both' norm reduces to sum / sqrt(in-deg) — one fused
            # kernel pass on TPU (mask + sum + rsqrt + bf16 cast).
            from legion_tpu.ops.identity_agg_pallas import (
                identity_masked_mean_pallas, supported)
            if (self.dtype == jnp.bfloat16
                    and supported(h_src, block.nbr_mask,
                                  block.identity_offset)):
                agg = identity_masked_mean_pallas(
                    h_src, block.nbr_mask, block.identity_offset,
                    out_dtype=jnp.bfloat16, norm="sqrt")
            else:
                dst_deg = block_dst_degree(block).astype(self.dtype)
                agg = fanout_gather_sum(h_src.astype(self.dtype), block)
                agg = agg * jax.lax.rsqrt(
                    jnp.maximum(dst_deg, 1.0))[:, None]
            agg = dense(agg)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_dim,), jnp.float32)
            return agg + bias.astype(self.dtype)
        src_deg = block_src_out_degree(block, h_src.shape[0]).astype(self.dtype)
        dst_deg = block_dst_degree(block).astype(self.dtype)
        h = h_src * (1.0 / jnp.sqrt(jnp.maximum(src_deg, 1.0)))[:, None]
        # The kernel (bias-free) commutes exactly with the masked sum and
        # the per-row dst scaling, so when it NARROWS and the block
        # gathers (non-identity layout), transform before aggregation to
        # shrink the random row gather + backward scatter (same move as
        # SAGEConv); bias is added after the norm either way.
        if self.out_dim < h_src.shape[-1]:
            from legion_tpu.ops.identity_agg_pallas import (
                gathered_masked_mean, gathered_mean_supported)
            h_t = dense(h)
            if (self.dtype == jnp.bfloat16
                    and gathered_mean_supported(h_t, block.nbr_mask)):
                # fused masked sum on the gathered rows (no (P, f, D)
                # re-tile; see models.sage)
                agg = gathered_masked_mean(h_t, block.nbr_pos,
                                           block.nbr_mask, norm="sum")
            else:
                agg = fanout_gather_sum(h_t, block)
        else:
            agg = dense(fanout_gather_sum(h, block))
        agg = agg * (1.0 / jnp.sqrt(jnp.maximum(dst_deg, 1.0)))[:, None]
        # Zero-degree rows: both guards above give factor 1 on a zero sum,
        # so the result is exactly 0 (DGL allow_zero_in_degree behavior).
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                          jnp.float32)
        return agg + bias.astype(self.dtype)


class GCN(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, blocks: Sequence[Block], x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        assert len(blocks) == self.num_layers
        # identity-layout first block: the fused kernel consumes raw f32
        # features; skip the whole-array cast (see models.sage).
        if blocks and blocks[0].identity_offset is not None:
            h = x
        else:
            h = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            dim = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            h = GraphConvLayer(dim, dtype=self.dtype, name=f"layer_{i}")(block, h)
            if i != self.num_layers - 1:
                h = nn.relu(h)
        return h
