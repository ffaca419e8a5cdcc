"""Pallas TPU kernel: grouped masked row-sum — the SpMM of identity-layout
blocks.

With last-hop dedup elided (sampler.append_frontier), the outermost
GNN layer's aggregation is a sum over FIXED groups of `fanout`
consecutive src rows: out[g] = sum_j x[g*f + j] * mask[g*f + j]. XLA's
lowering of the equivalent reshape+reduce costs ~6.1ms at bench shapes
(142k dst x fanout 10 x 128 feat) because the (P, f, D) view pads the
f=10 sublane dim to 16 and relayouts; this kernel streams (G*f, D) tiles
through VMEM and reduces in-register: 3.3ms measured, vs a 1.3ms pure
HBM-bandwidth bound. (An MXU block-diagonal dot variant hits 2.45ms but
only at default bf16 precision — 1e-2 error; with Precision.HIGHEST it
is slower than this kernel, 3.95ms.)

The reference's counterpart is the DGL SpMM its client runs on sampled
blocks (``pytorch_extension/legion_graphsage.py:37-64``) — a
scatter-based aggregation; here the identity layout removes the
scatter/gather entirely.

IMPORTANT (measured): this kernel wins STANDALONE only. Inside the full
jitted train step, XLA fuses the reshape+reduce into the upstream
feature gather's consumer fusion, so the aggregation input never
materializes in HBM — a pallas_call at that point forces a
materialization boundary and the step regresses 41.0ms -> 45.4ms. The
production path (ops.segment.fanout_gather_sum) therefore uses the XLA
formulation; this kernel is kept for standalone aggregation jobs and as
the measured record of that trade-off.

Backward (only needed if h_src requires grad — never true for the last
hop whose input is the raw feature table): dx = repeat(dy, f) * mask,
expressed in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Preferred dst rows per grid step (largest divisor of P wins; VMEM use is
# G*f*D*4 bytes per buffer — 128*10*128*4 = 655KB at bench shapes).
_GROUP_CANDIDATES = (512, 384, 256, 128, 64, 32, 16, 8)


def _pick_group(p: int) -> int:
    for g in _GROUP_CANDIDATES:
        if p % g == 0:
            return g
    return 0


def _kernel(x_ref, m_ref, o_ref, *, g, f, d):
    v = x_ref[:] * m_ref[:]                    # (G*f, D) * (G*f, 1)
    o_ref[:] = jnp.sum(v.reshape(g, f, d), axis=1)


def _forward(x2: jnp.ndarray, mask_col: jnp.ndarray, f: int) -> jnp.ndarray:
    pf, d = x2.shape
    p = pf // f
    g = _pick_group(p)
    return pl.pallas_call(
        functools.partial(_kernel, g=g, f=f, d=d),
        grid=(p // g,),
        in_specs=[pl.BlockSpec((g * f, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g * f, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, d), x2.dtype),
    )(x2, mask_col)


# Tests set this True (under pltpu.force_tpu_interpret_mode) to exercise
# the kernel off-TPU; production leaves it False so CPU runs use XLA.
FORCE_PALLAS = False


def _use_pallas(p: int, d: int) -> bool:
    ok_shape = d % 128 == 0 and _pick_group(p) > 0
    if FORCE_PALLAS:
        return ok_shape
    return jax.default_backend() == "tpu" and ok_shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grouped_masked_sum(x2: jnp.ndarray, mask: jnp.ndarray,
                       f: int) -> jnp.ndarray:
    """out[g, :] = sum_{j<f} x2[g*f + j, :] * mask[g, j].

    x2: (P*f, D); mask: (P, f) bool/float. Pallas-accelerated on TPU for
    128-multiple D; XLA reshape+reduce elsewhere (identical numerics).
    """
    return _impl(x2, mask, f)


def _impl(x2, mask, f):
    pf, d = x2.shape
    p = pf // f
    mcol = mask.astype(x2.dtype).reshape(pf, 1)
    if _use_pallas(p, d):
        return _forward(x2, mcol, f)
    return jnp.sum((x2 * mcol).reshape(p, f, d), axis=1)


def _fwd(x2, mask, f):
    return _impl(x2, mask, f), mask


def _bwd(f, mask, dy):
    pf = mask.shape[0] * f
    dx = jnp.repeat(dy, f, axis=0) * mask.astype(dy.dtype).reshape(pf, 1)
    return dx, None


grouped_masked_sum.defvjp(_fwd, _bwd)
