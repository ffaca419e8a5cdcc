"""Pallas kernel tests. On CPU these run in interpreter mode (semantics
only); bench_kernels.py exercises them compiled on the real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _interpret(flag=True):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode() if flag else _null()


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.mark.parametrize("m,d", [(256, 100), (512, 32)])
def test_gather_rows_pallas_interpret(m, d):
    from legion_tpu.ops.gather_pallas import gather_rows_pallas
    rng = np.random.default_rng(0)
    table = rng.standard_normal((1000, d)).astype(np.float32)
    ids = rng.integers(-1, 1000, size=m).astype(np.int32)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = gather_rows_pallas(jnp.asarray(table), jnp.asarray(ids))
    want = table[np.clip(ids, 0, None)]
    want[ids < 0] = 0
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


@pytest.mark.parametrize("p,f,d", [(64, 10, 128), (32, 3, 100)])
def test_grouped_masked_sum(p, f, d):
    """Pallas grouped sum (interpret mode) vs numpy; plus VJP."""
    from legion_tpu.ops import spmm_pallas
    from legion_tpu.ops.spmm_pallas import grouped_masked_sum
    rng = np.random.default_rng(0)
    x2 = rng.standard_normal((p * f, d)).astype(np.float32)
    mask = rng.random((p, f)) > 0.3
    want = (x2.reshape(p, f, d) * mask[..., None]).sum(1)

    spmm_pallas.FORCE_PALLAS = True   # run the kernel (interpreted) off-TPU
    try:
        with _interpret():
            out = grouped_masked_sum(jnp.asarray(x2), jnp.asarray(mask), f)
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-5, atol=1e-5)

        # gradient: d/dx sum(out * w) = repeat(w) * mask
        w = rng.standard_normal((p, d)).astype(np.float32)
        def lossf(x):
            return jnp.sum(grouped_masked_sum(x, jnp.asarray(mask), f)
                           * jnp.asarray(w))
        with _interpret():
            g = jax.grad(lossf)(jnp.asarray(x2))
        want_g = np.repeat(w, f, axis=0) * mask.reshape(-1)[:, None]
        np.testing.assert_allclose(np.asarray(g), want_g,
                                   rtol=1e-5, atol=1e-5)
    finally:
        spmm_pallas.FORCE_PALLAS = False


def test_block_sddmm_matches_decode(small_graph=None):
    from legion_tpu.ops.segment import block_sddmm
    from legion_tpu.sampling.block import Block
    rng = np.random.default_rng(2)
    p, f, s, d = 6, 3, 12, 8
    pos = rng.integers(0, s, size=(p, f)).astype(np.int32)
    mask = rng.random((p, f)) > 0.3
    h_src = rng.standard_normal((s, d)).astype(np.float32)
    blk = Block(nbr_pos=jnp.asarray(pos), nbr_mask=jnp.asarray(mask),
                num_src=jnp.int32(s), num_dst=jnp.int32(p))
    out = np.asarray(block_sddmm(jnp.asarray(h_src[:p]),
                                 jnp.asarray(h_src), blk))
    for i in range(p):
        for j in range(f):
            want = h_src[i] @ h_src[pos[i, j]] if mask[i, j] else 0.0
            np.testing.assert_allclose(out[i, j], want, rtol=1e-5,
                                       atol=1e-6)


@pytest.mark.parametrize("p,f", [(300, 10), (512, 25)])
def test_select_lanes_pallas_interpret(p, f):
    """Pallas lane select (interpret mode) == take_along_axis, including
    the non-tile-multiple padding path."""
    from legion_tpu.ops.select_pallas import select_lanes_pallas
    rng = np.random.default_rng(3)
    win = rng.integers(0, 2_449_029, (p, 256), dtype=np.int32)
    off = rng.integers(0, 256, (p, f), dtype=np.int32)
    with _interpret():
        out = select_lanes_pallas(jnp.asarray(win), jnp.asarray(off))
    want = np.take_along_axis(win, off, axis=1)
    assert (np.asarray(out) == want).all()


def test_identity_masked_mean_pallas_interpret():
    """Fused identity-agg kernel (interpret mode) == fanout_gather_mean
    on an identity-layout block, including zero-in-degree rows."""
    from legion_tpu.ops.identity_agg_pallas import identity_masked_mean_pallas
    from legion_tpu.ops.segment import fanout_gather_mean
    from legion_tpu.sampling.block import Block
    rng = np.random.default_rng(4)
    p, f, d, off = 256, 5, 128, 192
    x = rng.standard_normal((off + p * f, d)).astype(np.float32)
    mask = rng.random((p, f)) > 0.4
    mask[7] = False                       # zero-in-degree dst row
    pos = (off + np.arange(p * f).reshape(p, f)).astype(np.int32)
    blk = Block(nbr_pos=jnp.asarray(pos), nbr_mask=jnp.asarray(mask),
                num_src=jnp.int32(off + p * f), num_dst=jnp.int32(p),
                identity_offset=off)
    with _interpret():
        out = identity_masked_mean_pallas(
            jnp.asarray(x), jnp.asarray(mask), off,
            out_dtype=jnp.float32, interpret=True)
    want = np.asarray(fanout_gather_mean(
        jnp.asarray(x).astype(jnp.bfloat16), blk)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                               atol=2e-2)
    assert np.all(np.asarray(out)[7] == 0.0)


def test_identity_agg_pallas_sqrt_norm():
    """norm='sqrt' (GCN 'both' on identity blocks) == sum / sqrt(in-deg)."""
    from legion_tpu.ops.identity_agg_pallas import identity_masked_mean_pallas
    rng = np.random.default_rng(5)
    p, f, d, off = 128, 3, 128, 128
    x = rng.standard_normal((off + p * f, d)).astype(np.float32)
    mask = rng.random((p, f)) > 0.3
    mask[3] = False
    with _interpret():
        out = identity_masked_mean_pallas(
            jnp.asarray(x), jnp.asarray(mask), off,
            out_dtype=jnp.float32, norm="sqrt", interpret=True)
    rows = x[off:].reshape(p, f, d) * mask[:, :, None]
    want = rows.sum(1) / np.sqrt(np.maximum(mask.sum(1), 1))[:, None]
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(out)[3] == 0.0)


def test_gathered_masked_mean_and_vjp():
    """gathered_masked_mean == take+reshape+mask+mean, value AND grad
    (the custom VJP routes d_rows through a broadcast-repeat and the
    gather's own scatter-add transpose)."""
    from legion_tpu.ops.identity_agg_pallas import gathered_masked_mean
    from legion_tpu.ops.segment import fanout_gather_mean
    from legion_tpu.sampling.block import Block
    rng = np.random.default_rng(6)
    p, f, s, d = 128, 7, 300, 100     # d not lane-aligned on purpose
    h = rng.standard_normal((s, d)).astype(np.float32)
    mask = rng.random((p, f)) > 0.4
    mask[5] = False                   # zero-in-degree dst
    pos = rng.integers(0, s, (p, f)).astype(np.int32)
    pos = np.where(mask, pos, 0)
    blk = Block(nbr_pos=jnp.asarray(pos), nbr_mask=jnp.asarray(mask),
                num_src=jnp.int32(s), num_dst=jnp.int32(p))

    def ref(hj):
        return fanout_gather_mean(hj, blk)

    def fused(hj):
        return gathered_masked_mean(hj, jnp.asarray(pos),
                                    jnp.asarray(mask), interpret=True)

    hj = jnp.asarray(h)
    with _interpret():
        out = fused(hj)
    want = np.asarray(ref(hj))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(out)[5] == 0.0)

    w = jnp.asarray(rng.standard_normal((p, d)).astype(np.float32))
    with _interpret():
        g_fused = jax.grad(lambda x: jnp.sum(fused(x) * w))(hj)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) * w))(hj)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_pick_tile_adaptive_default():
    """The kernel upgrades to the fast tile only when the row count
    divides and the DMA ring fits VMEM (r5 in-step A/B: 128 beats the
    standalone-tuned 64 on the identity path)."""
    from legion_tpu.ops.identity_agg_pallas import (_SCRATCH_VMEM_LIMIT,
                                                    _TILE_P_FAST, TILE_P,
                                                    _pick_tile)
    # bench identity path: P = 122240 (128-divisible), f=10, D=128 f32
    assert _pick_tile(122240, 10, 128, 4, 3) == _TILE_P_FAST
    # layer-2 gathered path: P = batch 8000 -> not 128-divisible
    assert _pick_tile(8000, 10, 128, 4, 3) == TILE_P
    # VMEM overflow at the fast tile falls back to the floor
    wide = _SCRATCH_VMEM_LIMIT // (3 * _TILE_P_FAST * 10 * 4) + 128
    assert _pick_tile(122240, 10, wide, 4, 3) == TILE_P
