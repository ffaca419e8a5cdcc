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
