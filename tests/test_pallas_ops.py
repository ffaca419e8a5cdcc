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
