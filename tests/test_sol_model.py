"""Pin the whole-step roof model's composition (tools/sol_model.py).

The roof is the falsifiability surface for the bench's ``sol_frac``
(VERDICT r4 #7): these tests pin the arithmetic so an accidental edit
(wrong cap index, dropped stage, unit slip) fails in CI rather than
silently inflating or deflating the published speed-of-light fraction.
The RATES themselves are measured on-chip and documented in the module;
CI only checks the composition built from them.
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.sol_model import (DESC_ROWS_PER_S, sol_fraction,  # noqa: E402
                             step_roof_ms)

BENCH_ARGS = dict(batch=8000, caps=(8000, 122240, 1344640),
                  fanouts=(25, 10), hidden=256, feat_dim=128,
                  num_classes=47)


def test_total_is_sum_of_stages():
    roof = step_roof_ms(**BENCH_ARGS)
    stages = [v for k, v in roof.items() if k != "total"]
    assert math.isclose(roof["total"], sum(stages), rel_tol=1e-9)
    assert all(v > 0 for v in stages)


def test_gather_stage_is_descriptor_bound_on_final_cap():
    # the dominant roof: caps[-1] identity-append rows at the measured
    # descriptor rate — the stage a cap change must move proportionally
    roof = step_roof_ms(**BENCH_ARGS)
    expect = BENCH_ARGS["caps"][-1] / DESC_ROWS_PER_S * 1e3
    assert math.isclose(roof["gather"], expect, rel_tol=1e-9)
    assert roof["gather"] == max(v for k, v in roof.items()
                                 if k != "total")


def test_roof_scales_with_caps():
    small = step_roof_ms(4000, (4000, 61120, 672320), (25, 10),
                         256, 128, 47)
    big = step_roof_ms(**BENCH_ARGS)
    assert small["total"] < big["total"]
    for k in ("sample", "dedup", "gather", "aggregate", "matmuls"):
        assert small[k] < big[k], k


def test_bf16_halves_only_the_mxu_stage():
    b = step_roof_ms(**BENCH_ARGS, bf16=True)
    f = step_roof_ms(**BENCH_ARGS, bf16=False)
    assert math.isclose(f["matmuls"], 2 * b["matmuls"], rel_tol=1e-9)
    for k in ("sample", "dedup", "gather", "bwd_scatter"):
        assert math.isclose(f[k], b[k], rel_tol=1e-9), k


def test_sol_fraction_definition():
    roof = step_roof_ms(**BENCH_ARGS)
    assert math.isclose(sol_fraction(2 * roof["total"], roof), 0.5,
                        rel_tol=1e-9)
    # the r5 measured point: 16.6 ms against this roof sits in (0.5, 1)
    # — if the composition drifts enough to leave that band, either the
    # model or this pin is stale and the discrepancy must be looked at
    assert 0.5 < sol_fraction(16.6, roof) < 1.0
