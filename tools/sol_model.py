"""Whole-step speed-of-light roof model (VERDICT r4 next #7).

BASELINE.md's first target says ">=90% of speed-of-light" but until r5
only the feature gather had a measured roof. This module composes a
PER-STAGE roof for the entire bench train step from four device-level
rates, each measured independently on this chip (not fitted to the step
time, so the model can disagree with reality):

* ``DESC_ROWS_PER_S`` — random-row descriptor-issue rate. Measured
  226 Mrows/s in-step for the 512B feature gather (xprof hlo_stats,
  docs/ARCHITECTURE.md r4 step-floor study; the standalone marginal-rate
  measurement in tools/bench_gather.py agrees at ~220M). TPU random row
  gathers are descriptor-bound, not byte-bound, for rows <= 512B.
* ``SCATTER_ROWS_PER_S`` — scatter-add update-row rate. Measured
  70 Mrows/s in-step (200k update rows in 2.83 ms, r4 xprof;
  tools/bench_scatter_bwd.py shows every reformulation — sorted,
  presorted, cumsum, bf16 — loses or breaks even, so this is treated
  as the device's scatter floor; TPU scatter costs per update row
  whether or not it is dropped).
* ``SORT_KEYS_PER_S`` — XLA sort throughput, marginal rate (t(2N)-t(N))
  1.0 Gkeys/s at 2^18-key scale (tools/bench_dedup.py; hand-rolled
  bitonic networks lose ~2x, docs/ARCHITECTURE.md negative results).
* ``HBM_GBPS`` / ``MXU_BF16_TFLOPS`` — v5e chip specs (819 GB/s, 197
  TFLOP/s bf16); elementwise stages are modeled as HBM passes, matmuls
  as MXU time.

``step_roof_ms`` returns the per-stage roof times for the bench step's
shapes; bench.py reports measured/roof as ``sol_frac``. The composition
is documented in docs/ARCHITECTURE.md ("Whole-step roof model").
"""

from __future__ import annotations

from typing import Dict

DESC_ROWS_PER_S = 226e6      # measured, in-step gather (r4 xprof)
SCATTER_ROWS_PER_S = 70e6    # measured, in-step d_h scatter (r4 xprof)
SORT_KEYS_PER_S = 1.0e9      # measured marginal rate, bench_dedup
HBM_GBPS = 819.0             # v5e spec
MXU_BF16_TFLOPS = 197.0      # v5e spec


def step_roof_ms(batch: int, caps, fanouts, hidden: int, feat_dim: int,
                 num_classes: int, bf16: bool = True) -> Dict[str, float]:
    """Per-stage roof (ms) for one fused train step at the bench
    configuration (2-layer SAGE, lined topology layout, last-hop
    identity append, transform-first layer ordering).

    caps: realized frontier caps (caps[0]=batch, caps[k]=hop-k frontier,
    caps[-1]=identity-append extent = caps[-2]*(1+fanouts[-1])).
    """
    caps = list(caps)
    f1, f2 = fanouts[0], fanouts[1]
    m_final = caps[-1]                    # gathered feature rows
    m_hop1 = caps[1]                      # deduped hop-1 frontier

    # 1. neighbor draws: lined layout issues ONE 512B line descriptor
    #    per sampled node (hop1 from the seed batch, hop2 from the hop-1
    #    frontier); the lane select fuses into the window consumer.
    sample_rows = batch + m_hop1
    t_sample = sample_rows / DESC_ROWS_PER_S

    # 2. hop-1 dedup/renumber: sort-based (2 KV sorts over the drawn
    #    ids + 2 over the compacted frontier; the last hop is
    #    identity-appended and never sorts).
    sort_keys = 2 * batch * (1 + f1) + 2 * m_hop1
    t_dedup = sort_keys / SORT_KEYS_PER_S

    # 3. feature gather: descriptor-bound random rows (512B).
    t_gather = m_final / DESC_ROWS_PER_S

    # 4. identity aggregation (fused Pallas kernel): one HBM read pass
    #    over the gathered rows + the write of the (m_hop1, D) means.
    row_bytes = max(feat_dim, 128) * 4
    agg_bytes = m_final * row_bytes + m_hop1 * row_bytes
    t_agg = agg_bytes / (HBM_GBPS * 1e9)

    # 5. model matmuls on the MXU. The layer-1 transforms consume the
    #    GATHERED FEATURES, which need no input gradient — their
    #    backward is dW only (1 extra matmul, not 2), so those flops
    #    count 2x fwd; deeper layers count the usual 3x. (r5 xprof
    #    cross-check: convolution-fusion category measures 1.11 ms/step
    #    at bench shapes vs 1.26 modeled — a naive 3x-everything model
    #    claimed 1.71 and sat ABOVE the measurement, i.e. not a roof.)
    l1 = 2 * (m_final * feat_dim * hidden                 # l1 transform
              + m_hop1 * feat_dim * hidden)               # l1 self
    rest = 2 * (m_hop1 * hidden * hidden                  # l2 transform
                + batch * hidden * num_classes)           # head
    rate = MXU_BF16_TFLOPS if bf16 else MXU_BF16_TFLOPS / 2
    t_mxu = (2 * l1 + 3 * rest) / (rate * 1e12)

    # 6. backward scatter-add: the transpose of the BLOCK-1 aggregation
    #    gather — batch x f1 update rows into the hop-1 frontier (the
    #    identity-append layer's backward is a row-repeat BROADCAST, no
    #    scatter — that is why ops/identity_agg_pallas.py exists; the
    #    XLA-internal key sort is counted in the measured rate).
    t_scatter = batch * f1 / SCATTER_ROWS_PER_S

    # 7. optimizer + dropout + losses: HBM passes over activations
    #    (dropout mask + apply on the two hidden activation sets) and
    #    params (Adam reads/writes ~4x param bytes; negligible here).
    act_bytes = 3 * m_hop1 * hidden * (2 if bf16 else 4)
    t_vpu = act_bytes / (HBM_GBPS * 1e9)

    out = {
        "sample": t_sample * 1e3,
        "dedup": t_dedup * 1e3,
        "gather": t_gather * 1e3,
        "aggregate": t_agg * 1e3,
        "matmuls": t_mxu * 1e3,
        "bwd_scatter": t_scatter * 1e3,
        "elementwise": t_vpu * 1e3,
    }
    out["total"] = sum(out.values())
    return out


def sol_fraction(measured_step_ms: float, roof: Dict[str, float]) -> float:
    """Aggregate step %SoL: roof-time / measured-time (1.0 = the step
    runs at the composed roof; >1 means the roof model is stale)."""
    return roof["total"] / measured_step_ms


if __name__ == "__main__":
    # bench-shape preview (caps from the r4 probe memo)
    roof = step_roof_ms(8000, (8000, 122240, 1344640), (25, 10),
                        256, 128, 47)
    for k, v in roof.items():
        print(f"{k:>12}: {v:6.2f} ms")
    print(f"measured 16.6 ms -> sol_frac "
          f"{sol_fraction(16.6, roof):.2f}")
