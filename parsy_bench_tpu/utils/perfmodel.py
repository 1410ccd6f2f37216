"""Performance model: per-kernel speed-of-light accounting for the plan.

Reference: cholesky/performanceModel.h — flop macros (OPS_GEMM/TRSM/PPF
:19-21), machine-calibrated per-kernel time models (:26-88), per-supernode
cost ``computeCostperBlock`` (:151) and schedule communication analysis
``computeComCost`` (:194).  Here the "machine" is one TPU chip driven
through XLA, calibrated round 3 from scripts/microbench6.py +
scripts/diag_r3.py with the host-dispatch floor subtracted.  The three
governing floors (none of which is raw HBM bandwidth):

* **row movement** — index-driven gathers/scatters move whole rows at a
  roughly width-independent ROW rate (small per-row DMAs), so cost scales
  with rows moved, not bytes;
* **per-lane batched-matmul latency** — XLA serializes batched small
  einsums over the batch axis (~0.1 us per lane floor);
* **sequential-op latency** — dependent tiny kernels (the rank-1
  Cholesky chain) cost ~5-8 us each regardless of size.

The report tells you whether a slow factorization is a scheduling
problem (steps/chains), a batching problem (lanes), or a data-movement
problem (rows), which is what the ladder/segmentation knobs tune.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from parsy_bench_tpu.symbolic.splan import SupernodalPlan


@dataclasses.dataclass(frozen=True)
class ChipModel:
    """Measured throughputs/floors of one chip behind XLA (v5e-class chip
    via the axon tunnel; scripts/microbench6.py, dispatch-corrected)."""
    name: str = "tpu-v5e-xla-r3"
    mxu_flops: float = 5e12          # sustained batched-einsum flops/s
    gather_rows: float = 60e6        # index-driven row gathers, rows/s
    scatter_rows: float = 38e6       # row scatter-add, rows/s
    stream_bytes: float = 1.4e11     # window slice+update bytes/s
    lane_s: float = 1.1e-7           # per-einsum-lane serialization floor
    chain_op_s: float = 5e-6         # per dependent tiny kernel (rank-1)
    step_s: float = 8e-6             # per scan-step sequential overhead


@dataclasses.dataclass
class KernelCost:
    label: str
    flops: float          # padded flops executed
    rows: float           # gather/scatter rows moved
    count: float          # batch lanes x steps
    model_s: float        # modeled time


@dataclasses.dataclass
class PlanCostReport:
    kernels: list[KernelCost]
    true_flops: float
    padded_flops: float
    model_s: float
    steps: int

    @property
    def padding_efficiency(self) -> float:
        return self.true_flops / max(self.padded_flops, 1.0)

    @property
    def speed_of_light_gflops(self) -> float:
        """GFLOP/s the model says this plan can reach on the chip."""
        return self.true_flops / self.model_s / 1e9

    def summary(self) -> dict:
        return {
            "model_s": round(self.model_s, 6),
            "true_gflop": round(self.true_flops / 1e9, 4),
            "padded_gflop": round(self.padded_flops / 1e9, 4),
            "padding_efficiency": round(self.padding_efficiency, 4),
            "speed_of_light_gflops": round(self.speed_of_light_gflops, 3),
            "sequential_steps": self.steps,
        }


def factorize_cost(plan: SupernodalPlan, chip: ChipModel | None = None,
                   dtype_bytes: int = 4) -> PlanCostReport:
    """Model the supernodal factorization time on one chip."""
    chip = chip or ChipModel()
    kernels: list[KernelCost] = []
    padded_flops = 0.0
    steps = 0
    total = 0.0
    classes = plan.classes
    for si, seg in enumerate(plan.segments):
        T = seg.nsteps
        steps += T
        seg_t = chip.step_s * T
        # window slice in/out per class
        wbytes = 2.0 * dtype_bytes * T * sum(
            seg.wslice[ci] * c for ci, c in enumerate(classes))
        seg_t += wbytes / chip.stream_bytes
        for b in seg.upd:
            G, _, P = b.arow.shape
            lanes = G * T * P
            fl = 2.0 * lanes * b.Mc * b.Q * (b.K + b.c)
            grows = lanes * (b.Mc + b.Q)          # A chunk + B overlap rows
            srows = lanes * b.Mc                  # C rows into the delta
            t = (lanes * chip.lane_s * 2          # two einsums per bucket
                 + fl / chip.mxu_flops
                 + grows / chip.gather_rows
                 + srows / chip.scatter_rows)
            kernels.append(KernelCost(
                f"seg{si}:upd{b.Mc}x{b.K}q{b.Q}->{b.c}",
                fl, grows + srows, lanes, t))
            padded_flops += fl
            seg_t += t
        for b in seg.fin:
            lanes = T * b.P
            chol = lanes * b.c ** 3 / 3.0 * 4.0   # blocked chol+inverse
            trsm = 2.0 * lanes * b.H * b.c ** 2
            fl = chol + trsm
            # dependent-kernel chain: ~2.5 ops per rank-1 column step plus
            # per-panel inverse/TRSM plumbing, paid once per scan step
            chain = T * (2.5 * b.c + 40) * chip.chain_op_s
            by = dtype_bytes * lanes * b.H * b.c * 2
            # 32-wide intermediates are lane-padded 4x on the VPU tiles
            pad = 4.0 if b.c < 128 else 1.0
            t = (chain + fl / chip.mxu_flops
                 + pad * by / chip.stream_bytes
                 + lanes * chip.lane_s)
            kernels.append(KernelCost(
                f"seg{si}:fin{b.c}x{b.H}", fl, 0, lanes, t))
            padded_flops += fl
            seg_t += t
        total += seg_t
    return PlanCostReport(kernels=kernels, true_flops=plan.flops,
                          padded_flops=padded_flops, model_s=total,
                          steps=steps)


def comm_cost(plan: SupernodalPlan, dtype_bytes: int = 4) -> dict:
    """Schedule communication analysis for the SPMD executor (reference:
    computeComCost, performanceModel.h:194 — intra/inter-partition
    contribution volumes and edge cuts become psum volumes here).  The
    psum payload is the per-level delta window, contiguous on ICI."""
    G = plan.nshards
    psum_bytes = sum(seg.nsteps * dtype_bytes * sum(
        (seg.wslice[ci] + 1) * c for ci, c in enumerate(plan.classes))
        for seg in plan.segments if seg.upd)
    lanes = sum(b.arow.shape[0] * seg.nsteps * b.arow.shape[2]
                for seg in plan.segments for b in seg.upd)
    return {
        "partitions": G,
        "psum_steps": sum(s.nsteps for s in plan.segments if s.upd),
        "psum_bytes_per_factorize": int(psum_bytes),
        "update_lanes": int(lanes),
    }
