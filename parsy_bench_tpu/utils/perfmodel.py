"""Performance model: per-kernel speed-of-light accounting for the plan.

Reference: cholesky/performanceModel.h — flop macros (OPS_GEMM/TRSM/PPF
:19-21), machine-calibrated per-kernel time models (:26-88), per-supernode
cost ``computeCostperBlock`` (:151) and schedule communication analysis
``computeComCost`` (:194).  Here the "machine" is one TPU chip, calibrated
from scripts/microbench2.py measurements (not datasheet numbers): row
gathers and row scatters have their own element rates far below HBM
bandwidth, contiguous window slices run at stream rate, and batched
matmuls at the MXU rate.  The report tells you whether a slow
factorization is a scheduling problem (steps), a padding problem (wasted
lanes), or physics (gather-bound).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from parsy_bench_tpu.symbolic.splan import SupernodalPlan


@dataclasses.dataclass(frozen=True)
class ChipModel:
    """Measured throughputs of one chip (defaults: the v5e-class chip
    behind the axon tunnel, scripts/microbench2.py marginal rates)."""
    name: str = "tpu-v5e-measured"
    mxu_flops: float = 50e12         # sustained f32 batched-matmul flops/s
    gather_eps: float = 14.8e9       # row-gather elements/s (128-wide)
    scatter_eps: float = 10.9e9      # row-scatter-add elements/s
    stream_bytes: float = 6e11       # contiguous slice copy bytes/s
    launch_s: float = 2e-6           # per-fused-kernel overhead
    step_s: float = 1e-5             # per scan-step sequential overhead


@dataclasses.dataclass
class KernelCost:
    label: str
    flops: float          # padded flops executed
    elems: float          # gather/scatter elements moved
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
        seg_t += wbytes / chip.stream_bytes + chip.launch_s * 2 * T
        for b in seg.upd:
            G, _, P = b.arow.shape
            lanes = G * T * P
            fl = 2.0 * lanes * b.Mc * b.Q * (b.K + b.c)
            gat = lanes * (b.Mc + b.Q) * b.K
            sca = lanes * b.Mc * b.c
            t = (fl / chip.mxu_flops + gat / chip.gather_eps
                 + sca / chip.scatter_eps) + chip.launch_s * 3 * T
            kernels.append(KernelCost(
                f"seg{si}:upd{b.Mc}x{b.K}q{b.Q}->{b.c}",
                fl, gat + sca, lanes, t))
            padded_flops += fl
            seg_t += t
        for b in seg.fin:
            lanes = T * b.P
            chol = lanes * b.c ** 3 / 3.0 * 4.0   # blocked chol+inverse
            trsm = 2.0 * lanes * b.H * b.c ** 2
            fl = chol + trsm
            by = dtype_bytes * lanes * b.H * b.c * 2
            t = (fl / chip.mxu_flops + by / chip.stream_bytes
                 + chip.launch_s * 4 * T)
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
