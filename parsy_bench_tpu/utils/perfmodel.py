"""Performance model: per-kernel speed-of-light accounting for the plan.

Reference: cholesky/performanceModel.h — flop macros (OPS_GEMM/TRSM/PPF
:19-21), machine-calibrated per-kernel time models (:26-88), per-supernode
cost ``computeCostperBlock`` (:151) and schedule communication analysis
``computeComCost`` (:194).  Here the "machine" is a TPU chip: each batched
kernel is modeled as max(flop time on the MXU, byte time on HBM) plus a
fixed launch overhead, and the schedule analysis reports per-segment
modeled time, arithmetic intensity, and the padding efficiency of the
inspector's bucketing — the quantities that tell you whether a slow
factorization is a scheduling problem (too many sequential steps), a
padding problem (wasted lanes), or physics (bandwidth-bound stream).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from parsy_bench_tpu.symbolic.splan import SupernodalPlan


@dataclasses.dataclass(frozen=True)
class ChipModel:
    """Throughput constants of one chip (defaults: TPU v5e)."""
    name: str = "tpu-v5e"
    mxu_flops: float = 197e12 / 2    # f32 MACs/s via MXU (bf16 rate halved)
    vpu_flops: float = 4e12          # elementwise f32
    hbm_bytes: float = 8.1e11        # HBM bandwidth bytes/s
    launch_s: float = 2e-6           # per-fused-kernel overhead
    step_s: float = 1e-5             # per scan-step sequential overhead


@dataclasses.dataclass
class KernelCost:
    label: str
    flops: float          # useful padded flops executed
    bytes: float          # HBM traffic (reads + writes)
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
    for si, seg in enumerate(plan.segments):
        T = seg.nsteps
        steps += T
        seg_t = chip.step_s * T
        for b in seg.upd:
            G, _, P = b.a_start.shape
            lanes = G * T * P
            fl = 2.0 * lanes * b.Mc * b.K * b.Q
            by = dtype_bytes * lanes * (b.Mc * b.K + b.Q * b.K
                                        + b.Mc * b.Q)
            t = max(fl / 2 / chip.mxu_flops, by / chip.hbm_bytes) \
                + chip.launch_s * T
            kernels.append(KernelCost(
                f"seg{si}:gemm{b.Mc}x{b.K}x{b.Q}", fl, by, lanes, t))
            padded_flops += fl
            seg_t += t
        if seg.V:
            # stream sort-gather + two-level prefix + window update
            v = T * seg.V * seg.perm.shape[0]
            by = dtype_bytes * v * 3 + 4 * v + dtype_bytes * T * seg.W * 3
            t = by / chip.hbm_bytes + chip.launch_s * 4 * T
            kernels.append(KernelCost(f"seg{si}:reduce", v, by, v, t))
            seg_t += t
        for b in seg.fin:
            _, P = b.base.shape
            lanes = T * P
            pot = lanes * b.Ws ** 3 / 3.0
            trs = lanes * b.H * b.Ws ** 2
            fl = pot + trs
            by = dtype_bytes * lanes * b.H * b.Ws * 2
            t = max(fl / 2 / chip.mxu_flops, by / chip.hbm_bytes) \
                + chip.launch_s * 2 * T
            kernels.append(KernelCost(
                f"seg{si}:panel{b.Ws}x{b.H}", fl, by, lanes, t))
            padded_flops += fl
            seg_t += t
        total += seg_t
    return PlanCostReport(kernels=kernels, true_flops=plan.flops,
                          padded_flops=padded_flops, model_s=total,
                          steps=steps)


def comm_cost(plan: SupernodalPlan, dtype_bytes: int = 4) -> dict:
    """Schedule communication analysis for the SPMD executor (reference:
    computeComCost, performanceModel.h:194 — intra/inter-partition
    contribution volumes and edge cuts become psum volumes here)."""
    G = plan.segments[0].perm.shape[0] if plan.segments else 1
    psum_bytes = sum(seg.nsteps * seg.W * dtype_bytes
                     for seg in plan.segments)
    stream = sum(seg.nsteps * seg.V * G for seg in plan.segments)
    return {
        "partitions": G,
        "psum_steps": sum(s.nsteps for s in plan.segments if s.V),
        "psum_bytes_per_factorize": psum_bytes,
        "contribution_stream_elems": stream,
    }
