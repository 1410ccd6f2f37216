"""Headline benchmark: sparse Cholesky factorization + blocked triangular
solve throughput on one chip.

Protocol follows the reference (choleskyTest01.cpp:199-277 and
triangularTest02.cpp:195-260): timed numeric factorizations and solves
with the symbolic phase run once beforehand (analyze once / factor many
contract), median reported.  The matrix is a 48^3 3D Laplacian
(n = 110,592) — the reference's benchmark set is 17 SuiteSparse SPD
matrices of n = 36k-1.5M (scripts/dlMat.sh), so this sits at its lower
third; ordering is the framework's coordinate-free nested dissection (the
reference's default is METIS node-ND, LSparsity.h:534).

Baselines (the reference publishes no numbers, BASELINE.md):
* factorize ``vs_baseline``: the reference's machine-calibrated kernel
  time model (performanceModel.h:26-88, GEMM t = 2.429e-10 * ijk s) run
  at its 4-thread eval protocol (scripts/eval.sh) over the same true
  factorization flops, divided by our measured median time.
* trisolve ``trisolve_vs_baseline``: scipy's compiled sparse triangular
  solve (the strongest trsv actually present in this stack — the
  libExample/ MKL trsv role, triangular_MKL_Chol.cpp:225) measured on
  the same factor, divided by our median.  The reference's calibrated
  TRSV/GEMV model replayed over our supernode partition at 4 threads is
  also reported as ``trisolve_vs_ref_model``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...};
extra keys carry the trisolve metrics, the correctness gates, and the
min/median/max spread of the timed rounds (a result that varies
run-to-run through the tunnel must say so).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


# reference cost model: t_gemm = 2.429e-10 * ijk s for 2ijk flops
_REF_SEC_PER_FLOP = 2.429e-10 / 2.0
_REF_THREADS = 4  # scripts/eval.sh protocol
_ITERS = 5
_GRID = 48        # laplace_3d(48): n = 110,592


def _warm_scatter() -> None:
    """Compile one trivial scatter first: the TPU toolchain's first
    scatter-containing program pays a one-time kernel-library cost;
    warming it on a tiny program keeps the real compiles fast."""
    import jax
    import jax.numpy as jnp
    idx = jnp.arange(8)
    jax.block_until_ready(
        jax.jit(lambda v: v.at[idx].add(v[idx]))(jnp.ones(16)))


def _ref_trisolve_model_s(plan) -> float:
    """Reference calibrated blocked-trisolve time for our partition:
    per supernode one dense TRSV on the w-wide diag block plus one GEMV
    on the (h-w, w) off-diag block (performanceModel.h:26-88 PERF_TRSV /
    PERF_GEMV), at the 4-thread eval protocol."""
    lay = plan.layout
    w = np.diff(lay.part.sptr).astype(np.float64)
    h = np.diff(lay.rptr).astype(np.float64)
    hw = np.maximum(h - w, 0.0)
    trsv = 3.224536e-10 * w * w + 1.709178e-08 * w + 1.947268e-07
    gemv = (6.192657e-10 * hw * w - 2.884799e-09 * hw
            + 7.594831e-10 * w + 3.575035e-07)
    return float(np.sum(trsv + np.maximum(gemv, 0.0))) / _REF_THREADS


def _scipy_trsv_s(lmat, b, iters: int = 3) -> float:
    """Measured scipy compiled triangular solve on the same factor."""
    import scipy.sparse.linalg as spla
    lcsr = lmat.tocsr()
    spla.spsolve_triangular(lcsr, b, lower=True)  # warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        spla.spsolve_triangular(lcsr, b, lower=True)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main() -> None:
    import jax
    # Persistent compilation cache: the factorize/solve programs for the
    # benchmark shapes compile in ~15 min cold and O(10 s) cached; the
    # symbolic phase is analyze-once by contract and the compile is the
    # same artifact-cacheable preprocessing (SURVEY §5.4).
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # AOT executable cache (utils/aotcache.py): warm starts deserialize
    # the compiled PJRT executables directly, skipping Python tracing,
    # lowering AND compile-cache key hashing (the measured 50+ s of the
    # round-4 72 s "warm" compile).
    aot_dir = "/root/repo/.aot_cache"
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    _warm_scatter()
    a = generate.laplace_3d(_GRID)
    t0 = time.perf_counter()
    solver = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                            tier="supernodal"))
    analyze_s = time.perf_counter() - t0

    # device-resident A values: uploaded once (the tunnel moves ~6 MB/s,
    # so a per-iteration host upload would dominate the timed loop)
    data = jax.device_put(solver.ap.data.astype(np.float32))
    jax.block_until_ready(data)

    # Timed phase: _ITERS full factorizations per round, several rounds,
    # median per-iteration time; min/median/max reported so tunnel
    # dispatch jitter is visible.  Execution is grouped multi-segment
    # programs (factorize_segmented): the monolithic whole-factorization
    # program exceeds the remote compile helper's memory at this scale.
    # The reference's timed loop (choleskyTest01.cpp:199-277) is the same
    # analyze-once/factor-many protocol.
    t0 = time.perf_counter()
    group = 16
    try:
        solver.lx = jax.block_until_ready(
            solver.executor.factorize_segmented(data, group=group,
                                                cache_dir=aot_dir))
    except jax.errors.JaxRuntimeError as e:
        # the remote compile helper OOM/SIGKILLs on too-large programs;
        # anything else (shape bugs, NaN asserts) must fail the bench
        # loudly rather than be silently remeasured at a smaller group
        print(f"group=16 compile failed ({type(e).__name__}: "
              f"{str(e)[:300]}); falling back to group=8",
              file=sys.stderr)
        group = 8
        t0 = time.perf_counter()  # timer restarts: only the good compile
        solver.lx = jax.block_until_ready(
            solver.executor.factorize_segmented(data, group=group,
                                                cache_dir=aot_dir))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _i in range(_ITERS):
            lx = solver.executor.factorize_segmented(data, group=group,
                                                     cache_dir=aot_dir)
        jax.block_until_ready(lx)
        times.append((time.perf_counter() - t0) / _ITERS)
    median = sorted(times)[len(times) // 2]

    # blocked triangular solve (H2LeveledBlockedLsolve analog) with the
    # reference's constructed-solution protocol: b = L*1 so the exact
    # solution is x = 1 (rhsInitBlocked, common/Util.h:277)
    lmat = solver.factor_csc().to_scipy()
    b = np.asarray(lmat @ np.ones(a.n), dtype=np.float32)
    x_warm = jax.block_until_ready(
        solver.executor.solve_loop(solver.lx, b, _ITERS,
                                   cache_dir=aot_dir))
    stimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(
            solver.executor.solve_loop(solver.lx, b, _ITERS,
                                       cache_dir=aot_dir))
        stimes.append((time.perf_counter() - t0) / _ITERS)
    smedian = sorted(stimes)[len(stimes) // 2]
    nnzl = int(solver.cc.sum())   # nnz(L) without materializing the pattern
    scipy_trsv = _scipy_trsv_s(lmat, b)
    ref_model_trsv = _ref_trisolve_model_s(solver.plan)

    # correctness gates: a fast-but-wrong run must not score.
    # Factor: Frobenius residual vs reference bar 1e-3
    # (choleskyTest01.cpp:538-546).  Solve: with b = L*1 every solution
    # component must satisfy |1 - x_i| < 1e-3 (testTriangular,
    # common/Util.h:294-306).
    residual = solver.factor_residual()
    if not (residual < 1e-3):
        raise SystemExit(f"factor residual {residual:.3e} exceeds 1e-3 "
                         f"— benchmark invalid")
    solve_err = float(np.max(np.abs(np.asarray(x_warm) - 1.0)))
    if not (solve_err < 1e-3):
        raise SystemExit(f"trisolve error {solve_err:.3e} exceeds 1e-3 "
                         f"— benchmark invalid")

    flops = solver.plan.flops
    gflops = flops / median / 1e9
    ref_time = flops * _REF_SEC_PER_FLOP / _REF_THREADS
    print(json.dumps({
        "metric": "supernodal_cholesky_factorize_gflops",
        "value": round(gflops, 4),
        "unit": "GFLOP/s",
        "vs_baseline": round(ref_time / median, 4),
        "n": int(a.n),
        "factor_residual": float(f"{residual:.3e}"),
        "factorize_s_min_med_max": [round(min(times), 4), round(median, 4),
                                    round(max(times), 4)],
        "trisolve_gnnz_per_s": round(nnzl / smedian / 1e9, 4),
        "trisolve_vs_baseline": round(scipy_trsv / smedian, 4),
        "trisolve_vs_ref_model": round(ref_model_trsv / smedian, 4),
        "trisolve_residual": float(f"{solve_err:.3e}"),
        "analyze_s": round(analyze_s, 1),
        "compile_s": round(compile_s, 1),
        "group": group,
    }))


if __name__ == "__main__":
    main()
