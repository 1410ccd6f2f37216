"""Large-problem end-to-end test (VERDICT r2 next-step #3): inspector
time, compile time, table/pool MB, factorize GFLOP/s, residual."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    # persistent compilation cache: the headline bench reuses these exact
    # programs, so a scale_test run pre-warms the driver's bench compile
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    ordering = sys.argv[2] if len(sys.argv) > 2 else "nd"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg_kw = {}
    for arg in sys.argv[4:]:          # e.g. width_classes=128 alpha=1.6
        key, _, val = arg.partition("=")
        if key in ("width_classes", "chunk_classes", "q_classes",
                   "nrelax"):
            cfg_kw[key] = tuple(int(x) for x in val.split(","))
        elif key == "zrelax":
            cfg_kw[key] = tuple(float(x) for x in val.split(","))
        elif key == "alpha":
            cfg_kw["segment_alpha"] = float(val)
        elif key == "max_width":
            cfg_kw["max_supernode_width"] = int(val)

    t0 = time.perf_counter()
    a = generate.laplace_3d(k)
    t_gen = time.perf_counter() - t0
    print(f"gen laplace_3d({k}): n={a.n} nnz={a.nnz} {t_gen:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    solver = CholeskySolver(a, SolverConfig(
        ordering=ordering, dtype="float32", tier="supernodal", **cfg_kw))
    t_analyze = time.perf_counter() - t0
    plan = solver.plan
    print(json.dumps({
        "analyze_s": round(t_analyze, 1),
        "stage_timings": solver.timings,
        "nsuper": int(plan.layout.part.nsuper),
        "nlev": plan.nlev, "nseg": len(plan.segments),
        "flops_G": round(plan.flops / 1e9, 2),
        "gemm_padded_G": round(plan.gemm_flops / 1e9, 2),
        "table_MB": round(plan.table_bytes() / 1e6, 1),
        "pool_MB": round(plan.pool_elems() * 4 / 1e6, 1),
        "upd_buckets": sum(len(s.upd) for s in plan.segments),
        "fin_buckets": sum(len(s.fin) for s in plan.segments),
        "upd_lanes": int(sum(b.arow.shape[0] * s.nsteps * b.arow.shape[2]
                             for s in plan.segments for b in s.upd)),
    }), flush=True)

    segmented = any(a == "segmented=1" for a in sys.argv[4:])
    data = jax.device_put(solver.ap.data.astype(np.float32))
    jax.block_until_ready(data)
    t0 = time.perf_counter()
    if segmented:
        solver.lx = jax.block_until_ready(
            solver.executor.factorize_segmented(data))
    else:
        solver.lx = jax.block_until_ready(
            solver.executor.factorize_loop(data, iters))
    t_compile = time.perf_counter() - t0
    print(f"compile+first: {t_compile:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        if segmented:
            lx = solver.executor.factorize_segmented(data)
        else:
            lx = solver.executor.factorize_loop(data, iters)
        jax.block_until_ready(lx)
        times.append((time.perf_counter() - t0)
                     / (1 if segmented else iters))
    med = sorted(times)[1]
    res = solver.factor_residual()
    ref_s = plan.flops * 2.429e-10 / 2.0 / 4
    print(json.dumps({
        "factorize_s": round(med, 4),
        "gflops": round(plan.flops / med / 1e9, 1),
        "vs_baseline": round(ref_s / med, 3),
        "residual": float(res),
    }), flush=True)

    # blocked trisolve (BASELINE.md second headline metric)
    b = solver.ap.spd_rhs_for_ones()
    bp = np.asarray(b, dtype=np.float32)
    t0 = time.perf_counter()
    x = jax.block_until_ready(
        solver.executor.solve_loop(solver.lx, bp, iters))
    t_sc = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(
            solver.executor.solve_loop(solver.lx, bp, iters))
        times.append((time.perf_counter() - t0) / iters)
    smed = sorted(times)[1]
    nnzl = int(solver.cc.sum())
    print(json.dumps({
        "solve_compile_s": round(t_sc, 1),
        "trisolve_s": round(smed, 5),
        "trisolve_gnnz_per_s": round(nnzl / smed / 1e9, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
