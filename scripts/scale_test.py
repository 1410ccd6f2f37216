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
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    ordering = sys.argv[2] if len(sys.argv) > 2 else "nd"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    t0 = time.perf_counter()
    a = generate.laplace_3d(k)
    t_gen = time.perf_counter() - t0
    print(f"gen laplace_3d({k}): n={a.n} nnz={a.nnz} {t_gen:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    solver = CholeskySolver(a, SolverConfig(
        ordering=ordering, dtype="float32", tier="supernodal"))
    t_analyze = time.perf_counter() - t0
    plan = solver.plan
    print(json.dumps({
        "analyze_s": round(t_analyze, 1),
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

    data = solver.ap.data.astype(np.float32)
    t0 = time.perf_counter()
    solver.lx = jax.block_until_ready(
        solver.executor.factorize_loop(data, iters))
    t_compile = time.perf_counter() - t0
    print(f"compile+first: {t_compile:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        lx = solver.executor.factorize_loop(data, iters)
        jax.block_until_ready(lx)
        times.append((time.perf_counter() - t0) / iters)
    med = sorted(times)[1]
    res = solver.factor_residual()
    ref_s = plan.flops * 2.429e-10 / 2.0 / 4
    print(json.dumps({
        "factorize_s": round(med, 4),
        "gflops": round(plan.flops / med / 1e9, 1),
        "vs_baseline": round(ref_s / med, 3),
        "residual": float(res),
    }), flush=True)


if __name__ == "__main__":
    main()
