#!/usr/bin/env python
"""Cholesky H1-vs-coarsened schedule comparison (VERDICT r2 next-step #7;
the reference's choleskyTest03 wavefront baseline vs choleskyTest LBC,
choleskyTest03.cpp:46 / InspectionLevel_06.h:18).

segment_alpha controls the LBC-replacement coarsening: alpha <= 1 gives
one scan segment per wavefront level (plain H1 — every level pays its own
program and no padding is shared), larger alpha coalesces levels into
padded multi-step segments.  Sweeps alpha, times the in-device factorize
loop, and appends JSONL rows to H1VSCOARSE_r03.jsonl.

    python scripts/h1_vs_coarse.py [grid] [ordering]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ALPHAS = (1.0, 1.25, 1.6, 2.5)
ITERS = 5


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ordering = sys.argv[2] if len(sys.argv) > 2 else "nd"
    a = generate.laplace_3d(grid)
    out = open("H1VSCOARSE_r03.jsonl", "a")
    for alpha in ALPHAS:
        t0 = time.perf_counter()
        s = CholeskySolver(a, SolverConfig(
            ordering=ordering, dtype="float32", tier="supernodal",
            segment_alpha=alpha))
        analyze_s = time.perf_counter() - t0
        data = s.ap.data.astype(np.float32)
        t0 = time.perf_counter()
        s.lx = jax.block_until_ready(
            s.executor.factorize_loop(data, ITERS))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(s.executor.factorize_loop(data, ITERS))
            ts.append((time.perf_counter() - t0) / ITERS)
        med = sorted(ts)[1]
        row = {
            "matrix": f"laplace_3d({grid})", "n": int(a.n),
            "ordering": ordering, "segment_alpha": alpha,
            "schedule": "wavefront-H1" if alpha <= 1.0 else "coarsened",
            "segments": len(s.plan.segments), "nlev": s.plan.nlev,
            "factorize_s": round(med, 4),
            "gflops": round(s.plan.flops / med / 1e9, 2),
            "compile_s": round(compile_s, 1),
            "analyze_s": round(analyze_s, 1),
            "table_MB": round(s.plan.table_bytes() / 1e6, 1),
            "residual": float(f"{s.factor_residual():.3e}"),
        }
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
