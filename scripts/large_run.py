#!/usr/bin/env python
"""Reference-scale end-to-end run (VERDICT r3 next-step #2): laplace_3d(64),
n = 262,144 — the scale band of the reference's SuiteSparse set
(n = 36k-1.5M, scripts/dlMat.sh) — timed on the real chip with the
grouped-compile path built for exactly this size.

Writes a BENCH-style JSON artifact (GFLOP/s, residual, analyze_s,
compile_s, trisolve) to the path given as argv[1] (default LARGE_r04.json).

    python scripts/large_run.py [out.json] [grid]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_REF_SEC_PER_FLOP = 2.429e-10 / 2.0
_REF_THREADS = 4


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    out_path = sys.argv[1] if len(sys.argv) > 1 else "LARGE_r05.json"
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    a = generate.laplace_3d(grid)
    t0 = time.perf_counter()
    # n >= 5e5: the scatter-free gather tables cost ~1.2 GB HBM at n=1e6
    # (gidx+pidx, splan._build_gather_tables) for a measured ~5% step win
    # — at reference scale the memory goes to pools instead
    upd = "gather" if a.n < 5e5 else "scatter"
    solver = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                            tier="supernodal",
                                            update_delta=upd))
    analyze_s = time.perf_counter() - t0
    print(json.dumps({"stage": "analyze", "s": round(analyze_s, 1),
                      "timings": solver.timings,
                      "segments": len(solver.plan.segments),
                      "gflop_true": round(solver.plan.flops / 1e9, 1),
                      "pool_mb": round(solver.plan.pool_elems() * 4 / 1e6),
                      }), flush=True)

    data = jax.device_put(solver.ap.data.astype(np.float32))
    jax.block_until_ready(data)
    t0 = time.perf_counter()
    group = 8      # conservative at this scale (compile-helper memory)
    aot = "/root/repo/.aot_cache"
    solver.lx = jax.block_until_ready(
        solver.executor.factorize_segmented(data, group=group,
                                            cache_dir=aot))
    compile_s = time.perf_counter() - t0
    print(json.dumps({"stage": "compile+first", "s": round(compile_s, 1)}),
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        lx = solver.executor.factorize_segmented(data, group=group,
                                                 cache_dir=aot)
        jax.block_until_ready(lx)
        times.append(time.perf_counter() - t0)
    median = sorted(times)[len(times) // 2]

    # trisolve on the factor, b = L*1 protocol
    nnzl = int(solver.cc.sum())
    if a.n < 5e5:
        lmat = solver.factor_csc().to_scipy()
        b = np.asarray(lmat @ np.ones(a.n), dtype=np.float32)
    else:
        # b = L*1 computed on DEVICE by masked pool-row sums: at n=1e6
        # nnz(L) = 614M — materializing L on the host (and its int64
        # extraction map on the chip) does not fit; the masked sum
        # excludes the Linv^T stored in the diag blocks' strict upper
        # triangles (ops/supernodal._finalize)
        import jax.numpy as jnp
        lay = solver.plan.layout
        part = lay.part
        w_all = np.diff(part.sptr)
        h_all = np.diff(lay.rptr)
        b_np = np.zeros(a.n + 1, dtype=np.float64)
        _sum_fns = {}

        def _chunk_sum(k, c):
            # masked row sums of k fat rows of a PACKED (R/8, 8c) pool;
            # chunked so no (R, c) view (4x lane-padded on TPU at c=32)
            # is ever materialized at full pool size
            if (k, c) not in _sum_fns:
                import jax as _jax

                def f(pool, r0, cnt):
                    v = _jax.lax.dynamic_slice(
                        pool, (r0, jnp.int32(0)),
                        (k, pool.shape[1])).reshape(k * 8, c)
                    m = jnp.arange(c, dtype=jnp.int32)[None, :] \
                        < cnt[:, None]
                    return jnp.sum(jnp.where(m, v, 0), axis=1)
                _sum_fns[(k, c)] = _jax.jit(f)
            return _sum_fns[(k, c)]

        for ci, c in enumerate(lay.classes):
            sel = np.nonzero(lay.cls == ci)[0]
            tot = int(h_all[sel].sum())
            owner = np.repeat(np.arange(len(sel)), h_all[sel])
            intra = (np.arange(tot)
                     - np.repeat(np.cumsum(h_all[sel]) - h_all[sel],
                                 h_all[sel]))
            pr = lay.rowoff[sel][owner] + intra
            nrows = int(solver.plan.nrows[ci])
            gr = np.full(nrows, a.n, dtype=np.int64)
            cnt = np.zeros(nrows, dtype=np.int32)
            gr[pr] = lay.rows[np.repeat(lay.rptr[sel], h_all[sel])
                              + intra]
            cnt[pr] = np.minimum(intra + 1, w_all[sel][owner])
            pool = solver.lx[ci]
            nfat = pool.shape[0]
            CHF = 1 << 16
            r = 0
            while r < nfat:
                k = min(CHF, nfat - r)
                rs = np.asarray(_chunk_sum(k, c)(
                    pool, r, jnp.asarray(cnt[r * 8:(r + k) * 8])))
                np.add.at(b_np, gr[r * 8:(r + k) * 8], rs)
                r += k
        b = b_np[:a.n].astype(np.float32)
    x = jax.block_until_ready(solver.executor.solve_loop(solver.lx, b, 3))
    stimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(solver.executor.solve_loop(solver.lx, b, 3))
        stimes.append((time.perf_counter() - t0) / 3)
    smedian = sorted(stimes)[len(stimes) // 2]

    if a.n < 5e5:
        residual = solver.factor_residual()
    else:
        # end-to-end SPD-solve gate in the solution domain: A x = A*1
        # exercises L, L^T and the A scatter without materializing L
        ba = np.zeros(a.n, dtype=np.float32)
        ad, ai, ap_ = solver.ap.data, solver.ap.indices, solver.ap.indptr
        ones = np.ones(a.n, dtype=np.float32)
        import scipy.sparse as sp
        amat = sp.csc_matrix((ad, ai, ap_), shape=(a.n, a.n))
        full = amat + sp.tril(amat, -1).T     # stored lower half
        ba = np.asarray(full @ ones, dtype=np.float32)
        xs = np.asarray(solver.executor.solve_spd(solver.lx, ba))
        residual = float(np.max(np.abs(xs - 1.0)))
    solve_err = float(np.max(np.abs(np.asarray(x) - 1.0)))
    flops = solver.plan.flops
    ref_time = flops * _REF_SEC_PER_FLOP / _REF_THREADS
    art = {
        "matrix": f"laplace_3d({grid})", "n": int(a.n),
        "metric": "supernodal_cholesky_factorize_gflops",
        "value": round(flops / median / 1e9, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(ref_time / median, 3),
        "factorize_s": [round(t, 3) for t in sorted(times)],
        "factor_residual": float(f"{residual:.3e}"),
        "trisolve_gnnz_per_s": round(nnzl / smedian / 1e9, 3),
        "trisolve_residual": float(f"{solve_err:.3e}"),
        "analyze_s": round(analyze_s, 1),
        "analyze_timings": solver.timings,
        "compile_s": round(compile_s, 1),
        "group": group,
    }
    print(json.dumps(art), flush=True)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    if not (residual < 1e-3 and solve_err < 1e-3):
        raise SystemExit("verification failed")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
