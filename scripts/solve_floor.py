#!/usr/bin/env python
"""Blocked-trisolve floor attribution at n=1e5 (VERDICT r4 #3).

Times the pair-granular forward solve with the scan truncated to
segment prefixes [0, k) — the cumulative per-segment cost split — and
(optionally) with the dense-top absorbing the thin root levels
(config.dense_top_cols), all on the factorized pools from the AOT-cached
bench programs.  Truncated solves produce wrong x (timing only); the
full solve is residual-gated.

    python scripts/solve_floor.py [--ks 12,20,27,34] [--top 8192]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def _mk(cfg_kw, a, aot):
    import jax
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    solver = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                            tier="supernodal", **cfg_kw))
    data = jax.device_put(solver.ap.data.astype(np.float32))
    solver.lx = jax.block_until_ready(
        solver.executor.factorize_segmented(data, group=16, cache_dir=aot))
    return solver


def _time_solve(solver, b, iters=5, rounds=3):
    import jax
    jax.block_until_ready(solver.executor.solve_loop(solver.lx, b, iters))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(
            solver.executor.solve_loop(solver.lx, b, iters))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=str, default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--grid", type=int, default=48)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    aot = "/root/repo/.aot_cache"
    from parsy_bench_tpu.core import generate

    a = generate.laplace_3d(args.grid)
    out = {"n": int(a.n)}
    solver = _mk({}, a, aot)
    lmat = solver.factor_csc().to_scipy()
    b = np.asarray(lmat @ np.ones(a.n), dtype=np.float32)
    full = _time_solve(solver, b)
    x = np.asarray(solver.executor.solve_lower(solver.lx, b))
    err = float(np.max(np.abs(x - 1.0)))
    out["full_s"] = round(full, 5)
    out["full_err"] = float(f"{err:.2e}")
    nseg = len(solver.plan.segments)
    if args.ks:
        pref = {}
        for k in [int(x) for x in args.ks.split(",")]:
            solver.plan.solve_nseg = min(k, nseg)
            # drop compiled fns so the truncated loop recompiles
            solver.executor.__dict__.pop("_solve_loop_fn", None)
            solver.executor.__dict__.pop("_solve_loop_aot", None)
            solver.executor._solve_loop_key = None
            pref[k] = round(_time_solve(solver, b), 5)
            print(json.dumps({"k": k, "s": pref[k]}), file=sys.stderr,
                  flush=True)
        solver.plan.solve_nseg = nseg
        out["prefix_s"] = pref
    if args.top:
        solver2 = _mk({"dense_top_cols": args.top}, a, aot)
        t2 = _time_solve(solver2, b)
        x2 = np.asarray(solver2.executor.solve_lower(solver2.lx, b))
        out["top_s"] = round(t2, 5)
        out["top_err"] = float(f"{np.max(np.abs(x2 - 1.0)):.2e}")
        out["top_t"] = (None if solver2.plan.top is None
                        else int(solver2.plan.top.t))
        out["top_nseg"] = solver2.plan.solve_nseg
    print(json.dumps(out))


if __name__ == "__main__":
    main()
