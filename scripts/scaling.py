#!/usr/bin/env python
"""Multi-device scaling artifact (BASELINE.md multi-host bar; VERDICT r3
next-step #1).

Runs the OWNERSHIP-PARTITIONED distributed factorize + solve
(parallel/dist.py: per-device pools, boundary-only ragged psum) at
G in {1,2,4,8} on the virtual CPU mesh and reports wall times, the
per-device collective payload (boundary slots — the computeComCost
analog, performanceModel.h:194), per-device pool memory, and scaling
efficiency.

Caveats recorded in the artifact: virtual devices share ONE host with
`cores` physical cores, so wall-clock parallel speedup is capped at
min(G, cores) — efficiency_vs_g1 is reported raw AND normalized by that
ceiling; collectives are memcpy-speed.  The architecture metrics
(psum bytes/device, pool bytes/device) are measurement-independent.

    python scripts/scaling.py [grid] [out.json]
"""
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_single_g(g: int, grid: int) -> None:
    """Measure one G in a fresh process (XLA:CPU JIT code mappings from
    the compiled programs accumulate; one process per G stays under the
    kernel's max_map_count) and print the row JSON."""
    import jax
    # unconditional: the environment's sitecustomize imports jax on the
    # axon (TPU) platform at interpreter start, so the env var alone is
    # ignored — only the config override reaches the loaded jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.parallel.dist import DistExecutor
    from parsy_bench_tpu.symbolic.dplan import build_dist_plan

    cores = os.cpu_count() or 1
    a = generate.laplace_3d(grid)
    # scatter updates on EVERY row: the distributed executor always
    # scatters (its deltas ride collectives), and the scatter-free
    # gather path is a TPU win but ~5x SLOWER on this CPU host — mixing
    # paths would fake the G=1 baseline
    cfg = SolverConfig(ordering="nd", dtype="float32", tier="supernodal",
                       update_delta="scatter")
    s = CholeskySolver(a, cfg)
    data32 = s.ap.data.astype(np.float32)
    nnzl = int(s.cc.sum())
    if g == 1:
        ex = s.executor
        fact = lambda: ex.factorize_segmented(data32, group=8)
        psum_dev = 0.0
        solve_psum = {}
        pool_dev = s.plan.pool_elems() * 4
        cross = 0.0
        solve_fn = lambda pools, b: ex.solve_lower(pools, b)
    else:
        dplan = build_dist_plan(s.ap, s.parent, s.cc, g, cfg)
        mesh = Mesh(np.array(jax.devices()[:g]), ("p",))
        dex = DistExecutor(dplan, mesh, dtype=jnp.float32)
        fact = lambda: dex.factorize_segmented(data32, group=8)
        pm = dplan.psum_bytes_per_step()
        psum_dev = pm["factorize_bytes"]
        solve_psum = {k: pm[k] for k in
                      ("solve_lower_bytes", "solve_upper_bytes",
                       "solve_r4_design_bytes", "receive_min_bytes")}
        pool_dev = dplan.pool_elems_per_device() * 4
        cross = dplan.comm["row_fraction_cross"]
        solve_fn = lambda pools, b: dex.solve_lower(pools, b)
    t0 = time.perf_counter()
    pools = jax.block_until_ready(fact())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        pools = jax.block_until_ready(fact())
        ts.append(time.perf_counter() - t0)
    tf = sorted(ts)[1]
    bvec = np.asarray(s.ap.spd_rhs_for_ones(), dtype=np.float32)
    jax.block_until_ready(solve_fn(pools, bvec))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(solve_fn(pools, bvec))
        ts.append(time.perf_counter() - t0)
    tsolve = sorted(ts)[1]
    print("ROW " + json.dumps({
        "g": g, "n": int(a.n), "nnz_l": nnzl, "cores": cores,
        "factorize_s": round(tf, 3), "solve_s": round(tsolve, 3),
        "compile_s": round(compile_s, 1),
        "factorize_mnnz_per_s": round(nnzl / tf / 1e6, 2),
        "psum_bytes_per_device_per_factorize": psum_dev,
        "solve_psum_bytes": solve_psum,
        "pool_bytes_per_device": pool_dev,
        "cross_row_fraction": round(cross, 4),
    }), flush=True)


def main():
    if "--single-g" in sys.argv:
        i = sys.argv.index("--single-g")
        run_single_g(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    import subprocess
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING_r05.json"
    cores = os.cpu_count() or 1
    rows = []
    t1 = None
    for g in (1, 2, 4, 8):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--single-g", str(g), str(grid)],
            capture_output=True, text=True)
        row = None
        for line in r.stdout.splitlines():
            if line.startswith("ROW "):
                row = json.loads(line[4:])
        if row is None:
            print(json.dumps({"g": g, "error": r.stderr[-300:]}),
                  flush=True)
            continue
        if g == 1:
            t1 = row["factorize_s"]
        row["efficiency_vs_g1"] = round(t1 / (g * row["factorize_s"]), 3)
        row["efficiency_vs_core_ceiling"] = round(
            t1 / (min(g, cores) * row["factorize_s"]), 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    art = {
        "matrix": f"laplace_3d({grid})",
        "n": rows[0]["n"] if rows else None,
        "backend": f"cpu-virtual-8dev on {cores} physical cores",
        "design": "ownership-partitioned pools + ragged boundary psum; "
                  "solves exchange boundary slots only, one final x "
                  "assembly psum (parallel/dist.py)",
        "caveat": f"virtual devices share one {cores}-core host: "
                  "wall-clock speedup is capped at min(G, cores); "
                  "psum/pool bytes per device are architecture "
                  "properties independent of the measurement host",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", out_path)



if __name__ == "__main__":
    main()
