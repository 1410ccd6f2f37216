#!/usr/bin/env python
"""Multi-device scaling artifact (VERDICT r2 next-step #2; BASELINE.md
multi-host bar).

Runs the SPMD supernodal factorize + blocked solve at G in {1,2,4,8} on
the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8;
real multi-chip hardware is not reachable from this environment), reports
wall times, modeled psum bytes (utils/perfmodel.comm_cost — the
computeComCost analog, performanceModel.h:194), and scaling efficiency
T(1)/(G*T(G)).

Caveat recorded in the artifact: virtual devices share one host's cores,
so absolute times under-represent real chips and collectives are
memcpy-speed; the artifact demonstrates that the sharded code paths
execute end-to-end at every G and tracks the communication volume the
real machine would pay.

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


def main():
    import jax
    # the environment's sitecustomize presets JAX_PLATFORMS=axon (single
    # TPU); the virtual mesh needs the CPU backend (same pattern as
    # __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.parallel import ShardedSupernodalExecutor
    from parsy_bench_tpu.utils.perfmodel import comm_cost

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING_r03.json"
    a = generate.laplace_3d(grid)
    rows = []
    t1 = None
    for g in (1, 2, 4, 8):
        s = CholeskySolver(a, SolverConfig(
            ordering="nd", dtype="float32", tier="supernodal",
            num_partitions=g))
        mesh = Mesh(np.array(jax.devices()[:g]), ("p",))
        ex = ShardedSupernodalExecutor(s.plan, mesh, dtype=jnp.float32)
        data = jnp.asarray(s.ap.data, dtype=jnp.float32)
        pools = jax.block_until_ready(ex.factorize(data))   # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(ex.factorize(data))
            ts.append(time.perf_counter() - t0)
        tf = sorted(ts)[1]
        b = jnp.asarray(a.spd_rhs_for_ones()[s.perm], jnp.float32)
        jax.block_until_ready(ex.solve_lower(pools, b))     # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(ex.solve_lower(pools, b))
            ts.append(time.perf_counter() - t0)
        tsolve = sorted(ts)[1]
        cc = comm_cost(s.plan)
        if g == 1:
            t1 = tf
        nnzl = int(s.cc.sum())
        rows.append({
            "g": g, "factorize_s": round(tf, 4),
            "solve_s": round(tsolve, 4),
            "factorize_nnz_per_s": round(nnzl / tf / 1e6, 2),
            "efficiency_vs_g1": round(t1 / (g * tf), 3),
            "psum_bytes_per_factorize": cc["psum_bytes_per_factorize"],
            "psum_steps": cc["psum_steps"],
        })
        print(json.dumps(rows[-1]), flush=True)
    art = {
        "matrix": f"laplace_3d({grid})", "n": int(a.n),
        "nnz_l": int(nnzl),
        "backend": "cpu-virtual-8dev",
        "caveat": "virtual devices share one host; times are a code-path "
                  "and comm-volume artifact, not chip-scaling evidence",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
