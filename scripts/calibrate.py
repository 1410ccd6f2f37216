#!/usr/bin/env python
"""Chip calibration: regenerates the ChipModel constants in
parsy_bench_tpu/utils/perfmodel.py.

Consolidates the round-2/3 one-off microbenchmarks (microbench*.py,
diag_r3.py — now deleted) into one maintained tool.  Measures, on
whatever backend JAX selects (the axon TPU in production):

* dispatch floor     — host->device latency of a trivial jitted op;
* row gather rate    — index-driven 8-row packed gathers from a pool;
* row scatter rate   — index-driven row scatter-add into a pool;
* stream bandwidth   — contiguous window slice + add + update;
* MXU rate + lane floor — batched (P, m, k) einsums across P;
* chain-op floor     — a chain of dependent tiny kernels in one program.

Each measurement repeats the op inside ONE device program (fori_loop)
so the dispatch floor is amortized, and reports medians.  Prints one
JSON document.

CAVEAT (measured r4): in-program loops let XLA fuse/hoist aggressively
even with sum-consumed results — this tool reports upper-bound fused
rates (e.g. "stream" above HBM bandwidth, 49 ns chain ops vs the 5-8 us
the executor pays across kernels), NOT the executor-context floors that
ChipModel encodes.  Treat its output as the optimistic ceiling; floors
must be calibrated against profile_segments on real plans before
updating ChipModel constants.

    python scripts/calibrate.py [--quick]
"""
import json
import sys
import time

import numpy as np


def _median_time(fn, iters=5):
    import jax
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    quick = "--quick" in sys.argv
    reps = 10 if quick else 50
    out = {"backend": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    # dispatch floor: trivial op, NOT amortized
    tiny = jnp.zeros(8)
    f = jax.jit(lambda x: x + 1)
    out["dispatch_s"] = _median_time(lambda: f(tiny))

    # row gather (packed 8-row) + scatter-add, dispatch-amortized
    rows, c = 1 << 17, 128
    pool = jnp.ones((rows, c), jnp.float32)
    nidx = 1 << 13
    idx = jnp.asarray(
        (np.random.default_rng(0).integers(0, rows // 8, nidx)) * 8,
        jnp.int32)

    def gather_loop(pool, idx):
        p8 = pool.reshape(-1, 8 * c)

        def body(i, acc):
            g = p8[(idx // 8) + (i & 1)]
            # consume EVERY gathered element: reducing only a corner lets
            # XLA dead-code the bulk of the gather
            return acc + g.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    t = _median_time(lambda: jax.jit(gather_loop)(pool, idx))
    out["gather_rows_per_s"] = nidx * 8 * reps / t

    def scatter_loop(pool, idx):
        def body(i, p):
            return p.at[idx + (i & 1)].add(1.0)
        return jax.lax.fori_loop(0, reps, body, pool).sum()
    t = _median_time(lambda: jax.jit(scatter_loop)(pool, idx))
    out["scatter_rows_per_s"] = nidx * reps / t

    # stream bandwidth: slice + add + update
    W = 1 << 15

    def stream_loop(pool):
        def body(i, p):
            w = jax.lax.dynamic_slice(p, (i & 7, 0), (W, c))
            return jax.lax.dynamic_update_slice(p, w + 1.0, (i & 7, 0))
        return jax.lax.fori_loop(0, reps, body, pool).sum()
    t = _median_time(lambda: jax.jit(stream_loop)(pool))
    out["stream_bytes_per_s"] = 2.0 * W * c * 4 * reps / t

    # batched einsum: big-lane MXU rate and small-lane floor
    for P, m, k, tag in [(64, 256, 128, "mxu"), (4096, 16, 128, "lane")]:
        A = jnp.ones((P, m, k), jnp.float32)
        B = jnp.ones((P, 48, k), jnp.float32)

        def mm_loop(A, B):
            def body(i, acc):
                C = jnp.einsum("pmk,pqk->pmq", A + acc, B,
                               preferred_element_type=jnp.float32)
                return C.sum() * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        t = _median_time(lambda: jax.jit(mm_loop)(A, B)) / reps
        if tag == "mxu":
            out["mxu_flops_per_s"] = 2.0 * P * m * 48 * k / t
        else:
            out["lane_s"] = t / P

    # chain-op floor: dependent 16x16 cholesky-ish chain
    D = jnp.eye(16) * 4.0

    def chain_loop(D):
        def body(i, M):
            piv = jax.lax.rsqrt(M[0, 0])
            return M * piv
        return jax.lax.fori_loop(0, 64 * reps, body, D)[0, 0]
    t = _median_time(lambda: jax.jit(chain_loop)(D))
    out["chain_op_s"] = t / (64 * reps)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
