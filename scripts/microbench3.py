#!/usr/bin/env python
"""Round-2 design probes: true MXU ceiling + Pallas DMA gather rates.

Q1: what matmul rate can this chip actually sustain (f32/bf16, big square)?
Q2: can a Pallas kernel with per-row async DMA beat XLA's ~9 GB/s gather?
Q3: how fast is a chained small-matmul accumulation loop in VMEM?
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def bench_loop(fn, state, iters=8, reps=3):
    import jax

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, fn, state)

    jax.block_until_ready(run(state))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / iters


def bench_call(fn, *args, iters=8, reps=3):
    """Time `iters` sequential dependent calls of an already-jitted fn."""
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # ---- Q1: big matmul ceiling ----------------------------------------
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        N = 4096
        A = jnp.asarray(rng.standard_normal((N, N)) * 0.01, dt)

        def f(i, s):
            return (jnp.dot(s[0], s[0],
                            preferred_element_type=dt) * 0.001,)
        t = bench_loop(f, (A,), iters=4)
        fl = 2 * N ** 3
        print(json.dumps({"bench": f"matmul_{N}_{name}",
                          "per_iter_s": round(t, 6),
                          "tflop_per_s": round(fl / t / 1e12, 2)}),
              flush=True)

    # ---- Q2: pallas row gather ------------------------------------------
    K = 128
    R = 1 << 15                      # 32768 pool rows (16 MB)
    NR = 1 << 15                     # gather 32768 rows (16 MB out)
    B = 256                          # rows per grid block
    pool = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)
    idx = np.asarray(rng.integers(0, R, NR), np.int32)

    def gather_kernel(idx_ref, pool_ref, out_ref, sems):
        i = pl.program_id(0)

        def start(j, _):
            r = idx_ref[i * B + j]
            pltpu.make_async_copy(pool_ref.at[r], out_ref.at[j],
                                  sems.at[j]).start()
            return 0

        jax.lax.fori_loop(0, B, start, 0)

        def wait(j, _):
            pltpu.make_async_copy(pool_ref.at[0], out_ref.at[j],
                                  sems.at[j]).wait()
            return 0

        jax.lax.fori_loop(0, B, wait, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NR // B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((B, K), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((B,))],
    )
    gather_rows = jax.jit(lambda ix, p: pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((NR, K), jnp.float32),
        grid_spec=grid_spec,
    )(ix, p))

    g = gather_rows(jnp.asarray(idx), pool)
    ref = np.asarray(pool)[idx]
    err = float(np.abs(np.asarray(g) - ref).max())
    t = bench_call(gather_rows, jnp.asarray(idx), pool)
    print(json.dumps({"bench": f"pallas_row_gather_{NR}x{K}",
                      "per_iter_s": round(t, 6), "max_err": err,
                      "gelem_per_s": round(NR * K / t / 1e9, 3),
                      "gb_per_s": round(NR * K * 8 / t / 1e9, 2)}),
          flush=True)

    # ---- Q2b: pallas chunk gather (16 rows x 128 per DMA) ---------------
    C = 16
    NCH = NR // C                    # chunks
    cidx = np.asarray(rng.integers(0, R - C, NCH), np.int32)

    def cgather_kernel(idx_ref, pool_ref, out_ref, sems):
        i = pl.program_id(0)
        nb = B // C

        def start(j, _):
            r = idx_ref[i * nb + j]
            pltpu.make_async_copy(pool_ref.at[pl.ds(r, C)],
                                  out_ref.at[pl.ds(j * C, C)],
                                  sems.at[j]).start()
            return 0

        jax.lax.fori_loop(0, nb, start, 0)

        def wait(j, _):
            pltpu.make_async_copy(pool_ref.at[pl.ds(0, C)],
                                  out_ref.at[pl.ds(j * C, C)],
                                  sems.at[j]).wait()
            return 0

        jax.lax.fori_loop(0, nb, wait, 0)

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCH // (B // C),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((B, K), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((B // C,))],
    )
    cgather = jax.jit(lambda ix, p: pl.pallas_call(
        cgather_kernel,
        out_shape=jax.ShapeDtypeStruct((NR, K), jnp.float32),
        grid_spec=grid_spec2,
    )(ix, p))
    g = cgather(jnp.asarray(cidx), pool)
    ref = np.concatenate([np.asarray(pool)[r:r + C] for r in cidx])
    err = float(np.abs(np.asarray(g) - ref).max())
    t = bench_call(cgather, jnp.asarray(cidx), pool)
    print(json.dumps({"bench": f"pallas_chunk_gather_{NCH}x{C}x{K}",
                      "per_iter_s": round(t, 6), "max_err": err,
                      "gelem_per_s": round(NR * K / t / 1e9, 3),
                      "gb_per_s": round(NR * K * 8 / t / 1e9, 2)}),
          flush=True)

    # ---- Q3: chained small matmuls with VMEM accumulator ----------------
    # one destination block (256 x 128) accumulating 64 source GEMMs
    NSRC, M, Kd, W = 64, 256, 128, 128
    A = jnp.asarray(rng.standard_normal((NSRC, M, Kd)) * .1, jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((NSRC, W, Kd)) * .1, jnp.float32)

    def acc_kernel(a_ref, b_ref, out_ref):
        def body(j, acc):
            return acc + jnp.dot(a_ref[j], b_ref[j].T,
                                 preferred_element_type=jnp.float32)
        out_ref[:] = jax.lax.fori_loop(
            0, NSRC, body, jnp.zeros((M, W), jnp.float32))

    accm = jax.jit(lambda a, b: pl.pallas_call(
        acc_kernel,
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    t = bench_call(accm, A, Bm)
    fl = 2 * NSRC * M * Kd * W
    print(json.dumps({"bench": f"pallas_acc_gemm_{NSRC}x{M}x{Kd}x{W}",
                      "per_iter_s": round(t, 6),
                      "gflop_per_s": round(fl / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
