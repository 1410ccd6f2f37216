#!/usr/bin/env python
"""In-jit-loop TPU primitive rates (amortizes the ~100us axon dispatch).

The numbers from this file picked the executor's primitive palette:
element-granular gathers/scatters run ~200-800x below HBM bandwidth on TPU,
row-granular (minor dim >= 128 lanes) gathers/scatters and contiguous
slices run near it.  Design rule: never move data at element granularity.
"""
from __future__ import annotations

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


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def rep(name, t, elems, bytes_):
        print(json.dumps({"bench": name, "per_iter_s": round(t, 6),
                          "gelem_per_s": round(elems / t / 1e9, 3),
                          "gb_per_s": round(bytes_ / t / 1e9, 2)}),
              flush=True)

    # 0. pure HBM stream (copy+add), 64 MB
    N = 1 << 24
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    t = bench_loop(lambda i, s: s + 1.0, x)
    rep("stream_add_64MB", t, N, N * 8)

    # 1. element gather 2M from 16MB
    POOL = 1 << 22
    pool = jnp.asarray(rng.standard_normal(POOL), jnp.float32)
    V = 1 << 21
    idx = jnp.asarray(rng.integers(0, POOL, V), jnp.int32)
    t = bench_loop(lambda i, s: (s[0],
                                 s[1] + s[0][(idx + i) % POOL].sum()),
                   (pool, jnp.float32(0)))
    rep("elem_gather_2M", t, V, V * 8)

    # 2. row gather 2-D, w in {8, 128, 512}
    for w in (8, 128, 512):
        R = POOL // w
        NR = min(1 << 18, R)
        p2 = pool.reshape(R, w)
        ridx = jnp.asarray(rng.integers(0, R, NR), jnp.int32)

        def f2(i, s, p2=p2, ridx=ridx, R=R):
            acc, = s
            g = p2[(ridx + i) % R]
            return (acc + g.sum(),)
        t = bench_loop(f2, (jnp.float32(0),))
        rep(f"row_gather_{NR}x{w}", t, NR * w, NR * w * 8)

    # 3. row scatter-add 2-D, w in {128}
    for w in (128,):
        R = POOL // w
        NR = 1 << 15
        p2 = pool.reshape(R, w)
        ridx = jnp.asarray(rng.choice(R, NR, replace=False), jnp.int32)
        rows = jnp.asarray(rng.standard_normal((NR, w)), jnp.float32)
        t = bench_loop(lambda i, s: s.at[(ridx + i) % R].add(rows),
                       p2)
        rep(f"row_scatter_add_{NR}x{w}", t, NR * w, NR * w * 12)

    # 4. slice gather via vmap(dynamic_slice), 32K x 128
    L, Pn = 128, 1 << 15
    st = jnp.asarray(rng.integers(0, POOL - L, Pn), jnp.int32)

    def f4(i, s):
        p, acc = s
        g = jax.vmap(lambda s0: jax.lax.dynamic_slice(
            p, ((s0 + i) % (POOL - L),), (L,)))(st)
        return p, acc + g.sum()
    t = bench_loop(f4, (pool, jnp.float32(0)))
    rep(f"slice_gather_{Pn}x{L}", t, Pn * L, Pn * L * 8)

    # 5. cumsum 2M flat vs (4K, 512) 2-D per-axis
    v = jnp.asarray(rng.standard_normal(V), jnp.float32)
    t = bench_loop(lambda i, s: (s[0], s[1] + jnp.cumsum(s[0])[-1]),
                   (v, jnp.float32(0)))
    rep("cumsum_2M_flat", t, V, V * 8)
    m = v.reshape(V // 512, 512)
    t = bench_loop(lambda i, s: (s[0], s[1] + jnp.cumsum(s[0], 1)[-1, -1]),
                   (m, jnp.float32(0)))
    rep("cumsum_2M_axis1_512", t, V, V * 8)
    m2 = v.reshape(512, V // 512)
    t = bench_loop(lambda i, s: (s[0], s[1] + jnp.cumsum(s[0], 0)[-1, -1]),
                   (m2, jnp.float32(0)))
    rep("cumsum_2M_axis0_512", t, V, V * 8)

    # 6. segment_sum 2M -> 128K sorted
    nseg = 1 << 17
    sid = jnp.asarray(np.sort(rng.integers(0, nseg, V)), jnp.int32)
    t = bench_loop(
        lambda i, s: (s[0], s[1] + jax.ops.segment_sum(
            s[0], sid, num_segments=nseg, indices_are_sorted=True)[-1]),
        (v, jnp.float32(0)))
    rep("segment_sum_2M_128K", t, V, V * 12)

    # 7. batched chol+trsm real rate
    for (Pb, W, H) in ((64, 128, 1024), (512, 32, 256)):
        M0 = rng.standard_normal((Pb, W, W))
        A = jnp.asarray(M0 @ M0.transpose(0, 2, 1) + W * np.eye(W),
                        jnp.float32)
        Bm = jnp.asarray(rng.standard_normal((Pb, H, W)), jnp.float32)

        def f7(i, s):
            A_, acc = s
            Ld = jnp.linalg.cholesky(A_ + acc * 0)
            Y = jax.lax.linalg.triangular_solve(
                Ld, Bm, left_side=False, lower=True, transpose_a=True)
            return A_, acc + Y[0, 0, 0]
        t = bench_loop(f7, (A, jnp.float32(0)), iters=4)
        print(json.dumps({"bench": f"chol_trsm_{Pb}x{W}_H{H}",
                          "per_iter_s": round(t, 6),
                          "lanes_per_s": round(Pb / t, 1)}), flush=True)

    # 8. batched gemm real rate
    for (Pb, M, K, Nn) in ((64, 512, 128, 128), (8, 2048, 512, 128)):
        A = jnp.asarray(rng.standard_normal((Pb, M, K)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((Pb, Nn, K)), jnp.float32)

        def f8(i, s):
            acc, = s
            C = jnp.einsum("pmk,pnk->pmn", A + acc * 0, B,
                           preferred_element_type=jnp.float32)
            return (acc + C.mean(),)
        t = bench_loop(f8, (jnp.float32(0),), iters=4)
        fl = 2 * Pb * M * K * Nn
        print(json.dumps({"bench": f"bgemm_{Pb}x{M}x{K}x{Nn}",
                          "per_iter_s": round(t, 6),
                          "gflop_per_s": round(fl / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
