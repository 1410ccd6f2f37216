#!/usr/bin/env python
"""TPU primitive microbenchmarks that drive the executor design.

Measures the data-movement and small-linalg primitives the supernodal
executor is built from, so design choices (element gather vs row gather vs
one-hot matmul, scatter vs window update, cholesky vs inverse-multiply) are
made from measured rates on the actual chip rather than folklore.

    python scripts/microbench.py            # run all, one JSON line each
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench(fn, *args, iters=5, warmup=2):
    import jax
    fn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    out = []

    def report(name, t, elems, bytes_):
        row = {"bench": name, "median_s": round(t, 6),
               "gelem_per_s": round(elems / t / 1e9, 3),
               "gb_per_s": round(bytes_ / t / 1e9, 2)}
        out.append(row)
        print(json.dumps(row), flush=True)

    POOL = 1 << 22                      # 4M f32 pool (16 MB)
    pool = jnp.asarray(rng.standard_normal(POOL), jnp.float32)

    # --- 1. element gather, random 1-D indices -------------------------
    for V in (1 << 21,):
        idx = jnp.asarray(rng.integers(0, POOL, V), jnp.int32)
        t = bench(lambda p, i: p[i], pool, idx)
        report(f"elem_gather_{V}", t, V, V * 8)

    # --- 2. element gather, affine 3-D computed indices (round-1 path) -
    P, Mc, K = 64, 512, 128
    starts = jnp.asarray(rng.integers(0, POOL - Mc * K, P), jnp.int32)
    def affine_gather(p, s):
        i = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 1)
        k = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 2)
        return p[s[:, None, None] + i * K + k]
    t = bench(affine_gather, pool, starts)
    report(f"affine3d_gather_{P}x{Mc}x{K}", t, P * Mc * K, P * Mc * K * 8)

    # --- 3. slice gather: vmap(dynamic_slice) --------------------------
    for L in (128, 1024, 65536):
        Pn = max(1, (1 << 22) // L)
        st = jnp.asarray(rng.integers(0, POOL - L, Pn), jnp.int32)
        f = lambda p, s: jax.vmap(
            lambda s0: jax.lax.dynamic_slice(p, (s0,), (L,)))(s)
        t = bench(f, pool, st)
        report(f"slice_gather_{Pn}x{L}", t, Pn * L, Pn * L * 8)

    # --- 4. row gather from 2-D pool, minor dim w ----------------------
    for w in (8, 32, 128, 256):
        R = POOL // w
        NR = 1 << 18
        p2 = pool.reshape(R, w)
        ridx = jnp.asarray(rng.integers(0, R, NR), jnp.int32)
        t = bench(lambda p, i: p[i], p2, ridx)
        report(f"row_gather_{NR}x{w}", t, NR * w, NR * w * 8)

    # --- 5. jnp.take rows (same but take) -------------------------------
    w = 128
    p2 = pool.reshape(POOL // w, w)
    ridx = jnp.asarray(rng.integers(0, POOL // w, 1 << 18), jnp.int32)
    t = bench(lambda p, i: jnp.take(p, i, axis=0), p2, ridx)
    report("take_rows_262144x128", t, (1 << 18) * w, (1 << 18) * w * 8)

    # --- 6. element scatter-add / set -----------------------------------
    for V in (1 << 18,):
        idx = jnp.asarray(rng.integers(0, POOL, V), jnp.int32)
        vals = jnp.asarray(rng.standard_normal(V), jnp.float32)
        t = bench(lambda p, i, v: p.at[i].add(v), pool, idx, vals)
        report(f"elem_scatter_add_{V}", t, V, V * 12)
        t = bench(lambda p, i, v: p.at[i].set(v), pool, idx, vals)
        report(f"elem_scatter_set_{V}", t, V, V * 8)

    # --- 7. row scatter to 2-D pool --------------------------------------
    for w in (32, 128):
        R = POOL // w
        NR = 1 << 15
        p2 = pool.reshape(R, w)
        ridx = jnp.asarray(
            rng.choice(R, NR, replace=False), jnp.int32)
        rows = jnp.asarray(rng.standard_normal((NR, w)), jnp.float32)
        t = bench(lambda p, i, v: p.at[i].set(v), p2, ridx, rows)
        report(f"row_scatter_set_{NR}x{w}", t, NR * w, NR * w * 12)
        t = bench(lambda p, i, v: p.at[i].add(v), p2, ridx, rows)
        report(f"row_scatter_add_{NR}x{w}", t, NR * w, NR * w * 12)

    # --- 8. cumsum + segment boundary gather (round-1 reduce) -----------
    V = 1 << 21
    vals = jnp.asarray(rng.standard_normal(V), jnp.float32)
    t = bench(jnp.cumsum, vals)
    report(f"cumsum_{V}", t, V, V * 8)
    nseg = 1 << 17
    segids = jnp.asarray(np.sort(rng.integers(0, nseg, V)), jnp.int32)
    t = bench(lambda v, s: jax.ops.segment_sum(v, s, num_segments=nseg,
                                               indices_are_sorted=True),
              vals, segids)
    report(f"segment_sum_{V}to{nseg}", t, V, V * 12)

    # --- 9. batched GEMM (the MXU workhorses) ---------------------------
    for (Pb, M, Kd, N) in ((64, 512, 128, 128), (256, 128, 128, 128),
                           (1024, 32, 32, 32)):
        A = jnp.asarray(rng.standard_normal((Pb, M, Kd)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((Pb, N, Kd)), jnp.float32)
        t = bench(lambda a, b: jnp.einsum(
            "pmk,pnk->pmn", a, b, preferred_element_type=jnp.float32), A, B)
        fl = 2 * Pb * M * Kd * N
        row = {"bench": f"bgemm_{Pb}x{M}x{Kd}x{N}", "median_s": round(t, 6),
               "gflop_per_s": round(fl / t / 1e9, 1)}
        out.append(row)
        print(json.dumps(row), flush=True)

    # --- 10. batched cholesky + triangular_solve ------------------------
    for (Pb, W) in ((64, 128), (256, 32), (512, 8)):
        M0 = rng.standard_normal((Pb, W, W))
        A = jnp.asarray(M0 @ M0.transpose(0, 2, 1) + W * np.eye(W),
                        jnp.float32)
        t = bench(jnp.linalg.cholesky, A)
        row = {"bench": f"bchol_{Pb}x{W}", "median_s": round(t, 6),
               "lanes_per_s": round(Pb / t, 1)}
        out.append(row); print(json.dumps(row), flush=True)
        L = jnp.linalg.cholesky(A)
        H = 512
        Bm = jnp.asarray(rng.standard_normal((Pb, H, W)), jnp.float32)
        t = bench(lambda l, b: jax.lax.linalg.triangular_solve(
            l, b, left_side=False, lower=True, transpose_a=True), L, Bm)
        fl = Pb * H * W * W
        row = {"bench": f"btrsm_{Pb}x{H}x{W}", "median_s": round(t, 6),
               "gflop_per_s": round(fl / t / 1e9, 1)}
        out.append(row); print(json.dumps(row), flush=True)
        # trsm-as-gemm: invert W x W triangle once, then GEMM
        I = jnp.broadcast_to(jnp.eye(W, dtype=jnp.float32), (Pb, W, W))
        def inv_mm(l, b, i):
            linv = jax.lax.linalg.triangular_solve(
                l, i, left_side=True, lower=True)
            return jnp.einsum("phk,pwk->phw", b, linv,
                              preferred_element_type=jnp.float32)
        t = bench(inv_mm, L, Bm, I)
        row = {"bench": f"btrsm_via_inv_{Pb}x{H}x{W}",
               "median_s": round(t, 6),
               "gflop_per_s": round(fl / t / 1e9, 1)}
        out.append(row); print(json.dumps(row), flush=True)

    # --- 11. dynamic window update (dynamic_slice + DUS) ----------------
    Wn = 1 << 20
    lo = jnp.asarray(123456, jnp.int32)
    delta = jnp.asarray(rng.standard_normal(Wn), jnp.float32)
    def wupd(p, lo, d):
        w = jax.lax.dynamic_slice(p, (lo,), (Wn,))
        return jax.lax.dynamic_update_slice(p, w - d, (lo,))
    t = bench(wupd, pool, lo, delta)
    report(f"window_update_{Wn}", t, Wn, Wn * 16)

    print(json.dumps({"device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
