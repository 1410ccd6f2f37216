#!/usr/bin/env python
"""Stage-by-stage timing of the supernodal executor's hot path on the real
plan, with in-jit repetition (fori_loop) so axon dispatch latency (~100us)
does not mask per-stage cost.  Diagnosis tool for the round-2 perf work."""
from __future__ import annotations

import json
import time

import numpy as np


def bench_loop(fn, state, iters=8, reps=3):
    """Median time of `fn` applied `iters` times inside one jit."""
    import jax

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: fn(i, s), state)

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
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver

    idx8 = jnp.arange(8)
    jax.block_until_ready(
        jax.jit(lambda v: v.at[idx8].add(v[idx8]))(jnp.ones(16)))

    a = generate.laplace_3d(24)
    s = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float32",
                                       tier="supernodal"))
    ex = s.executor
    plan = s.plan
    data = jnp.asarray(s.ap.data.astype(np.float32))

    pool0 = jnp.zeros(plan.pool_size, jnp.float32)
    pool0 = pool0.at[ex._a_map].add(data)
    pool0 = jax.block_until_ready(pool0)

    SEG = 2   # V=3.5M, T=4 — the heaviest segment
    seg = plan.segments[SEG]
    upd_xs, win_xs, fin_xs = ex._seg_xs[SEG]
    t_index = 0  # step inside the segment

    def step_tbl(tree, t):
        return jax.tree.map(lambda x: x[t] if hasattr(x, 'shape')
                            and x.ndim > 0 else x, tree)

    # materialize single-step tables (cheap, host)
    u1 = [dict(a_start=d["a_start"][t_index], b_start=d["b_start"][t_index])
          for d in upd_xs]
    w1 = dict(perm=win_xs["perm"][t_index], wstart=win_xs["wstart"][t_index],
              wend=win_xs["wend"][t_index], lo=win_xs["lo"][t_index])
    f1 = [dict(base=d["base"][t_index], w=d["w"][t_index],
               h=d["h"][t_index], cols=d["cols"][t_index],
               rows=d["rows"][t_index]) for d in fin_xs]

    out = {}

    # ---- A: einsums only (gather A/B + batched GEMM + concat) ---------
    def stage_einsum(i, st):
        pool, acc = st
        cs = []
        for b, xs in zip(seg.upd, u1):
            K, Mc, Q = b.K, b.Mc, b.Q
            ii = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 1)
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 2)
            A = pool[(xs["a_start"][0] + i) [:, None, None] + ii * K + kk]
            iq = jax.lax.broadcasted_iota(jnp.int32, (1, Q, K), 1)
            kq = jax.lax.broadcasted_iota(jnp.int32, (1, Q, K), 2)
            B = pool[(xs["b_start"][0] + i)[:, None, None] + iq * K + kq]
            C = jnp.einsum("pmk,pqk->pmq", A, B,
                           preferred_element_type=jnp.float32)
            cs.append(C.reshape(-1))
        v = jnp.concatenate(cs)
        return pool, acc + v[0] + v[-1]

    out["A_einsum_gather"] = bench_loop(stage_einsum,
                                        (pool0, jnp.float32(0)))

    # ---- B: perm gather of the V stream --------------------------------
    v0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal(seg.V), jnp.float32)
    perm = w1["perm"][0]

    def stage_perm(i, st):
        v, acc = st
        vs = v[perm]
        return v, acc + vs[0] + vs[-1]

    out["B_perm_gather"] = bench_loop(stage_perm, (v0, jnp.float32(0)))

    # ---- C: pad + chunked cumsum ---------------------------------------
    CH = 512
    Vp = -(-seg.V // CH) * CH

    def stage_cumsum(i, st):
        v, acc = st
        vs = jnp.concatenate([v, jnp.zeros(Vp - seg.V, jnp.float32)])
        m = vs.reshape(Vp // CH, CH)
        intra = jnp.cumsum(m, axis=1)
        inter = jnp.concatenate([jnp.zeros(1, jnp.float32),
                                 jnp.cumsum(intra[:, -1])])
        return v, acc + intra[0, 0] + inter[-1]

    out["C_cumsum"] = bench_loop(stage_cumsum, (v0, jnp.float32(0)))

    # ---- D: boundary prefix gathers ------------------------------------
    intra0 = jnp.asarray(np.random.default_rng(1)
                         .standard_normal((Vp // CH, CH)), jnp.float32)
    inter0 = jnp.asarray(np.random.default_rng(2)
                         .standard_normal(Vp // CH + 1), jnp.float32)
    wstart, wend = w1["wstart"][0], w1["wend"][0]

    def stage_boundary(i, st):
        intra, inter, acc = st

        def prefix_at(ix):
            chunk, off = ix // CH, ix % CH
            head = jnp.where(off > 0, intra[chunk, jnp.maximum(off - 1, 0)],
                             0)
            return inter[chunk], head

        e_hi, e_lo = prefix_at(wend)
        b_hi, b_lo = prefix_at(wstart)
        d = (e_hi - b_hi) + (e_lo - b_lo)
        return intra, inter, acc + d[0] + d[-1]

    out["D_boundary"] = bench_loop(stage_boundary,
                                   (intra0, inter0, jnp.float32(0)))

    # ---- E: window update ----------------------------------------------
    delta0 = jnp.asarray(np.random.default_rng(3)
                         .standard_normal(seg.W), jnp.float32)

    def stage_window(i, st):
        pool, _ = st
        lo = w1["lo"]
        win = jax.lax.dynamic_slice(pool, (lo,), (seg.W,))
        pool = jax.lax.dynamic_update_slice(pool, win - delta0, (lo,))
        return pool, jnp.float32(0)

    out["E_window"] = bench_loop(stage_window, (pool0, jnp.float32(0)))

    # ---- F: finalize (gather + chol + trsm, no writeback) --------------
    def stage_fin_math(i, st):
        pool, acc = st
        for b, xs in zip(seg.fin, f1):
            Ws, H = b.Ws, b.H
            G = ex._gather_panel(pool, xs["base"], H, Ws)
            D = ex._masked_diag(G, xs["w"], Ws)
            Ld = jnp.linalg.cholesky(D)
            Y = jax.lax.linalg.triangular_solve(
                Ld, G, left_side=False, lower=True, transpose_a=True)
            acc = acc + Y[0, 0, 0] + Ld[0, 0, 0]
        return pool, acc

    out["F_fin_math"] = bench_loop(stage_fin_math, (pool0, jnp.float32(0)))

    # ---- G: finalize writeback scatter ----------------------------------
    def stage_fin_scatter(i, st):
        pool, acc = st
        for b, xs in zip(seg.fin, f1):
            Ws, H = b.Ws, b.H
            P = xs["base"].shape[0]
            outv = jnp.full((P, H, Ws), 0.5, jnp.float32)
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 2)
            ii = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 1)
            hv = xs["h"][:, None, None]
            idx = jnp.where(ii < hv,
                            xs["base"][:, None, None] + ii * Ws + kk,
                            ex._dummy)
            pool = pool.at[idx.reshape(-1)].set(outv.reshape(-1))
        return pool, acc

    out["G_fin_scatter"] = bench_loop(stage_fin_scatter,
                                      (pool0, jnp.float32(0)))

    # ---- H: one full real step (everything) -----------------------------
    def stage_full(i, st):
        pool, acc = st
        u = [dict(a_start=d["a_start"], b_start=d["b_start"]) for d in u1]
        pool = ex._apply_updates(pool, u, w1, seg)
        pool = ex._finalize_panels(pool, f1, seg)
        return pool, acc

    out["H_full_step"] = bench_loop(stage_full, (pool0, jnp.float32(0)),
                                    iters=4)

    for k, v in out.items():
        print(json.dumps({"stage": k, "per_iter_s": round(v, 6)}))
    print(json.dumps({"segment": SEG, "V": seg.V, "W": seg.W,
                      "T": seg.nsteps}))


if __name__ == "__main__":
    main()
