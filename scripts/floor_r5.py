#!/usr/bin/env python
"""Per-phase floor attribution for the supernodal factorize.

VERDICT r4 #1 asks for either a >=2x faster update path or "a committed
experiment showing the per-step floor breakdown".  This harness times
ABLATED variants of the per-step code inside one device program per
segment (fold-proof fori_loop, dispatch amortized), so each phase's
marginal cost on the real plan is measured — not modeled.  Modes (for
the scatter-free gather update path, the r5 default):

  full         the shipped _step (updates + finalize)
  upd_only     updates + window subtract, no finalize
  fin_only     finalize only (window never updated)
  einsum_only  gathers + einsum pairs, C summed (no ladder/assembly)
  gather_only  ladder gathers + assembly over real pool rows (no einsums)

Marginals: assembly = upd_only - einsum_only; einsums+gathers =
einsum_only; finalize = full - upd_only.  Prints one JSON document.

    python scripts/floor_r5.py [--grid 48] [--reps 20] [--segments 0,5]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--segments", type=str, default="")
    ap.add_argument("--all-modes", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.ops.supernodal import SupernodalExecutor, _iota

    a = generate.laplace_3d(args.grid)
    t0 = time.perf_counter()
    solver = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                            tier="supernodal"))
    print(f"analyze {time.perf_counter()-t0:.1f}s n={a.n}", file=sys.stderr)
    ex: SupernodalExecutor = solver.executor
    plan = ex.plan
    classes = ex.classes

    def updates_ablate(pools, wins, seg, upd_xs, gsc_xs, mode):
        pools8 = pools   # pools are stored packed (r5)
        cbuf = [[] for _ in classes]
        acc = jnp.zeros((), jnp.float32)
        if mode != "gather_only":
            for b, xs in zip(seg.upd, upd_xs):
                A = pools8[b.kcls][
                    (xs["arow"][0] // 8)[:, None] + _iota(b.Mc // 8)
                ].reshape(-1, b.Mc, b.K)
                Braw = pools8[b.kcls][
                    (xs["brow"][0] // 8)[:, None] + _iota(b.Q // 8)
                ].reshape(-1, b.Q, b.K)
                Chat = jnp.einsum("pmk,pqk->pmq", A, Braw,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                S = (_iota(b.c)[None, :, None]
                     == xs["colq"][0][:, None, :]).astype(jnp.float32)
                C = jnp.einsum("pmq,pcq->pmc", Chat, S,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
                cbuf[b.ccls].append(C.reshape(-1, b.c))
        out = []
        for ci, c in enumerate(classes):
            ent = gsc_xs[ci] if gsc_xs is not None else None
            if ent is None:
                out.append(wins[ci])
                continue
            if mode == "einsum_only":
                for C in cbuf[ci]:
                    acc = acc + jnp.sum(C)
                out.append(wins[ci])
                continue
            if mode == "gather_only":
                ntot = 1 + sum(
                    int(np.prod(xs["arow"].shape[1:])) * b.Mc
                    for b, xs in zip(seg.upd, upd_xs) if b.ccls == ci)
                # real rows so the gather cannot fold: tile pool rows
                reps_n = -(-ntot // pools[ci].shape[0])
                call = jnp.concatenate(
                    [pools[ci]] * reps_n, axis=0)[:ntot]
            else:
                call = jnp.concatenate(
                    [jnp.zeros((1, c), jnp.float32)] + cbuf[ci], axis=0)
            parts = [jnp.zeros((1, c), jnp.float32)]
            for gi in ent["gidx"]:
                parts.append(jnp.sum(call[gi], axis=1))
            stacked = jnp.concatenate(parts, axis=0)
            out.append(wins[ci] - stacked[ent["pidx"]])
        out[0] = out[0] + 0.0 * acc
        return out

    def step_variant(pools, seg, upd_xs, fin_xs, rlo, gsc_xs, mode):
        wins = [ex._rows_view(pools[ci], ci, rlo[ci], seg.wslice[ci])
                for ci in range(len(classes))]
        if mode != "fin_only":
            wins = updates_ablate(pools, wins, seg, upd_xs, gsc_xs, mode)
        if mode in ("full", "fin_only"):
            wins = ex._finalize(wins, seg, fin_xs)
        return [ex._rows_write(pools[ci], ci, rlo[ci], wins[ci])
                for ci in range(len(classes))]

    import numpy as np
    pools = jax.block_until_ready(
        ex._init_pools_j(jnp.asarray(solver.ap.data.astype(np.float32))))
    modes = (["full", "upd_only", "fin_only", "einsum_only", "gather_only"]
             if args.all_modes
             else ["full", "upd_only", "fin_only", "einsum_only"])
    nseg = len(plan.segments)
    sel = ([int(s) for s in args.segments.split(",")]
           if args.segments else list(range(nseg)))
    rows = []
    reps = args.reps
    for i in sel:
        seg = plan.segments[i]
        row = {"segment": i, "steps": seg.nsteps,
               "upd_buckets": len(seg.upd), "fin_buckets": len(seg.fin)}
        for mode in modes:
            def run_reps(pools, fr, fu, i=i, seg=seg, mode=mode):
                xs3 = ex._unpack(fr, fu)[i]
                g = ex._unpack_gsc(fr)[i]
                def body(k, ps):
                    ps = [p + jnp.float32(0) * jnp.float32(k) for p in ps]
                    def step2(ps2, xs):
                        (u, f, rlo), gx = xs
                        return step_variant(tuple(ps2), seg, u, f, rlo,
                                            gx, mode), None
                    return jax.lax.scan(step2, ps, (xs3, g))[0]
                return jax.lax.fori_loop(0, reps, body, list(pools))
            jrun = jax.jit(run_reps)
            jax.block_until_ready(jrun(pools, ex._flat_rep, ex._flat_upd))
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                jax.block_until_ready(jrun(pools, ex._flat_rep,
                                           ex._flat_upd))
                times.append(time.perf_counter() - t0)
            row[mode] = sorted(times)[len(times) // 2] / reps
        rows.append(row)
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in row.items()}), file=sys.stderr)
        def run_once(pools, fr, fu, i=i, seg=seg):
            xs4 = ex._unpack(fr, fu)[i] + (ex._unpack_gsc(fr)[i],)
            def step(ps, xs):
                u, f, rlo, g = xs
                return ex._step(list(ps), seg, u, f, rlo, None, g), None
            return jax.lax.scan(step, list(pools), xs4)[0]
        pools = jax.block_until_ready(
            jax.jit(run_once)(pools, ex._flat_rep, ex._flat_upd))

    tot = {m: sum(r[m] for r in rows) for m in modes}
    out = {"n": int(a.n), "nseg": nseg, "reps": reps,
           "segments_timed": sel,
           "totals_s": {m: round(v, 5) for m, v in tot.items()},
           "marginals_s": {
               "assembly": round(tot["upd_only"] - tot["einsum_only"], 5),
               "einsums_gathers": round(tot["einsum_only"], 5),
               "gather_assembly_alone": round(tot["gather_only"], 5),
               "finalize": round(tot["full"] - tot["upd_only"], 5),
               "fin_only": round(tot["fin_only"], 5)},
           "segments": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
