#!/usr/bin/env python
"""Finalize-phase sub-ablation at one segment (default 0 — the leaf
level, measured 48 ms of the 273 ms factorize at n=1e5).

Times the finalize chain with pieces knocked out, each inside one
device program (reps amortize dispatch):

  full       the shipped _finalize
  nochol     chol_inverse replaced by (D, D) passthrough
  xlachol    chol_inverse forced to the XLA chain (PBT_DISABLE_PALLAS)
  cholonly   masked_spd + chol_inverse alone (no Y einsum, no deltas)
  noy        full minus the Y einsum (Y := blk)
  slices     window slice + unslice only

    python scripts/fin_ablate.py [--segment 0] [--reps 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segment", type=int, default=0)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.ops.supernodal import chol_inverse, _iota
    from parsy_bench_tpu.ops.dense import (masked_spd, cholesky_inverse)

    a = generate.laplace_3d(48)
    solver = CholeskySolver(a, SolverConfig(ordering="nd", dtype="float32",
                                            tier="supernodal"))
    ex = solver.executor
    plan = ex.plan
    classes = ex.classes
    si = args.segment
    seg = plan.segments[si]
    dt = jnp.float32

    def finalize_ablate(wins, fin_xs, mode):
        acc = jnp.zeros((), dt)
        for ci, c in enumerate(classes):
            bks = [(b, xs) for b, xs in zip(seg.fin, fin_xs)
                   if b.ccls == ci]
            if not bks:
                continue
            win = wins[ci]
            delta = jnp.zeros_like(win)
            blks, tops, ws = [], [], []
            for b, xs in bks:
                blk = jax.lax.dynamic_slice(
                    win, (xs["boff"], jnp.int32(0)),
                    (b.P * b.H, c)).reshape(b.P, b.H, c)
                blks.append(blk)
                tops.append(blk[:, :c, :])
                ws.append(xs["w"])
            D = masked_spd(jnp.concatenate(tops), jnp.concatenate(ws),
                           c, dt)
            if mode == "nochol":
                L, Linv = D, D
            elif mode == "xlachol":
                L, Linv = cholesky_inverse(D)
            else:
                L, Linv = chol_inverse(D)
            if mode == "cholonly":
                acc = acc + jnp.sum(L) + jnp.sum(Linv)
                continue
            off = 0
            i_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
            j_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
            for (b, xs), blk, w in zip(bks, blks, ws):
                Pm = blk.shape[0]
                Lb = L[off:off + Pm]
                Lib = Linv[off:off + Pm]
                off += Pm
                wv = w[:, None, None]
                Ltop = jnp.where((i_c < wv) & (j_c < wv), Lb, 0)
                Ltop = Ltop + jnp.where(
                    (j_c > i_c) & (i_c < wv) & (j_c < wv),
                    jnp.swapaxes(Lib, 1, 2), 0)
                if mode == "noy":
                    Y = blk
                else:
                    Y = jnp.einsum("phk,pck->phc", blk, Lib,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=dt)
                Y = jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, c), 2) < wv, Y, 0)
                top = jnp.where(i_c < wv, Ltop, Y[:, :c, :])
                out = jnp.concatenate([top, Y[:, c:, :]], axis=1)
                lane = _iota(b.P)
                diff = jnp.where(lane[:, None, None]
                                 < xs["cnt"][None, None, None],
                                 out - blk, 0)
                buf = diff.reshape(b.P * b.H, c)
                delta = jax.lax.dynamic_update_slice(
                    delta,
                    jax.lax.dynamic_slice(
                        delta, (xs["boff"], jnp.int32(0)),
                        (b.P * b.H, c)) + buf,
                    (xs["boff"], jnp.int32(0)))
            wins[ci] = win + delta + 0 * acc
        return wins

    def step_variant(pools, fin_xs, rlo, mode):
        wins = [ex._rows_view(pools[ci], ci, rlo[ci], seg.wslice[ci])
                for ci in range(len(classes))]
        if mode != "slices":
            wins = finalize_ablate(wins, fin_xs, mode)
        return [ex._rows_write(pools[ci], ci, rlo[ci], wins[ci])
                for ci in range(len(classes))]

    pools = jax.block_until_ready(
        ex._init_pools_j(jnp.asarray(solver.ap.data.astype(np.float32))))
    reps = args.reps
    out = {"segment": si, "fin": [(b.ccls, b.c, b.H, b.P)
                                  for b in seg.fin]}
    for mode in ["full", "nochol", "xlachol", "cholonly", "noy",
                 "slices"]:
        os.environ.pop("PBT_DISABLE_PALLAS", None)

        def run_reps(pools, fr, mode=mode):
            segx = ex._unpack(fr)[si]
            _, fin_xs_all, rlo_all = segx
            def body(k, ps):
                ps = [p + jnp.float32(0) * jnp.float32(k) for p in ps]
                def step(ps2, xs):
                    f, rlo = xs
                    return step_variant(list(ps2), f, rlo, mode), None
                return jax.lax.scan(step, ps, (fin_xs_all, rlo_all))[0]
            return jax.lax.fori_loop(0, reps, body, list(pools))
        jrun = jax.jit(run_reps)
        jax.block_until_ready(jrun(pools, ex._flat_rep))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(jrun(pools, ex._flat_rep))
            times.append(time.perf_counter() - t0)
        out[mode] = round(sorted(times)[len(times) // 2] / reps, 5)
        print(json.dumps({mode: out[mode]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
