"""Round-3 diagnosis: per-segment measured vs modeled time on the bench plan.

Times every segment in-device (reps inside one program) and breaks each
into window-move / updates / finalize parts to localize the measured-vs-
model gap (VERDICT r2 next-step #1b)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 20


def timeit(jrun, *args, iters=3):
    jax.block_until_ready(jrun(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jrun(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / REPS


def main():
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    from parsy_bench_tpu.utils.perfmodel import factorize_cost, ChipModel

    t0 = time.perf_counter()
    a = generate.laplace_3d(24)
    solver = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float32",
                                            tier="supernodal"))
    print(f"analyze: {time.perf_counter()-t0:.2f}s", flush=True)
    plan = solver.plan
    ex = solver.executor
    rep = factorize_cost(plan)
    print("model summary:", json.dumps(rep.summary()), flush=True)
    chip = ChipModel()
    seg_model = []
    for si, seg in enumerate(plan.segments):
        t = chip.step_s * seg.nsteps
        t += 2.0 * 4 * seg.nsteps * sum(
            seg.wslice[ci] * c for ci, c in enumerate(plan.classes)) / chip.stream_bytes
        for k in rep.kernels:
            if k.label.startswith(f"seg{si}:"):
                t += k.model_s
        seg_model.append(t)

    data = solver.ap.data.astype(np.float32)
    pools = jax.block_until_ready(jax.jit(ex._init_pools)(jnp.asarray(data)))

    def make_run(seg, xs3, mode):
        def body_step(ps, xs, seg=seg, mode=mode):
            u, f, rlo = xs
            wins = [jax.lax.dynamic_slice(
                ps[ci], (rlo[ci], jnp.int32(0)), (seg.wslice[ci], c))
                for ci, c in enumerate(ex.classes)]
            if mode in ("full", "upd"):
                wins = ex._apply_updates(ps, wins, seg, u)
            if mode in ("full", "fin"):
                wins = ex._finalize(wins, seg, f)
            return [jax.lax.dynamic_update_slice(
                ps[ci], wins[ci], (rlo[ci], jnp.int32(0)))
                for ci in range(ex.ncls)], None

        def run(ps, xs3):
            def body(k, ps2):
                ps2 = [p + jnp.float32(0) * jnp.float32(k) for p in ps2]
                return jax.lax.scan(body_step, ps2, xs3)[0]
            return jax.lax.fori_loop(0, REPS, body, list(ps))
        return jax.jit(run)

    total = {m: 0.0 for m in ("full", "upd", "fin", "win")}
    print(f"{'seg':>4} {'T':>3} {'full_ms':>8} {'win_ms':>7} {'upd_ms':>7} "
          f"{'fin_ms':>7} {'model_ms':>8} {'ratio':>6}", flush=True)
    seg_xs_all = ex._unpack(ex._flat_rep, ex._flat_upd)
    for si, (seg, xs3) in enumerate(zip(plan.segments, seg_xs_all)):
        res = {}
        for mode in ("full", "win", "upd", "fin"):
            res[mode] = timeit(make_run(seg, xs3, mode), pools, xs3)
            total[mode] += res[mode]
        print(f"{si:>4} {seg.nsteps:>3} {res['full']*1e3:>8.3f} "
              f"{res['win']*1e3:>7.3f} {res['upd']*1e3:>7.3f} "
              f"{res['fin']*1e3:>7.3f} {seg_model[si]*1e3:>8.3f} "
              f"{res['full']/max(seg_model[si],1e-12):>6.2f}", flush=True)
        # advance pools with one true full step so later segments see
        # realistic values
        pools = jax.block_until_ready(jax.jit(
            lambda ps, xs3, seg=seg: jax.lax.scan(
                lambda p, xs: (ex._step(tuple(p), seg, *xs), None),
                list(ps), xs3)[0])(pools, xs3))
    print(json.dumps({k: round(v * 1e3, 3) for k, v in total.items()}),
          flush=True)


if __name__ == "__main__":
    main()
