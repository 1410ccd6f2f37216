"""Supernodal (blocked) numeric executors — the performance tier.

TPU-native form of the reference's supernodal kernels, round-2 design
(see symbolic/splan.py for the inspector contract and the measured
primitive rates that shaped it):

* ``factorize`` — parallel left-looking supernodal Cholesky
  (cholesky_left_par_05, parallel_PB_Cholesky_05.h:27).  Per wavefront
  level: every update pair runs as lanes of batched MXU einsums over
  row-gathered operands (the dsyrk/dgemm pair, :160-173); contributions
  are row-scatter-added into a per-level **delta window** and applied with
  one contiguous window subtraction (replacing ``omp atomic``, SURVEY P7);
  panel finalization (dpotrf/dtrsm, :204-218) operates on **contiguous
  window slices** — one shared matmul-only blocked Cholesky per width
  class (ops/dense.py) and one GEMM against the triangular inverse.
* ``solve_lower`` / ``solve_upper`` — blocked triangular solves
  (H2LeveledBlockedLsolve, Triangular_BCSC.h:171).

The factor lives in per-width-class 2-D row pools.  Pool invariant:
padding (columns beyond logical width, rows beyond logical height, slack
rows, and each pool's trailing dummy row) is zero at all times, so padded
lanes ride through gathers and GEMMs as harmless zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parsy_bench_tpu.ops.dense import cholesky_inverse, masked_spd
from parsy_bench_tpu.symbolic.splan import SupernodalPlan, SupSegment


def _iota(n, dtype=jnp.int32):
    return jax.lax.iota(dtype, n)


class SupernodalExecutor:
    """Compiled numeric phase for one ``SupernodalPlan``."""

    def __init__(self, plan: SupernodalPlan, dtype=jnp.float32):
        self.plan = plan
        self.dtype = jnp.dtype(dtype)
        lay = plan.layout
        self.ncls = lay.ncls
        self.classes = lay.classes
        self._a_map = [(jnp.asarray(m[0]), jnp.asarray(m[1]))
                       for m in lay.a_map]
        self._l_map = [(jnp.asarray(m[0]), jnp.asarray(m[1]))
                       for m in lay.l_map]
        self._nnz_a = int(sum(m.shape[1] for m in lay.a_map))
        self._nnz_l = int(sum(m.shape[1] for m in lay.l_map))
        # device-resident per-segment xs pytrees, step axis leading.
        # Tables enter jitted functions as ARGUMENTS (device buffers),
        # not closures (which would be baked in as giant constants).
        self._seg_xs = []
        for seg in plan.segments:
            upd = [dict(arow=jnp.asarray(b.arow.transpose(1, 0, 2)),
                        brow=jnp.asarray(b.brow.transpose(1, 0, 2)),
                        colq=jnp.asarray(b.colq.transpose(1, 0, 2, 3)),
                        dst=jnp.asarray(b.dst.transpose(1, 0, 2, 3)))
                   for b in seg.upd]
            fin = [dict(cnt=jnp.asarray(b.cnt), boff=jnp.asarray(b.boff),
                        w=jnp.asarray(b.w), cols0=jnp.asarray(b.cols0),
                        rows=jnp.asarray(b.rows)) for b in seg.fin]
            rlo = jnp.asarray(seg.rlo.T)          # (T, ncls)
            self._seg_xs.append((upd, fin, rlo))
        self._factorize = jax.jit(self._factorize_impl)
        self._factorize_loop = None
        self._solve_lower = jax.jit(self._solve_lower_impl)
        self._solve_upper = jax.jit(self._solve_upper_impl)
        self._solve_spd = jax.jit(
            lambda pools, b, xs: self._solve_upper_impl(
                pools, self._solve_lower_impl(pools, b, xs), xs))
        self._factor_values = jax.jit(self._factor_values_impl)

    # ------------------------------------------------------------- pools
    def _init_pools(self, a_data):
        a_data = a_data.astype(self.dtype)
        pools = []
        for ci, c in enumerate(self.classes):
            r = int(self.plan.nrows[ci])
            pos, sel = self._a_map[ci]
            flat = jnp.zeros(r * c, self.dtype).at[pos].add(a_data[sel])
            pools.append(flat.reshape(r, c))
        return pools

    # ----------------------------------------------------------- updates
    def _apply_updates(self, pools, wins, seg: SupSegment, upd_xs,
                       axis_name=None):
        """Batched einsum updates scatter-added into per-class delta
        windows; one subtraction lands them on the window."""
        deltas = [jnp.zeros((seg.wslice[ci] + 1, c), self.dtype)
                  for ci, c in enumerate(self.classes)]
        for b, xs in zip(seg.upd, upd_xs):
            G = xs["arow"].shape[0]
            for g in range(G):
                A = pools[b.kcls][xs["arow"][g][:, None] + _iota(b.Mc)]
                Braw = pools[b.kcls][xs["brow"][g][:, None] + _iota(b.Q)]
                Chat = jnp.einsum("pmk,pqk->pmq", A, Braw,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=self.dtype)
                # column alignment as an on-the-fly one-hot MXU matmul:
                # S[p, c_, q] = (colq[p, q] == c_)
                S = (_iota(b.c)[None, :, None]
                     == xs["colq"][g][:, None, :]).astype(self.dtype)
                C = jnp.einsum("pmq,pcq->pmc", Chat, S,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=self.dtype)
                deltas[b.ccls] = deltas[b.ccls].at[xs["dst"][g]].add(C)
        if axis_name is not None:
            deltas = [jax.lax.psum(d, axis_name) for d in deltas]
        return [w - d[:seg.wslice[ci]]
                for ci, (w, d) in enumerate(zip(wins, deltas))]

    # ---------------------------------------------------------- finalize
    def _finalize(self, wins, seg: SupSegment, fin_xs, axis_name=None):
        """Shared blocked Cholesky per width class + per-bucket TRSM-as-
        GEMM, all on contiguous window slices (see splan.py layout).

        Panels within a wavefront level are independent, so every bucket
        reads the PRE-finalize window and contributes a masked diff to a
        per-class delta; one window add applies them all (padded lanes
        contribute zero, so overlapping padded slices are harmless).

        Sharded (``axis_name``): bucket lanes are owner-strided across the
        mesh (lane % G == device), each device factors only its panels, and
        the delta is ``psum``-merged — ownership partitioning of node
        finalization (SURVEY §7E; the reference's per-partition node loop,
        parallel_PB_Cholesky_05.h:83)."""
        nsh = self.plan.nshards if axis_name is not None else 1
        g = jax.lax.axis_index(axis_name) if axis_name is not None else 0
        for ci, c in enumerate(self.classes):
            bks = [(b, xs) for b, xs in zip(seg.fin, fin_xs)
                   if b.ccls == ci]
            if not bks:
                continue
            win = wins[ci]
            delta = jnp.zeros_like(win)
            blks, tops, ws, lanes = [], [], [], []
            for b, xs in bks:
                blk = jax.lax.dynamic_slice(
                    win, (xs["boff"], jnp.int32(0)),
                    (b.P * b.H, c)).reshape(b.P, b.H, c)
                w = xs["w"]
                lane = _iota(b.P)
                if nsh > 1:
                    Pg = b.P // nsh
                    blk = jnp.take(blk.reshape(Pg, nsh, b.H, c), g, axis=1)
                    w = jnp.take(w.reshape(Pg, nsh), g, axis=1)
                    lane = _iota(Pg) * nsh + g
                blks.append(blk)
                tops.append(blk[:, :c, :])
                ws.append(w)
                lanes.append(lane)
            D = masked_spd(jnp.concatenate(tops), jnp.concatenate(ws),
                           c, self.dtype)
            L, Linv = cholesky_inverse(D)
            off = 0
            i_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
            j_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
            for (b, xs), blk, w, lane in zip(bks, blks, ws, lanes):
                Pm = blk.shape[0]
                Lb = L[off:off + Pm]
                Lib = Linv[off:off + Pm]
                off += Pm
                wv = w[:, None, None]
                Ltop = jnp.where((i_c < wv) & (j_c < wv), Lb, 0)
                Y = jnp.einsum("phk,pck->phc", blk, Lib,
                               precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=self.dtype)
                Y = jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, c), 2) < wv, Y, 0)
                top = jnp.where(i_c < wv, Ltop, Y[:, :c, :])
                out = jnp.concatenate([top, Y[:, c:, :]], axis=1)
                diff = jnp.where(lane[:, None, None]
                                 < xs["cnt"][None, None, None],
                                 out - blk, 0)
                if nsh > 1:
                    Pg = b.P // nsh
                    buf = jnp.zeros((Pg, nsh, b.H, c), self.dtype)
                    buf = jax.lax.dynamic_update_index_in_dim(
                        buf, diff, g, 1).reshape(b.P * b.H, c)
                else:
                    buf = diff.reshape(b.P * b.H, c)
                delta = jax.lax.dynamic_update_slice(
                    delta,
                    jax.lax.dynamic_slice(
                        delta, (xs["boff"], jnp.int32(0)),
                        (b.P * b.H, c)) + buf,
                    (xs["boff"], jnp.int32(0)))
            if axis_name is not None:
                delta = jax.lax.psum(delta, axis_name)
            wins[ci] = win + delta
        return wins

    # ------------------------------------------------------------ factor
    def _step(self, pools, seg: SupSegment, upd_xs, fin_xs, rlo,
              axis_name=None):
        wins = [jax.lax.dynamic_slice(
            pools[ci], (rlo[ci], jnp.int32(0)), (seg.wslice[ci], c))
            for ci, c in enumerate(self.classes)]
        wins = self._apply_updates(pools, wins, seg, upd_xs, axis_name)
        wins = self._finalize(wins, seg, fin_xs, axis_name)
        return [jax.lax.dynamic_update_slice(
            pools[ci], wins[ci], (rlo[ci], jnp.int32(0)))
            for ci in range(self.ncls)]

    def _factorize_impl(self, a_data, seg_xs, axis_name=None):
        pools = self._init_pools(a_data)
        for seg, (upd_xs, fin_xs, rlo) in zip(self.plan.segments, seg_xs):
            def step(pools, xs, seg=seg):
                u, f, rlo_t = xs
                pools = self._step(pools, seg, u, f, rlo_t, axis_name)
                return pools, None
            pools, _ = jax.lax.scan(step, pools, (upd_xs, fin_xs, rlo))
        return tuple(pools)

    def factorize(self, a_data):
        """Numeric supernodal Cholesky: A values -> per-class panel pools."""
        return self._factorize(jnp.asarray(a_data), self._seg_xs)

    def factorize_loop(self, a_data, iters: int):
        """Run ``iters`` full factorizations inside ONE device program and
        return the last iteration's pools.  Benchmark helper: host->device
        dispatch has a fixed per-call latency (27 ms through the axon
        tunnel, ~0.1 ms in production) that is not part of the numeric
        phase being measured; the reference's timed loop
        (choleskyTest01.cpp:199-277) likewise pays no per-iteration
        process overhead.  A data dependency between iterations (input
        perturbed by 0*prev) stops XLA from collapsing the loop."""
        if self._factorize_loop is None:
            def run(d, xs, iters):
                zero = tuple(
                    jnp.zeros((int(self.plan.nrows[ci]), c), self.dtype)
                    for ci, c in enumerate(self.classes))
                def body(i, carry):
                    acc, _ = carry
                    pools = self._factorize_impl(d + 0.0 * acc, xs)
                    return pools[0].reshape(-1)[0], pools
                _, pools = jax.lax.fori_loop(0, iters, body,
                                             (jnp.zeros((), self.dtype),
                                              zero))
                return pools
            self._factorize_loop = jax.jit(run, static_argnums=2)
        return self._factorize_loop(jnp.asarray(a_data), self._seg_xs,
                                    iters)

    # ------------------------------------------------------------ solves
    def _diag_tri(self, blk, w, c):
        """Extract the solve-ready lower triangle of a factored panel top:
        identity on padded diagonal entries so the inverse exists."""
        i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
        wv = w[:, None, None]
        D = jnp.where((i < wv) & (j < wv) & (j <= i), blk[:, :c, :], 0)
        return D + jnp.where((i == j) & (i >= wv),
                             jnp.ones((), self.dtype), 0)

    def _panel_blk(self, pools, b, xs, rlo):
        start = rlo[b.ccls] + xs["boff"]
        return jax.lax.dynamic_slice(
            pools[b.ccls], (start, jnp.int32(0)),
            (b.P * b.H, b.c)).reshape(b.P, b.H, b.c)

    def _solve_lower_impl(self, pools, b_vec, seg_xs):
        from parsy_bench_tpu.ops.dense import tri_lower_solve
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bc = jnp.concatenate([b_vec.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])
        for seg, (_, fin_xs, rlo_all) in zip(self.plan.segments,
                                             self._seg_xs):
            def step(carry, xs, seg=seg):
                x, bc = carry
                f_xs, rlo = xs
                for b, fx in zip(seg.fin, f_xs):
                    blk = self._panel_blk(pools, b, fx, rlo)
                    D = self._diag_tri(blk, fx["w"], b.c)
                    cidx = jnp.minimum(fx["cols0"][:, None] + _iota(b.c),
                                       n)
                    colv = _iota(b.c)[None, :] < fx["w"][:, None]
                    bvec = bc[cidx] * colv
                    xs_ = tri_lower_solve(D, bvec) * colv
                    x = x.at[jnp.where(colv, cidx, n)].set(
                        jnp.where(colv, xs_, 0))
                    y = jnp.einsum("phc,pc->ph", blk, xs_,
                                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=self.dtype)
                    below = _iota(b.H)[None, :] >= fx["w"][:, None]
                    ridx = jnp.where(below, fx["rows"], n)
                    bc = bc.at[ridx].add(-(y * below))
                    bc = bc.at[n].set(0)
                    x = x.at[n].set(0)
                return (x, bc), None
            (x, bc), _ = jax.lax.scan(step, (x, bc), (fin_xs, rlo_all))
        return x[:n]

    def _solve_upper_impl(self, pools, b_vec, seg_xs):
        from parsy_bench_tpu.ops.dense import tri_lower_solve_t
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bp = jnp.concatenate([b_vec.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])
        for seg, (_, fin_xs, rlo_all) in zip(reversed(self.plan.segments),
                                             reversed(self._seg_xs)):
            def step(x, xs, seg=seg):
                f_xs, rlo = xs
                for b, fx in zip(seg.fin, f_xs):
                    blk = self._panel_blk(pools, b, fx, rlo)
                    D = self._diag_tri(blk, fx["w"], b.c)
                    below = _iota(b.H)[None, :] >= fx["w"][:, None]
                    xr = x[fx["rows"]] * below
                    t = jnp.einsum("phc,ph->pc", blk, xr,
                                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=self.dtype)
                    cidx = jnp.minimum(fx["cols0"][:, None] + _iota(b.c),
                                       n)
                    colv = _iota(b.c)[None, :] < fx["w"][:, None]
                    rhs = (bp[cidx] - t) * colv
                    xs_ = tri_lower_solve_t(D, rhs) * colv
                    x = x.at[jnp.where(colv, cidx, n)].set(
                        jnp.where(colv, xs_, 0))
                    x = x.at[n].set(0)
                return x, None
            x, _ = jax.lax.scan(step, x, (fin_xs, rlo_all), reverse=True)
        return x[:n]

    def solve_lower(self, pools, b):
        """x = L^{-1} b (forward substitution, level-parallel)."""
        return self._solve_lower(pools, jnp.asarray(b), self._seg_xs)

    def solve_upper(self, pools, b):
        """x = L^{-T} b (backward substitution)."""
        return self._solve_upper(pools, jnp.asarray(b), self._seg_xs)

    def solve_spd(self, pools, b):
        return self._solve_spd(pools, jnp.asarray(b), self._seg_xs)

    # ------------------------------------------------------------ export
    def _factor_values_impl(self, pools):
        out = jnp.zeros(self._nnz_l, self.dtype)
        for ci in range(self.ncls):
            pos, sel = self._l_map[ci]
            out = out.at[sel].set(pools[ci].reshape(-1)[pos])
        return out

    def factor_values(self, pools):
        """Values of the simplicial L pattern extracted from the pools
        (verification path; element-granular, not performance-relevant)."""
        return self._factor_values(pools)

    # --------------------------------------------------------- profiling
    def profile_segments(self, a_data, iters: int = 3,
                         reps: int = 20) -> list[dict]:
        """Per-segment wall times (reference: the instrumented executors
        behind TIMING/ANALYZE_THEORY, Cholesky_Perf_Modeling.h:29).

        Each segment is repeated ``reps`` times inside ONE device program
        (fori_loop with a fold-proof data dependency) so the fixed
        host->device dispatch latency (~27 ms through the axon tunnel) is
        amortized to noise; reported ``median_s`` is per single run."""
        import time
        pools = jax.block_until_ready(
            jax.jit(self._init_pools)(jnp.asarray(a_data)))
        out = []
        for i, (seg, xs3) in enumerate(zip(self.plan.segments,
                                           self._seg_xs)):
            def run_once(pools, xs3, seg=seg):
                def step(pools, xs):
                    u, f, rlo = xs
                    return self._step(pools, seg, u, f, rlo), None
                return jax.lax.scan(step, pools, xs3)[0]

            def run_reps(pools, xs3, seg=seg):
                def body(k, ps):
                    # fold-proof dependency: k-dependent zero contribution
                    ps = [p + jnp.float32(0) * jnp.float32(k) for p in ps]
                    def step(ps2, xs):
                        u, f, rlo = xs
                        return self._step(tuple(ps2), seg, u, f, rlo), None
                    return jax.lax.scan(step, ps, xs3)[0]
                return jax.lax.fori_loop(0, reps, body, list(pools))
            jrun = jax.jit(run_reps)
            jax.block_until_ready(jrun(pools, xs3))
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(jrun(pools, xs3))
                times.append(time.perf_counter() - t0)
            out.append({"segment": i, "steps": seg.nsteps,
                        "upd_buckets": len(seg.upd),
                        "fin_buckets": len(seg.fin),
                        "wslice": list(seg.wslice),
                        "median_s": sorted(times)[len(times) // 2] / reps})
            pools = jax.block_until_ready(
                jax.jit(run_once)(pools, xs3))
        return out
