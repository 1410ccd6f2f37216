"""Supernodal (blocked) numeric executors — the performance tier.

TPU-native form of the reference's supernodal kernels:

* ``factorize`` — parallel left-looking supernodal Cholesky
  (cholesky_left_par_05, parallel_PB_Cholesky_05.h:27): per wavefront
  level, every update pair C = A @ B^T runs as one lane of a batched MXU
  einsum (the dsyrk/dgemm pair, :160-173), the scatter-subtract (:190-197)
  is a functional ``.at[].add``, and panel finalization is batched
  ``jnp.linalg.cholesky`` + ``triangular_solve`` (dpotrf/dtrsm, :204-218);
* ``solve_lower`` / ``solve_upper`` — blocked triangular solves
  (H2LeveledBlockedLsolve, Triangular_BCSC.h:171: dense diag-block solve +
  panel mat-vec + atomic scatter -> batched triangular_solve + einsum +
  ``.at[].add``).

Levels are executed as ``lax.scan`` segments (see splan.py); every gather /
scatter uses precomputed padded index tables whose invalid lanes point at a
dummy pool slot, so the scanned bodies contain no masking control flow.

The panel pool invariant: padding inside every panel (columns beyond the
logical width, rows beyond the logical height) is zero at all times, which
lets padded lanes participate in GEMMs as harmless zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parsy_bench_tpu.symbolic.splan import SupernodalPlan, SupSegment


class SupernodalExecutor:
    """Compiled numeric phase for one ``SupernodalPlan``."""

    def __init__(self, plan: SupernodalPlan, dtype=jnp.float32):
        self.plan = plan
        self.dtype = jnp.dtype(dtype)
        self._a_map = jnp.asarray(plan.layout.a_map)
        self._l_map = jnp.asarray(plan.layout.l_map)
        self._dummy = plan.layout.pool_size - 1
        # device-resident per-segment xs pytrees
        self._seg_xs = []
        for seg in plan.segments:
            # tables are (G, T, ...); the single-device executor iterates
            # the shard axis sequentially (G=1 for unsharded plans), the
            # SPMD executor shard_maps over it.  Step axis must lead for
            # lax.scan, so transpose to (T, G, ...).
            upd = [dict(a_start=jnp.asarray(b.a_start.swapaxes(0, 1)),
                        b_start=jnp.asarray(b.b_start.swapaxes(0, 1)))
                   for b in seg.upd]
            win = dict(perm=jnp.asarray(seg.perm.swapaxes(0, 1)),
                       wstart=jnp.asarray(seg.wstart.swapaxes(0, 1)),
                       wend=jnp.asarray(seg.wend.swapaxes(0, 1)),
                       lo=jnp.asarray(seg.lo))
            fin = [dict(base=jnp.asarray(b.base), w=jnp.asarray(b.w),
                        h=jnp.asarray(b.h), cols=jnp.asarray(b.cols),
                        rows=jnp.asarray(b.rows)) for b in seg.fin]
            self._seg_xs.append((upd, win, fin))
        # index tables enter as jit ARGUMENTS (not closures): closed-over
        # arrays are baked into the lowered module as constants, which for
        # large plans means hundreds of MB of literals and pathological
        # compile times — as parameters they are just device buffers.
        self._factorize = jax.jit(self._factorize_impl)
        self._solve_lower = jax.jit(self._solve_lower_impl)
        self._solve_upper = jax.jit(self._solve_upper_impl)
        self._solve_spd = jax.jit(
            lambda pool, b, seg_xs: self._solve_upper_impl(
                pool, self._solve_lower_impl(pool, b, seg_xs), seg_xs))

    # ----------------------------------------------------------- helpers
    def _gather_panel(self, pool, base, H, Ws):
        """(P, H, Ws) panel gather from flat pool; clamped at pool end."""
        i = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 1)
        k = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 2)
        idx = base[:, None, None] + i * Ws + k
        return pool[idx]

    def _masked_diag(self, G, w, Ws):
        """Extract the (P, Ws, Ws) diagonal block: rows/cols >= w zeroed,
        identity on the padded diagonal, so batched cholesky /
        triangular_solve treat padding as an independent identity block."""
        D = G[:, :Ws, :]
        i = jax.lax.broadcasted_iota(jnp.int32, (1, Ws, Ws), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, Ws, Ws), 2)
        wv = w[:, None, None]
        # keep the valid lower triangle only, then symmetrize explicitly:
        # XLA's Cholesky computes chol((A + A^T)/2), so a lower-only input
        # would halve the off-diagonals
        D = jnp.where((i < wv) & (j < wv) & (j <= i), D, 0)
        strict = jnp.where(j < i, D, 0)          # strict lower part
        D = D + jnp.swapaxes(strict, 1, 2)       # mirror into the upper part
        eye_pad = jnp.where((i == j) & (i >= wv),
                            jnp.ones((), self.dtype), 0)
        return D + eye_pad

    # ------------------------------------------------------------ factor
    def _apply_updates(self, pool, upd_xs, win_xs, seg: SupSegment):
        """Scatter-free contribution application: batched einsums produce
        the contribution stream, a static sort permutation + cumsum +
        window-boundary gathers reduce it, and one dynamic-slice subtract
        lands it on the (contiguous, level-major) target window."""
        if seg.V == 0:
            return pool
        nshards = seg.perm.shape[0]
        lo = win_xs["lo"]
        delta = jnp.zeros(seg.W, self.dtype)
        for g in range(nshards):
            delta = delta + self._shard_delta(pool, upd_xs, win_xs, seg, g)
        win = jax.lax.dynamic_slice(pool, (lo,), (seg.W,))
        return jax.lax.dynamic_update_slice(pool, win - delta, (lo,))

    def _shard_delta(self, pool, upd_xs, win_xs, seg: SupSegment, g: int,
                     axis_name: str | None = None):
        """One shard's window-delta: batched einsums -> sorted stream ->
        two-level prefix -> boundary gathers.  ``g`` indexes the shard
        tables; inside shard_map the leading axis is already split and
        g = 0."""
        cs = []
        for b, xs in zip(seg.upd, upd_xs):
            K, Mc, Q = b.K, b.Mc, b.Q
            i = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 1)
            k = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, K), 2)
            A = pool[xs["a_start"][g][:, None, None] + i * K + k]
            iq = jax.lax.broadcasted_iota(jnp.int32, (1, Q, K), 1)
            kq = jax.lax.broadcasted_iota(jnp.int32, (1, Q, K), 2)
            B = pool[xs["b_start"][g][:, None, None] + iq * K + kq]
            C = jnp.einsum("pmk,pqk->pmq", A, B,
                           preferred_element_type=self.dtype)
            cs.append(C.reshape(-1))
        v = jnp.concatenate(cs)                       # (V,)
        vs = v[win_xs["perm"][g]]                     # sorted by destination
        # two-level prefix: a flat cumsum's boundary differences lose
        # eps * |global prefix| to cancellation; chunking keeps the
        # within-chunk term small, and the inter-chunk term cancels
        # exactly for ranges inside one chunk (the common case)
        CH = 512
        Vp = -(-seg.V // CH) * CH
        vs = jnp.concatenate([vs, jnp.zeros(Vp - seg.V, self.dtype)])
        mchunk = vs.reshape(Vp // CH, CH)
        intra = jnp.cumsum(mchunk, axis=1)            # inclusive prefixes
        inter = jnp.concatenate(
            [jnp.zeros(1, self.dtype), jnp.cumsum(intra[:, -1])])

        def prefix_at(i):                              # sum of vs[:i]
            chunk, off = i // CH, i % CH
            head = jnp.where(off > 0,
                             intra[chunk, jnp.maximum(off - 1, 0)], 0)
            return inter[chunk], head

        e_hi, e_lo = prefix_at(win_xs["wend"][g])
        b_hi, b_lo = prefix_at(win_xs["wstart"][g])
        return (e_hi - b_hi) + (e_lo - b_lo)           # (W,)

    def _finalize_panels(self, pool, fin_xs, seg: SupSegment):
        for b, xs in zip(seg.fin, fin_xs):
            Ws, H = b.Ws, b.H
            G = self._gather_panel(pool, xs["base"], H, Ws)
            D = self._masked_diag(G, xs["w"], Ws)
            Ld = jnp.linalg.cholesky(D)
            Y = jax.lax.linalg.triangular_solve(
                Ld, G, left_side=False, lower=True, transpose_a=True)
            i_h = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
            wv = xs["w"][:, None, None]
            hv = xs["h"][:, None, None]
            top = jnp.where(i_h[:, :Ws, :] < wv, Ld, Y[:, :Ws, :])
            out = jnp.concatenate([top, Y[:, Ws:, :]], axis=1)
            k = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 2)
            i = jax.lax.broadcasted_iota(jnp.int32, (1, H, Ws), 1)
            idx = jnp.where(i < hv, xs["base"][:, None, None] + i * Ws + k,
                            self._dummy)
            pool = pool.at[idx.reshape(-1)].set(out.reshape(-1))
            pool = pool.at[self._dummy].set(0)
        return pool

    def _factorize_impl(self, a_data, seg_xs):
        pool = jnp.zeros(self.plan.pool_size, self.dtype)
        pool = pool.at[self._a_map].add(a_data.astype(self.dtype))
        for seg, (upd_xs, win_xs, fin_xs) in zip(self.plan.segments, seg_xs):
            def step(pool, xs, seg=seg):
                u, wxs, f = xs
                pool = self._apply_updates(pool, u, wxs, seg)
                pool = self._finalize_panels(pool, f, seg)
                return pool, None
            pool, _ = jax.lax.scan(step, pool, (upd_xs, win_xs, fin_xs))
        return pool

    def factorize(self, a_data) -> jax.Array:
        """Numeric supernodal Cholesky: A values -> panel pool."""
        return self._factorize(jnp.asarray(a_data), self._seg_xs)

    # ------------------------------------------------------------ solves
    def _solve_lower_impl(self, pool, b, seg_xs):
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bc = jnp.concatenate([b.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])

        for seg, (_, _, fin_xs) in zip(self.plan.segments, seg_xs):
            def step(carry, xs, seg=seg):
                x, bc = carry
                for bk, fx in zip(seg.fin, xs):
                    Ws, H = bk.Ws, bk.H
                    G = self._gather_panel(pool, fx["base"], H, Ws)
                    D = self._masked_diag(G, fx["w"], Ws)
                    bvec = bc[fx["cols"]]               # (P, Ws)
                    xs_ = jax.lax.linalg.triangular_solve(
                        D, bvec[..., None], left_side=True, lower=True)
                    x = x.at[fx["cols"]].set(xs_[..., 0])
                    y = jnp.einsum("phk,pk->ph", G, xs_[..., 0],
                                   preferred_element_type=self.dtype)
                    i = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
                    ridx = jnp.where(i >= fx["w"][:, None], fx["rows"], n)
                    bc = bc.at[ridx].add(-y * (i >= fx["w"][:, None]))
                    bc = bc.at[n].set(0)
                    x = x.at[n].set(0)
                return (x, bc), None
            (x, bc), _ = jax.lax.scan(step, (x, bc), fin_xs)
        return x[:n]

    def _solve_upper_impl(self, pool, b, seg_xs):
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bp = jnp.concatenate([b.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])

        for seg, (_, _, fin_xs) in zip(reversed(self.plan.segments),
                                       reversed(seg_xs)):
            def step(x, xs, seg=seg):
                for bk, fx in zip(seg.fin, xs):
                    Ws, H = bk.Ws, bk.H
                    G = self._gather_panel(pool, fx["base"], H, Ws)
                    D = self._masked_diag(G, fx["w"], Ws)
                    xr = x[fx["rows"]]                  # (P, H)
                    t = jnp.einsum("phk,ph->pk", G, xr,
                                   preferred_element_type=self.dtype)
                    rhs = bp[fx["cols"]] - t
                    xs_ = jax.lax.linalg.triangular_solve(
                        D, rhs[..., None], left_side=True, lower=True,
                        transpose_a=True)
                    x = x.at[fx["cols"]].set(xs_[..., 0])
                    x = x.at[n].set(0)
                return x, None
            x, _ = jax.lax.scan(step, x, fin_xs, reverse=True)
        return x[:n]

    def solve_lower(self, pool, b) -> jax.Array:
        return self._solve_lower(pool, jnp.asarray(b), self._seg_xs)

    def solve_upper(self, pool, b) -> jax.Array:
        return self._solve_upper(pool, jnp.asarray(b), self._seg_xs)

    def solve_spd(self, pool, b) -> jax.Array:
        return self._solve_spd(pool, jnp.asarray(b), self._seg_xs)

    # ------------------------------------------------------------ export
    def factor_values(self, pool) -> jax.Array:
        """Values of the simplicial L pattern extracted from the pool."""
        return pool[self._l_map]

    # --------------------------------------------------------- profiling
    def profile_segments(self, a_data, iters: int = 3) -> list[dict]:
        """Per-segment wall times (reference: the instrumented executors
        behind TIMING/ANALYZE_THEORY, Cholesky_Perf_Modeling.h:29).  Each
        segment is jitted separately with the pool as carry, so times
        include its scan but not other segments."""
        import time
        pool = jnp.zeros(self.plan.pool_size, self.dtype)
        pool = pool.at[self._a_map].add(
            jnp.asarray(a_data).astype(self.dtype))
        out = []
        for i, (seg, xs3) in enumerate(zip(self.plan.segments,
                                           self._seg_xs)):
            def run(pool, xs3, seg=seg):
                def step(pool, xs):
                    u, wxs, f = xs
                    pool = self._apply_updates(pool, u, wxs, seg)
                    pool = self._finalize_panels(pool, f, seg)
                    return pool, None
                return jax.lax.scan(step, pool, xs3)[0]
            jrun = jax.jit(run)
            pool2 = jax.block_until_ready(jrun(pool, xs3))
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(jrun(pool, xs3))
                times.append(time.perf_counter() - t0)
            out.append({"segment": i, "steps": seg.nsteps,
                        "stream": seg.V, "window": seg.W,
                        "upd_buckets": len(seg.upd),
                        "fin_buckets": len(seg.fin),
                        "median_s": sorted(times)[len(times) // 2]})
            pool = pool2
        return out
