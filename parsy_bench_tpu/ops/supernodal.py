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


def chol_inverse(D):
    """Batched masked-SPD Cholesky + inverse: the Pallas kernel on TPU
    (ops/pallas_kernels.py — the whole blocked chain as ONE kernel,
    measured 134 -> 139 GFLOP/s factorize at n=110k), the XLA chain
    elsewhere (CPU mesh tests; interpret-mode Pallas is too slow).
    ``PBT_DISABLE_PALLAS=1`` forces the XLA path for A/B runs."""
    import os
    if (jax.default_backend() == "tpu"
            and not os.environ.get("PBT_DISABLE_PALLAS")):
        from parsy_bench_tpu.ops.pallas_kernels import (
            cholesky_inverse_pallas)
        return cholesky_inverse_pallas(D)
    return cholesky_inverse(D)


class SupernodalExecutor:
    """Compiled numeric phase for one ``SupernodalPlan``."""

    def __init__(self, plan: SupernodalPlan, dtype=jnp.float32):
        self.plan = plan
        self.dtype = jnp.dtype(dtype)
        lay = plan.layout
        self.ncls = lay.ncls
        self.classes = lay.classes
        # A-scatter map uploads eagerly (every factorize needs it), int32
        # (pool positions < 2^31 by the int32 table contract).  The L
        # extraction map is nnz(L)-sized — hundreds of MB at scale, and
        # the tunnel moves ~6 MB/s — so it uploads lazily on the first
        # factor_values call (verification path only).
        idx_t = np.int32 if lay.pool_elems() < 2**31 else np.int64
        self._a_map = [(jnp.asarray(m[0].astype(idx_t)),
                        jnp.asarray(m[1].astype(idx_t)))
                       for m in lay.a_map]
        self._map_t = idx_t
        self._l_map = None
        self._nnz_a = int(sum(m.shape[1] for m in lay.a_map))
        self._nnz_l = int(lay.nnz_l)
        # Device-resident index tables, step axis leading.  All tables are
        # PACKED into two flat int32 buffers uploaded in single transfers:
        # per-array uploads through the axon tunnel pay ~10 ms latency
        # each, and a real plan has thousands of table arrays (measured
        # 60-70 s of pure upload at n=10^5).  ``flat_rep`` holds the
        # replicated finalize/rlo tables; ``flat_upd`` is (G, L) with the
        # update tables laid out G-major so the SPMD executor can shard
        # its leading axis.  Views are rebuilt with static slices inside
        # jit; tables still enter jitted functions as ARGUMENTS (device
        # buffers), not baked-in constants.
        G = max(1, int(plan.nshards))
        self._G = G
        rep_pieces: list[np.ndarray] = []
        upd_pieces: list[np.ndarray] = []   # each (G, size_per_g)
        self._rep_len = 0
        self._upd_len = 0

        def _pack_rep(arr):
            a = np.ascontiguousarray(arr, dtype=np.int32).ravel()
            off = self._rep_len
            rep_pieces.append(a)
            self._rep_len += a.size
            return (off, tuple(arr.shape))

        def _pack_upd(arr):
            # arr leads with the G axis; flatten per-g
            a = np.ascontiguousarray(arr, dtype=np.int32).reshape(G, -1)
            off = self._upd_len
            upd_pieces.append(a)
            self._upd_len += a.shape[1]
            return (off, tuple(arr.shape[1:]))

        self._seg_meta = []
        self._gsc_meta = []   # per segment: scatter-free update tables
        for seg in plan.segments:
            upd = [dict(arow=_pack_upd(b.arow), brow=_pack_upd(b.brow),
                        colq=_pack_upd(b.colq),
                        # dst feeds only the scatter path — skip the
                        # (G,T,P,Mc) upload when gather tables replace it
                        dst=(None if getattr(seg, "gsc", None) is not None
                             else _pack_upd(b.dst)),
                        Mc=b.Mc, Q=b.Q)
                   for b in seg.upd]
            fin = [dict(cnt=_pack_rep(b.cnt), boff=_pack_rep(b.boff),
                        w=_pack_rep(b.w), cols0=_pack_rep(b.cols0),
                        rows=_pack_rep(b.rows)) for b in seg.fin]
            rlo = _pack_rep(seg.rlo.T)            # (T, ncls)
            self._seg_meta.append((upd, fin, rlo))
            if getattr(seg, "gsc", None) is None:
                self._gsc_meta.append(None)
            else:
                self._gsc_meta.append([
                    None if ent is None else dict(
                        ladder=ent["ladder"], ntot=ent["ntot"],
                        gidx=[_pack_rep(g) for g in ent["gidx"]],
                        pidx=_pack_rep(ent["pidx"]))
                    for ent in seg.gsc])
        self._flat_rep = jnp.asarray(
            np.concatenate(rep_pieces) if rep_pieces
            else np.zeros(0, dtype=np.int32))
        self._flat_upd = jnp.asarray(
            np.concatenate(upd_pieces, axis=1) if upd_pieces
            else np.zeros((G, 0), dtype=np.int32))

        # ---- pair-granular solve tables (separate buffer so factorize
        # program cache keys are untouched; see _solve_lower_fast_impl)
        self._has_fast_solve = (
            getattr(plan, "bmap", None) is not None
            and all(getattr(s, "srlo", None) is not None
                    for s in plan.segments))
        if self._has_fast_solve:
            sol_pieces: list[np.ndarray] = []
            self._sol_len = 0

            def _pack_sol(arr):
                a = np.ascontiguousarray(arr, dtype=np.int32).ravel()
                off = self._sol_len
                sol_pieces.append(a)
                self._sol_len += a.size
                return (off, tuple(arr.shape))

            self._bmap_meta = [_pack_sol(m) for m in plan.bmap]
            self._slotw_meta = ([_pack_sol(w) for w in plan.slotw]
                                if getattr(plan, "slotw", None) is not None
                                else None)
            self._sol_meta = []
            for seg in plan.segments:
                supd = [dict(brow=_pack_sol(b.brow),
                             xrow=_pack_sol(b.xrow),
                             colq=_pack_sol(b.colq),
                             dst=_pack_sol(b.dst))
                        for b in seg.supd]
                soff = [_pack_sol(sf) for sf in seg.soff]
                srlo = _pack_sol(seg.srlo.T)        # (T, ncls)
                strue = (_pack_sol(seg.strue.T)     # (T, ncls)
                         if getattr(seg, "strue", None) is not None
                         else None)
                self._sol_meta.append((supd, soff, srlo, strue))
            # dense-top tables (TopSolve) ride the same flat buffer
            self._top = getattr(plan, "top", None)
            if self._top is not None:
                self._top_meta = dict(
                    gather=[_pack_sol(g) for g in self._top.gather],
                    xmap=[_pack_sol(m) for m in self._top.xmap],
                    supd=[dict(brow=_pack_sol(b.brow),
                               xrow=_pack_sol(b.xrow),
                               colq=_pack_sol(b.colq),
                               dst=_pack_sol(b.dst))
                          for b in self._top.supd])
            self._flat_sol = jnp.asarray(
                np.concatenate(sol_pieces) if sol_pieces
                else np.zeros(0, dtype=np.int32))
            # aligned-operand pool (G = S @ B_raw per pair, see
            # solve_prep): enabled when it fits the plan's budget
            nseg_s = (plan.solve_nseg if plan.solve_nseg is not None
                      else len(plan.segments))
            gbytes = 0
            for seg in plan.segments[:nseg_s]:
                for b in seg.supd:
                    gbytes += seg.nsteps * b.brow.shape[1] * b.c * b.K * 4
            if self._top is not None:
                for b in self._top.supd:
                    gbytes += b.brow.shape[1] * b.c * b.K * 4
            self._gpool_bytes = gbytes
            self._gpool_enabled = (
                gbytes <= getattr(plan, "gpool_mb", 2048) * 2**20)
            self._solve_lower_fast = jax.jit(self._solve_lower_fast_impl)
        else:
            self._top = None
            self._gpool_enabled = False
        self._factorize = jax.jit(self._factorize_impl)
        # jitted once here: a fresh jax.jit(self._init_pools) per call would
        # retrace every time (bound-method identity differs per access)
        self._init_pools_j = jax.jit(self._init_pools)
        self._factorize_loop = None
        self._solve_lower = jax.jit(self._solve_lower_impl)
        self._solve_upper = jax.jit(self._solve_upper_impl)
        self._solve_spd = jax.jit(
            lambda pools, b, fr: self._solve_upper_impl(
                pools, self._solve_lower_impl(pools, b, fr), fr))
        self._factor_values = jax.jit(self._factor_values_impl)

    # ---------------------------------------------------------- unpack
    def _unpack(self, flat_rep, flat_upd=None):
        """Rebuild the per-segment xs pytrees from the packed buffers with
        static slices (free at trace time).  ``flat_upd`` may carry a
        local G axis smaller than the plan's G (sharded executor), or be
        None for finalize/solve-only consumers."""
        Gl = flat_upd.shape[0] if flat_upd is not None else 0
        segs = []
        for upd_m, fin_m, rlo_m in self._seg_meta:
            upd = []
            for m in (upd_m if flat_upd is not None else []):
                def vu(key, m=m):
                    off, shape = m[key]      # shape = (T, P[, W])
                    size = int(np.prod(shape))
                    v = jax.lax.slice_in_dim(flat_upd, off, off + size,
                                             axis=1)
                    v = v.reshape((Gl,) + shape)
                    # -> step-major (T, Gl, ...)
                    return jnp.moveaxis(v, 0, 1)
                upd.append({k: vu(k)
                            for k in ("arow", "brow", "colq", "dst")
                            if m[k] is not None})
            fin = []
            for m in fin_m:
                def vr(key, m=m):
                    off, shape = m[key]
                    size = int(np.prod(shape))
                    return jax.lax.slice_in_dim(
                        flat_rep, off, off + size, axis=0).reshape(shape)
                fin.append(dict(cnt=vr("cnt"), boff=vr("boff"),
                                w=vr("w"), cols0=vr("cols0"),
                                rows=vr("rows")))
            off, shape = rlo_m
            rlo = jax.lax.slice_in_dim(
                flat_rep, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)
            segs.append((upd, fin, rlo))
        return segs

    def _unpack_gsc(self, flat_rep):
        """Step-major views of the scatter-free update tables (per
        segment: per class dict(gidx=[(T,R,m)...], pidx=(T,W)) or None;
        splan._build_gather_tables)."""
        def vr(meta):
            off, shape = meta
            return jax.lax.slice_in_dim(
                flat_rep, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)
        out = []
        for gm in self._gsc_meta:
            if gm is None:
                out.append(None)
                continue
            out.append([
                None if ent is None else dict(
                    gidx=[vr(m) for m in ent["gidx"]],
                    pidx=vr(ent["pidx"]))
                for ent in gm])
        return out

    # ------------------------------------------------------------- pools
    #
    # Pools are stored PACKED: (R/8, 8c) fat rows, the same linear
    # element order as (R, c).  The packed form is lane-exact on the TPU
    # (8c >= 256 is a multiple of 128), while a (R, 32) array is stored
    # 4x LANE-PADDED (measured: the n=1e6 class-32 pool was 5.87 GB
    # device-side for 1.47 GB of data, '4.0x expansion'), and the
    # per-step pools8 reshape the gathers need was a full-pool relayout
    # copy INSIDE the scan body — whole-pool bytes of traffic per level
    # step.  Row windows at arbitrary (non-8-aligned) offsets are cut
    # with _rows_view/_rows_write below (window-sized copies only).

    def _rows_view(self, pool, ci, start, rows):
        """(rows, c) row window [start, start+rows) of a packed pool."""
        c = self.classes[ci]
        f0 = start // 8
        off = start - f0 * 8
        nf = (rows + 14) // 8          # covers off in [0, 8) + rows
        sl = jax.lax.dynamic_slice(pool, (f0, jnp.int32(0)), (nf, 8 * c))
        return jax.lax.dynamic_slice(
            sl.reshape(nf * 8, c), (off, jnp.int32(0)), (rows, c))

    def _rows_write(self, pool, ci, start, win):
        """Write a (rows, c) window back into a packed pool (RMW of the
        covering fat rows; sequential within a step, so no races)."""
        c = self.classes[ci]
        rows = win.shape[0]
        f0 = start // 8
        off = start - f0 * 8
        nf = (rows + 14) // 8
        sl = jax.lax.dynamic_slice(pool, (f0, jnp.int32(0)), (nf, 8 * c))
        buf = jax.lax.dynamic_update_slice(
            sl.reshape(nf * 8, c), win, (off, jnp.int32(0)))
        return jax.lax.dynamic_update_slice(
            pool, buf.reshape(nf, 8 * c), (f0, jnp.int32(0)))

    def _init_pools(self, a_data, a_map=None):
        """Scatter A values into zeroed per-class PACKED pools.  ``a_map``
        may be passed explicitly (AOT-cached programs take it as an
        argument so the serialized executable carries no baked-in index
        constants); its positions are flat and layout-agnostic."""
        a_map = self._a_map if a_map is None else a_map
        a_data = a_data.astype(self.dtype)
        pools = []
        for ci, c in enumerate(self.classes):
            r = int(self.plan.nrows[ci])
            pos, sel = a_map[ci]
            flat = jnp.zeros(r * c, self.dtype).at[pos].add(a_data[sel])
            pools.append(flat.reshape(r // 8, 8 * c))
        return pools

    # ----------------------------------------------------------- updates
    def _apply_updates_gather(self, pools, wins, seg: SupSegment, upd_xs,
                              gsc_xs):
        """Scatter-free updates: the einsum pair per bucket as before,
        then the delta lands via STATIC gathers — ladder-classed
        contribution sums plus one dense window take — instead of the
        ~25 ns/row index scatter-add (splan._build_gather_tables).
        Single-shard only (sharded deltas ride collectives and keep the
        scatter form)."""
        cbuf = [[] for _ in self.classes]
        pools8 = pools
        for b, xs in zip(seg.upd, upd_xs):
            A = pools8[b.kcls][
                (xs["arow"][0] // 8)[:, None] + _iota(b.Mc // 8)
            ].reshape(-1, b.Mc, b.K)
            Braw = pools8[b.kcls][
                (xs["brow"][0] // 8)[:, None] + _iota(b.Q // 8)
            ].reshape(-1, b.Q, b.K)
            Chat = jnp.einsum("pmk,pqk->pmq", A, Braw,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=self.dtype)
            S = (_iota(b.c)[None, :, None]
                 == xs["colq"][0][:, None, :]).astype(self.dtype)
            C = jnp.einsum("pmq,pcq->pmc", Chat, S,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=self.dtype)
            cbuf[b.ccls].append(C.reshape(-1, b.c))
        out = []
        for ci, c in enumerate(self.classes):
            ent = gsc_xs[ci] if gsc_xs is not None else None
            if ent is None:
                out.append(wins[ci])
                continue
            call = jnp.concatenate(
                [jnp.zeros((1, c), self.dtype)] + cbuf[ci], axis=0)
            parts = [jnp.zeros((1, c), self.dtype)]
            for gi in ent["gidx"]:          # (R, m) at this step
                parts.append(jnp.sum(call[gi], axis=1))
            stacked = jnp.concatenate(parts, axis=0)
            out.append(wins[ci] - stacked[ent["pidx"]])
        return out

    def _apply_updates(self, pools, wins, seg: SupSegment, upd_xs,
                       axis_name=None, gsc_xs=None):
        """Batched einsum updates scatter-added into per-class delta
        windows; one subtraction lands them on the window."""
        if gsc_xs is not None and axis_name is None:
            return self._apply_updates_gather(pools, wins, seg, upd_xs,
                                              gsc_xs)
        deltas = [jnp.zeros((seg.wslice[ci] + 1, c), self.dtype)
                  for ci, c in enumerate(self.classes)]
        # pools are stored packed (8 consecutive rows per fat row), so
        # the chunk gathers below move (Mc/8)-row payloads per index
        # instead of per-row DMAs (index-driven gathers cost per ROW —
        # the dominant update cost before round 3; splan aligns all
        # chunk starts)
        pools8 = pools
        for b, xs in zip(seg.upd, upd_xs):
            G = xs["arow"].shape[0]
            for g in range(G):
                A = pools8[b.kcls][
                    (xs["arow"][g] // 8)[:, None] + _iota(b.Mc // 8)
                ].reshape(-1, b.Mc, b.K)
                Braw = pools8[b.kcls][
                    (xs["brow"][g] // 8)[:, None] + _iota(b.Q // 8)
                ].reshape(-1, b.Q, b.K)
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
        parallel_PB_Cholesky_05.h:83).

        ``PBT_FUSED_FINALIZE=1`` (opt-in, TPU single-device): narrow
        classes (c <= 64) run the whole inner chain as ONE fused Pallas
        kernel per bucket (pallas_kernels.finalize_fused_pallas) — the
        leaf segment's finalize measured 48 ms of the 273 ms factorize
        at n=1e5 and the kernel does it in ~37 ms standalone.  OFF by
        default: in the full grouped-compile context the kernel
        instances ballooned the cold compile from ~6 to >40 minutes for
        a single-digit-ms win, and applied indiscriminately (wide
        classes / padded tall buckets) it REGRESSED to 72 GFLOP/s — the
        r5 floor-attribution record (RESULTS_r05.md) has the numbers."""
        import os
        use_fused = (axis_name is None
                     and jax.default_backend() == "tpu"
                     and os.environ.get("PBT_FUSED_FINALIZE")
                     and not os.environ.get("PBT_DISABLE_PALLAS"))
        nsh = self.plan.nshards if axis_name is not None else 1
        g = jax.lax.axis_index(axis_name) if axis_name is not None else 0
        for ci, c in enumerate(self.classes):
            bks = [(b, xs) for b, xs in zip(seg.fin, fin_xs)
                   if b.ccls == ci]
            if not bks:
                continue
            if use_fused and c <= 64:
                from parsy_bench_tpu.ops.pallas_kernels import (
                    finalize_fused_tile, finalize_fused_pallas)
                tiles = [finalize_fused_tile(b.H, b.c, b.P)
                         for b, _ in bks]
                if all(tiles):
                    for (b, xs), tp in zip(bks, tiles):
                        blk = jax.lax.dynamic_slice(
                            wins[ci], (xs["boff"], jnp.int32(0)),
                            (b.P * b.H, c)).reshape(b.P, b.H, c)
                        diff = finalize_fused_pallas(
                            blk, xs["w"], xs["cnt"], tp)
                        # in place: real lanes never overlap across
                        # buckets and padded-lane diffs are zero, so
                        # sequential adds equal the delta accumulation
                        wins[ci] = jax.lax.dynamic_update_slice(
                            wins[ci],
                            (blk + diff).reshape(b.P * b.H, c),
                            (xs["boff"], jnp.int32(0)))
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
            # shared chol per class, but batched in groups whose total
            # lane count keeps every (sumP, c, c) temp bounded: the
            # all-buckets concat at n=1e6 (252k leaf lanes) built 3.9 GB
            # chol temps and the program exceeded HBM.  One group at
            # bench scales (n <= 3e5), so the op count is unchanged
            # there.
            cap = max(1, int(getattr(self.plan, "fin_chol_elems",
                                     32 * 2**20)) // (c * c))
            groups, cur, cur_p = [], [], 0
            for k, blk in enumerate(blks):
                if cur and cur_p + blk.shape[0] > cap:
                    groups.append(cur)
                    cur, cur_p = [], 0
                cur.append(k)
                cur_p += blk.shape[0]
            if cur:
                groups.append(cur)
            L_g, Linv_g = {}, {}
            for grp in groups:
                D = masked_spd(jnp.concatenate([tops[k] for k in grp]),
                               jnp.concatenate([ws[k] for k in grp]),
                               c, self.dtype)
                Lg, Lig = chol_inverse(D)
                off = 0
                for k in grp:
                    Pm = blks[k].shape[0]
                    L_g[k] = Lg[off:off + Pm]
                    Linv_g[k] = Lig[off:off + Pm]
                    off += Pm
            i_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
            j_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
            for k, ((b, xs), blk, w, lane) in enumerate(
                    zip(bks, blks, ws, lanes)):
                Lb = L_g[k]
                Lib = Linv_g[k]
                wv = w[:, None, None]
                Ltop = jnp.where((i_c < wv) & (j_c < wv), Lb, 0)
                # store Linv^T in the (otherwise zero) strict upper
                # triangle of the diag block: solves reconstruct the
                # triangular inverse from the pool with no extra memory
                # and no per-solve Neumann products (see _inv_blk)
                Ltop = Ltop + jnp.where(
                    (j_c > i_c) & (i_c < wv) & (j_c < wv),
                    jnp.swapaxes(Lib, 1, 2), 0)
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
              axis_name=None, gsc_xs=None):
        wins = [self._rows_view(pools[ci], ci, rlo[ci], seg.wslice[ci])
                for ci in range(self.ncls)]
        wins = self._apply_updates(pools, wins, seg, upd_xs, axis_name,
                                   gsc_xs)
        wins = self._finalize(wins, seg, fin_xs, axis_name)
        return [self._rows_write(pools[ci], ci, rlo[ci], wins[ci])
                for ci in range(self.ncls)]

    def _factorize_impl(self, a_data, flat_rep, flat_upd, axis_name=None):
        pools = self._init_pools(a_data)
        seg_xs = self._unpack(flat_rep, flat_upd)
        gsc_all = self._unpack_gsc(flat_rep)
        for seg, (upd_xs, fin_xs, rlo), gsc in zip(
                self.plan.segments, seg_xs, gsc_all):
            def step(pools, xs, seg=seg):
                u, f, rlo_t, g = xs
                pools = self._step(pools, seg, u, f, rlo_t, axis_name, g)
                return pools, None
            pools, _ = jax.lax.scan(step, pools,
                                    (upd_xs, fin_xs, rlo, gsc))
        return tuple(pools)

    def factorize(self, a_data):
        """Numeric supernodal Cholesky: A values -> per-class panel pools."""
        return self._factorize(jnp.asarray(a_data), self._flat_rep,
                               self._flat_upd)

    # ----------------------------------------------------- AOT caching
    def _plan_desc(self) -> tuple:
        """Canonical description of everything (besides executor source)
        that shapes the traced FACTORIZE programs — the AOT cache key
        material.  Table VALUES are runtime arguments and excluded;
        solve-side structure is separate (:meth:`_solve_desc`) so solve
        plan changes don't invalidate factorize executables."""
        segs = []
        for seg in self.plan.segments:
            segs.append((
                seg.nsteps, tuple(seg.wslice),
                tuple((b.kcls, b.K, b.ccls, b.c, b.Mc, b.Q)
                      for b in seg.upd),
                tuple((b.ccls, b.c, b.H, b.P) for b in seg.fin),
            ))
        return (tuple(segs), self._seg_meta, self._gsc_meta,
                self._rep_len, self._upd_len,
                tuple(int(r) for r in self.plan.nrows),
                tuple(self.classes), str(self.dtype), self._G, self.plan.n)

    def _factor_src(self) -> str:
        """Source hash of the factorize-path code (AOT key material)."""
        from parsy_bench_tpu.ops import dense
        from parsy_bench_tpu.utils import aotcache
        C = SupernodalExecutor
        from parsy_bench_tpu.ops import pallas_kernels as pk
        return aotcache.source_hash(
            C._unpack, C._unpack_gsc, C._init_pools, C._apply_updates,
            C._apply_updates_gather, C._finalize,
            C._step, C.factorize_segmented, chol_inverse, dense.masked_spd,
            dense.cholesky_inverse, dense._chol_panel, dense.nilpotent_inv,
            pk._chol_inverse_body, pk._chol_panel, pk._nilpotent_inv,
            pk.cholesky_inverse_pallas, pk._finalize_body,
            pk._finalize_kernel, pk.finalize_fused_pallas,
            pk.finalize_fused_tile)

    def _solve_src(self) -> str:
        """Source hash of the solve-path code (AOT key material)."""
        from parsy_bench_tpu.ops import dense
        from parsy_bench_tpu.utils import aotcache
        C = SupernodalExecutor
        return aotcache.source_hash(
            C._unpack, C._solve_lower_fast_impl, C._solve_lower_impl,
            C._inv_blk, C.solve_loop, dense.nilpotent_inv)

    def _solve_desc(self) -> tuple:
        """Solve-side AOT key material (on top of :meth:`_plan_desc`)."""
        segs = []
        for seg in self.plan.segments:
            segs.append((
                None if seg.sslice is None else tuple(seg.sslice),
                tuple((b.kcls, b.K, b.ccls, b.c, b.Q) for b in seg.supd),
            ))
        top = None
        if self._top is not None:
            top = (self._top.t, self._top.lev0,
                   tuple((b.kcls, b.K, b.ccls, b.c, b.Q)
                         for b in self._top.supd),
                   self._top_meta)
        return (tuple(segs), getattr(self, "_sol_len", 0),
                getattr(self, "_sol_meta", None),
                getattr(self, "_bmap_meta", None),
                getattr(self, "_slotw_meta", None),
                getattr(self, "_gpool_enabled", False),
                getattr(self.plan, "solve_nseg", None), top,
                tuple(int(r) for r in self.plan.npanels)
                if self.plan.npanels is not None else None)

    def _pools_sds(self):
        return tuple(jax.ShapeDtypeStruct(
            (int(self.plan.nrows[ci]) // 8, 8 * c), self.dtype)
                     for ci, c in enumerate(self.classes))

    def init_pools_cached(self, a_data, cache_dir: str | None):
        """A-scatter as an AOT-cached program (maps enter as arguments)."""
        a_arr = jnp.asarray(a_data).astype(self.dtype)
        if cache_dir is None:
            return self._init_pools_j(a_arr)
        if not hasattr(self, "_init_aot"):
            from parsy_bench_tpu.utils import aotcache
            sds = [tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                         for x in m) for m in self._a_map]
            key = aotcache.fingerprint(
                "init_pools", self._factor_src(), self._plan_desc(),
                tuple((tuple(x.shape), str(x.dtype))
                      for m in self._a_map for x in m))
            jf = jax.jit(lambda a, maps: tuple(self._init_pools(a, maps)))
            self._init_aot = aotcache.load_or_compile(
                cache_dir, key,
                lambda: jf.lower(
                    jax.ShapeDtypeStruct((self._nnz_a,), self.dtype),
                    sds).compile())
        return self._init_aot(a_arr, self._a_map)

    def factorize_segmented(self, a_data, group: int = 8,
                            cache_dir: str | None = None):
        """Numeric factorization split into one device program per
        ``group`` consecutive segments instead of one monolithic program.
        The monolithic factorize exceeds the remote compiler's memory at
        scale (hundreds of buckets inlined); grouped programs compile in
        bounded memory, and grouping keeps the per-dispatch tunnel
        overhead (~5 ms each) amortized.

        ``cache_dir``: AOT executable cache (utils/aotcache.py) — warm
        starts deserialize the compiled group programs and skip tracing,
        lowering and compile-cache key hashing entirely."""
        key = ("_grp_fns", group, cache_dir)
        if getattr(self, "_grp_key", None) != key:
            nseg = len(self.plan.segments)
            desc = self._plan_desc() if cache_dir is not None else None

            def make(lo, hi):
                def run(pools, fr, fu):
                    seg_xs = self._unpack(fr, fu)
                    gsc_all = self._unpack_gsc(fr)
                    pools = list(pools)
                    for si in range(lo, hi):
                        seg = self.plan.segments[si]
                        def step(pools, xs, seg=seg):
                            u, f, rlo_t, g = xs
                            return self._step(list(pools), seg, u, f,
                                              rlo_t, None, g), None
                        pools = jax.lax.scan(
                            step, pools, seg_xs[si] + (gsc_all[si],))[0]
                    return tuple(pools)
                # donate the incoming pools: each group program rewrites
                # them in place (buffer reuse halves peak HBM across the
                # group chain)
                jf = jax.jit(run, donate_argnums=0)
                if cache_dir is None:
                    return jf
                from parsy_bench_tpu.utils import aotcache
                k = aotcache.fingerprint("factorize_group",
                                         self._factor_src(), desc, lo, hi)
                return aotcache.load_or_compile(
                    cache_dir, k,
                    lambda: jf.lower(
                        self._pools_sds(),
                        jax.ShapeDtypeStruct((self._rep_len,), jnp.int32),
                        jax.ShapeDtypeStruct((self._G, self._upd_len),
                                             jnp.int32)).compile())
            self._grp_fns = [make(lo, min(lo + group, nseg))
                             for lo in range(0, nseg, group)]
            self._grp_key = key
        pools = tuple(self.init_pools_cached(a_data, cache_dir))
        for fn in self._grp_fns:
            pools = tuple(fn(pools, self._flat_rep, self._flat_upd))
        return pools

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
            def run(d, fr, fu, iters):
                zero = tuple(
                    jnp.zeros((int(self.plan.nrows[ci]) // 8, 8 * c),
                              self.dtype)
                    for ci, c in enumerate(self.classes))
                def body(i, carry):
                    acc, _ = carry
                    # fold-proof iteration dependency (VERDICT r2 weak #3):
                    # acc == acc is unknowable to the simplifier (NaN
                    # semantics), so the select cannot collapse and every
                    # iteration's input depends on the previous factor.
                    di = jnp.where(acc == acc, d, acc)
                    pools = self._factorize_impl(di, fr, fu)
                    return pools[0].reshape(-1)[0], pools
                _, pools = jax.lax.fori_loop(0, iters, body,
                                             (jnp.zeros((), self.dtype),
                                              zero))
                return pools
            self._factorize_loop = jax.jit(run, static_argnums=3)
        return self._factorize_loop(jnp.asarray(a_data), self._flat_rep,
                                    self._flat_upd, iters)

    def solve_loop(self, pools, b, iters: int,
                   cache_dir: str | None = None):
        """Run ``iters`` forward triangular solves inside ONE device
        program (benchmark helper mirroring ``factorize_loop``; reference
        protocol: 5 timed solves, triangularTest02.cpp:195-260).  Returns
        the last x; iterations are chained fold-proof.  Uses the
        pair-granular fast path when the plan carries its tables.
        ``cache_dir``: AOT executable cache (see factorize_segmented)."""
        fast = self._has_fast_solve

        def run(pools, b, fr, fs, tv, lv, gpv, iters):
            def body(i, carry):
                acc, _ = carry
                bi = jnp.where(acc == acc, b, acc)
                if fast:
                    x = self._solve_lower_fast_impl(pools, bi, fr, fs,
                                                    tv, lv, gpv)
                else:
                    x = self._solve_lower_impl(pools, bi, fr)
                return x[0], x
            _, x = jax.lax.fori_loop(
                0, iters, body,
                (jnp.zeros((), self.dtype),
                 jnp.zeros(self.plan.n, self.dtype)))
            return x
        fs = self._flat_sol if fast else jnp.zeros(0, jnp.int32)
        if fast:
            tv, lv, gpv = self.solve_prep(pools)
        else:
            tv = jnp.zeros((0, 0), self.dtype)
            lv = ()
            gpv = ([], [])
        if cache_dir is not None:
            akey = ("_solve_loop_aot", iters)
            if getattr(self, "_solve_loop_key", None) != akey:
                from parsy_bench_tpu.utils import aotcache
                k = aotcache.fingerprint("solve_loop", self._solve_src(),
                                         self._plan_desc(),
                                         self._solve_desc(), fast, iters)
                sds = lambda tree: jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    tree)
                jf = jax.jit(run, static_argnums=7)
                self._solve_loop_aot = aotcache.load_or_compile(
                    cache_dir, k,
                    lambda: jf.lower(
                        self._pools_sds(),
                        jax.ShapeDtypeStruct((self.plan.n,), self.dtype),
                        jax.ShapeDtypeStruct((self._rep_len,), jnp.int32),
                        jax.ShapeDtypeStruct(fs.shape, jnp.int32),
                        jax.ShapeDtypeStruct(tv.shape, self.dtype),
                        sds(lv), sds(gpv), iters).compile())
                self._solve_loop_key = akey
            return self._solve_loop_aot(
                pools, jnp.asarray(b).astype(self.dtype),
                self._flat_rep, fs, tv, lv, gpv)
        if not hasattr(self, "_solve_loop_fn"):
            self._solve_loop_fn = jax.jit(run, static_argnums=7)
        return self._solve_loop_fn(pools, jnp.asarray(b), self._flat_rep,
                                   fs, tv, lv, gpv, iters)

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

    def _inv_blk(self, blk, w, c):
        """Reconstruct the diag block's triangular inverse from the pool:
        strict lower = transpose of the Linv^T stored in the strict upper
        triangle by _finalize / prepare_solve_pools, diagonal = 1/l_ii.
        Turns every per-solve TRSM into one einsum with no Neumann
        products (the dependent-kernel chains dominated solve time)."""
        i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
        wv = w[:, None, None]
        top = blk[:, :c, :]
        strict = jnp.where((i > j) & (i < wv) & (j < wv),
                           jnp.swapaxes(top, 1, 2), 0)
        dvec = jnp.diagonal(top, axis1=1, axis2=2)          # (P, c)
        valid = _iota(c)[None, :] < w[:, None]
        dinv = jnp.where(valid, 1.0 / jnp.where(valid, dvec, 1.0), 0)
        return strict + jnp.where(i == j, dinv[:, :, None], 0)

    def _prepare_solve_impl(self, pools, flat_rep):
        """Write Linv^T into every factored panel's strict upper triangle
        (for factors loaded as values, e.g. the blocked TriangularSolver
        path — factorize() already stores it)."""
        from parsy_bench_tpu.ops.dense import nilpotent_inv
        for seg, (_, fin_xs, rlo_all) in zip(self.plan.segments,
                                             self._unpack(flat_rep)):
            def step(pools, xs, seg=seg):
                f_xs, rlo = xs
                for b, fx in zip(seg.fin, f_xs):
                    c = b.c
                    blk = self._panel_blk(pools, b, fx, rlo)
                    D = self._diag_tri(blk, fx["w"], c)
                    Linv = nilpotent_inv(D)
                    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
                    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
                    wv = fx["w"][:, None, None]
                    upper = jnp.where((j > i) & (i < wv) & (j < wv),
                                      jnp.swapaxes(Linv, 1, 2), 0)
                    top = blk[:, :c, :] + upper
                    new = jnp.concatenate([top, blk[:, c:, :]], axis=1)
                    start = rlo[b.ccls] + fx["boff"]
                    pools = list(pools)
                    pools[b.ccls] = self._rows_write(
                        pools[b.ccls], b.ccls, start,
                        new.reshape(b.P * b.H, c))
                return tuple(pools), None
            pools, _ = jax.lax.scan(step, tuple(pools), (fin_xs, rlo_all))
        return pools

    def prepare_solve_pools(self, pools):
        """Pools with stored inverses, from a values-only factor."""
        if not hasattr(self, "_prepare_solve"):
            self._prepare_solve = jax.jit(self._prepare_solve_impl)
        return self._prepare_solve(pools, self._flat_rep)

    def _panel_blk(self, pools, b, xs, rlo):
        start = rlo[b.ccls] + xs["boff"]
        return self._rows_view(pools[b.ccls], b.ccls, start,
                               b.P * b.H).reshape(b.P, b.H, b.c)

    def _own_mask(self, P, axis_name):
        """Owner stripe of a bucket's lane axis for SPMD solves: lane
        l belongs to device l % G (same ownership striding as finalize;
        SURVEY §7E).  Returns (P,) bool, all-true unsharded."""
        if axis_name is None:
            return jnp.ones((P,), bool)
        g = jax.lax.axis_index(axis_name)
        return (_iota(P) % self.plan.nshards) == g

    def _solve_lower_impl(self, pools, b_vec, flat_rep, axis_name=None):
        """Forward substitution over the wavefront schedule
        (H2LeveledBlockedLsolve, Triangular_BCSC.h:171).  Sharded
        (``axis_name``): each device solves its owner-striped panel lanes
        and contributes x-entries / RHS updates additively; one psum per
        level step merges them — the collective replacing the reference's
        ``omp atomic`` scatter (Triangular_BCSC.h:218, SURVEY P7).

        Pools must carry stored diag-block inverses (factorize output;
        use ``prepare_solve_pools`` for a values-only factor)."""
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bc = jnp.concatenate([b_vec.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])
        for seg, (_, fin_xs, rlo_all) in zip(self.plan.segments,
                                             self._unpack(flat_rep)):
            def step(carry, xs, seg=seg):
                x, bc = carry
                f_xs, rlo = xs
                dx = jnp.zeros(n + 1, self.dtype)
                dbc = jnp.zeros(n + 1, self.dtype)
                for b, fx in zip(seg.fin, f_xs):
                    blk = self._panel_blk(pools, b, fx, rlo)
                    Linv = self._inv_blk(blk, fx["w"], b.c)
                    own = self._own_mask(b.P, axis_name)
                    cidx = jnp.minimum(fx["cols0"][:, None] + _iota(b.c),
                                       n)
                    colv = (_iota(b.c)[None, :] < fx["w"][:, None]) \
                        & own[:, None]
                    bvec = bc[cidx] * colv
                    xs_ = jnp.einsum(
                        "pij,pj->pi", Linv, bvec,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=self.dtype) * colv
                    # same-level panels' columns are disjoint and start at
                    # zero, so set == add and shards merge additively
                    dx = dx.at[jnp.where(colv, cidx, n)].add(
                        jnp.where(colv, xs_, 0))
                    y = jnp.einsum("phc,pc->ph", blk, xs_,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=self.dtype)
                    below = (_iota(b.H)[None, :] >= fx["w"][:, None]) \
                        & own[:, None]
                    ridx = jnp.where(below, fx["rows"], n)
                    dbc = dbc.at[ridx].add(-(y * below))
                if axis_name is not None:
                    dx = jax.lax.psum(dx, axis_name)
                    dbc = jax.lax.psum(dbc, axis_name)
                x = (x + dx).at[n].set(0)
                bc = (bc + dbc).at[n].set(0)
                return (x, bc), None
            (x, bc), _ = jax.lax.scan(step, (x, bc), (fin_xs, rlo_all))
        return x[:n]

    def _solve_upper_impl(self, pools, b_vec, flat_rep, axis_name=None):
        n = self.plan.n
        x = jnp.zeros(n + 1, self.dtype)
        bp = jnp.concatenate([b_vec.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])
        for seg, (_, fin_xs, rlo_all) in zip(
                reversed(self.plan.segments),
                reversed(self._unpack(flat_rep))):
            def step(x, xs, seg=seg):
                f_xs, rlo = xs
                dx = jnp.zeros(n + 1, self.dtype)
                for b, fx in zip(seg.fin, f_xs):
                    blk = self._panel_blk(pools, b, fx, rlo)
                    Linv = self._inv_blk(blk, fx["w"], b.c)
                    own = self._own_mask(b.P, axis_name)
                    below = _iota(b.H)[None, :] >= fx["w"][:, None]
                    xr = x[fx["rows"]] * below
                    t = jnp.einsum("phc,ph->pc", blk, xr,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=self.dtype)
                    cidx = jnp.minimum(fx["cols0"][:, None] + _iota(b.c),
                                       n)
                    colv = (_iota(b.c)[None, :] < fx["w"][:, None]) \
                        & own[:, None]
                    rhs = (bp[cidx] - t) * colv
                    xs_ = jnp.einsum(
                        "pji,pj->pi", Linv, rhs,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=self.dtype) * colv
                    dx = dx.at[jnp.where(colv, cidx, n)].add(
                        jnp.where(colv, xs_, 0))
                if axis_name is not None:
                    dx = jax.lax.psum(dx, axis_name)
                x = (x + dx).at[n].set(0)
                return x, None
            x, _ = jax.lax.scan(step, x, (fin_xs, rlo_all), reverse=True)
        return x[:n]

    def _solve_lower_fast_impl(self, pools, b_vec, flat_rep, flat_sol,
                               tinv, linv, gp):
        """Forward substitution with the RHS in PANEL-COLUMN layout
        (xb pools: one c-wide row per panel holding the b/x values of its
        columns).  Per level step each update pair contributes ONE
        column-aligned row scatter (y = L_overlap @ x_src, aligned by a
        one-hot matmul) instead of one element per below-diagonal factor
        row — the index count drops from sum(panel heights) to the pair
        count (~6x fewer at n=1e5), which is the measured floor of the
        blocked solve.  Mirrors the factorize delta-window discipline
        over panel SLOTS (SolveUpdBucket, splan.py).

        When the plan carries a dense top (splan.TopSolve), the scan
        covers only segments [0, solve_nseg); the thin top levels finish
        as a few single-step batched update einsums plus one
        ``tinv @ rhs`` GEMV (``tinv`` from :meth:`top_inverse`)."""
        n = self.plan.n
        classes = self.classes

        def vs(meta):
            off, shape = meta
            return jax.lax.slice_in_dim(
                flat_sol, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)

        # xb init: scatter b into panel-column positions
        xb = []
        for ci, c in enumerate(classes):
            m = vs(self._bmap_meta[ci])
            r = int(self.plan.npanels[ci])
            xb.append(jnp.zeros(r * c, self.dtype)
                      .at[m[0]].set(b_vec.astype(self.dtype)[m[1]])
                      .reshape(r, c))
        pools8 = pools
        slotw = [vs(m) for m in self._slotw_meta]
        nseg_s = (self.plan.solve_nseg
                  if getattr(self.plan, "solve_nseg", None) is not None
                  else len(self.plan.segments))
        use_gp = self._gpool_enabled
        for si in range(nseg_s):
            seg = self.plan.segments[si]
            supd_m, _, srlo_m, strue_m = self._sol_meta[si]
            supd = [dict((k, vs(mm)) for k, mm in m.items())
                    for m in supd_m]
            srlo = vs(srlo_m)
            strue = vs(strue_m)
            gseg = gp[0][si] if use_gp else [
                jnp.zeros((seg.nsteps, 0), self.dtype) for _ in seg.supd]
            has_cls = [any(fb.ccls == ci for fb in seg.fin)
                       for ci in range(len(classes))]

            def step(xb, xs, seg=seg, has_cls=has_cls):
                su_xs, srlo_t, strue_t, g_xs = xs
                wins = [jax.lax.dynamic_slice(
                    xb[ci], (srlo_t[ci], jnp.int32(0)),
                    (seg.sslice[ci], c))
                    for ci, c in enumerate(classes)]
                deltas = [jnp.zeros((seg.sslice[ci] + 1, c), self.dtype)
                          for ci, c in enumerate(classes)]
                for b, sx, gb in zip(seg.supd, su_xs, g_xs):
                    xsrc = xb[b.kcls][sx["xrow"]]         # (P, K)
                    if use_gp:
                        # precomputed aligned operand: slab + einsum
                        Gm = gb.reshape(-1, b.c, b.K)
                        C = jnp.einsum(
                            "pck,pk->pc", Gm, xsrc,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=self.dtype)
                    else:
                        Braw = pools8[b.kcls][
                            (sx["brow"] // 8)[:, None] + _iota(b.Q // 8)
                        ].reshape(-1, b.Q, b.K)
                        y = jnp.einsum(
                            "pqk,pk->pq", Braw, xsrc,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=self.dtype)
                        S = (_iota(b.c)[None, :, None]
                             == sx["colq"][:, None, :]).astype(self.dtype)
                        C = jnp.einsum(
                            "pq,pcq->pc", y, S,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=self.dtype)
                    deltas[b.ccls] = deltas[b.ccls].at[sx["dst"]].add(C)
                wins = [w - d[:seg.sslice[ci]]
                        for ci, (w, d) in enumerate(zip(wins, deltas))]
                # merged per-class diagonal solve: the level's slots are
                # ONE contiguous run [0, strue) of the slot window, and
                # the slot-ordered Linv pool makes the whole step one
                # contiguous slice + one batched einsum per class (the
                # per-(class, height)-bucket chains this replaces were
                # the measured op-count floor of the blocked solve)
                for ci, c in enumerate(classes):
                    Sw = seg.sslice[ci]
                    if Sw == 0 or not has_cls[ci]:
                        continue
                    Lw = jax.lax.dynamic_slice(
                        linv[ci], (srlo_t[ci], jnp.int32(0), jnp.int32(0)),
                        (Sw, c, c))
                    wv = jax.lax.dynamic_slice(
                        slotw[ci], (srlo_t[ci],), (Sw,))
                    colv = (_iota(c)[None, :] < wv[:, None]).astype(
                        self.dtype)
                    xs_ = jnp.einsum(
                        "pij,pj->pi", Lw, wins[ci] * colv,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=self.dtype) * colv
                    rowv = _iota(Sw) < strue_t[ci]
                    wins[ci] = jnp.where(rowv[:, None], xs_, wins[ci])
                xb = [jax.lax.dynamic_update_slice(
                    xb[ci], wins[ci], (srlo_t[ci], jnp.int32(0)))
                    for ci in range(len(classes))]
                return xb, None
            xb, _ = jax.lax.scan(step, xb, (supd, srlo, strue, gseg))
        # ---- dense top: batched bottom->top updates + one GEMV --------
        if self._top is not None:
            t = self._top.t
            for bi_t, (b, m) in enumerate(zip(self._top.supd,
                                              self._top_meta["supd"])):
                sx = {k: vs(mm) for k, mm in m.items()}
                xsrc = xb[b.kcls][sx["xrow"][0]]           # (P, K)
                if use_gp:
                    Gm = gp[1][bi_t].reshape(-1, b.c, b.K)
                    C = jnp.einsum("pck,pk->pc", Gm, xsrc,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=self.dtype)
                else:
                    Braw = pools8[b.kcls][
                        (sx["brow"][0] // 8)[:, None] + _iota(b.Q // 8)
                    ].reshape(-1, b.Q, b.K)
                    y = jnp.einsum("pqk,pk->pq", Braw, xsrc,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=self.dtype)
                    S = (_iota(b.c)[None, :, None]
                         == sx["colq"][0][:, None, :]).astype(self.dtype)
                    C = jnp.einsum("pq,pcq->pc", y, S,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=self.dtype)
                xb[b.ccls] = xb[b.ccls].at[sx["dst"][0]].add(-C)
            rhs = jnp.zeros(t, self.dtype)
            for ci in range(self.ncls):
                m = vs(self._top_meta["xmap"][ci])
                rhs = rhs.at[m[1]].set(xb[ci].reshape(-1)[m[0]])
            xt = jnp.einsum("ij,j->i", tinv, rhs,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=self.dtype)
            for ci in range(self.ncls):
                m = vs(self._top_meta["xmap"][ci])
                xb[ci] = xb[ci].reshape(-1).at[m[0]].set(
                    xt[m[1]]).reshape(xb[ci].shape)
        out = jnp.zeros(n, self.dtype)
        for ci in range(self.ncls):
            m = vs(self._bmap_meta[ci])
            out = out.at[m[1]].set(xb[ci].reshape(-1)[m[0]])
        return out

    # ------------------------------------------------ solve preparation
    def _linv_pools_impl(self, pools, flat_rep, flat_sol):
        """Slot-ordered per-class pools of diag-block inverses, built
        once per factorization: linv[ci][slot] = Linv of the panel at
        that slot.  Makes the whole per-step diagonal solve ONE
        contiguous slice + ONE batched einsum per class (see
        _solve_lower_fast_impl); the reconstruction chains (_inv_blk)
        this hoists out of the scan were the solve's op-count floor."""
        def vs(meta):
            off, shape = meta
            return jax.lax.slice_in_dim(
                flat_sol, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)
        linv = [jnp.zeros((int(self.plan.npanels[ci]), c, c), self.dtype)
                for ci, c in enumerate(self.classes)]
        fin_rep = self._unpack(flat_rep)
        for si, seg in enumerate(self.plan.segments):
            _, fin_xs, rlo_all = fin_rep[si]
            _, soff_m, srlo_m, _ = self._sol_meta[si]
            soffs = [vs(m) for m in soff_m]
            srlo = vs(srlo_m)

            def step(linv, xs, seg=seg):
                f_xs, rlo_t, soff_t, srlo_t = xs
                fi = 0
                for fb, fx in zip(seg.fin, f_xs):
                    c = fb.c
                    blk = self._panel_blk(pools, fb, fx, rlo_t)
                    Li = self._inv_blk(blk, fx["w"], c)   # pad lanes -> 0
                    so = srlo_t[fb.ccls] + soff_t[fi]
                    fi += 1
                    cur = jax.lax.dynamic_slice(
                        linv[fb.ccls],
                        (so, jnp.int32(0), jnp.int32(0)), (fb.P, c, c))
                    # add (not set): a bucket's padded lanes overlap the
                    # next level's slots and must leave them untouched
                    linv[fb.ccls] = jax.lax.dynamic_update_slice(
                        linv[fb.ccls], cur + Li,
                        (so, jnp.int32(0), jnp.int32(0)))
                return linv, None
            soff_stack = soffs if soffs else []
            linv, _ = jax.lax.scan(
                step, linv,
                (fin_xs, rlo_all,
                 jnp.stack(soff_stack, 1) if soff_stack
                 else jnp.zeros((seg.nsteps, 0), jnp.int32), srlo))
        return tuple(linv)

    def _gpool_impl(self, pools, flat_sol):
        """Aligned-operand pool: per update pair the column-aligned
        overlap block G = S @ B_raw (c, K), laid out contiguously per
        (bucket, step) so every solve step reads one slab — no per-step
        one-hot alignment and no index-driven gathers (the two largest
        measured solve-traffic terms)."""
        def vs(meta):
            off, shape = meta
            return jax.lax.slice_in_dim(
                flat_sol, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)
        pools8 = pools

        def build(b, sx, T):
            P = sx["brow"].shape[-1]
            br = sx["brow"].reshape(T, P)
            cq = sx["colq"].reshape(T, P, b.Q)
            Braw = pools8[b.kcls][
                (br // 8)[..., None] + _iota(b.Q // 8)
            ].reshape(T, P, b.Q, b.K)
            S = (_iota(b.c)[None, None, :, None]
                 == cq[:, :, None, :]).astype(self.dtype)
            G = jnp.einsum("tpcq,tpqk->tpck", S, Braw,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=self.dtype)
            return G.reshape(T, P * b.c * b.K)

        nseg_s = (self.plan.solve_nseg
                  if getattr(self.plan, "solve_nseg", None) is not None
                  else len(self.plan.segments))
        out = []
        for si in range(nseg_s):
            seg = self.plan.segments[si]
            out.append([build(b, {k: vs(mm) for k, mm in m.items()},
                              seg.nsteps)
                        for b, m in zip(seg.supd, self._sol_meta[si][0])])
        top = []
        if self._top is not None:
            top = [build(b, {k: vs(mm) for k, mm in m.items()}, 1)
                   for b, m in zip(self._top.supd,
                                   self._top_meta["supd"])]
        return (out, top)

    def solve_prep(self, pools):
        """(tinv, linv, gp) for the fast solve, cached on pools identity
        — one-time per factorization (the stored-inverse discipline of
        the factorize side extended to the solve; reference analog: the
        peeled level's multithreaded dtrsm, Triangular_BCSC.h:238)."""
        cached = getattr(self, "_solve_prep_cache", None)
        if cached is not None and cached[0] is pools[0]:
            return cached[1], cached[2], cached[3]
        if not hasattr(self, "_linv_pools_j"):
            self._linv_pools_j = jax.jit(self._linv_pools_impl)
        tinv = self.top_inverse(pools)
        linv = self._linv_pools_j(pools, self._flat_rep, self._flat_sol)
        if self._gpool_enabled:
            if not hasattr(self, "_gpool_j"):
                self._gpool_j = jax.jit(self._gpool_impl)
            gp = self._gpool_j(pools, self._flat_sol)
        else:
            gp = ([], [])
        self._solve_prep_cache = (pools[0], tinv, linv, gp)
        return tinv, linv, gp

    # --------------------------------------------------- dense-top prep
    def _top_inverse_impl(self, pools, flat_sol):
        from parsy_bench_tpu.ops.dense import dense_tri_inv
        t = self._top.t

        def vs(meta):
            off, shape = meta
            return jax.lax.slice_in_dim(
                flat_sol, off, off + int(np.prod(shape)),
                axis=0).reshape(shape)
        Td = jnp.zeros(t * t, self.dtype)
        for ci in range(self.ncls):
            m = vs(self._top_meta["gather"][ci])   # (3, k)
            # flat (row*c + col) indexing is pool-layout-agnostic
            c_i = self.classes[ci]
            Td = Td.at[m[2]].set(
                pools[ci].reshape(-1)[m[0] * c_i + m[1]])
        return dense_tri_inv(Td.reshape(t, t))

    def top_inverse(self, pools):
        """Explicit inverse of the dense-top triangular block, gathered
        from the factored pools — ONE-time per factorization (the solve
        analog of the stored panel inverses; reference peeled level,
        Triangular_BCSC.h:238).  Cached on the pools' identity."""
        if self._top is None:
            return jnp.zeros((0, 0), self.dtype)
        cached = getattr(self, "_top_inv_cache", None)
        if cached is not None and cached[0] is pools[0]:
            return cached[1]
        if not hasattr(self, "_top_inverse_j"):
            self._top_inverse_j = jax.jit(self._top_inverse_impl)
        tinv = self._top_inverse_j(pools, self._flat_sol)
        self._top_inv_cache = (pools[0], tinv)
        return tinv

    def solve_lower(self, pools, b):
        """x = L^{-1} b (forward substitution, level-parallel)."""
        if self._has_fast_solve:
            tinv, linv, gp = self.solve_prep(pools)
            return self._solve_lower_fast(pools, jnp.asarray(b),
                                          self._flat_rep, self._flat_sol,
                                          tinv, linv, gp)
        return self._solve_lower(pools, jnp.asarray(b), self._flat_rep)

    def solve_upper(self, pools, b):
        """x = L^{-T} b (backward substitution)."""
        return self._solve_upper(pools, jnp.asarray(b), self._flat_rep)

    def solve_spd(self, pools, b):
        return self._solve_spd(pools, jnp.asarray(b), self._flat_rep)

    # ------------------------------------------------------------ export
    def _factor_values_impl(self, pools, maps):
        # maps enter as ARGUMENTS: closing over the nnz(L)-sized index
        # arrays bakes them into the HLO as constants (a >1 GB program at
        # n=262k — the remote compile service rejects it)
        out = jnp.zeros(self._nnz_l, self.dtype)
        for ci in range(self.ncls):
            pos, sel = maps[ci]
            out = out.at[sel].set(pools[ci].reshape(-1)[pos])
        return out

    def factor_values(self, pools):
        """Values of the simplicial L pattern extracted from the pools
        (verification path; element-granular, not performance-relevant)."""
        if self._l_map is None:
            self._l_map = [(jnp.asarray(m[0].astype(self._map_t)),
                            jnp.asarray(m[1].astype(self._map_t)))
                           for m in self.plan.layout.l_map]
        return self._factor_values(pools, self._l_map)

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
            self._init_pools_j(jnp.asarray(a_data)))
        out = []
        for i, seg in enumerate(self.plan.segments):
            def run_once(pools, fr, fu, i=i, seg=seg):
                xs4 = self._unpack(fr, fu)[i] + (self._unpack_gsc(fr)[i],)
                def step(pools, xs):
                    u, f, rlo, g = xs
                    return self._step(pools, seg, u, f, rlo, None,
                                      g), None
                return jax.lax.scan(step, pools, xs4)[0]

            def run_reps(pools, fr, fu, i=i, seg=seg):
                xs4 = self._unpack(fr, fu)[i] + (self._unpack_gsc(fr)[i],)
                def body(k, ps):
                    # fold-proof dependency: k-dependent zero contribution
                    ps = [p + jnp.float32(0) * jnp.float32(k) for p in ps]
                    def step(ps2, xs):
                        u, f, rlo, g = xs
                        return self._step(tuple(ps2), seg, u, f, rlo,
                                          None, g), None
                    return jax.lax.scan(step, ps, xs4)[0]
                return jax.lax.fori_loop(0, reps, body, list(pools))
            jrun = jax.jit(run_reps)
            jax.block_until_ready(jrun(pools, self._flat_rep,
                                       self._flat_upd))
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(jrun(pools, self._flat_rep,
                                           self._flat_upd))
                times.append(time.perf_counter() - t0)
            out.append({"segment": i, "steps": seg.nsteps,
                        "upd_buckets": len(seg.upd),
                        "fin_buckets": len(seg.fin),
                        "wslice": list(seg.wslice),
                        "median_s": sorted(times)[len(times) // 2] / reps})
            pools = jax.block_until_ready(
                jax.jit(run_once)(pools, self._flat_rep, self._flat_upd))
        return out
