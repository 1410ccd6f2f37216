"""Supernodal (BCSC) triangular-solve inspector for a given numeric L.

Reference: triangularSolve/Inspection_Block.h — value-pattern supernode
detection (``superNodeDetection`` :7, adjacent columns with identical
off-diagonal pattern), BCSC construction (``createFormat`` :75), and the
level-set scheduling of the supernodal DAG (``buildLevelSet_BCSC``,
Inspection_Level.h:65).  The executor side is ops/supernodal.py's blocked
solves (H2LeveledBlockedLsolve analogue, Triangular_BCSC.h:171).

Unlike the Cholesky path there is no etree: levels are longest paths in the
supernode dependency DAG (edge d -> s when a below-diagonal row of d is a
column of s), which works for chordal and non-chordal L alike (the
reference's triangularTest_DAG_nonChordal.cpp case).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from parsy_bench_tpu.core.csc import CSC
from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.ops.simplicial import segment_levels
from parsy_bench_tpu.symbolic.splan import (
    FinBucket, SupSegment, SupernodalPlan, _emit_pairs, _ladder_ceil,
    _merge_buckets)
from parsy_bench_tpu.symbolic.supernodes import (
    SupernodePartition, build_layout)


def detect_supernodes_from_pattern(l: sp.csc_matrix,
                                   max_width: int = 128) -> np.ndarray:
    """Start flags: column j+1 joins j's supernode when its pattern equals
    column j's pattern minus row j (identical off-diagonal structure,
    reference superNodeDetection, Inspection_Block.h:7-50)."""
    n = l.shape[0]
    ptr, ind = l.indptr, l.indices
    start = np.ones(n, dtype=bool)
    for j in range(1, n):
        a0, a1 = ptr[j - 1], ptr[j]
        b0, b1 = ptr[j], ptr[j + 1]
        # col j-1 pattern without its diagonal row (j-1) must equal col j's
        prev = ind[a0:a1]
        prev = prev[prev != j - 1]
        cur = ind[b0:b1]
        start[j] = not (len(prev) == len(cur) and np.array_equal(prev, cur))
    # enforce max width
    w = 0
    for j in range(n):
        if start[j]:
            w = 1
        else:
            w += 1
            if w > max_width:
                start[j] = True
                w = 1
    return start


def build_trisolve_plan(l: CSC, config: SolverConfig | None = None
                        ) -> SupernodalPlan:
    """Inspector for blocked trisolve with a given numeric L: partition by
    value-pattern detection, panel layout, DAG levels, finalize buckets
    only (no update pairs — the numeric factor already exists)."""
    config = config or SolverConfig()
    n = l.n
    lpat = sp.csc_matrix((np.ones(l.nnz, dtype=np.int8), l.indices,
                          l.indptr), shape=(n, n))
    start = detect_supernodes_from_pattern(lpat, config.max_supernode_width)
    sptr = np.concatenate([np.nonzero(start)[0], [n]]).astype(np.int64)
    nsuper = len(sptr) - 1
    col2sup = (np.cumsum(start) - 1).astype(np.int32)
    part = SupernodePartition(nsuper, sptr, col2sup,
                              np.full(nsuper, -1, dtype=np.int32))

    # provisional layout (id order) to emit the dependency pairs
    layout0 = build_layout(lpat, l, part, config.width_classes,
                           config.height_unit)
    dd, ss, _, _ = _emit_pairs(layout0)

    # supernode DAG levels: longest path over edges d -> s (d < s)
    lev = np.zeros(nsuper, dtype=np.int64)
    order = np.argsort(dd, kind="stable")
    for p in order:
        d, s = int(dd[p]), int(ss[p])
        if lev[d] + 1 > lev[s]:
            lev[s] = lev[d] + 1
    nlev = int(lev.max(initial=-1)) + 1

    # final layout level-major (window contiguity is irrelevant for solves,
    # but keeps one code path) and fin-bucket tables
    panel_order = np.lexsort((np.arange(nsuper), lev))
    layout = build_layout(lpat, l, part, config.width_classes,
                          config.height_unit, panel_order=panel_order)
    rptr, rows, poff = layout.rptr, layout.rows, layout.poff
    wpad = layout.wpad
    dummy = layout.pool_size - 1

    fin_cnt = np.bincount(lev, minlength=nlev) if nlev else np.zeros(0)
    segs = segment_levels(fin_cnt[:, None], alpha=1.6, slack=8.0) \
        if nlev else []
    sn_order = np.argsort(lev, kind="stable")
    sn_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(fin_cnt, out=sn_off[1:])

    segments = []
    for (t0, t1) in segs:
        T = t1 - t0
        fbuckets: dict[tuple[int, int], list[list[int]]] = {}
        for t in range(t0, t1):
            for s in sn_order[sn_off[t]:sn_off[t + 1]]:
                h = int(rptr[s + 1] - rptr[s])
                key = (int(wpad[s]),
                       _ladder_ceil(h, max(8, int(wpad[s])), factor=2))
                fbuckets.setdefault(key, [[] for _ in range(T)])[t - t0].append(int(s))
        _merge_buckets(fbuckets, max_buckets=6,
                       compatible=lambda a_, b_: (a_[0] == b_[0]
                                                  and a_[1] <= b_[1]),
                       volume=lambda key, cnt: cnt * key[1] * key[0])
        fin_buckets = []
        for (Ws, H), steps in sorted(fbuckets.items()):
            P = max(len(sl) for sl in steps)
            base = np.full((T, P), dummy, dtype=np.int32)
            w = np.zeros((T, P), dtype=np.int32)
            h = np.zeros((T, P), dtype=np.int32)
            colsar = np.full((T, P, Ws), n, dtype=np.int32)
            rowsar = np.full((T, P, H), n, dtype=np.int32)
            for t, sl in enumerate(steps):
                for kk, s in enumerate(sl):
                    j1, j2 = int(sptr[s]), int(sptr[s + 1])
                    hh = int(rptr[s + 1] - rptr[s])
                    base[t, kk] = poff[s]
                    w[t, kk] = j2 - j1
                    h[t, kk] = hh
                    colsar[t, kk, :j2 - j1] = np.arange(j1, j2)
                    rowsar[t, kk, :hh] = rows[rptr[s]:rptr[s + 1]]
            fin_buckets.append(FinBucket(Ws=Ws, H=H, base=base, w=w, h=h,
                                         cols=colsar, rows=rowsar))
        segments.append(SupSegment(
            nsteps=T, upd=[], fin=fin_buckets, V=0, W=0,
            perm=np.zeros((1, T, 0), dtype=np.int32),
            wstart=np.zeros((1, T, 0), dtype=np.int32),
            wend=np.zeros((1, T, 0), dtype=np.int32),
            lo=np.zeros(T, dtype=np.int32)))

    nnz_flops = float(n) + 2.0 * float(l.nnz - n)
    return SupernodalPlan(n=n, layout=layout, lev=lev, nlev=nlev,
                          segments=segments, flops=nnz_flops,
                          window_slack=8)
