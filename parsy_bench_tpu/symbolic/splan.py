"""Supernodal execution plan: the inspector -> batched-executor contract.

Replaces the reference's LBC scheduler (InspectionLevel_06.h:18
``getCoarseLevelSet_6``) with the TPU-native mapping (SURVEY §7C):

* wavefront levels of the supernodal etree = sequential steps;
* within a level, **update pairs** (source panel d -> target panel s,
  reference executor loop parallel_PB_Cholesky_05.h:117-197) and **panel
  finalizations** (dpotrf+dtrsm, :204-218) are bucketed into padded tile
  classes and executed as batched MXU ops;
* levels are grouped into contiguous segments (ops/simplicial.py
  ``segment_levels``) so each segment is one ``lax.scan`` — compile cost
  O(#segments x #buckets), run cost bounded by the padding factor.

An update pair exploits two structural facts (same ones the reference's
lb/ub overlap scan uses, parallel_PB_Cholesky_05.h:137-149):
  - the rows of d landing in s's columns are one contiguous slice
    [lb, lb+q) of d's row list;
  - all rows of d at or below that slice appear in s's row list
    (the supernodal subset property), so C = A @ B^T scatters entirely
    into s's panel.
With A = rows [lb, h_d) of d's stored panel, B = A[:q], the numeric step is
one batched einsum per bucket; B is a prefix of A, so only A is gathered.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from parsy_bench_tpu.core.csc import CSC, IDX
from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.ops.simplicial import segment_levels
from parsy_bench_tpu.symbolic.etree import tree_levels
from parsy_bench_tpu.symbolic.supernodes import (
    BCSCLayout, SupernodePartition, build_layout, build_partition)


def _pow2ceil(x: np.ndarray, lo: int = 8) -> np.ndarray:
    x = np.maximum(np.asarray(x, dtype=np.int64), 1)
    out = np.maximum(lo, 2 ** np.ceil(np.log2(x)).astype(np.int64))
    return out


@dataclasses.dataclass
class UpdBucket:
    """Padded batch of update pairs with identical tile classes, for one
    level segment.  All arrays lead with the step axis (T = segment steps,
    P = max pairs per step in this bucket)."""
    K: int               # stored width class of the source panel (= stride)
    M: int               # padded row count of A (pow2)
    Q: int               # padded overlap width (pow2 <= 128)
    a_start: np.ndarray  # (T, P) int32 pool index of A's first element
    rowpos: np.ndarray   # (T, P, M) int32 position of each A row in s; -1 pad
    colpos: np.ndarray   # (T, P, Q) int32 column offset within s; -1 pad
    dstbase: np.ndarray  # (T, P) int32 pool offset of s's panel
    ws: np.ndarray       # (T, P) int32 stored width class of s

    @property
    def flops(self) -> float:
        return 2.0 * float(np.sum(self.rowpos >= 0)) * self.K  # ~2*m*q*k est


@dataclasses.dataclass
class FinBucket:
    """Padded batch of panel finalizations (potrf + trsm) for one segment."""
    Ws: int              # stored width class
    H: int               # padded panel height (pow2, >= Ws)
    base: np.ndarray     # (T, P) int32 pool offset; pad -> points at dummy
    w: np.ndarray        # (T, P) int32 logical width; 0 for padding
    h: np.ndarray        # (T, P) int32 logical height (rows incl diag block)
    cols: np.ndarray     # (T, P, Ws) int32 global column ids; pad -> n
    rows: np.ndarray     # (T, P, H) int32 global row ids; pad -> n


@dataclasses.dataclass
class SupSegment:
    nsteps: int
    upd: list[UpdBucket]
    fin: list[FinBucket]


@dataclasses.dataclass
class SupernodalPlan:
    n: int
    layout: BCSCLayout
    lev: np.ndarray               # (nsuper,) wavefront level per supernode
    nlev: int
    segments: list[SupSegment]
    flops: float                  # true factorization flops (sum cc^2-ish)

    @property
    def pool_size(self) -> int:
        return self.layout.pool_size


def _emit_pairs(layout: BCSCLayout):
    """All update pairs (d, s, lb, q) from the supernodal row patterns."""
    part = layout.part
    nsuper = part.nsuper
    rptr, rows = layout.rptr, layout.rows
    col2sup = part.col2sup
    d_list, s_list, lb_list, q_list = [], [], [], []
    for d in range(nsuper):
        r0, r1 = int(rptr[d]), int(rptr[d + 1])
        w = int(part.sptr[d + 1] - part.sptr[d])
        below = rows[r0 + w:r1]
        if len(below) == 0:
            continue
        tgt = col2sup[below]
        # group boundaries: consecutive runs of equal target supernode
        cut = np.nonzero(np.diff(tgt))[0] + 1
        starts = np.concatenate([[0], cut])
        ends = np.concatenate([cut, [len(below)]])
        d_list.append(np.full(len(starts), d, dtype=np.int64))
        s_list.append(tgt[starts].astype(np.int64))
        lb_list.append(w + starts)
        q_list.append(ends - starts)
    if not d_list:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    return (np.concatenate(d_list), np.concatenate(s_list),
            np.concatenate(lb_list), np.concatenate(q_list))


def build_supernodal_plan(a: CSC, parent: np.ndarray, cc: np.ndarray,
                          lpat: sp.csc_matrix,
                          config: SolverConfig | None = None) -> SupernodalPlan:
    """Inspector: partition + layout + level-bucketed batch tables.

    ``a`` must be permuted lower CSC with a postordered etree ``parent`` and
    column counts ``cc``; ``lpat`` the simplicial factor pattern.
    """
    config = config or SolverConfig()
    part = build_partition(a, parent, cc, config.nrelax, config.zrelax,
                           config.max_supernode_width)
    layout = build_layout(lpat, a, part, config.width_classes,
                          config.height_unit)
    n = a.n
    nsuper = part.nsuper
    rptr, rows, poff = layout.rptr, layout.rows, layout.poff
    wpad, sptr = layout.wpad, part.sptr
    lev = tree_levels(part.sparent)
    nlev = int(lev.max(initial=-1)) + 1

    # ---------------- update pairs ------------------------------------
    dd, ss, lb, qq = _emit_pairs(layout)
    plev = lev[ss] if len(ss) else np.empty(0, dtype=np.int64)
    hm = (rptr[dd + 1] - rptr[dd] - lb).astype(np.int64)  # m = h_d - lb

    # (supernode, row) -> global position, for rowpos resolution
    sup_of_row = np.repeat(np.arange(nsuper, dtype=np.int64), np.diff(rptr))
    row_keys = sup_of_row * np.int64(n + 1) + rows.astype(np.int64)

    # ---------------- per-level work vectors for segmentation ---------
    pair_cnt = np.bincount(plev, minlength=nlev) if nlev else np.zeros(0)
    fin_cnt = np.bincount(lev, minlength=nlev) if nlev else np.zeros(0)
    pair_vol = np.bincount(plev, weights=hm.astype(np.float64),
                           minlength=nlev) if nlev else np.zeros(0)
    segs = segment_levels(np.stack(
        [pair_cnt, fin_cnt, pair_vol / 64.0], axis=1)) if nlev else []

    # pre-group pairs and supernodes by level
    pair_order = np.argsort(plev, kind="stable")
    pair_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(pair_cnt, out=pair_off[1:])
    sn_order = np.argsort(lev, kind="stable")
    sn_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(fin_cnt, out=sn_off[1:])

    dummy = layout.pool_size - 1

    segments: list[SupSegment] = []
    for (t0, t1) in segs:
        T = t1 - t0
        # ---- update buckets: key (K, M, Q) --------------------------
        buckets: dict[tuple[int, int, int], list[list[int]]] = {}
        for t in range(t0, t1):
            for p in pair_order[pair_off[t]:pair_off[t + 1]]:
                d = dd[p]
                key = (int(wpad[d]), int(_pow2ceil(hm[p])),
                       int(min(128, _pow2ceil(qq[p]))))
                buckets.setdefault(key, [[] for _ in range(T)])[t - t0].append(int(p))
        upd_buckets = []
        for (K, M, Q), steps in sorted(buckets.items()):
            P = max(len(sl) for sl in steps)
            a_start = np.zeros((T, P), dtype=np.int32)
            rowpos = np.full((T, P, M), -1, dtype=np.int32)
            colpos = np.full((T, P, Q), -1, dtype=np.int32)
            dstbase = np.full((T, P), dummy, dtype=np.int32)
            wsarr = np.ones((T, P), dtype=np.int32)
            for t, sl in enumerate(steps):
                for k, p in enumerate(sl):
                    d, s = int(dd[p]), int(ss[p])
                    m, q = int(hm[p]), int(qq[p])
                    a_start[t, k] = poff[d] + lb[p] * wpad[d]
                    rseg = rows[rptr[d] + lb[p]:rptr[d + 1]].astype(np.int64)
                    pos = np.searchsorted(
                        row_keys, s * np.int64(n + 1) + rseg)
                    assert np.all(rows[pos] == rseg), \
                        "supernodal subset property violated"
                    rowpos[t, k, :m] = pos - rptr[s]
                    colpos[t, k, :q] = rseg[:q] - sptr[s]
                    dstbase[t, k] = poff[s]
                    wsarr[t, k] = wpad[s]
            upd_buckets.append(UpdBucket(K=K, M=M, Q=Q, a_start=a_start,
                                         rowpos=rowpos, colpos=colpos,
                                         dstbase=dstbase, ws=wsarr))
        # ---- finalize buckets: key (Ws, H) --------------------------
        fbuckets: dict[tuple[int, int], list[list[int]]] = {}
        for t in range(t0, t1):
            for s in sn_order[sn_off[t]:sn_off[t + 1]]:
                h = int(rptr[s + 1] - rptr[s])
                key = (int(wpad[s]), int(max(wpad[s], _pow2ceil(h))))
                fbuckets.setdefault(key, [[] for _ in range(T)])[t - t0].append(int(s))
        fin_buckets = []
        for (Ws, H), steps in sorted(fbuckets.items()):
            P = max(len(sl) for sl in steps)
            base = np.full((T, P), dummy, dtype=np.int32)
            w = np.zeros((T, P), dtype=np.int32)
            h = np.zeros((T, P), dtype=np.int32)
            colsar = np.full((T, P, Ws), n, dtype=np.int32)
            rowsar = np.full((T, P, H), n, dtype=np.int32)
            for t, sl in enumerate(steps):
                for k, s in enumerate(sl):
                    j1, j2 = int(sptr[s]), int(sptr[s + 1])
                    hh = int(rptr[s + 1] - rptr[s])
                    base[t, k] = poff[s]
                    w[t, k] = j2 - j1
                    h[t, k] = hh
                    colsar[t, k, :j2 - j1] = np.arange(j1, j2)
                    rowsar[t, k, :hh] = rows[rptr[s]:rptr[s + 1]]
            fin_buckets.append(FinBucket(Ws=Ws, H=H, base=base, w=w, h=h,
                                         cols=colsar, rows=rowsar))
        segments.append(SupSegment(nsteps=T, upd=upd_buckets,
                                   fin=fin_buckets))

    cc64 = cc.astype(np.float64)
    flops = float(np.sum(cc64 * cc64))
    return SupernodalPlan(n=n, layout=layout, lev=lev, nlev=nlev,
                          segments=segments, flops=flops)
