"""Supernodal execution plan: the inspector -> batched-executor contract.

Replaces the reference's LBC scheduler (InspectionLevel_06.h:18
``getCoarseLevelSet_6``) with the TPU-native mapping (SURVEY §7C):

* wavefront levels of the supernodal etree = sequential steps;
* within a level, **update pairs** (source panel d -> target panel s,
  reference executor loop parallel_PB_Cholesky_05.h:117-197) are row-chunked
  and bucketed into a few padded tile classes, each executed as one batched
  MXU einsum; **panel finalizations** (dpotrf+dtrsm, :204-218) are bucketed
  by (width class, height class) and run as batched cholesky +
  triangular_solve;
* levels are grouped into contiguous segments (ops/simplicial.py
  ``segment_levels``) so each segment is one ``lax.scan`` — compile cost
  O(#segments x #buckets);
* the contribution **scatter is eliminated**: panels are laid out in the
  pool level-major, so each level's targets form one contiguous window;
  contributions are sorted by destination with a host-precomputed static
  permutation, reduced by ``cumsum`` + boundary gathers, and applied with
  one dynamic-slice subtraction.  This replaces both the reference's
  ``omp atomic`` scatter (SURVEY P7) and XLA's element-serialized TPU
  scatter with bandwidth-bound gathers and a parallel prefix sum.

An update pair exploits two structural facts (the reference's lb/ub overlap
scan, parallel_PB_Cholesky_05.h:137-149): the rows of d landing in s's
columns are one contiguous slice [lb, lb+q) of d's row list, and every row
of d at or below that slice appears in s's row list (supernodal subset
property).  With A = rows [lb, h_d) of d's stored panel and B = A[:q],
C = A @ B^T is exactly the dsyrk+dgemm contribution.  A's rows are split
greedily into chunks from ``_CHUNK_CLASSES`` so padding stays < 2 x true
work while the number of distinct batch shapes stays small.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from parsy_bench_tpu.core.csc import CSC
from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.ops.simplicial import segment_levels
from parsy_bench_tpu.symbolic.etree import tree_levels
from parsy_bench_tpu.symbolic.supernodes import (
    BCSCLayout, build_layout, build_partition)

#: greedy row-chunk classes for update tiles (descending)
_CHUNK_CLASSES = (512, 128, 32, 8)
#: sentinel destination for padded contribution lanes (sorts last)
_PAD_DST = np.int64(1) << 62


def _ladder_ceil(x: int, base: int, factor: int = 4) -> int:
    """Smallest base * factor^k >= x (coarse class ladder)."""
    c = base
    while c < x:
        c *= factor
    return c


def _chunk_sizes(m: int) -> list[int]:
    """Greedy split of m rows into _CHUNK_CLASSES chunks (last padded up
    to the smallest class)."""
    out = []
    left = m
    for c in _CHUNK_CLASSES:
        while left >= c:
            out.append(c)
            left -= c
    if left > 0:
        out.append(_CHUNK_CLASSES[-1])
    return out


@dataclasses.dataclass
class UpdBucket:
    """Padded batch of update chunks with identical tile classes for one
    segment.  Arrays lead with (shard, step) axes (G shards, T steps,
    P chunks/step/shard); G=1 when unsharded."""
    K: int               # stored width class of the source panel (= stride)
    Mc: int              # chunk row count
    Q: int               # padded overlap width (<= 128)
    a_start: np.ndarray  # (G, T, P) int32 pool index of the chunk's 1st row
    b_start: np.ndarray  # (G, T, P) int32 pool index of the pair's B block


@dataclasses.dataclass
class FinBucket:
    """Padded batch of panel finalizations (potrf + trsm) for one segment."""
    Ws: int              # stored width class
    H: int               # padded panel height
    base: np.ndarray     # (T, P) int32 pool offset; pad -> dummy slot
    w: np.ndarray        # (T, P) int32 logical width; 0 for padding
    h: np.ndarray        # (T, P) int32 logical height
    cols: np.ndarray     # (T, P, Ws) int32 global column ids; pad -> n
    rows: np.ndarray     # (T, P, H) int32 global row ids; pad -> n


@dataclasses.dataclass
class SupSegment:
    nsteps: int
    upd: list[UpdBucket]
    fin: list[FinBucket]
    V: int               # contribution-stream length per step per shard
    W: int               # padded level-window length
    perm: np.ndarray     # (G, T, V) int32 sort-by-destination permutation
    wstart: np.ndarray   # (G, T, W) int32 cumsum range start per window slot
    wend: np.ndarray     # (G, T, W) int32 cumsum range end per window slot
    lo: np.ndarray       # (T,) int32 pool offset of the level window


@dataclasses.dataclass
class SupernodalPlan:
    n: int
    layout: BCSCLayout
    lev: np.ndarray
    nlev: int
    segments: list[SupSegment]
    flops: float
    window_slack: int    # extra zero slots appended to the pool

    @property
    def pool_size(self) -> int:
        return self.layout.pool_size + self.window_slack


def _merge_buckets(buckets: dict, max_buckets: int, compatible, volume):
    """Fold small buckets into compatible larger-class buckets in place
    until at most ``max_buckets`` remain (compile-shape cap)."""
    while len(buckets) > max_buckets:
        cnts = {k: sum(len(sl) for sl in v) for k, v in buckets.items()}
        order = sorted(buckets, key=lambda k: volume(k, cnts[k]))
        merged = False
        for small in order:
            targets = [k for k in buckets
                       if k != small and compatible(small, k)]
            if not targets:
                continue
            tgt = min(targets, key=lambda k: volume(k, cnts[small]))
            for tl, sl in zip(buckets[tgt], buckets[small]):
                tl.extend(sl)
            del buckets[small]
            merged = True
            break
        if not merged:
            break


def _emit_pairs(layout: BCSCLayout):
    """All update pairs (d, s, lb, q) from the supernodal row patterns."""
    part = layout.part
    rptr, rows = layout.rptr, layout.rows
    col2sup = part.col2sup
    d_list, s_list, lb_list, q_list = [], [], [], []
    for d in range(part.nsuper):
        r0, r1 = int(rptr[d]), int(rptr[d + 1])
        w = int(part.sptr[d + 1] - part.sptr[d])
        below = rows[r0 + w:r1]
        if len(below) == 0:
            continue
        tgt = col2sup[below]
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
    """Inspector: partition + level-major layout + batched step tables."""
    config = config or SolverConfig()
    part = build_partition(a, parent, cc, config.nrelax, config.zrelax,
                           config.max_supernode_width)
    lev = tree_levels(part.sparent)
    nlev = int(lev.max(initial=-1)) + 1
    # level-major pool layout -> per-level contiguous target windows
    panel_order = np.lexsort((np.arange(part.nsuper), lev))
    layout = build_layout(lpat, a, part, config.width_classes,
                          config.height_unit, panel_order=panel_order)
    n = a.n
    nsuper = part.nsuper
    rptr, rows, poff = layout.rptr, layout.rows, layout.poff
    wpad, sptr = layout.wpad, part.sptr
    psize = (layout.hpad * layout.wpad).astype(np.int64)

    # per-level windows [wlo, whi) in the pool
    wlo = np.full(nlev, np.iinfo(np.int64).max, dtype=np.int64)
    whi = np.zeros(nlev, dtype=np.int64)
    for s in range(nsuper):
        t = lev[s]
        wlo[t] = min(wlo[t], poff[s])
        whi[t] = max(whi[t], poff[s] + psize[s])
    if nlev:
        wlo = np.minimum(wlo, whi)  # empty levels

    # ---------------- update pairs ------------------------------------
    dd, ss, lb, qq = _emit_pairs(layout)
    plev = lev[ss] if len(ss) else np.empty(0, dtype=np.int64)
    hm = (rptr[dd + 1] - rptr[dd] - lb).astype(np.int64)

    sup_of_row = np.repeat(np.arange(nsuper, dtype=np.int64), np.diff(rptr))
    row_keys = sup_of_row * np.int64(n + 1) + rows.astype(np.int64)

    pair_cnt = np.bincount(plev, minlength=nlev) if nlev else np.zeros(0)
    fin_cnt = np.bincount(lev, minlength=nlev) if nlev else np.zeros(0)
    pair_vol = np.bincount(plev, weights=hm.astype(np.float64),
                           minlength=nlev) if nlev else np.zeros(0)
    win_sz = (whi - wlo).astype(np.float64) if nlev else np.zeros(0)
    segs = segment_levels(np.stack(
        [pair_cnt, fin_cnt, pair_vol / 64.0, win_sz / 256.0], axis=1),
        alpha=1.6, slack=8.0) if nlev else []

    pair_order = np.argsort(plev, kind="stable")
    pair_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(pair_cnt, out=pair_off[1:])
    sn_order = np.argsort(lev, kind="stable")
    sn_off = np.zeros(nlev + 1, dtype=np.int64)
    np.cumsum(fin_cnt, out=sn_off[1:])

    dummy = layout.pool_size - 1

    segments: list[SupSegment] = []
    max_W = 0
    for (t0, t1) in segs:
        T = t1 - t0
        # ---- chunked update buckets: key (K, Mc, Q) -----------------
        # each entry: (a_start, b_start, dst_block (Mc, Q) int64)
        buckets: dict[tuple[int, int, int], list[list[tuple]]] = {}
        for t in range(t0, t1):
            for p in pair_order[pair_off[t]:pair_off[t + 1]]:
                d, s = int(dd[p]), int(ss[p])
                m, q = int(hm[p]), int(qq[p])
                K = int(wpad[d])
                Ws = int(wpad[s])
                Q = min(128, _ladder_ceil(q, 8))
                rseg = rows[rptr[d] + lb[p]:rptr[d + 1]].astype(np.int64)
                pos = np.searchsorted(row_keys, s * np.int64(n + 1) + rseg)
                assert np.all(rows[pos] == rseg), \
                    "supernodal subset property violated"
                rowpos = (pos - rptr[s]).astype(np.int64)
                colpos = (rseg[:q] - sptr[s]).astype(np.int64)
                cdst = np.full(Q, _PAD_DST, dtype=np.int64)
                cdst[:q] = poff[s] + colpos
                b0 = int(poff[d] + lb[p] * K)
                off = 0
                for csz in _chunk_sizes(m):
                    rdst = np.full(csz, _PAD_DST, dtype=np.int64)
                    nr = min(csz, m - off)
                    rdst[:nr] = rowpos[off:off + nr] * Ws
                    dst = rdst[:, None] + cdst[None, :]  # (csz, Q)
                    dst[dst >= _PAD_DST] = _PAD_DST
                    buckets.setdefault((K, csz, Q),
                                       [[] for _ in range(T)])[t - t0].append(
                        (b0 + off * K, b0, dst))
                    off += csz
        _merge_buckets(
            buckets, max_buckets=10,
            compatible=lambda a_, b_: (a_[0] == b_[0] and a_[1] == b_[1]
                                       and a_[2] <= b_[2]),
            volume=lambda key, cnt: cnt * key[1] * (key[0] + key[2]))

        # round-robin chunk assignment to G shards (the reference's
        # w-partition owner axis, SURVEY P2; G=1 unsharded)
        G = max(1, int(config.num_partitions))
        sharded: dict[tuple, list[list[list[tuple]]]] = {
            key: [[[] for _ in range(T)] for _ in range(G)]
            for key in buckets}
        for key, steps in buckets.items():
            for t, sl in enumerate(steps):
                for kk, entry in enumerate(sl):
                    sharded[key][kk % G][t].append(entry)

        upd_buckets = []
        bkeys = sorted(buckets)
        widths = {}
        for key in bkeys:
            K, Mc, Q = key
            P = max(len(sl) for g in sharded[key] for sl in g)
            P = max(P, 1)
            widths[key] = P
            a_start = np.zeros((G, T, P), dtype=np.int32)
            b_start = np.zeros((G, T, P), dtype=np.int32)
            for g in range(G):
                for t, sl in enumerate(sharded[key][g]):
                    for kk, (astart, bstart, _) in enumerate(sl):
                        a_start[g, t, kk] = astart
                        b_start[g, t, kk] = bstart
            upd_buckets.append(UpdBucket(K=K, Mc=Mc, Q=Q, a_start=a_start,
                                         b_start=b_start))
        # per-shard dst stream in executor concat order:
        # for each bucket (sorted), C.reshape(P*Mc*Q)
        V = sum(widths[k] * k[1] * k[2] for k in bkeys)
        dsts = np.full((G, T, V), _PAD_DST, dtype=np.int64)
        off = 0
        for key in bkeys:
            K, Mc, Q = key
            width = widths[key] * Mc * Q
            for g in range(G):
                for t, sl in enumerate(sharded[key][g]):
                    for kk, (_, _, dstblk) in enumerate(sl):
                        base = off + kk * Mc * Q
                        if dstblk.shape != (Mc, Q):  # merged, smaller Q
                            padded = np.full((Mc, Q), _PAD_DST,
                                             dtype=np.int64)
                            padded[:, :dstblk.shape[1]] = dstblk
                            dstblk = padded
                        dsts[g, t, base:base + Mc * Q] = dstblk.reshape(-1)
            off += width
        assert off == V

        # sort-by-destination permutation and window boundary tables
        Wn = int(max((whi[t] - wlo[t] for t in range(t0, t1)), default=0))
        max_W = max(max_W, Wn)
        perm = np.zeros((G, T, V), dtype=np.int32)
        wstart = np.zeros((G, T, Wn), dtype=np.int32)
        wend = np.zeros((G, T, Wn), dtype=np.int32)
        lo = np.zeros(T, dtype=np.int32)
        for t in range(T):
            lo[t] = wlo[t0 + t]
            span = np.arange(wlo[t0 + t], wlo[t0 + t] + Wn, dtype=np.int64)
            for g in range(G):
                order = np.argsort(dsts[g, t], kind="stable")
                perm[g, t] = order.astype(np.int32)
                sd = dsts[g, t, order]
                wstart[g, t] = np.searchsorted(sd, span, side="left")
                wend[g, t] = np.searchsorted(sd, span, side="right")
        # ---- finalize buckets: key (Ws, H) --------------------------
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
        segments.append(SupSegment(nsteps=T, upd=upd_buckets,
                                   fin=fin_buckets, V=V, W=Wn, perm=perm,
                                   wstart=wstart, wend=wend, lo=lo))

    cc64 = cc.astype(np.float64)
    flops = float(np.sum(cc64 * cc64))
    return SupernodalPlan(n=n, layout=layout, lev=lev, nlev=nlev,
                          segments=segments, flops=flops,
                          window_slack=max_W + 8)
