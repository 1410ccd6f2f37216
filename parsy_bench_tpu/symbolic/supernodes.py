"""Supernode detection, relaxed amalgamation, and the BCSC factor layout.

Reference: cholesky/Inspection_BlockC.h ``super_symbolic2`` — fundamental
supernodes from the postordered etree + column counts (:315-328), supernodal
etree (:353), CHOLMOD-style relaxed amalgamation with (nrelax, zrelax)
(:370-483), and the supernodal row pattern Ls (:684-752).

TPU-first differences from the reference:

* supernodes wider than ``max_width`` are **split into panel chains** so
  every stored panel fits one MXU-width class — the huge root separator
  becomes a chain of 128-column panels whose mutual updates are dense
  GEMMs, subsuming the reference's "last level with multithreaded BLAS"
  (parallel_PB_Cholesky_05.h:271) by construction;
* panels are stored **row-major padded** to (height rounded to 8, width
  rounded to a class in ``width_classes``) in one flat pool, so numeric
  updates are contiguous slices and zero padding participates harmlessly
  in GEMMs.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from parsy_bench_tpu.core.csc import CSC, IDX


@dataclasses.dataclass
class SupernodePartition:
    """Column partition into supernodes (before layout)."""
    nsuper: int
    sptr: np.ndarray      # (nsuper+1,) first column of each supernode
    col2sup: np.ndarray   # (n,) supernode of each column
    sparent: np.ndarray   # (nsuper,) supernodal etree (-1 = root)

    @property
    def widths(self) -> np.ndarray:
        return np.diff(self.sptr)


def fundamental_supernodes(parent: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Start flags of fundamental supernodes.

    Column j extends the supernode of j-1 iff parent[j-1] == j,
    cc[j-1] == cc[j] + 1, and j has exactly one child in the etree
    (the CHOLMOD rule, reference Inspection_BlockC.h:315-328).  Requires a
    postordered etree (supernode columns must be contiguous).
    """
    n = len(parent)
    nchild = np.zeros(n + 1, dtype=np.int64)
    np.add.at(nchild, parent, 1)  # parent == -1 accumulates at [-1]
    start = np.ones(n, dtype=bool)
    j = np.arange(1, n)
    merge = (parent[j - 1] == j) & (cc[j - 1] == cc[j] + 1) & (nchild[j] == 1)
    start[1:] = ~merge
    return start


def _supernodes_from_starts(start: np.ndarray,
                            parent: np.ndarray) -> SupernodePartition:
    n = len(start)
    sptr = np.concatenate([np.nonzero(start)[0], [n]]).astype(np.int64)
    nsuper = len(sptr) - 1
    col2sup = np.cumsum(start) - 1
    last = sptr[1:] - 1
    pcol = parent[last]
    sparent = np.where(pcol >= 0, col2sup[np.clip(pcol, 0, n - 1)], -1)
    return SupernodePartition(nsuper, sptr,
                              col2sup.astype(IDX), sparent.astype(IDX))


def relaxed_amalgamation(parent: np.ndarray, cc: np.ndarray,
                         start: np.ndarray,
                         nrelax=(4, 16, 48),
                         zrelax=(0.8, 0.1, 0.05),
                         max_width: int = 128) -> np.ndarray:
    """Merge small supernodes into their parents when the induced explicit
    zeros stay below the CHOLMOD thresholds.

    Rule (reference Inspection_BlockC.h:466-469): merge child c into parent
    p (both become one supernode spanning their columns; only valid when
    c's columns are exactly adjacent to p's) when the merged width w
    satisfies w <= nrelax[0], or the fraction of explicit zeros z in the
    merged panel is <= zrelax[k] for the applicable size bracket.

    Works bottom-up over the (postordered) column order; returns new start
    flags.  ``cc`` lets us track per-supernode nonzeros exactly:
    zeros(s) = nrows(s) * width(s) - sum(cc[j] + (j - j1) for j in s)
    where nrows(s) = cc[j1] + 0 ... we track nrows = cc[first col] + width-1
    under the subset property.
    """
    n = len(parent)
    part = _supernodes_from_starts(start, parent)
    sptr, sparent = part.sptr, part.sparent
    nsuper = part.nsuper

    # per supernode: width, rows below = cc[first] (incl. diagonal of first)
    width = np.diff(sptr).astype(np.int64)
    # number of rows of the supernode panel (= pattern of its first column)
    nrows = cc[sptr[:-1]].astype(np.int64)
    # explicit zeros currently in the panel
    zeros = np.zeros(nsuper, dtype=np.float64)
    for s in range(nsuper):
        j1, j2 = sptr[s], sptr[s + 1]
        zeros[s] = nrows[s] * width[s] - np.sum(
            cc[j1:j2] + np.arange(j2 - j1))

    merged_into = np.arange(nsuper)  # union-find to the surviving root

    def find(s):
        while merged_into[s] != s:
            merged_into[s] = merged_into[merged_into[s]]
            s = merged_into[s]
        return s

    # bottom-up: children have smaller indices than parents (postorder)
    for s in range(nsuper - 1):
        p = sparent[s]
        if p < 0:
            continue
        rs, rp = find(s), find(p)
        if rs == rp:
            continue
        # adjacency: child's columns must end where parent's begin
        if sptr[rs + 1] != sptr[rp]:
            continue
        w = width[rs] + width[rp]
        if w > max_width:
            continue
        # merged panel: parent's rows become child's tail rows; child keeps
        # its own rows.  nrows(merged) = nrows(child) + (rows of parent not
        # already in child's pattern).  Under the subset property the
        # parent's rows are a subset of the child's below-diagonal rows
        # union parent's columns, so nrows(merged) = max(nrows[rs],
        # width[rs] + nrows[rp]).
        nr = max(nrows[rs], width[rs] + nrows[rp])
        total = nr * w - (w * (w - 1)) // 2
        filled = (nrows[rs] * width[rs] - (width[rs] * (width[rs] - 1)) // 2
                  - zeros[rs]) + (nrows[rp] * width[rp]
                                  - (width[rp] * (width[rp] - 1)) // 2
                                  - zeros[rp])
        z = 1.0 - filled / max(total, 1)
        ok = (w <= nrelax[0]
              or (w <= nrelax[1] and z <= zrelax[0])
              or (w <= nrelax[2] and z <= zrelax[1])
              or z <= zrelax[2])
        if not ok:
            continue
        # merge rs into rp, surviving root keeps child's first column
        merged_into[rp] = rs
        sptr_rs1 = sptr[rp + 1]  # merged supernode now spans to parent end
        width[rs] = w
        nrows[rs] = nr
        zeros[rs] = total - filled
        # extend: record by rewriting sptr of the surviving root's end
        sptr[rs + 1] = sptr_rs1  # note: only roots' entries are read below

    new_start = np.zeros(n, dtype=bool)
    for s in range(nsuper):
        if find(s) == s:
            new_start[sptr[s]] = True
    new_start[0] = True
    return new_start


def split_wide(start: np.ndarray, max_width: int) -> np.ndarray:
    """Split supernodes wider than ``max_width`` into panel chains."""
    n = len(start)
    starts = np.nonzero(start)[0]
    ends = np.concatenate([starts[1:], [n]])
    out = start.copy()
    for j1, j2 in zip(starts, ends):
        w = j2 - j1
        if w > max_width:
            out[j1 + max_width:j2:max_width] = True
    return out


def build_partition(a: CSC, parent: np.ndarray, cc: np.ndarray,
                    nrelax=(4, 16, 48), zrelax=(0.8, 0.1, 0.05),
                    max_width: int = 128) -> SupernodePartition:
    """Full pipeline: fundamental SNs -> relaxed amalgamation -> width split.

    ``a`` must already be permuted by (fill-reducing ∘ postorder), so the
    etree is topologically ordered with contiguous children.
    """
    start = fundamental_supernodes(parent, cc)
    start = relaxed_amalgamation(parent, cc, start, nrelax, zrelax, max_width)
    start = split_wide(start, max_width)
    return _supernodes_from_starts(start, parent)


# --------------------------------------------------------------- layout

@dataclasses.dataclass
class BCSCLayout:
    """Padded panel-pool layout of the supernodal factor.

    Panel of supernode s: shape (hpad[s], wpad[s]) row-major at pool offset
    ``poff[s]``; logical entry L[rows[rptr[s]+r], sptr[s]+c] lives at
    ``poff[s] + r * wpad[s] + c``.  The reference's BCSC (common/def.h:117)
    stores the same data column-major unpadded.
    """
    part: SupernodePartition
    rptr: np.ndarray      # (nsuper+1,) row-pattern offsets
    rows: np.ndarray      # (sum h,) global row ids per supernode, ascending
    wpad: np.ndarray      # (nsuper,) padded (stored) width — a width class
    hpad: np.ndarray      # (nsuper,) padded height
    poff: np.ndarray      # (nsuper+1,) int64 pool offsets; poff[-1] = size+1
    a_map: np.ndarray     # (nnz(A),) pool position of each A entry
    l_map: np.ndarray     # (nnz(L),) pool position of each simplicial-L entry

    @property
    def pool_size(self) -> int:
        """Pool length including the trailing dummy padding slot."""
        return int(self.poff[-1])


def _width_class(w: int, classes) -> int:
    for c in classes:
        if w <= c:
            return c
    raise ValueError(f"width {w} exceeds largest class {classes[-1]}")


def build_layout(lpat: sp.csc_matrix, a: CSC, part: SupernodePartition,
                 width_classes=(8, 16, 32, 64, 128),
                 height_unit: int = 8,
                 panel_order: np.ndarray | None = None) -> BCSCLayout:
    """Compute the supernodal row pattern and padded pool layout.

    ``lpat`` is the simplicial factor pattern (from symbolic_pattern);
    supernode rows = union of its columns' patterns (reference builds the
    same Ls by row-subtree walks, Inspection_BlockC.h:684-752).

    ``panel_order`` (a permutation of supernode ids) sets the order panels
    are laid out in the pool; the scheduler passes level-major order so each
    wavefront level's target panels form one contiguous pool window (the
    scatter-free update trick in ops/supernodal.py).
    """
    n = lpat.shape[0]
    sptr, nsuper = part.sptr, part.nsuper
    lptr = lpat.indptr.astype(np.int64)
    lind = lpat.indices

    rows_per_s: list[np.ndarray] = []
    rptr = np.zeros(nsuper + 1, dtype=np.int64)
    wpad = np.empty(nsuper, dtype=np.int64)
    hpad = np.empty(nsuper, dtype=np.int64)
    for s in range(nsuper):
        j1, j2 = int(sptr[s]), int(sptr[s + 1])
        # union of column patterns; first column usually contains the rest
        seg = lind[lptr[j1]:lptr[j2]]
        u = np.unique(seg)
        # amalgamation guarantee: diagonal block rows j1..j2-1 all present
        missing = np.setdiff1d(np.arange(j1, j2, dtype=u.dtype), u,
                               assume_unique=True)
        if len(missing):
            u = np.union1d(u, missing)
        rows_per_s.append(u.astype(IDX))
        rptr[s + 1] = rptr[s] + len(u)
        w = j2 - j1
        wpad[s] = _width_class(w, width_classes)
        hpad[s] = -(-len(u) // height_unit) * height_unit
    rows = (np.concatenate(rows_per_s) if rows_per_s
            else np.empty(0, dtype=IDX))
    # pool offsets in panel_order (level-major when given)
    order = (np.arange(nsuper) if panel_order is None
             else np.asarray(panel_order))
    sizes = hpad * wpad
    poff = np.zeros(nsuper + 1, dtype=np.int64)
    cum = 0
    for s in order:
        poff[s] = cum
        cum += sizes[s]
    poff[-1] = cum
    # one extra dummy slot absorbs padded scatter lanes
    poff_final = poff.copy()
    poff_final[-1] += 1

    # vectorized (supernode, row) -> position: the flat ``rows`` array is
    # sorted under the key s * (n+1) + row, so one searchsorted resolves
    # every entry at once
    sup_of_row = np.repeat(np.arange(nsuper, dtype=np.int64), np.diff(rptr))
    row_keys = sup_of_row * np.int64(n + 1) + rows.astype(np.int64)

    def entry_pos(i: np.ndarray, j: np.ndarray) -> np.ndarray:
        """pool positions of entries (i >= j) given per-entry arrays."""
        s = part.col2sup[j].astype(np.int64)
        r = np.searchsorted(row_keys, s * np.int64(n + 1) + i)
        assert np.all(rows[r] == i), "entry outside supernodal pattern"
        return (poff[s] + (r - rptr[s]) * wpad[s]
                + (j - sptr[s])).astype(np.int64)

    acol = np.repeat(np.arange(n, dtype=np.int64), np.diff(a.indptr))
    a_map = entry_pos(a.indices.astype(np.int64), acol)
    lcol = np.repeat(np.arange(n, dtype=np.int64), np.diff(lptr))
    l_map = entry_pos(lind.astype(np.int64), lcol)
    return BCSCLayout(part=part, rptr=rptr, rows=rows, wpad=wpad, hpad=hpad,
                      poff=poff_final, a_map=a_map, l_map=l_map)
