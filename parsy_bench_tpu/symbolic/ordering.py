"""Fill-reducing orderings.

Reference: LSparsity.h:446-621 selects GIVEN / SCOTCH / METIS node-ND / AMD.
Here the menu is:

* ``natural`` — identity;
* ``given``   — user permutation (reference GIVEN path, LSparsity.h:446);
* ``rcm``     — reverse Cuthill-McKee (scipy.csgraph) — bandwidth reducer;
* ``amd``     — minimum-degree class: native C++ AMD when built, otherwise
  SuperLU's MMD(A^T+A) via scipy.splu (reference AMD path, LSparsity.h:614);
* ``nd``      — geometric nested dissection using node coordinates (the
  METIS_NodeND stand-in, LSparsity.h:534-613; our synthetic generators carry
  coordinates, and METIS is not available in this environment).

All return ``perm`` with the convention **perm[new] = old**, i.e. the
reordered matrix is A(perm, perm).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from parsy_bench_tpu.core.csc import CSC, IDX
from parsy_bench_tpu.native import lib as _native


def compute_ordering(a: CSC, method: str = "amd",
                     given_perm=None) -> np.ndarray:
    n = a.n
    if method == "natural":
        return np.arange(n, dtype=IDX)
    if method == "given":
        perm = np.asarray(given_perm, dtype=IDX)
        check_permutation(perm, n)
        return perm
    full = a.symmetrize_from_lower().to_scipy() if a.is_lower() else a.to_scipy()
    if method == "rcm":
        return csgraph.reverse_cuthill_mckee(full.tocsr(), symmetric_mode=True
                                             ).astype(IDX)
    if method == "amd":
        if _native is not None and hasattr(_native, "amd_order"):
            return _native.amd_order(full)
        return _mmd_via_superlu(full)
    if method == "nd":
        if a.coords is None:
            # no geometry -> fall back to minimum degree
            return compute_ordering(a, "amd")
        return _geometric_nd(full, a.coords)
    raise ValueError(f"unknown ordering method {method!r}")


def check_permutation(perm: np.ndarray, n: int) -> None:
    """Bijection check (reference: LSparsity.h:626-636)."""
    if len(perm) != n or not np.array_equal(np.sort(perm), np.arange(n)):
        raise ValueError("perm is not a permutation of 0..n-1")


def _mmd_via_superlu(full: sp.spmatrix) -> np.ndarray:
    """Multiple-minimum-degree on A^T+A through SuperLU.  Used only as the
    ordering oracle; the numeric LU it performs as a side effect is wasted
    host work, which is why the native AMD replaces this path."""
    from scipy.sparse.linalg import splu
    n = full.shape[0]
    try:
        lu = splu(full.tocsc(), permc_spec="MMD_AT_PLUS_A",
                  options=dict(SymmetricMode=True, DiagPivotThresh=0.0))
        # SuperLU's perm_c maps old -> new; our contract is perm[new] = old,
        # so A(perm, perm) is the reordered matrix — invert it.
        perm = np.argsort(lu.perm_c).astype(IDX)
        check_permutation(perm, n)
        return perm
    except Exception:
        return csgraph.reverse_cuthill_mckee(full.tocsr(),
                                             symmetric_mode=True).astype(IDX)


def _geometric_nd(full: sp.spmatrix, coords: np.ndarray,
                  leaf_size: int = 48) -> np.ndarray:
    """Recursive coordinate bisection with vertex separators.

    At each step split the node set at the median of its widest coordinate;
    the separator is the boundary layer of the left part (nodes with a
    neighbour on the right).  Children are ordered before the separator so
    elimination proceeds leaves -> separators, the defining property of
    nested dissection.
    """
    adj = full.tocsr()
    n = adj.shape[0]
    out = np.empty(n, dtype=IDX)
    pos = 0

    # explicit stack with post-typed emission: each frame is (nodes, phase)
    stack: list[np.ndarray] = [np.arange(n, dtype=np.int64)]
    pending_seps: list[np.ndarray] = []

    def order_leaf(nodes: np.ndarray) -> np.ndarray:
        if len(nodes) <= 1:
            return nodes
        sub = adj[nodes][:, nodes]
        local = csgraph.reverse_cuthill_mckee(sub.tocsr(), symmetric_mode=True)
        return nodes[local]

    def rec(nodes: np.ndarray) -> list[np.ndarray]:
        """returns ordered list of node arrays (concatenation = ordering)"""
        if len(nodes) <= leaf_size:
            return [order_leaf(nodes)]
        c = coords[nodes]
        spread = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(spread))
        med = np.median(c[:, axis])
        left_mask = c[:, axis] <= med
        if left_mask.all() or not left_mask.any():
            left_mask = c[:, axis] < med
            if left_mask.all() or not left_mask.any():
                return [order_leaf(nodes)]
        left = nodes[left_mask]
        right = nodes[~left_mask]
        # separator: left nodes adjacent to right nodes
        in_right = np.zeros(adj.shape[0], dtype=bool)
        in_right[right] = True
        sub = adj[left]
        touches = np.zeros(len(left), dtype=bool)
        indptr, indices = sub.indptr, sub.indices
        touches = np.add.reduceat(in_right[indices].astype(np.int64),
                                  indptr[:-1]) > 0
        touches[np.diff(indptr) == 0] = False
        sep = left[touches]
        left = left[~touches]
        parts: list[np.ndarray] = []
        if len(left):
            parts += rec(left)
        if len(right):
            parts += rec(right)
        parts.append(sep)
        return parts

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        parts = rec(np.arange(n, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old)
    perm = np.concatenate([p for p in parts if len(p)]).astype(IDX)
    check_permutation(perm, n)
    return perm
