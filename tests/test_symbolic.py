"""Symbolic-engine tests: etree / postorder / counts / pattern / reach /
orderings, checked against brute-force dense oracles (SURVEY §4: the new
framework must create the unit-test pyramid the reference lacks)."""
import numpy as np
import pytest
import scipy.sparse as sp

from parsy_bench_tpu.core import generate
from parsy_bench_tpu.core.csc import CSC
from parsy_bench_tpu.symbolic import (
    col_counts, compute_ordering, ereach, etree, postorder, reach,
    subtree_sizes, symbolic_pattern, tree_children, tree_height, tree_levels,
)
from parsy_bench_tpu.symbolic.etree import bucket_by_level, level_sets, tree_depths
from parsy_bench_tpu.symbolic.ordering import check_permutation


def dense_chol_pattern(a: CSC) -> np.ndarray:
    """Oracle: symbolic fill of L by the textbook recurrence
    struct(L[:, parent(k)]) >= struct(L[:, k]) \\ {k}: at step k the below-
    diagonal rows of column k are merged into the column of the first such
    row (no numeric cancellation assumed)."""
    pat = np.tril(a.symmetrize_from_lower().to_dense() != 0)
    n = a.n
    for k in range(n):
        rows = np.nonzero(pat[:, k])[0]
        rows = rows[rows > k]
        if len(rows):
            p = rows[0]
            pat[rows[1:], p] = True
    return pat


MATS = ["tiny", "bcsstk14ish", "ecology_small"]


@pytest.mark.parametrize("name", MATS)
def test_etree_matches_pattern_parents(name):
    a = generate.SUITE[name]()
    parent = etree(a)
    lpat = symbolic_pattern(a, parent)
    # invariant: parent[j] = min row > j in column j of L (Liu's theorem)
    for j in range(a.n):
        rows = lpat.indices[lpat.indptr[j]:lpat.indptr[j + 1]]
        off = rows[rows > j]
        if len(off):
            assert parent[j] == off.min()
        else:
            assert parent[j] == -1


@pytest.mark.parametrize("name", MATS)
def test_symbolic_pattern_vs_dense_oracle(name):
    a = generate.SUITE[name]()
    if a.n > 700:
        a = generate.SUITE["tiny"]()
    parent = etree(a)
    lpat = symbolic_pattern(a, parent).toarray() != 0
    oracle = dense_chol_pattern(a)
    assert np.array_equal(lpat, oracle)


@pytest.mark.parametrize("name", MATS)
def test_col_counts_match_pattern(name):
    a = generate.SUITE[name]()
    parent = etree(a)
    cc = col_counts(a, parent)
    lpat = symbolic_pattern(a, parent)
    assert np.array_equal(cc, np.diff(lpat.indptr))


def test_postorder_is_valid():
    a = generate.SUITE["bcsstk14ish"]()
    parent = etree(a)
    post = postorder(parent)
    # every child appears before its parent; it's a permutation
    check_permutation(post, a.n)
    posinv = np.empty(a.n, dtype=np.int64)
    posinv[post] = np.arange(a.n)
    for j in range(a.n):
        if parent[j] >= 0:
            assert posinv[j] < posinv[parent[j]]
    # weighted variant also valid
    post_w = postorder(parent, weights=np.random.default_rng(0).uniform(1, 2, a.n))
    check_permutation(post_w, a.n)
    posinv[post_w] = np.arange(a.n)
    for j in range(a.n):
        if parent[j] >= 0:
            assert posinv[j] < posinv[parent[j]]


def test_tree_utilities():
    #       5
    #      / \
    #     3   4
    #    / \   \
    #   0  1    2
    parent = np.array([3, 3, 4, 5, 5, -1], dtype=np.int32)
    assert np.array_equal(tree_depths(parent), [2, 2, 2, 1, 1, 0])
    assert np.array_equal(tree_levels(parent), [0, 0, 0, 1, 1, 2])
    assert tree_height(parent) == 3
    assert np.array_equal(subtree_sizes(parent), [1, 1, 1, 3, 2, 6])
    childptr, children, roots = tree_children(parent)
    assert np.array_equal(roots, [5])
    assert set(children[childptr[3]:childptr[4]]) == {0, 1}
    assert set(children[childptr[5]:childptr[6]]) == {3, 4}
    ptr, nodes = level_sets(parent)
    assert np.array_equal(nodes[ptr[0]:ptr[1]], [0, 1, 2])
    assert np.array_equal(nodes[ptr[2]:ptr[3]], [5])


def test_levels_respect_dependencies():
    a = generate.SUITE["ecology_small"]()
    parent = etree(a)
    lev = tree_levels(parent)
    ok = parent >= 0
    assert np.all(lev[parent[ok]] > lev[ok])


def test_ereach_matches_pattern_row():
    a = generate.SUITE["tiny"]()
    parent = etree(a)
    lpat = symbolic_pattern(a, parent).tocsr()
    for k in [0, a.n // 2, a.n - 1]:
        row = lpat.indices[lpat.indptr[k]:lpat.indptr[k + 1]]
        expect = np.sort(row[row < k])
        got = ereach(a, parent, k)
        assert np.array_equal(got, expect), k


def test_reach_closure():
    a = generate.SUITE["tiny"]()
    parent = etree(a)
    lpat = symbolic_pattern(a, parent)
    got = set(reach(lpat, np.array([2, 5])))
    # brute force: solve with sparse rhs, nonzeros of x = reach set
    n = a.n
    lo = np.tril(a.symmetrize_from_lower().to_dense())
    lnum = np.linalg.cholesky(a.symmetrize_from_lower().to_dense())
    b = np.zeros(n)
    b[[2, 5]] = 1.0
    x = np.linalg.solve(lnum, b)
    nz = set(np.nonzero(np.abs(x) > 1e-12)[0])
    assert nz <= got  # reach is structural superset of numeric nonzeros
    assert {2, 5} <= got


@pytest.mark.parametrize("method", ["natural", "rcm", "amd", "nd"])
def test_orderings_are_permutations_and_reduce_fill(method):
    a = generate.SUITE["ecology_small"]()
    perm = compute_ordering(a, method)
    check_permutation(perm, a.n)
    ap = a.permute(perm)
    cc = col_counts(ap, etree(ap))
    fill = cc.sum()
    cc0 = col_counts(a, etree(a))
    if method in ("amd", "nd"):
        assert fill < cc0.sum() * 1.05  # fill-reducers shouldn't blow up fill


def test_given_ordering():
    a = generate.SUITE["tiny"]()
    perm = np.random.default_rng(0).permutation(a.n)
    got = compute_ordering(a, "given", given_perm=perm)
    assert np.array_equal(got, perm)
    with pytest.raises(ValueError):
        compute_ordering(a, "given", given_perm=np.zeros(a.n, dtype=int))
