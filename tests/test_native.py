"""Native C++ fast path must match the NumPy specification bit-for-bit.

The NumPy implementations in parsy_bench_tpu.symbolic are the spec; here we
run both paths on the same inputs and compare (SURVEY §4: unit tests the
reference lacks)."""
import numpy as np
import pytest

from parsy_bench_tpu.core import generate
from parsy_bench_tpu import symbolic
import importlib

_cc_mod = importlib.import_module("parsy_bench_tpu.symbolic.colcounts")
_etree_mod = importlib.import_module("parsy_bench_tpu.symbolic.etree")
from parsy_bench_tpu.native import lib as native_lib

pytestmark = pytest.mark.skipif(native_lib is None,
                                reason="native library failed to build")


@pytest.fixture(params=["tiny", "bcsstk14ish", "ecology_small"])
def mat(request):
    return generate.SUITE[request.param]()


def _with_lib(monkeypatch, lib):
    monkeypatch.setattr(_etree_mod, "_native", lib)
    monkeypatch.setattr(_cc_mod, "_native", lib)


def test_native_builds():
    assert native_lib is not None


def test_etree_matches(mat, monkeypatch):
    _with_lib(monkeypatch, None)
    ref = symbolic.etree(mat)
    _with_lib(monkeypatch, native_lib)
    got = symbolic.etree(mat)
    assert np.array_equal(ref, got)


def test_postorder_matches(mat, monkeypatch):
    _with_lib(monkeypatch, None)
    parent = symbolic.etree(mat)
    w = np.random.default_rng(0).uniform(1, 3, mat.n)
    ref = symbolic.postorder(parent)
    ref_w = symbolic.postorder(parent, weights=w)
    _with_lib(monkeypatch, native_lib)
    assert np.array_equal(symbolic.postorder(parent), ref)
    assert np.array_equal(symbolic.postorder(parent, weights=w), ref_w)


def test_tree_passes_match(mat, monkeypatch):
    _with_lib(monkeypatch, None)
    parent = symbolic.etree(mat)
    ref_lev = symbolic.tree_levels(parent)
    ref_dep = _etree_mod.tree_depths(parent)
    ref_sub = symbolic.subtree_sizes(parent)
    _with_lib(monkeypatch, native_lib)
    assert np.array_equal(symbolic.tree_levels(parent), ref_lev)
    assert np.array_equal(_etree_mod.tree_depths(parent), ref_dep)
    assert np.array_equal(symbolic.subtree_sizes(parent), ref_sub)


def test_colcounts_pattern_match(mat, monkeypatch):
    _with_lib(monkeypatch, None)
    parent = symbolic.etree(mat)
    ref_cc = symbolic.col_counts(mat, parent)
    ref_pat = symbolic.symbolic_pattern(mat, parent)
    _with_lib(monkeypatch, native_lib)
    assert np.array_equal(symbolic.col_counts(mat, parent), ref_cc)
    got_pat = symbolic.symbolic_pattern(mat, parent)
    assert (ref_pat != got_pat).nnz == 0


def test_amd_order_quality():
    """Native AMD (symbolic.cpp pbt_amd_order, reference AMD.h:298): valid
    permutation, and fill within 25% of the SuperLU-MMD oracle."""
    import numpy as np
    from parsy_bench_tpu.native import lib
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.symbolic.etree import etree
    from parsy_bench_tpu.symbolic.colcounts import col_counts
    from parsy_bench_tpu.symbolic.ordering import (_mmd_via_superlu,
                                                   check_permutation)
    for name in ["bcsstk14ish", "ecology_small", "apache_small"]:
        a = generate.SUITE[name]()
        full = a.symmetrize_from_lower().to_scipy().tocsc()
        perm = lib.amd_order(full)
        check_permutation(perm, a.n)

        def fill(p):
            ap = a.permute(p)
            return int(col_counts(ap, etree(ap)).sum())

        f_amd = fill(perm)
        f_mmd = fill(_mmd_via_superlu(full))
        assert f_amd <= 1.25 * f_mmd, (name, f_amd, f_mmd)


def test_native_relaxed_amalgamation_matches_python():
    """pbt_relaxed_amalgamation must match the NumPy specification
    bit-for-bit (same surviving merge roots) across matrices and
    threshold settings."""
    import numpy as np
    from parsy_bench_tpu.native import lib
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.symbolic import supernodes as sn
    from parsy_bench_tpu.symbolic.etree import etree, postorder
    from parsy_bench_tpu.symbolic.colcounts import col_counts
    for name in ["tiny", "bcsstk14ish", "ecology_small", "apache_small"]:
        a = generate.SUITE[name]()
        parent0 = etree(a)
        post = postorder(parent0, weights=col_counts(a, parent0))
        ap = a.permute(post)
        parent = etree(ap)
        cc = col_counts(ap, parent)
        start = sn.fundamental_supernodes(parent, cc)
        for nrelax, zrelax in [((4, 16, 48), (0.8, 0.1, 0.05)),
                               ((8, 32, 96), (0.9, 0.2, 0.1))]:
            got = sn.relaxed_amalgamation(parent, cc, start, nrelax,
                                          zrelax, 128)
            saved, sn._native = sn._native, None
            try:
                want = sn.relaxed_amalgamation(parent, cc, start, nrelax,
                                               zrelax, 128)
            finally:
                sn._native = saved
            assert np.array_equal(got, want), name


def test_native_supernodal_rows_matches_union():
    """pbt_supernodal_rows (etree row walk, the reference's subtree Ls
    construction) must equal the simplicial-pattern union specification
    exactly."""
    import numpy as np
    from parsy_bench_tpu.native import lib
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.symbolic import supernodes as sn
    from parsy_bench_tpu.symbolic.etree import etree, postorder, tree_levels
    from parsy_bench_tpu.symbolic.colcounts import (col_counts,
                                                    symbolic_pattern)
    for name in ["tiny", "bcsstk14ish", "ecology_small", "apache_small"]:
        a = generate.SUITE[name]()
        parent0 = etree(a)
        post = postorder(parent0, weights=col_counts(a, parent0))
        ap = a.permute(post)
        parent = etree(ap)
        cc = col_counts(ap, parent)
        part = sn.build_partition(ap, parent, cc)
        rptr_n, rows_n = sn.supernodal_rows_from_etree(ap, parent, part)
        lpat = symbolic_pattern(ap, parent)
        rptr_p, rows_p = sn.supernodal_rows(lpat, part)
        assert np.array_equal(rptr_n, rptr_p), name
        assert np.array_equal(rows_n, rows_p), name
