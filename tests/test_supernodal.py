"""Supernodal tier tests: partition/layout invariants, factorization vs
dense oracle, blocked triangular solves (SURVEY §2.2-2.4, reference
acceptance bars §4.2-4.3)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core import generate
from parsy_bench_tpu.models import CholeskySolver
from parsy_bench_tpu.symbolic.etree import etree, postorder, tree_levels
from parsy_bench_tpu.symbolic.colcounts import col_counts, symbolic_pattern
from parsy_bench_tpu.symbolic.ordering import compute_ordering
from parsy_bench_tpu.symbolic.supernodes import (
    build_class_layout, build_partition, fundamental_supernodes)


MATS = ["tiny", "bcsstk14ish", "ecology_small", "apache_small"]


def _prep(name):
    a = generate.SUITE[name]()
    p = compute_ordering(a, "amd")
    ap1 = a.permute(p)
    par1 = etree(ap1)
    cc1 = col_counts(ap1, par1)
    post = postorder(par1, weights=cc1)
    ap = ap1.permute(post)
    parent = etree(ap)
    cc = col_counts(ap, parent)
    return ap, parent, cc


@pytest.mark.parametrize("name", MATS)
def test_partition_invariants(name):
    ap, parent, cc = _prep(name)
    part = build_partition(ap, parent, cc)
    n = ap.n
    # supernode widths cover all columns exactly once
    # (reference check Inspection_BlockC.h:546-552)
    assert part.sptr[0] == 0 and part.sptr[-1] == n
    assert np.all(np.diff(part.sptr) >= 1)
    assert np.all(np.diff(part.sptr) <= 128)
    # col2sup consistent with sptr
    for s in range(part.nsuper):
        assert np.all(part.col2sup[part.sptr[s]:part.sptr[s + 1]] == s)
    # supernodal etree is topological
    sid = np.arange(part.nsuper)
    assert np.all((part.sparent == -1) | (part.sparent > sid))


@pytest.mark.parametrize("name", MATS)
def test_layout_covers_pattern(name):
    ap, parent, cc = _prep(name)
    part = build_partition(ap, parent, cc)
    lpat = symbolic_pattern(ap, parent)
    lev = tree_levels(part.sparent)
    lay = build_class_layout(lpat, ap, part, lev)
    # diag block rows present and first
    for s in range(min(part.nsuper, 50)):
        j1, j2 = part.sptr[s], part.sptr[s + 1]
        rows = lay.rows[lay.rptr[s]:lay.rptr[s + 1]]
        assert np.all(rows[:j2 - j1] == np.arange(j1, j2))
        assert np.all(np.diff(rows) > 0)
    # panels respect class geometry and fit their level windows
    assert np.all(lay.hpad >= lay.wpad)
    assert np.all(lay.hpad >= np.diff(lay.rptr))
    for ci in range(lay.ncls):
        sel = np.nonzero(lay.cls == ci)[0]
        for s in sel[:50]:
            t = lay.lev[s]
            assert lay.rlo[ci, t] <= lay.rowoff[s]
            assert (lay.rowoff[s] + lay.hpad[s]
                    <= lay.rlo[ci, t] + lay.wrows[ci, t])
    # l_map covers the simplicial pattern injectively across the pools
    flat = [m[0] + sum(int(r) * c for r, c in
                       zip(lay.nrows[:ci], lay.classes[:ci]))
            for ci, m in enumerate(lay.l_map)]
    allpos = np.concatenate(flat)
    allsel = np.concatenate([m[1] for m in lay.l_map])
    assert len(np.unique(allpos)) == len(allpos) == lpat.nnz
    assert np.array_equal(np.sort(allsel), np.arange(lpat.nnz))


def test_fundamental_supernodes_chain():
    # a path graph: etree is a chain with cc[j] = 2 except root -> every
    # column must start its own supernode except none can merge widths...
    # actually parent[j-1]==j and cc[j-1]==cc[j]+1 fails (cc const 2), so
    # all singletons
    parent = np.array([1, 2, 3, -1], dtype=np.int32)
    cc = np.array([2, 2, 2, 1], dtype=np.int64)
    start = fundamental_supernodes(parent, cc)
    assert start.tolist() == [True, False, False, False] or start[0]
    # dense block: cc strictly decreasing by 1 -> single supernode
    cc2 = np.array([4, 3, 2, 1], dtype=np.int64)
    start2 = fundamental_supernodes(parent, cc2)
    assert start2.tolist() == [True, False, False, False]


@pytest.mark.parametrize("name", MATS)
def test_supernodal_factor_matches_dense(name):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float64",
                                       tier="supernodal"))
    s.factorize()
    assert s.factor_residual() < 1e-10
    if a.n <= 2000:
        dense = s.ap.symmetrize_from_lower().to_dense()
        lref = np.linalg.cholesky(dense)
        lgot = s.factor_csc().to_dense()
        assert np.max(np.abs(lref - lgot)) < 1e-8


@pytest.mark.parametrize("name", MATS)
def test_supernodal_solve(name):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float64",
                                       tier="supernodal")).factorize()
    b = a.spd_rhs_for_ones()
    x = s.solve(b)
    assert np.max(np.abs(x - 1.0)) < 1e-8


def test_supernodal_float32_parsy_tolerance():
    a = generate.SUITE["bcsstk14ish"]()
    s = CholeskySolver(a, SolverConfig(dtype="float32",
                                       tier="supernodal")).factorize()
    # the reference acceptance bar (1e-3, choleskyTest01.cpp:539)
    assert s.factor_residual() < 1e-3


def test_factorize_segmented_matches_monolithic():
    """Per-segment dispatch (the bounded-compile path for n >= ~2.5e5)
    must produce bit-identical pools to the monolithic program."""
    a = generate.SUITE["apache_small"]()
    s = CholeskySolver(a, SolverConfig(dtype="float32",
                                       tier="supernodal"))
    p1 = s.executor.factorize(s.ap.data)
    p2 = s.executor.factorize_segmented(s.ap.data)
    for x, y in zip(p1, p2):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_supernodal_matches_simplicial():
    a = generate.SUITE["ecology_small"]()
    s1 = CholeskySolver(a, SolverConfig(dtype="float64",
                                        tier="simplicial")).factorize()
    s2 = CholeskySolver(a, SolverConfig(dtype="float64",
                                        tier="supernodal")).factorize()
    # same ordering pipeline -> same permuted operator -> same L
    assert np.array_equal(s1.perm, s2.perm)
    l1 = s1._l_values()
    l2 = s2._l_values()
    assert np.max(np.abs(l1 - l2)) < 1e-10


def test_coarsening_reduces_levels():
    """The supernodal schedule must be far shallower than the scalar
    wavefront (the LBC coarsening goal, SURVEY P2)."""
    a = generate.SUITE["ecology_small"]()
    s2 = CholeskySolver(a, SolverConfig(tier="supernodal"))
    scalar_nlev = int(tree_levels(s2.parent).max()) + 1
    assert s2.plan.nlev * 5 < scalar_nlev


def test_supernodal_trisolve_chordal():
    """Blocked BCSC trisolve on a real Cholesky factor (reference:
    triangularTest02.cpp benchmark path)."""
    from parsy_bench_tpu.core.csc import rhs_init_trisolve, check_triangular
    from parsy_bench_tpu.models import TriangularSolver
    a = generate.SUITE["ecology_small"]()
    l = CholeskySolver(a, SolverConfig(dtype="float64")).factorize().factor_csc()
    ts = TriangularSolver(l, SolverConfig(dtype="float64", tier="supernodal"))
    x = ts.solve(rhs_init_trisolve(l))
    assert check_triangular(x)
    bt = l.to_scipy().T @ np.ones(l.n)
    xt = ts.solve_transposed(bt)
    assert np.max(np.abs(xt - 1.0)) < 1e-8


def test_supernodal_trisolve_nonchordal():
    """Value-pattern supernode detection + DAG levels on a non-chordal L
    (reference: triangularTest_DAG_nonChordal.cpp)."""
    import scipy.sparse as sp
    from parsy_bench_tpu.core.csc import CSC, rhs_init_trisolve, check_triangular
    from parsy_bench_tpu.models import TriangularSolver
    rng = np.random.default_rng(3)
    n = 400
    m = sp.random(n, n, density=0.03, random_state=rng, format="lil")
    m = sp.tril(m, -1).tolil()
    m.setdiag(np.full(n, 4.0))
    l = CSC.from_scipy(m.tocsc())
    ts = TriangularSolver(l, SolverConfig(dtype="float64", tier="supernodal"))
    assert ts.nlev < n
    x = ts.solve(rhs_init_trisolve(l))
    assert check_triangular(x)
    xref = sp.linalg.spsolve_triangular(l.to_scipy().tocsr(),
                                        rhs_init_trisolve(l), lower=True)
    assert np.allclose(x, xref)


def test_trisolve_tiers_agree():
    from parsy_bench_tpu.core.csc import rhs_init_trisolve
    from parsy_bench_tpu.models import TriangularSolver
    a = generate.SUITE["bcsstk14ish"]()
    l = CholeskySolver(a, SolverConfig(dtype="float64")).factorize().factor_csc()
    b = rhs_init_trisolve(l)
    x1 = TriangularSolver(l, SolverConfig(dtype="float64")).solve(b)
    x2 = TriangularSolver(l, SolverConfig(dtype="float64",
                                          tier="supernodal")).solve(b)
    assert np.max(np.abs(x1 - x2)) < 1e-10


def test_slack_placement_valid_and_reduces_fin_padding():
    """Opt-in slack level placement (InspectionLevel_06.h:118 analog):
    plans stay valid (verify_plan), factors stay correct, and padded
    finalize lanes do not increase."""
    from parsy_bench_tpu.symbolic.verify import verify_plan

    a = generate.SUITE["ecology_small"]()
    pads = {}
    for slack in (False, True):
        cfg = SolverConfig(dtype="float64", tier="supernodal",
                           ordering="amd", slack_placement=slack)
        s = CholeskySolver(a, cfg)
        verify_plan(s.plan)
        s.factorize()
        assert s.factor_residual() < 1e-10
        pad = true = 0
        for seg in s.plan.segments:
            for b in seg.fin:
                pad += b.P * seg.nsteps
                true += int(b.cnt.sum())
        pads[slack] = pad - true
    assert pads[True] <= pads[False]


def test_aot_cache_roundtrip(tmp_path):
    """AOT executable cache (utils/aotcache.py): a cold run populates the
    cache, a fresh executor warm-loads the serialized executables and
    reproduces the factor and solve bit-for-bit (the reference's
    cacheable-symbolic contract, common/Util.h:187, extended to the
    compiled programs — the compile IS symbolic-phase work here)."""
    from parsy_bench_tpu.core.csc import rhs_init_trisolve

    cache = str(tmp_path / "aot")
    a = generate.SUITE["bcsstk14ish"]()
    cfg = SolverConfig(dtype="float32", tier="supernodal")
    s1 = CholeskySolver(a, cfg)
    data = np.asarray(s1.ap.data, dtype=np.float32)
    lx1 = s1.executor.factorize_segmented(data, group=4, cache_dir=cache)
    v1 = np.asarray(s1.executor.factor_values(lx1))
    import os
    nfiles = len(os.listdir(cache))
    assert nfiles >= 2  # init_pools + >=1 group program

    s2 = CholeskySolver(a, cfg)       # fresh executor, warm cache
    lx2 = s2.executor.factorize_segmented(data, group=4, cache_dir=cache)
    v2 = np.asarray(s2.executor.factor_values(lx2))
    assert len(os.listdir(cache)) == nfiles  # pure hits, nothing rebuilt
    assert np.array_equal(v1, v2)

    s1.lx = lx1
    lmat = s1.factor_csc().to_scipy()
    b = np.asarray(lmat @ np.ones(a.n), dtype=np.float32)
    x1 = np.asarray(s1.executor.solve_loop(lx1, b, 2, cache_dir=cache))
    x2 = np.asarray(s2.executor.solve_loop(lx2, b, 2, cache_dir=cache))
    assert np.array_equal(x1, x2)
    assert np.max(np.abs(x1 - 1.0)) < 1e-3   # testTriangular bar


def test_gather_updates_match_scatter():
    """The scatter-free gather/ladder update path (update_delta="gather",
    splan._build_gather_tables) must produce the same factor as the
    index-scatter path — same sums, different static order, so values
    agree to f32 roundoff."""
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.models import CholeskySolver
    a = generate.laplace_3d(9)
    vals = {}
    for upd in ("scatter", "gather"):
        s = CholeskySolver(a, SolverConfig(
            ordering="nd", tier="supernodal", update_delta=upd))
        s.factorize()
        assert s.factor_residual() < 1e-5
        vals[upd] = np.asarray(s.executor.factor_values(s.lx))
        has_gsc = any(getattr(seg, "gsc", None) is not None
                      for seg in s.plan.segments)
        assert has_gsc == (upd == "gather")
    assert np.max(np.abs(vals["gather"] - vals["scatter"])) < 1e-5
