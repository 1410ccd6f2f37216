"""Numeric tier tests: simplicial Cholesky + triangular solves vs dense
oracles, and the reference's acceptance bars (factor match within 1e-3,
trisolve |1 - x_i| < 1e-3 — SURVEY §4.2/§4.3)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax

jax.config.update("jax_enable_x64", True)

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core import generate
from parsy_bench_tpu.core.csc import CSC, rhs_init_trisolve, check_triangular
from parsy_bench_tpu.models import CholeskySolver, TriangularSolver


MATS = ["tiny", "bcsstk14ish", "ecology_small", "apache_small"]


@pytest.mark.parametrize("name", MATS)
@pytest.mark.parametrize("ordering", ["amd"])
def test_factor_matches_dense_cholesky(name, ordering):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(ordering=ordering, dtype="float64"))
    s.factorize()
    assert s.factor_residual() < 1e-10
    # elementwise vs dense oracle on the permuted operator (reference bar:
    # CHOLMOD comparison within 1e-3, choleskyTest01.cpp:529-546)
    if a.n <= 2000:
        dense = s.ap.symmetrize_from_lower().to_dense()
        lref = np.linalg.cholesky(dense)
        lgot = s.factor_csc().to_dense()
        assert np.max(np.abs(lref - lgot)) < 1e-3


@pytest.mark.parametrize("name", ["tiny", "bcsstk14ish"])
def test_factor_float32_within_parsy_tolerance(name):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(dtype="float32")).factorize()
    assert s.factor_residual() < 1e-3


@pytest.mark.parametrize("name", MATS)
def test_spd_solve(name):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(dtype="float64")).factorize()
    b = a.spd_rhs_for_ones()
    x = s.solve(b)
    assert s.solve_residual(b, x) < 1e-10
    assert np.max(np.abs(x - 1.0)) < 1e-6


def test_spd_solve_float32_with_refinement():
    a = generate.SUITE["ecology_small"]()
    s = CholeskySolver(a, SolverConfig(dtype="float32", refine_steps=2))
    s.factorize()
    b = a.spd_rhs_for_ones()
    x = s.solve(b)
    assert s.solve_residual(b, x) < 1e-5


def test_refactorize_new_values_same_pattern():
    a = generate.SUITE["tiny"]()
    s = CholeskySolver(a, SolverConfig(dtype="float64")).factorize()
    a2 = a.copy()
    a2.data = a2.data * 2.0
    s.factorize(a2)
    b = a2.spd_rhs_for_ones()
    x = s.solve(b)
    assert np.max(np.abs(x - 1.0)) < 1e-8


def _chol_lower(a: CSC) -> CSC:
    lo = np.linalg.cholesky(a.symmetrize_from_lower().to_dense())
    m = sp.csc_matrix(lo)
    m.eliminate_zeros()
    return CSC.from_scipy(m)


@pytest.mark.parametrize("name", ["tiny", "ecology_small"])
def test_triangular_solver_chordal(name):
    a = generate.SUITE[name]()
    l = _chol_lower(a)
    ts = TriangularSolver(l, SolverConfig(dtype="float64"))
    b = rhs_init_trisolve(l)
    x = ts.solve(b)
    assert check_triangular(x)  # reference bar: |1 - x_i| < 1e-3, Util.h:294
    # transposed solve
    bt = l.to_scipy().T @ np.ones(l.n)
    xt = ts.solve_transposed(bt)
    assert np.max(np.abs(xt - 1.0)) < 1e-8


def test_triangular_solver_nonchordal_dag():
    """General L whose DAG is not an etree (reference:
    triangularTest_DAG_nonChordal.cpp)."""
    rng = np.random.default_rng(7)
    n = 300
    m = sp.random(n, n, density=0.02, random_state=rng, format="lil")
    m = sp.tril(m, -1).tolil()
    m.setdiag(np.full(n, 3.0))
    l = CSC.from_scipy(m.tocsc())
    ts = TriangularSolver(l, SolverConfig(dtype="float64"))
    assert ts.nlev < n  # DAG levels give real parallelism
    b = rhs_init_trisolve(l)
    x = ts.solve(b)
    assert check_triangular(x)
    xref = sp.linalg.spsolve_triangular(l.to_scipy().tocsr(), b, lower=True)
    assert np.allclose(x, xref)


def test_float32_runs_on_default_backend():
    a = generate.SUITE["tiny"]()
    s = CholeskySolver(a, SolverConfig(dtype="float32")).factorize()
    b = a.spd_rhs_for_ones()
    x = s.solve(b)
    assert s.solve_residual(b, x) < 1e-3


def test_pruned_sparse_rhs_solve():
    """Reach-restricted solve touches only the active columns (reference:
    lsolve_reach_dec, Triangular_CSC.h:225; SURVEY P4)."""
    from parsy_bench_tpu.models import CholeskySolver, TriangularSolver
    a = generate.SUITE["ecology_small"]()
    l = CholeskySolver(a, SolverConfig(dtype="float64")).factorize().factor_csc()
    ts = TriangularSolver(l, SolverConfig(dtype="float64"))
    rows = np.array([5, 700, 2000])
    ps = ts.pruned(rows)
    assert len(ps.reach) < l.n // 4
    b = np.zeros(l.n)
    b[rows] = [1.0, -2.0, 0.5]
    x = ps.solve(b)
    xref = sp.linalg.spsolve_triangular(l.to_scipy().tocsr(), b, lower=True)
    assert np.max(np.abs(x - xref)) < 1e-12


def test_pruned_blocked_solve_matches_simplicial():
    """Supernodal pruned solve (reach_sn + batched panel subset —
    blockedPrunedLSolve, Triangular_BCSC.h:55) agrees with the simplicial
    pruned path and touches a strict subset of panels."""
    from parsy_bench_tpu.models import CholeskySolver, TriangularSolver
    a = generate.SUITE["ecology_small"]()
    l = CholeskySolver(a, SolverConfig(dtype="float64")
                       ).factorize().factor_csc()
    rows = np.array([5, 700, 2000])
    b = np.zeros(l.n)
    b[rows] = [1.0, -2.0, 0.5]
    ref = TriangularSolver(l, SolverConfig(dtype="float64")
                           ).pruned(rows).solve(b)
    ts = TriangularSolver(l, SolverConfig(dtype="float64",
                                          tier="supernodal"))
    ps = ts.pruned(rows)
    assert len(ps.sn_reach) < ts.plan.layout.part.nsuper
    assert len(ps.cols) < l.n // 2
    x = ps.solve(b)
    assert np.max(np.abs(x - ref)) < 1e-9


@pytest.mark.parametrize("tier", ["simplicial", "supernodal"])
def test_indefinite_matrix_raises(tier):
    """Non-SPD inputs must abort like the reference's dpotrf info != 0
    check (parallel_PB_Cholesky_05.h:206-207): factorize(check_spd=True,
    the default) raises NotPositiveDefiniteError at both tiers."""
    from parsy_bench_tpu.models import NotPositiveDefiniteError
    a = generate.SUITE["bcsstk14ish"]()
    # flip one interior diagonal entry far negative -> indefinite
    m = a.symmetrize_from_lower().to_scipy().tolil()
    m[50, 50] = -abs(m[50, 50]) - 1.0
    bad = CSC.from_scipy(sp.tril(m.tocsc(), 0).tocsc())
    s = CholeskySolver(bad, SolverConfig(dtype="float64", tier=tier))
    with pytest.raises(NotPositiveDefiniteError):
        s.factorize()
    assert not s.factor_ok()
    # the same solver still accepts the SPD original on the same pattern
    s2 = CholeskySolver(a, SolverConfig(dtype="float64", tier=tier))
    s2.factorize()
    assert s2.factor_ok()
