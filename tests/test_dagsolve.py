"""Coarsened DAG trisolve tests (the DAG-LBC replacement,
symbolic/dagplan.py; reference: getCoarseLevelSet_DAG_CSC03
InspectionDAG_03.h:14 + lsolveParH2 Triangular_CSC.h:76)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax

jax.config.update("jax_enable_x64", True)

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core.csc import CSC, check_triangular, rhs_init_trisolve
from parsy_bench_tpu.models import TriangularSolver
from parsy_bench_tpu.symbolic.dagplan import (build_coarse_trisolve,
                                              cc_partition, choose_schedule)
from parsy_bench_tpu.symbolic.plan import dag_levels


def _random_lower(n, density, seed):
    rng = np.random.default_rng(seed)
    m = sp.random(n, n, density=density, random_state=rng, format="lil")
    m = sp.tril(m, -1).tolil()
    m.setdiag(np.full(n, 3.0))
    return CSC.from_scipy(m.tocsc())


def _chain_lower(n):
    """Bidiagonal chain: worst-case DAG depth (nlev == n)."""
    d = np.full(n, 2.0)
    e = np.full(n - 1, -1.0)
    m = sp.diags([d, e], [0, -1]).tocsc()
    return CSC.from_scipy(m)


@pytest.mark.parametrize("make,args", [
    (_random_lower, (300, 0.02, 7)),
    (_random_lower, (700, 0.005, 3)),
    (_chain_lower, (1000,)),
])
def test_coarse_solve_matches_scipy(make, args):
    l = make(*args)
    ts = TriangularSolver(l, SolverConfig(dtype="float64",
                                          trisolve_schedule="coarsened",
                                          coarse_width=128))
    assert ts.schedule == "coarsened"
    # the point of coarsening: far fewer steps than DAG levels on chains
    assert ts.plan.nsteps == -(-l.n // 128)
    b = rhs_init_trisolve(l)
    x = ts.solve(b)
    assert check_triangular(x)
    xref = sp.linalg.spsolve_triangular(l.to_scipy().tocsr(), b, lower=True)
    assert np.allclose(x, xref, atol=1e-9)
    # transposed solve
    bt = l.to_scipy().T @ np.ones(l.n)
    xt = ts.solve_transposed(bt)
    assert np.max(np.abs(xt - 1.0)) < 1e-8


def test_auto_schedule_picks_coarsened_for_chain():
    l = _chain_lower(4096)
    lev = dag_levels(sp.csc_matrix(
        (np.ones(l.nnz, dtype=np.int8), l.indices, l.indptr),
        shape=(l.n, l.n)))
    assert int(lev.max()) + 1 == l.n          # full-depth chain
    assert choose_schedule(l, lev) == "coarsened"
    ts = TriangularSolver(l, SolverConfig(dtype="float64"))
    assert ts.schedule == "coarsened"
    assert ts.plan.nsteps * 16 <= l.n          # material step reduction


def test_auto_schedule_picks_wavefront_for_shallow():
    # wide shallow DAG: one dense column block, nlev small
    l = _random_lower(400, 0.05, 1)
    lev = dag_levels(sp.csc_matrix(
        (np.ones(l.nnz, dtype=np.int8), l.indices, l.indptr),
        shape=(l.n, l.n)))
    if int(lev.max()) + 1 < 40:
        assert choose_schedule(l, lev) == "wavefront"


def test_cc_partition_components():
    # two independent chains -> 2 components in any level window
    n = 40
    d = np.full(n, 2.0)
    e = np.zeros(n - 1)
    e[:n // 2 - 1] = -1.0            # chain on [0, 20)
    e[n // 2:] = -1.0                # chain on [20, 40)
    m = sp.diags([d, e], [0, -1]).tocsc()
    lpat = sp.csc_matrix((np.ones(m.nnz, dtype=np.int8), m.indices,
                          m.indptr), shape=m.shape)
    lev = dag_levels(lpat)
    cc = cc_partition(lpat, lev, 0, int(lev.max()) + 1)
    assert cc[0] != cc[n - 1]
    assert len(np.unique(cc[cc >= 0])) == 2
