"""Distributed ownership-partitioned executor tests (SURVEY §7E).

Run on the virtual 8-device CPU mesh (conftest): the same shard_map
program a real pod slice would execute."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
from jax.sharding import Mesh

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core import generate
from parsy_bench_tpu.models import CholeskySolver
from parsy_bench_tpu.parallel.dist import DistExecutor
from parsy_bench_tpu.symbolic.dplan import build_dist_plan
from parsy_bench_tpu.symbolic.partition import (partition_supernodes,
                                                supernode_costs)


@pytest.fixture(scope="module")
def oracle():
    a = generate.SUITE["bcsstk14ish"]()
    cfg = SolverConfig(dtype="float32", tier="supernodal")
    s = CholeskySolver(a, cfg).factorize()
    return a, cfg, s, s._l_values().astype(np.float32), s.lpat


def test_partitioner_balances_and_covers():
    a = generate.SUITE["ecology_small"]()
    s = CholeskySolver(a, SolverConfig(tier="supernodal"))
    part = s.plan.layout.part
    cost = supernode_costs(part.sptr, s.cc)
    for G in (2, 4, 8):
        owner = partition_supernodes(part.sparent, cost, G)
        assert owner.min() >= 0 and owner.max() < G
        loads = np.bincount(owner, weights=cost, minlength=G)
        assert loads.max() < 2.0 * cost.sum() / G, (G, loads)


@pytest.mark.parametrize("G", [2, 4, 8])
def test_dist_factor_matches_single_device(oracle, G):
    """Per-device pools + boundary-only ragged psum must reproduce the
    single-device factor values (reference bar: elementwise 1e-3,
    choleskyTest01.cpp:538; we hold f32 roundoff)."""
    a, cfg, s, lref, lpat = oracle
    plan = build_dist_plan(s.ap, s.parent, s.cc, G, cfg)
    mesh = Mesh(np.array(jax.devices()[:G]), ("p",))
    ex = DistExecutor(plan, mesh)
    pools = jax.block_until_ready(
        ex.factorize(s.ap.data.astype(np.float32)))
    lgot = ex.factor_values(pools, lpat)
    assert np.max(np.abs(lgot - lref)) < 1e-4
    # per-device memory must SHRINK vs the single-device pool
    assert plan.pool_elems_per_device() < s.plan.pool_elems()


def test_dist_grouped_matches_monolithic(oracle):
    a, cfg, s, lref, lpat = oracle
    G = 4
    plan = build_dist_plan(s.ap, s.parent, s.cc, G, cfg)
    mesh = Mesh(np.array(jax.devices()[:G]), ("p",))
    ex = DistExecutor(plan, mesh)
    pools = jax.block_until_ready(
        ex.factorize_segmented(s.ap.data.astype(np.float32), group=3))
    lgot = ex.factor_values(pools, lpat)
    assert np.max(np.abs(lgot - lref)) < 1e-4


def test_dist_solves(oracle):
    a, cfg, s, lref, lpat = oracle
    G = 4
    plan = build_dist_plan(s.ap, s.parent, s.cc, G, cfg)
    mesh = Mesh(np.array(jax.devices()[:G]), ("p",))
    ex = DistExecutor(plan, mesh)
    pools = ex.factorize(s.ap.data.astype(np.float32))
    lm = sp.csc_matrix((lref, lpat.indices, lpat.indptr),
                       shape=(a.n, a.n))
    bl = np.asarray(lm @ np.ones(a.n), dtype=np.float32)
    x = np.asarray(ex.solve_lower(pools, bl))
    assert np.max(np.abs(1.0 - x)) < 1e-3   # testTriangular bar
    full = s.ap.symmetrize_from_lower().to_scipy()
    bspd = np.asarray(full @ np.ones(a.n), dtype=np.float32)
    xs = np.asarray(ex.solve_spd(pools, bspd))
    assert np.max(np.abs(1.0 - xs)) < 1e-3


def test_boundary_volume_smaller_than_window():
    """The architecture claim: the total collective payload (ragged
    boundary rows, summed over every (class, step)) must be WELL below
    what the round-3 design moved — a full per-level window psum every
    step.  This fails if boundary slots regress to window scale.

    Uses the grid-class matrix: on tiny FEM graphs (bcsstk14ish) the top
    of the tree is nearly all separator at G=4, so the separation only
    shows at moderate size (measured ratio 0.095 here; the round-3
    design is 1.0 by definition)."""
    a = generate.SUITE["ecology_small"]()
    cfg = SolverConfig(dtype="float32", tier="supernodal")
    s = CholeskySolver(a, cfg)
    plan = build_dist_plan(s.ap, s.parent, s.cc, 4, cfg)
    boundary = 0
    window_r3 = 0
    for seg in plan.segments:
        for ci, c in enumerate(plan.classes):
            boundary += seg.nsteps * seg.btot[ci] * c
            window_r3 += seg.nsteps * seg.wslice[ci] * c
    assert window_r3 > 0
    assert boundary < 0.3 * window_r3, (boundary, window_r3)


def test_solve_boundary_volume_below_r4_design(oracle):
    """The distributed solves must move boundary slots, not full
    (n+1)-vectors per step (the round-4 design): modeled psum bytes per
    device for both solve directions must sit well below the r4 design
    volume, and within sight of the factorize discipline."""
    a, cfg, s, lref, lpat = oracle
    plan = build_dist_plan(s.ap, s.parent, s.cc, 4, cfg)
    m = plan.psum_bytes_per_step()
    assert m["solve_lower_bytes"] < 0.5 * m["solve_r4_design_bytes"]
    assert m["solve_upper_bytes"] < 0.5 * m["solve_r4_design_bytes"]
