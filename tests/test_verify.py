"""End-to-end plan verification + analysis save/restore round-trip
(reference: LBC coverage/ordering verification InspectionLevel_06.h:354-371
and the cacheable-symbolic contract common/Util.h:187)."""
import numpy as np
import pytest

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core import generate
from parsy_bench_tpu.models import CholeskySolver
from parsy_bench_tpu.symbolic.verify import PlanError, verify_plan


MATS = ["tiny", "bcsstk14ish", "ecology_small", "apache_small"]


@pytest.mark.parametrize("name", MATS)
def test_verify_plan_passes(name):
    a = generate.SUITE[name]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal",
                                       verify=True))
    stats = verify_plan(s.plan)
    assert stats["ok"]
    assert stats["nsuper"] == s.plan.layout.part.nsuper
    # every below-diagonal pattern row participates in some update pair
    # or belongs to a root supernode


def test_verify_plan_catches_corruption():
    a = generate.SUITE["bcsstk14ish"]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal"))
    plan = s.plan
    # corrupt a finalize bucket: shift one step's slice offset
    for seg in plan.segments:
        for b in seg.fin:
            t = int(np.argmax(b.cnt))
            if b.cnt[t] > 0:
                b.boff = b.boff.copy()
                b.boff[t] += b.H
                with pytest.raises(PlanError):
                    verify_plan(plan)
                b.boff[t] -= b.H
                return
    pytest.skip("no finalize bucket found")


def test_verify_plan_catches_dropped_chunk():
    a = generate.SUITE["apache_small"]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal"))
    plan = s.plan
    for seg in plan.segments:
        for b in seg.upd:
            dummy = seg.wslice[b.ccls]
            real = np.any(b.dst != dummy, axis=-1)
            if real.any():
                g, t, p = np.argwhere(real)[0]
                b.dst = b.dst.copy()
                save = b.dst[g, t, p].copy()
                b.dst[g, t, p] = dummy      # drop the chunk
                with pytest.raises(PlanError):
                    verify_plan(plan)
                b.dst[g, t, p] = save
                return
    pytest.skip("no update chunk found")


def test_artifact_round_trip(tmp_path):
    a = generate.SUITE["bcsstk14ish"]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal",
                                       dtype="float64"))
    s.factorize()
    r0 = s.factor_residual()
    path = str(tmp_path / "analysis.pbt")
    s.save_analysis(path)

    s2 = CholeskySolver.from_artifact(a, path,
                                      SolverConfig(dtype="float64"))
    assert np.array_equal(s2.perm, s.perm)
    s2.factorize()
    assert s2.factor_residual() <= max(1e-10, 2 * r0)
    b = a.spd_rhs_for_ones()
    x = s2.solve(b)
    assert np.allclose(x, 1.0, atol=1e-3)


def test_artifact_rejects_wrong_matrix(tmp_path):
    a = generate.SUITE["bcsstk14ish"]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal"))
    path = str(tmp_path / "analysis.pbt")
    s.save_analysis(path)
    other = generate.SUITE["tiny"]()
    with pytest.raises(ValueError):
        CholeskySolver.from_artifact(other, path)
