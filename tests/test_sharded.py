"""SPMD supernodal executor tests on the virtual 8-device CPU mesh
(SURVEY §2.7/§7E; conftest provides the devices)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core import generate
from parsy_bench_tpu.models import CholeskySolver
from parsy_bench_tpu.parallel import ShardedSupernodalExecutor


@pytest.mark.parametrize("g", [2, 8])
def test_sharded_matches_single_device(g):
    a = generate.SUITE["apache_small"]()
    ref = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float32",
                                         tier="supernodal"))
    ref.factorize()

    s = CholeskySolver(a, SolverConfig(ordering="amd", dtype="float32",
                                       tier="supernodal",
                                       num_partitions=g))
    mesh = Mesh(np.array(jax.devices()[:g]), ("p",))
    ex = ShardedSupernodalExecutor(s.plan, mesh, dtype=jnp.float32)
    pools = ex.factorize(s.ap.data)

    lx_ref = np.asarray(ref.executor.factor_values(ref.lx))
    lx_sh = np.asarray(ex.factor_values(pools))
    # orderings agree (same inspector inputs), so values are comparable
    assert np.allclose(lx_sh, lx_ref, atol=1e-4)

    b = a.spd_rhs_for_ones()
    inv = np.empty(a.n, dtype=np.int64)
    inv[s.perm] = np.arange(a.n)
    x = np.asarray(ex.solve_spd(pools, b[s.perm]))[inv]
    assert np.max(np.abs(x - 1.0)) < 1e-2

    # sharded forward solve matches the single-device executor
    xl_sh = np.asarray(ex.solve_lower(pools, b[s.perm]))
    xl_ref = np.asarray(ref.executor.solve_lower(ref.lx, b[ref.perm]))
    assert np.allclose(xl_sh, xl_ref, atol=1e-4)
