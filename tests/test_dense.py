"""Dense micro-kernel tests: blocked Cholesky + Neumann-product triangular
inverse vs numpy oracles (the role the reference's MKL dpotrf/dtrsm play,
parallel_PB_Cholesky_05.h:204-218)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from parsy_bench_tpu.ops.dense import (cholesky_inverse, masked_spd,
                                       nilpotent_inv, tri_lower_solve,
                                       tri_lower_solve_t)


def _rand_spd(rng, p, c):
    A = rng.standard_normal((p, c, c))
    return A @ np.swapaxes(A, 1, 2) + c * np.eye(c)


@pytest.mark.parametrize("c", [8, 16, 32, 128])
def test_cholesky_inverse_oracle(c):
    rng = np.random.default_rng(0)
    D = _rand_spd(rng, 5, c)
    L, Linv = cholesky_inverse(jnp.asarray(D))
    L, Linv = np.asarray(L), np.asarray(Linv)
    ref = np.linalg.cholesky(D)
    assert np.allclose(L, ref, rtol=1e-8, atol=1e-8)
    assert np.allclose(Linv @ ref, np.eye(c)[None], atol=1e-8)
    # strictly lower-triangular outputs
    assert np.allclose(np.triu(L, 1), 0)
    assert np.allclose(np.triu(Linv, 1), 0)


@pytest.mark.parametrize("c", [32, 128])
def test_cholesky_inverse_masked_lanes(c):
    """Padded lanes (w < c, identity diagonal) must factor cleanly and
    produce no NaNs anywhere."""
    rng = np.random.default_rng(1)
    D = _rand_spd(rng, 4, c)
    w = jnp.asarray([c, c // 2, 3, 0])
    Dm = masked_spd(jnp.asarray(D), w, c, jnp.float64)
    L, Linv = cholesky_inverse(Dm)
    assert np.all(np.isfinite(np.asarray(L)))
    assert np.all(np.isfinite(np.asarray(Linv)))
    # the w=c lane matches the unmasked oracle
    ref = np.linalg.cholesky(D[0])
    assert np.allclose(np.asarray(L)[0], ref, atol=1e-8)
    # a partially masked lane factors its leading principal block
    k = c // 2
    refk = np.linalg.cholesky(D[1][:k, :k])
    assert np.allclose(np.asarray(L)[1][:k, :k], refk, atol=1e-8)


@pytest.mark.parametrize("c", [16, 64])
def test_nilpotent_inv_and_solves(c):
    rng = np.random.default_rng(2)
    L = np.tril(rng.standard_normal((3, c, c)))
    L[:, np.arange(c), np.arange(c)] = 2.0 + rng.random((3, c))
    Li = np.asarray(nilpotent_inv(jnp.asarray(L)))
    assert np.allclose(Li @ L, np.eye(c)[None], atol=1e-9)
    b = rng.standard_normal((3, c))
    x = np.asarray(tri_lower_solve(jnp.asarray(L), jnp.asarray(b)))
    assert np.allclose(L @ x[..., None], b[..., None], atol=1e-9)
    xt = np.asarray(tri_lower_solve_t(jnp.asarray(L), jnp.asarray(b)))
    assert np.allclose(np.swapaxes(L, 1, 2) @ xt[..., None],
                       b[..., None], atol=1e-9)


@pytest.mark.parametrize("c", [32, 128])
def test_cholesky_inverse_f32_ill_conditioned(c):
    """float32 with cond ~1e5 lanes: the Neumann-product inverse must keep
    the factor residual within the f32 envelope (ADVICE r2: the repeated
    squaring can amplify rounding on ill-conditioned panels)."""
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    s = np.logspace(0, -5, c)  # cond 1e5
    D = (Q * s) @ Q.T
    D = 0.5 * (D + D.T)
    Db = np.broadcast_to(D, (3, c, c)).astype(np.float32)
    L, Linv = cholesky_inverse(jnp.asarray(Db, dtype=jnp.float32))
    L = np.asarray(L, dtype=np.float64)
    Linv = np.asarray(Linv, dtype=np.float64)
    # factor residual relative to ||D||
    res = np.linalg.norm(L @ np.swapaxes(L, 1, 2) - D, axis=(1, 2))
    assert np.all(res / np.linalg.norm(D) < 1e-4)
    # inverse usable as a TRSM: ||Linv L - I|| bounded by cond * eps
    err = np.linalg.norm(Linv @ L - np.eye(c)[None], axis=(1, 2))
    assert np.all(err < 1e-1), err


def test_cholesky_inverse_rejects_bad_width():
    with pytest.raises(ValueError):
        cholesky_inverse(jnp.zeros((2, 24, 24)))


def test_factorize_loop_matches_factorize():
    """bench.py's in-device iteration loop must produce the same factor
    as a single factorize call."""
    from parsy_bench_tpu.config import SolverConfig
    from parsy_bench_tpu.core import generate
    from parsy_bench_tpu.models import CholeskySolver
    a = generate.SUITE["bcsstk14ish"]()
    s = CholeskySolver(a, SolverConfig(ordering="amd", tier="supernodal"))
    s.factorize()
    pools = s.executor.factorize_loop(s.ap.data, 3)
    for p, q in zip(pools, s.lx):
        assert np.allclose(np.asarray(p), np.asarray(q), atol=1e-6)


def test_pallas_cholesky_inverse_matches_dense():
    """The Pallas batched Cholesky+inverse kernel (ops/pallas_kernels.py)
    must reproduce ops/dense.cholesky_inverse (same algorithm traced as
    one kernel) — interpret mode on CPU, f32."""
    import numpy as np
    import jax.numpy as jnp
    from parsy_bench_tpu.ops.dense import cholesky_inverse, masked_spd
    from parsy_bench_tpu.ops.pallas_kernels import cholesky_inverse_pallas

    rng = np.random.default_rng(3)
    for (P, c) in ((5, 16), (9, 32), (6, 128)):
        w = rng.integers(1, c + 1, P).astype(np.int32)
        A = rng.standard_normal((P, c, c)).astype(np.float32)
        D0 = np.einsum("pij,pkj->pik", A, A) + c * np.eye(
            c, dtype=np.float32)
        D = masked_spd(jnp.asarray(D0), jnp.asarray(w), c, jnp.float32)
        L1, Li1 = cholesky_inverse(D)
        L2, Li2 = cholesky_inverse_pallas(D, tile_p=4, interpret=True)
        assert float(jnp.max(jnp.abs(L1 - L2))) < 1e-5 * c
        assert float(jnp.max(jnp.abs(Li1 - Li2))) < 1e-6


def test_pallas_fused_finalize_matches_xla_chain():
    """finalize_fused_pallas must reproduce the XLA finalize inner chain
    (ops/supernodal._finalize): masked-SPD build, blocked chol+inverse,
    Linv^T storage, TRSM-as-GEMM and the lane-masked diff — interpret
    mode on CPU, f32."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from parsy_bench_tpu.ops.dense import cholesky_inverse, masked_spd
    from parsy_bench_tpu.ops.pallas_kernels import finalize_fused_pallas

    rng = np.random.default_rng(7)
    for (P, H, c, cnt) in ((4, 32, 32, 3), (8, 64, 16, 8), (2, 256, 128, 1)):
        w = rng.integers(1, c + 1, P).astype(np.int32)
        blk = rng.standard_normal((P, H, c)).astype(np.float32)
        # SPD top so the chol chain is well-posed
        A = rng.standard_normal((P, c, c)).astype(np.float32)
        blk[:, :c, :] = np.einsum("pij,pkj->pik", A, A) + c * np.eye(
            c, dtype=np.float32)
        blkj, wj = jnp.asarray(blk), jnp.asarray(w)
        # ---- XLA reference chain (ops/supernodal._finalize inner loop)
        dt = jnp.float32
        D = masked_spd(blkj[:, :c, :], wj, c, dt)
        L, Lib = cholesky_inverse(D)
        i_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
        j_c = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
        wv = wj[:, None, None]
        Ltop = jnp.where((i_c < wv) & (j_c < wv), L, 0)
        Ltop = Ltop + jnp.where((j_c > i_c) & (i_c < wv) & (j_c < wv),
                                jnp.swapaxes(Lib, 1, 2), 0)
        Y = jnp.einsum("phk,pck->phc", blkj, Lib,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=dt)
        Y = jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, c), 2) < wv, Y, 0)
        top = jnp.where(i_c < wv, Ltop, Y[:, :c, :])
        out = jnp.concatenate([top, Y[:, c:, :]], axis=1)
        lane = jnp.arange(P)
        ref = jnp.where(lane[:, None, None] < cnt, out - blkj, 0)
        # ---- fused kernel
        # tp=2 exercises the full-w path, tp=8 the blocked-w path
        for tp in (2, 8):
            if P % tp:
                continue
            diff = finalize_fused_pallas(blkj, wj, jnp.int32(cnt), tp=tp,
                                         interpret=True)
            assert float(jnp.max(jnp.abs(ref - diff))) < 1e-4, (P, H, c)
