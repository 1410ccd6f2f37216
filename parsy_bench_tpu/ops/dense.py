"""Batched dense micro-kernels built from matmuls (MXU) and unrolled
vector ops (VPU) only.

XLA's ``jnp.linalg.cholesky`` / ``lax.linalg.triangular_solve`` lower to
element-serialized loops on TPU (measured ~1ms per step for a 64-lane
128x128 batch — scripts/microbench2.py), so the supernodal executor uses
these instead: a recursive-bisection blocked Cholesky that produces the
triangular **inverse** alongside the factor, turning every TRSM into a
GEMM.  This plays the role of the reference's dpotrf/dtrsm calls
(cholesky/parallel_PB_Cholesky_05.h:204,218) and of its hand-rolled
fallback BLAS (cholesky/MyBLAS.h:10, triangularSolve/BLAS.h:8).

All kernels are batched over a leading ``P`` axis and assume the input is
a *masked* SPD block: rows/columns beyond the logical width carry an
identity diagonal (see ``masked_spd``), so padded lanes factor to identity
and never produce NaNs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: unrolled base-case width (f32 sublane tile is 8)
_BASE = 8


def masked_spd(D, w, c, dtype):
    """Mask a gathered (P, c, c) block to its logical width ``w`` (P,):
    keep the valid symmetric part, identity on the padded diagonal."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    wv = w[:, None, None]
    valid = (i < wv) & (j < wv)
    D = jnp.where(valid & (j <= i), D, 0)
    strict = jnp.where(j < i, D, 0)
    D = D + jnp.swapaxes(strict, 1, 2)
    eye_pad = jnp.where((i == j) & (i >= wv), jnp.ones((), dtype), 0)
    return D + eye_pad


def _chol_inv_base(D):
    """Unrolled 8x8 batched Cholesky + inverse.

    D: (P, 8, 8) SPD (masked).  Returns (L, Linv), both (P, 8, 8) lower
    triangular.  ~8 rank-1 updates + 28 fused MACs on the VPU.
    """
    P = D.shape[0]
    dt = D.dtype
    n = D.shape[-1]
    cols = []
    for j in range(n):
        d = jnp.sqrt(D[:, j, j])
        c = D[:, :, j] / d[:, None]                       # (P, n)
        mask = (jnp.arange(n) >= j)
        c = c * mask
        cols.append(c)
        D = D - c[:, :, None] * c[:, None, :]
    L = jnp.stack(cols, axis=2)                           # (P, n, n) lower
    # forward substitution against I: row j of Linv
    rows = []
    for j in range(n):
        e = jnp.zeros((P, n), dt).at[:, j].set(1.0)
        acc = e
        for k in range(j):
            acc = acc - L[:, j, k][:, None] * rows[k]
        rows.append(acc / L[:, j, j][:, None])
    Linv = jnp.stack(rows, axis=1)
    return L, Linv


def cholesky_inverse(D):
    """Batched blocked Cholesky with inverse: D (P, c, c) masked SPD ->
    (L, Linv) lower triangular, pure matmuls + the unrolled base.

    Recursive bisection: for D = [[D11, .], [D21, D22]],
        L11, iL11 = chol(D11);  L21 = D21 @ iL11^T
        L22, iL22 = chol(D22 - L21 @ L21^T)
        iL21 = -iL22 @ L21 @ iL11
    """
    c = D.shape[-1]
    if c <= _BASE:
        return _chol_inv_base(D)
    h = c // 2
    L11, iL11 = cholesky_inverse(D[:, :h, :h])
    L21 = jnp.einsum("pij,pkj->pik", D[:, h:, :h], iL11,
                     precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=D.dtype)
    S = D[:, h:, h:] - jnp.einsum("pik,pjk->pij", L21, L21,
                                  precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=D.dtype)
    L22, iL22 = cholesky_inverse(S)
    iL21 = -jnp.einsum("pij,pjk,pkl->pil", iL22, L21, iL11,
                       precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=D.dtype)
    z = jnp.zeros_like(L21)
    L = jnp.concatenate([
        jnp.concatenate([L11, jnp.swapaxes(z, 1, 2)], axis=2),
        jnp.concatenate([L21, L22], axis=2)], axis=1)
    Linv = jnp.concatenate([
        jnp.concatenate([iL11, jnp.swapaxes(z, 1, 2)], axis=2),
        jnp.concatenate([iL21, iL22], axis=2)], axis=1)
    return L, Linv


def finalize_panel(G, w, c, dtype):
    """One supernode-panel finalization (dpotrf + dtrsm as GEMM).

    G: (P, H, c) assembled panel (diag block on top).  Returns the
    factored panel: rows [0, c) replaced by L (identity-padded columns
    zeroed), rows [c, H) by  G_below @ L^{-T}.
    """
    D = masked_spd(G[:, :c, :], w, c, dtype)
    L, Linv = cholesky_inverse(D)
    # zero the padded identity columns so the pool invariant (padding
    # is zero) holds for the panel top
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    wv = w[:, None, None]
    Ltop = jnp.where((i < wv) & (j < wv), L, 0)
    Y = jnp.einsum("phk,pck->phc", G[:, c:, :], Linv,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=dtype)
    # padded columns of Linv rows >= w are zero already via masking:
    Y = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, c), 2) < w[:, None, None], Y, 0)
    return jnp.concatenate([Ltop, Y], axis=1)


def tri_lower_solve(L, b):
    """x = L^{-1} b for batched lower-triangular L (P, c, c), b (P, c).
    Uses the blocked inverse (small c), so it is matmul-only."""
    _, Linv = _inv_only(L)
    return jnp.einsum("pij,pj->pi", Linv, b,
                      precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=b.dtype)


def tri_lower_solve_t(L, b):
    """x = L^{-T} b."""
    _, Linv = _inv_only(L)
    return jnp.einsum("pji,pj->pi", Linv, b,
                      precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=b.dtype)


def _inv_base(L):
    P, n = L.shape[0], L.shape[-1]
    rows = []
    for j in range(n):
        e = jnp.zeros((P, n), L.dtype).at[:, j].set(1.0)
        acc = e
        for k in range(j):
            acc = acc - L[:, j, k][:, None] * rows[k]
        rows.append(acc / L[:, j, j][:, None])
    return L, jnp.stack(rows, axis=1)


def _inv_only(L):
    """(L, Linv) for an already-factored lower triangle (identity padding
    must be present on unused diagonal entries)."""
    c = L.shape[-1]
    if c <= _BASE:
        return _inv_base(L)
    h = c // 2
    _, iL11 = _inv_only(L[:, :h, :h])
    _, iL22 = _inv_only(L[:, h:, h:])
    L21 = L[:, h:, :h]
    iL21 = -jnp.einsum("pij,pjk,pkl->pil", iL22, L21, iL11,
                       precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=L.dtype)
    z = jnp.zeros_like(L21)
    Linv = jnp.concatenate([
        jnp.concatenate([iL11, jnp.swapaxes(z, 1, 2)], axis=2),
        jnp.concatenate([iL21, iL22], axis=2)], axis=1)
    return L, Linv


def tri_inverse(L):
    """Linv for batched lower-triangular L (P, c, c)."""
    return _inv_only(L)[1]
