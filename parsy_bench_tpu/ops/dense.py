"""Batched dense micro-kernels built from matmuls (MXU) and unrolled
vector ops (VPU) only.

XLA's ``jnp.linalg.cholesky`` / ``lax.linalg.triangular_solve`` lower to
element-serialized loops on TPU (measured ~1ms per step for a 64-lane
128x128 batch — scripts/microbench2.py), so the supernodal executor uses
these instead: a flat panel-loop blocked Cholesky that produces the
triangular **inverse** alongside the factor (via the finite Neumann
product), turning every TRSM into a GEMM.  This plays the role of the
reference's dpotrf/dtrsm calls (cholesky/parallel_PB_Cholesky_05.h:204,218)
and of its hand-rolled fallback BLAS (cholesky/MyBLAS.h:10,
triangularSolve/BLAS.h:8).

All kernels are batched over a leading ``P`` axis and assume the input is
a *masked* SPD block: rows/columns beyond the logical width carry an
identity diagonal (see ``masked_spd``), so padded lanes factor to identity
and never produce NaNs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: panel width of the flat blocked Cholesky (rank-1 chain length per panel)
_PANEL = 16


def _tril_mask(c, k=0):
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    return j <= i + k


def nilpotent_inv(L):
    """Triangular inverse via the finite Neumann product.

    For lower-triangular L (P, c, c) with nonzero diagonal (identity on
    padded entries), write L = D(I + N) with N strictly lower, so N^c = 0
    and (I + N)^{-1} = sum_k (-N)^k = prod_j (I + M^(2^j)), M = -N —
    log2(c) squarings + products, all MXU matmuls, replacing the
    element-serialized forward substitution of the reference's dtrsm
    (parallel_PB_Cholesky_05.h:218)."""
    P, c, _ = L.shape
    dt = L.dtype
    d = jnp.diagonal(L, axis1=1, axis2=2)                 # (P, c)
    M = -(L / d[:, :, None])                              # -D^{-1} L
    M = jnp.where(_tril_mask(c, -1), M, 0)                # strictly lower
    acc = jnp.eye(c, dtype=dt)[None] + M
    k = 2
    while k < c:
        M = jnp.einsum("pij,pjk->pik", M, M,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=dt)
        acc = acc + jnp.einsum("pij,pjk->pik", acc, M,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=dt)
        k *= 2
    return acc / d[:, None, :]                            # (I+N)^{-1} D^{-1}


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


def _chol_panel(D, pw):
    """Unrolled rank-2 Cholesky chain for a (P, pw, pw) masked SPD block.

    Two columns per step via the closed-form 2x2 pivot: the trailing-block
    downdate (the expensive full-array op, and the sequential-kernel
    latency floor at ~5-8 us per dependent op) is paid pw/2 times instead
    of pw."""
    n = pw
    cols = []
    ar = jnp.arange(n)
    j = 0
    while j < n:
        if j + 1 < n:
            a = D[:, j, j]
            l11 = jnp.sqrt(a)
            cj = (D[:, :, j] / l11[:, None]) * (ar >= j)
            l21 = cj[:, j + 1]
            c22 = D[:, j + 1, j + 1] - l21 * l21
            l22 = jnp.sqrt(c22)
            cj1 = ((D[:, :, j + 1] - cj * l21[:, None])
                   / l22[:, None]) * (ar >= j + 1)
            cols.extend([cj, cj1])
            D = D - (cj[:, :, None] * cj[:, None, :]
                     + cj1[:, :, None] * cj1[:, None, :])
            j += 2
        else:
            d = jnp.sqrt(D[:, j, j])
            cvec = (D[:, :, j] / d[:, None]) * (ar >= j)
            cols.append(cvec)
            D = D - cvec[:, :, None] * cvec[:, None, :]
            j += 1
    return jnp.stack(cols, axis=2)


def cholesky_inverse(D):
    """Batched blocked Cholesky with inverse: D (P, c, c) masked SPD ->
    (L, Linv) lower triangular.

    Flat right-looking panel loop (static offsets, so every slice is a
    compile-time window): per 16-wide panel, an unrolled rank-1 chain on
    the diagonal block, one small ``nilpotent_inv`` for the panel TRSM,
    and one rank-16 MXU trailing update; the full-size Linv comes from a
    single log2(c)-matmul ``nilpotent_inv`` at the end.  Replaces the
    earlier recursive bisection, whose unrolled 8x8 bases dominated the
    executor's device-op count (~1k tiny HLO ops per call)."""
    P, c, _ = D.shape
    dt = D.dtype
    if c <= _PANEL:
        L = _chol_panel(D, c)
        return L, nilpotent_inv(L)
    if c % _PANEL:
        # the flat panel loop slices fixed 16-wide panels; a non-multiple
        # width class would clamp the last slice (SolverConfig.width_classes
        # must be multiples of 16)
        raise ValueError(f"width class {c} is not a multiple of {_PANEL}")
    L = jnp.zeros_like(D)
    A = D
    for j0 in range(0, c, _PANEL):
        j1 = j0 + _PANEL
        Lp = _chol_panel(A[:, j0:j1, j0:j1], _PANEL)
        iLp = nilpotent_inv(Lp)
        L = L.at[:, j0:j1, j0:j1].set(Lp)
        if j1 < c:
            below = jnp.einsum("pij,pkj->pik", A[:, j1:, j0:j1], iLp,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=dt)
            L = L.at[:, j1:, j0:j1].set(below)
            A = A.at[:, j1:, j1:].add(
                -jnp.einsum("pik,pjk->pij", below, below,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=dt))
    return L, nilpotent_inv(L)


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
    Matmul-only via the Neumann-product inverse."""
    return jnp.einsum("pij,pj->pi", nilpotent_inv(L), b,
                      precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=b.dtype)


def tri_lower_solve_t(L, b):
    """x = L^{-T} b."""
    return jnp.einsum("pji,pj->pi", nilpotent_inv(L), b,
                      precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=b.dtype)


def tri_inverse(L):
    """Linv for batched lower-triangular L (P, c, c)."""
    return nilpotent_inv(L)


def dense_tri_inv(T, base: int = 256):
    """Explicit inverse of ONE (t, t) lower-triangular matrix by blocked
    bisection — inv([[A,0],[B,C]]) = [[Ai,0],[-Ci B Ai, Ci]] — with the
    Neumann-product inverse at the base.  All MXU matmuls, O(t^3/3) flops,
    used once per factorization to prepare the dense-top solve block (the
    role dtrsm-on-the-peeled-level plays in the reference,
    Triangular_BCSC.h:238); every solve then costs one (t, t) GEMV."""
    t = T.shape[0]
    dt = T.dtype
    if t <= base:
        return nilpotent_inv(T[None])[0]
    h = max(((t // 2) + 127) // 128 * 128, base)
    if h >= t:
        h = t // 2
    Ai = dense_tri_inv(T[:h, :h], base)
    Ci = dense_tri_inv(T[h:, h:], base)
    BA = -jnp.dot(Ci, jnp.dot(T[h:, :h], Ai,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=dt),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=dt)
    top = jnp.concatenate([Ai, jnp.zeros((h, t - h), dt)], axis=1)
    bot = jnp.concatenate([BA, Ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)
