"""Pallas TPU kernels for the supernodal executor's serial-chain ops.

The factorize floor at n=1e5 is NOT the update gathers: host accounting
(r5) puts ~19 GB of HBM traffic (24 ms) and 202 padded Gflop (40 ms)
against ~38k tiny dependent HLO ops from the blocked-Cholesky chains
(ops/dense.py `_chol_panel` + `nilpotent_inv`) — at the measured ~3 us
per in-program small op that is >100 ms of pure kernel-boundary
overhead, matching the observed 300 ms (134 GFLOP/s).  This module
moves the ENTIRE batched factor+inverse into ONE Pallas kernel per
(width class, step): the rank-2 chains become straight-line VPU code on
VMEM-resident (TILE_P, c, c) blocks, the panel TRSMs and trailing
updates batched MXU dots — no per-op XLA launches at all.

This is the reference's dpotrf+dtrsm pair (parallel_PB_Cholesky_05.h:
204-218) as a single TPU kernel; the surrounding executor (gathers,
einsum updates, window scatter) stays XLA, which the same accounting
shows is traffic-bound, not op-bound.

Numerics are IDENTICAL to ops/dense.cholesky_inverse (same panel order,
same Neumann-product inverses); `tests/test_dense.py` compares the two
bit-for-bit in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PANEL = 16  # must match ops/dense._PANEL


def _diag(M):
    """Batched diagonal (P, c, c) -> (P, c) without jnp.diagonal (which
    Mosaic does not lower)."""
    c = M.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    return jnp.sum(jnp.where(i == j, M, 0), axis=2)


def _bdot(a, b, transpose_b=False):
    """Batched (P, m, k) @ (P, k, n) on the MXU (full f32 precision —
    the default would multiply in bf16 and cost ~1e-3 in the factor)."""
    dn = (((2,), (2 if transpose_b else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=a.dtype)


def _tril_mask(c, k=0):
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    return j <= i + k


def _nilpotent_inv(L):
    """Triangular inverse via the finite Neumann product (same math as
    ops/dense.nilpotent_inv, Mosaic-friendly diagonal handling)."""
    P, c, _ = L.shape
    dt = L.dtype
    d = _diag(L)                                          # (P, c)
    M = -(L / d[:, :, None])
    M = jnp.where(_tril_mask(c, -1), M, 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
    acc = jnp.where(i == j, jnp.ones((), dt), 0) + M
    k = 2
    while k < c:
        M = _bdot(M, M)
        acc = acc + _bdot(acc, M)
        k *= 2
    return acc / d[:, None, :]


def _col_onehot(n, j, dtype):
    """(1, 1, n) one-hot of column j (static) — scatter-free column set."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    return jnp.where(jj == j, jnp.ones((), dtype), 0)


def _chol_panel(D, pw):
    """Unrolled rank-2 Cholesky chain for (P, pw, pw) masked SPD blocks
    (ops/dense._chol_panel; Mosaic has no scatter, so column writes are
    one-hot mask-adds into the zero-initialized L)."""
    n = pw
    dt = D.dtype
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    L = jnp.zeros_like(D)
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
            L = (L + cj[:, :, None] * _col_onehot(n, j, dt)
                 + cj1[:, :, None] * _col_onehot(n, j + 1, dt))
            D = D - (cj[:, :, None] * cj[:, None, :]
                     + cj1[:, :, None] * cj1[:, None, :])
            j += 2
        else:
            d = jnp.sqrt(D[:, j, j])
            cvec = (D[:, :, j] / d[:, None]) * (ar >= j)
            L = L + cvec[:, :, None] * _col_onehot(n, j, dt)
            D = D - cvec[:, :, None] * cvec[:, None, :]
            j += 1
    return L


def _chol_inverse_body(D):
    """Blocked Cholesky + triangular inverse of masked SPD blocks —
    the ops/dense.cholesky_inverse algorithm, traced as kernel code."""
    P, c, _ = D.shape
    if c <= _PANEL:
        L = _chol_panel(D, c)
        return L, _nilpotent_inv(L)
    L = jnp.zeros_like(D)
    A = D
    for j0 in range(0, c, _PANEL):
        j1 = j0 + _PANEL
        Lp = _chol_panel(A[:, j0:j1, j0:j1], _PANEL)
        iLp = _nilpotent_inv(Lp)
        # static-pad block writes: Mosaic lowers pad/concat but not
        # scatter (.at[].set)
        L = L + jnp.pad(Lp, ((0, 0), (j0, c - j1), (j0, c - j1)))
        if j1 < c:
            below = _bdot(A[:, j1:, j0:j1], iLp, transpose_b=True)
            L = L + jnp.pad(below, ((0, 0), (j1, 0), (j0, c - j1)))
            upd = _bdot(below, below, transpose_b=True)
            A = A - jnp.pad(upd, ((0, 0), (j1, 0), (j1, 0)))
    return L, _nilpotent_inv(L)


def _kernel(d_ref, l_ref, li_ref):
    L, Li = _chol_inverse_body(d_ref[:])
    l_ref[:] = L
    li_ref[:] = Li


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def cholesky_inverse_pallas(D, tile_p: int | None = None,
                            interpret: bool = False):
    """Batched (P, c, c) masked-SPD Cholesky with triangular inverse as
    ONE Pallas kernel (grid over P/tile_p lane blocks).  Drop-in for
    ops/dense.cholesky_inverse; P is padded to the tile internally
    (padded lanes are identity blocks and factor to identity).

    ``tile_p`` None picks the largest lane tile that keeps the working
    set (~6 live (tp, c, c) arrays) inside VMEM — per-grid-block chain
    cost divides by tp, so bigger is strictly better until VMEM."""
    P, c, _ = D.shape
    if c % _PANEL and c > _PANEL:
        raise ValueError(f"width class {c} not a multiple of {_PANEL}")
    if tile_p is None:
        # the unrolled chain keeps ~10-15 (tp, c, c) values live on the
        # Mosaic stack; 16 MB VMEM caps the tile (measured: tp=64 at
        # c=32 overflows by 1.6 MB at scale)
        tile_p = max(8, min(32, (3 * 2**20) // (6 * c * c * 4)))
    tp = max(1, min(tile_p, P)) if P else 1
    Ppad = -(-max(P, 1) // tp) * tp
    if Ppad != P:
        i = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
        eye = jnp.where(i == j, jnp.ones((), D.dtype), 0)
        D = jnp.concatenate(
            [D, jnp.broadcast_to(eye, (Ppad - P, c, c))], axis=0)
    out_sds = jax.ShapeDtypeStruct((Ppad, c, c), D.dtype)
    L, Li = pl.pallas_call(
        _kernel,
        grid=(Ppad // tp,),
        in_specs=[pl.BlockSpec((tp, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((tp, c, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tp, c, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(out_sds, out_sds),
        interpret=interpret,
    )(D)
    return L[:P], Li[:P]
