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


def _finalize_body(blk, wc, cnt, lane0, dtype):
    """The whole per-bucket finalize on one lane tile: masked-SPD build,
    blocked Cholesky + inverse, panel TRSM-as-GEMM, Linv^T storage and
    the lane-masked diff — the exact ops/supernodal._finalize chain (same
    masks, same order) as straight-line kernel code.

    ``wc`` is (tp, c) with the lane's logical width replicated along the
    last axis: Mosaic cannot broadcast a (tp, 1, 1) value across both
    sublanes and lanes, so every width mask is built from wc with a
    SINGLE-direction broadcast ((tp,c,1) over lanes or (tp,1,c) over
    sublanes), and the two transposes use identity-matmul contractions
    (tpu.transpose is likewise unavailable)."""
    tp, H, c = blk.shape
    i_cc = jax.lax.broadcasted_iota(jnp.int32, (tp, c, c), 1)
    j_cc = jax.lax.broadcasted_iota(jnp.int32, (tp, c, c), 2)
    wi = wc[:, :, None]                  # (tp, c, 1): broadcast lanes
    wj = wc[:, None, :]                  # (tp, 1, c): broadcast sublanes
    valid = (i_cc < wi) & (j_cc < wj)
    top = blk[:, :c, :]
    eye = jnp.where(i_cc == j_cc, jnp.ones((), dtype), 0)
    # masked_spd (ops/dense.py:61): symmetric valid part, identity pad
    D0 = jnp.where(valid & (j_cc <= i_cc), top, 0)
    strict = jnp.where(j_cc < i_cc, D0, 0)
    # batch transpose as an identity contraction over the last axes
    D = D0 + _bdot(eye, strict, transpose_b=True)
    D = D + jnp.where((i_cc == j_cc) & (i_cc >= wi), jnp.ones((), dtype),
                      0)
    L, Linv = _chol_inverse_body(D)
    Ltop = jnp.where(valid, L, 0)
    LinvT = _bdot(eye, Linv, transpose_b=True)
    Ltop = Ltop + jnp.where((j_cc > i_cc) & valid, LinvT, 0)
    Y = _bdot(blk, Linv, transpose_b=True)            # (tp, H, c)
    colv = (jax.lax.broadcasted_iota(jnp.int32, (tp, 1, c), 2)
            < wc[:, None, :])                          # (tp, 1, c)
    Y = jnp.where(colv, Y, 0)
    topout = jnp.where(i_cc < wi, Ltop, Y[:, :c, :])
    # H == c panels have no below-diagonal rows (size-0 slices are not
    # Mosaic-representable)
    out = (topout if H == c
           else jnp.concatenate([topout, Y[:, c:, :]], axis=1))
    lane = lane0 + jax.lax.broadcasted_iota(jnp.int32, (tp, H, c), 0)
    return jnp.where(lane < cnt, out - blk, 0)


def _finalize_kernel(w_ref, cnt_ref, blk_ref, diff_ref, *,
                     blocked_w: bool):
    tp = blk_ref.shape[0]
    lane0 = pl.program_id(0) * tp
    # blocked_w: w arrives as a (tp, c) block (requires tp % 8 == 0 —
    # the TPU block-shape rule); otherwise the full (P, c) array is
    # VMEM-resident and sliced here (small-P buckets only: a 252k-lane
    # leaf bucket's full w is 32 MB and blew the scoped budget at n=1e6)
    wc = w_ref[:] if blocked_w else w_ref[pl.ds(lane0, tp), :]
    diff_ref[:] = _finalize_body(
        blk_ref[:], wc, cnt_ref[0, 0], lane0, blk_ref.dtype)


#: Mosaic scoped-vmem budget for the fused finalize kernel.  The default
#: 16 MB scoped limit is a compiler default, not the physical bound —
#: raising it via CompilerParams.vmem_limit_bytes compiles AND runs on
#: the v5e (measured r5: tp=32 at c=32 wants 22.8 MB, tp=64 ~45 MB).
_FIN_VMEM = 100 * 2**20


def finalize_fused_tile(H: int, c: int, P: int) -> int:
    """Lane tile for finalize_fused_pallas — measured operating points
    (r5, v5e): at c=32 the chain ops use only 32 of 128 lanes and the
    best tile is 32 (36.6 ms vs 41.5/43.5 at 16/64 on the 27k-lane leaf
    bucket); at c=128 tp=4 runs 2.2x faster than tp=1 (8.76 vs 19.6 ms
    at P=512, H=128).  The tile must divide P (small-H buckets are
    64-padded by the plan; tall buckets fall back to the largest
    power-of-two divisor — 1 always works).  Returns 0 when even one
    lane's blocks exceed the scoped-vmem budget (caller falls back to
    the XLA chain)."""
    per_lane_chain = 185 * c * c * 4     # measured live-set upper bound
    tp = 32 if c <= 64 else 4
    # the pipelined in/out windows are multi-buffered by Mosaic (the
    # compiler reported an 8x window footprint on an 8 MB block), so the
    # raw block is capped tightly and the chain stack separately
    while tp and (tp * H * c * 4 > 4 * 2**20
                  or tp * per_lane_chain > 64 * 2**20):
        tp //= 2
    while tp and P % tp:
        tp //= 2
    return tp


@functools.partial(jax.jit, static_argnames=("tp", "interpret"))
def finalize_fused_pallas(blk, w, cnt, tp: int, interpret: bool = False):
    """Per-bucket finalize (ops/supernodal._finalize inner chain) as ONE
    Pallas kernel over lane tiles: blk (P, H, c) window block, w (P,)
    logical widths, cnt scalar true-lane count -> lane-masked diff
    (P, H, c) to add onto the window.  Measured r5: the leaf segment's
    finalize was 48 ms of the 273 ms factorize at n=1e5 — ~24.5 ms of
    serial small-op Cholesky chains and ~19 ms of whole-window
    elementwise mask passes, all fused here into one VMEM-resident pass
    (reference dpotrf/dtrsm pair, parallel_PB_Cholesky_05.h:204-218)."""
    P, H, c = blk.shape
    if P % tp:
        raise ValueError(f"lane count {P} not a multiple of tile {tp}")
    blocked_w = tp % 8 == 0
    return pl.pallas_call(
        functools.partial(_finalize_kernel, blocked_w=blocked_w),
        grid=(P // tp,),
        in_specs=[
            pl.BlockSpec((tp, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            if blocked_w else
            pl.BlockSpec((P, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tp, H, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, H, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, H, c), blk.dtype),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_FIN_VMEM)}),
    )(jnp.broadcast_to(w.astype(jnp.int32)[:, None], (P, c)),
      cnt.reshape(1, 1).astype(jnp.int32), blk)


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
