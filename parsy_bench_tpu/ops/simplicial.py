"""Level-scheduled simplicial executors (the correctness tier).

One jitted XLA computation per operation.  Wavefront levels are grouped into
contiguous **segments** of similar size; each segment's per-level index
tables are padded to the segment maximum and executed with one
``lax.scan`` — so compile time is O(#segments), not O(#levels), while
padding overhead stays bounded (deep etree tails of thousands of tiny levels
become a single scan).  This is the TPU-native form of the reference's
simplicial kernels:

* factorize  — left-looking Cholesky (reference: cholesky_left_01,
  cholesky/sereial_Cholesky_01.h:13, and its wavefront-parallel schedule,
  Parallel_PB_Cholesky_wavefront.h:35);
* solve_lower — level-set parallel L x = b (reference: lsolve / lsolvePar,
  triangularSolve/Triangular_CSC.h:14,50 — ``omp atomic`` scatter becomes
  ``.at[].add``);
* solve_upper — L^T x = b by the same schedule reversed.

Padding trick: every gather/scatter index table carries one extra "dummy"
slot at the end of the value vector (position nnz for factor values,
position n for solution vectors).  Padded lanes read zeros from and write
zeros to the dummy slot, so no masking is needed inside the scanned body.

The supernodal executor (ops/supernodal.py) is the performance tier; this
one is the specification and works for any pattern.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from parsy_bench_tpu.symbolic.plan import SimplicialPlan

#: close a scan segment when padding would exceed this multiple of true work
_PAD_ALPHA = 1.25
#: fixed per-level slack so tiny neighbouring levels coalesce freely
_PAD_SLACK = 64.0


def segment_levels(counts: np.ndarray, alpha: float = _PAD_ALPHA,
                   slack: float = _PAD_SLACK) -> list[tuple[int, int]]:
    """Split the level sequence into contiguous runs [(t0, t1), ...).

    ``counts`` is (nlev, k) per-level work sizes.  A run is closed when
    padding everything in it to the running maxima would exceed
    ``_PAD_ALPHA * true + _PAD_SLACK * len`` — wavefront level sizes decay
    roughly monotonically, so runs coalesce the long tail of tiny levels.
    """
    counts = np.atleast_2d(np.asarray(counts, dtype=np.float64))
    nlev = counts.shape[0]
    segs: list[tuple[int, int]] = []
    t0 = 0
    while t0 < nlev:
        t1 = t0 + 1
        run_max = counts[t0].copy()
        run_sum = float(counts[t0].sum())
        while t1 < nlev:
            new_max = np.maximum(run_max, counts[t1])
            new_sum = run_sum + float(counts[t1].sum())
            padded = float(new_max.sum()) * (t1 - t0 + 1)
            if padded > alpha * new_sum + slack * (t1 - t0 + 1):
                break
            run_max, run_sum = new_max, new_sum
            t1 += 1
        segs.append((t0, t1))
        t0 = t1
    return segs


def _pad_stack(flat: np.ndarray, offsets: np.ndarray, t0: int, t1: int,
               width: int, fill: int) -> np.ndarray:
    """Stack flat[offsets[t]:offsets[t+1]] for t in [t0, t1) into a
    (t1-t0, width) int32 array padded with ``fill``."""
    out = np.full((t1 - t0, width), fill, dtype=np.int32)
    for r, t in enumerate(range(t0, t1)):
        s, e = int(offsets[t]), int(offsets[t + 1])
        out[r, :e - s] = flat[s:e]
    return out


@dataclasses.dataclass
class _Segment:
    """Device-resident padded index tables for one scanned run of levels."""
    nsteps: int
    diag: jax.Array      # (T, C)  positions of diagonals; pad=nnz
    cols: jax.Array      # (T, C)  column ids;              pad=n
    off_idx: jax.Array   # (T, O)  off-diag positions;      pad=nnz
    off_row: jax.Array   # (T, O)  global rows;             pad=n
    off_lcol: jax.Array  # (T, O)  col index within level;  pad=0
    upd_a: jax.Array     # (T, U)  L[i,k] positions;        pad=nnz
    upd_b: jax.Array     # (T, U)  L[j,k] positions;        pad=nnz
    upd_dst: jax.Array   # (T, U)  L[i,j] positions;        pad=nnz


class SimplicialExecutor:
    """Compiled numeric phase for one ``SimplicialPlan``.

    Arrays live on the default device; ``factorize`` / ``solve_*`` are jitted
    closures over them.  ``dtype`` is the numeric working precision
    (float32 on TPU; float64 under x64 on CPU for oracle tests).
    """

    def __init__(self, plan: SimplicialPlan, dtype=jnp.float32):
        self.plan = plan
        self.dtype = jnp.dtype(dtype)
        p = plan
        n, nnz = p.n, p.nnz

        ccnt = np.diff(p.col_off)
        ocnt = np.diff(p.off_off)
        ucnt = np.diff(p.upd_off)
        self._segs: list[_Segment] = []
        for (t0, t1) in segment_levels(
                np.stack([ccnt, ocnt, ucnt], axis=1)):
            cw = int(ccnt[t0:t1].max(initial=0))
            ow = int(ocnt[t0:t1].max(initial=0))
            uw = int(ucnt[t0:t1].max(initial=0))
            self._segs.append(_Segment(
                nsteps=t1 - t0,
                diag=jnp.asarray(_pad_stack(p.diag, p.col_off, t0, t1, cw, nnz)),
                cols=jnp.asarray(_pad_stack(p.cols, p.col_off, t0, t1, cw, n)),
                off_idx=jnp.asarray(
                    _pad_stack(p.off_idx, p.off_off, t0, t1, ow, nnz)),
                off_row=jnp.asarray(
                    _pad_stack(p.off_row, p.off_off, t0, t1, ow, n)),
                off_lcol=jnp.asarray(
                    _pad_stack(p.off_lcol, p.off_off, t0, t1, ow, 0)),
                upd_a=jnp.asarray(
                    _pad_stack(p.upd_a, p.upd_off, t0, t1, uw, nnz)),
                upd_b=jnp.asarray(
                    _pad_stack(p.upd_b, p.upd_off, t0, t1, uw, nnz)),
                upd_dst=jnp.asarray(
                    _pad_stack(p.upd_dst, p.upd_off, t0, t1, uw, nnz)),
            ))
        self._a_map = jnp.asarray(p.a_map)
        # index tables are jit ARGUMENTS, not closures, so they lower as
        # parameters instead of embedded constants (compile-time guard)
        self._seg_args = [(sg.cols, sg.diag, sg.off_idx, sg.off_row,
                           sg.off_lcol, sg.upd_a, sg.upd_b, sg.upd_dst)
                          for sg in self._segs]
        self._factorize = jax.jit(self._factorize_impl)
        self._solve_lower = jax.jit(self._solve_lower_impl)
        self._solve_upper = jax.jit(self._solve_upper_impl)
        self._solve_spd = jax.jit(
            lambda lx, b, seg_args: self._solve_upper_impl(
                lx, self._solve_lower_impl(lx, b, seg_args), seg_args))

    @property
    def num_segments(self) -> int:
        return len(self._segs)

    # ------------------------------------------------------------- factor
    def _factorize_impl(self, a_data, seg_args):
        p = self.plan
        # one dummy slot at position nnz absorbs all padded reads/writes
        lx = jnp.zeros(p.nnz + 1, self.dtype)
        lx = lx.at[self._a_map].add(a_data.astype(self.dtype))

        def step(lx, xs):
            diag, oidx, olcol, ua, ub, udst = xs
            s = jnp.sqrt(lx[diag])
            lx = lx.at[diag].set(s)
            vals = lx[oidx] / s[olcol]
            lx = lx.at[oidx].set(vals)
            upd = lx[ua] * lx[ub]
            lx = lx.at[udst].add(-upd)
            return lx.at[p.nnz].set(0), None

        for (cols, diag, oidx, orow, olcol, ua, ub, udst) in seg_args:
            lx, _ = jax.lax.scan(
                step, lx, (diag, oidx, olcol, ua, ub, udst))
        return lx[:p.nnz]

    def factorize(self, a_data) -> jax.Array:
        """Numeric Cholesky: A (data in the plan's CSC order) -> L values."""
        return self._factorize(jnp.asarray(a_data), self._seg_args)

    # ------------------------------------------------------------- solves
    def _solve_lower_impl(self, lx, b, seg_args):
        p = self.plan
        lxp = jnp.concatenate([lx.astype(self.dtype),
                               jnp.zeros(1, self.dtype)])
        x = jnp.zeros(p.n + 1, self.dtype)
        bc = jnp.concatenate([b.astype(self.dtype), jnp.zeros(1, self.dtype)])

        def step(carry, xs):
            x, bc = carry
            cols, diag, oidx, orow, olcol = xs
            xt = bc[cols] / lxp[diag]
            x = x.at[cols].set(xt)
            contrib = lxp[oidx] * xt[olcol]
            bc = bc.at[orow].add(-contrib)
            return (x.at[p.n].set(0), bc.at[p.n].set(0)), None

        for (cols, diag, oidx, orow, olcol, *_u) in seg_args:
            (x, bc), _ = jax.lax.scan(
                step, (x, bc), (cols, diag, oidx, orow, olcol))
        return x[:p.n]

    def _solve_upper_impl(self, lx, b, seg_args):
        p = self.plan
        lxp = jnp.concatenate([lx.astype(self.dtype),
                               jnp.zeros(1, self.dtype)])
        x = jnp.zeros(p.n + 1, self.dtype)
        bp = jnp.concatenate([b.astype(self.dtype), jnp.zeros(1, self.dtype)])

        def step(x, xs):
            cols, diag, oidx, orow, olcol = xs
            ow = oidx.shape[0]
            contrib = lxp[oidx] * x[orow]
            s = jnp.zeros(cols.shape[0] + 1, self.dtype)
            lcol_safe = jnp.where(oidx == p.nnz, cols.shape[0], olcol)
            s = s.at[lcol_safe].add(contrib)
            xt = (bp[cols] - s[:-1]) / lxp[diag]
            x = x.at[cols].set(xt)
            return x.at[p.n].set(0), None

        for (cols, diag, oidx, orow, olcol, *_u) in reversed(seg_args):
            x, _ = jax.lax.scan(
                step, x, (cols, diag, oidx, orow, olcol), reverse=True)
        return x[:p.n]

    def solve_lower(self, lx, b) -> jax.Array:
        """x = L^{-1} b (forward substitution, level-parallel)."""
        return self._solve_lower(jnp.asarray(lx), jnp.asarray(b),
                                 self._seg_args)

    def solve_upper(self, lx, b) -> jax.Array:
        """x = L^{-T} b (backward substitution, level-parallel)."""
        return self._solve_upper(jnp.asarray(lx), jnp.asarray(b),
                                 self._seg_args)

    def solve_spd(self, lx, b) -> jax.Array:
        """x = A^{-1} b given the factor values (two triangular solves)."""
        return self._solve_spd(jnp.asarray(lx), jnp.asarray(b),
                                self._seg_args)

    # ------------------------------------------------------------ exports
    def factor_csc(self, lx) -> "np.ndarray":
        """Host copy of L values (in plan CSC order)."""
        return np.asarray(lx)
