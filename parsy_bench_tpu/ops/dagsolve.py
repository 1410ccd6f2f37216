"""Coarsened dense-block triangular-solve executor (see
symbolic/dagplan.py for the schedule; reference counterpart:
``lsolveParH2`` over the DAG-LBC schedule, Triangular_CSC.h:76 +
InspectionDAG_03.h:14).

One ``lax.scan`` step per W-column window: scatter the window's entries
into a dense (W, W) lower-triangular block, batched Neumann inverse of
its 16x16 diagonal sub-blocks, unrolled sub-block forward substitution
(W/16 MXU matvecs), then one scatter-add of the off-block contributions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parsy_bench_tpu.ops.dense import nilpotent_inv
from parsy_bench_tpu.symbolic.dagplan import CoarseTrisolvePlan, _SUB


class CoarseTrisolveExecutor:
    """Compiled forward/backward substitution for one CoarseTrisolvePlan."""

    def __init__(self, plan: CoarseTrisolvePlan, dtype=jnp.float32):
        self.plan = plan
        self.dtype = jnp.dtype(dtype)
        self._xs = dict(cols=jnp.asarray(plan.cols),
                        diag=jnp.asarray(plan.diag),
                        bpos=jnp.asarray(plan.bpos),
                        brc=jnp.asarray(plan.brc),
                        opos=jnp.asarray(plan.opos),
                        orow=jnp.asarray(plan.orow),
                        ocol=jnp.asarray(plan.ocol))
        self._solve_lower = jax.jit(self._solve_lower_impl)
        self._solve_upper = jax.jit(self._solve_upper_impl)

    # ------------------------------------------------------------ helpers
    def _dense_block(self, lxp, xs):
        """(W, W) dense block with the window's diagonal on the diagonal
        (identity for padded columns) and sub-block inverses."""
        W = self.plan.W
        d = lxp[xs["diag"]]
        d = jnp.where(xs["cols"] < self.plan.n, d, 1.0)
        flat = jnp.zeros(W * W + 1, self.dtype)
        flat = flat.at[xs["brc"]].set(lxp[xs["bpos"]])
        Ld = flat[:-1].reshape(W, W)
        Ld = Ld + jnp.diag(d)
        nb = W // _SUB
        blocks = Ld.reshape(nb, _SUB, nb, _SUB)
        dblk = jnp.swapaxes(blocks, 1, 2)[jnp.arange(nb), jnp.arange(nb)]
        iL = nilpotent_inv(dblk)                     # (nb, 16, 16)
        return Ld, iL

    def _solve_window(self, Ld, iL, rhs):
        """xg with Ld xg = rhs via unrolled sub-block forward subst."""
        W = self.plan.W
        xg = jnp.zeros(W, self.dtype)
        for b in range(W // _SUB):
            s = b * _SUB
            r = rhs[s:s + _SUB] - Ld[s:s + _SUB, :] @ xg
            xb = iL[b] @ r
            xg = jax.lax.dynamic_update_slice(xg, xb, (s,))
        return xg

    def _solve_window_t(self, Ld, iL, rhs):
        """xg with Ld^T xg = rhs (reverse sub-block order)."""
        W = self.plan.W
        xg = jnp.zeros(W, self.dtype)
        for b in reversed(range(W // _SUB)):
            s = b * _SUB
            r = rhs[s:s + _SUB] - Ld[:, s:s + _SUB].T @ xg
            xb = iL[b].T @ r
            xg = jax.lax.dynamic_update_slice(xg, xb, (s,))
        return xg

    # ------------------------------------------------------------- solves
    def _solve_lower_impl(self, lx, b, xs_all):
        p = self.plan
        lxp = jnp.concatenate([lx.astype(self.dtype),
                               jnp.zeros(1, self.dtype)])
        x = jnp.zeros(p.n + 1, self.dtype)
        bc = jnp.concatenate([b.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])

        def step(carry, xs):
            x, bc = carry
            Ld, iL = self._dense_block(lxp, xs)
            xg = self._solve_window(Ld, iL, bc[xs["cols"]])
            xgp = jnp.concatenate([xg, jnp.zeros(1, self.dtype)])
            x = x.at[xs["cols"]].set(xg)
            contrib = lxp[xs["opos"]] * xgp[xs["ocol"]]
            bc = bc.at[xs["orow"]].add(-contrib)
            return (x.at[p.n].set(0), bc.at[p.n].set(0)), None

        (x, bc), _ = jax.lax.scan(step, (x, bc), xs_all)
        return x[:p.n]

    def _solve_upper_impl(self, lx, b, xs_all):
        p = self.plan
        lxp = jnp.concatenate([lx.astype(self.dtype),
                               jnp.zeros(1, self.dtype)])
        x = jnp.zeros(p.n + 1, self.dtype)
        bp = jnp.concatenate([b.astype(self.dtype),
                              jnp.zeros(1, self.dtype)])

        def step(x, xs):
            Ld, iL = self._dense_block(lxp, xs)
            # off-block contributions: sum_i L[i, j] x[i], i outside window
            contrib = lxp[xs["opos"]] * x[xs["orow"]]
            s = jnp.zeros(p.W + 1, self.dtype).at[xs["ocol"]].add(contrib)
            rhs = bp[xs["cols"]] - s[:p.W]
            xg = self._solve_window_t(Ld, iL, rhs)
            x = x.at[xs["cols"]].set(xg)
            return x.at[p.n].set(0), None

        x, _ = jax.lax.scan(step, x, xs_all, reverse=True)
        return x[:p.n]

    def solve_lower(self, lx, b):
        """x = L^{-1} b over the coarse schedule."""
        return self._solve_lower(jnp.asarray(lx), jnp.asarray(b), self._xs)

    def solve_upper(self, lx, b):
        """x = L^{-T} b over the coarse schedule."""
        return self._solve_upper(jnp.asarray(lx), jnp.asarray(b), self._xs)
