"""End-to-end solver models: analyze -> factorize -> solve.

The user-facing API of the framework, playing the role of the reference's
benchmark drivers (examples/choleskyTest01.cpp: readMatrix -> analyze_p2 ->
cholesky_left_par_05 -> verify; examples/triangularTest02.cpp for trisolve).
``analyze`` is the host inspector (ordering + symbolic + plan), ``factorize``
and ``solve`` run jitted on the device.
"""
from __future__ import annotations

import numpy as np

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core.csc import CSC
from parsy_bench_tpu.ops.simplicial import SimplicialExecutor
from parsy_bench_tpu.symbolic.etree import etree, postorder
from parsy_bench_tpu.symbolic.colcounts import col_counts, symbolic_pattern
from parsy_bench_tpu.symbolic.ordering import compute_ordering
from parsy_bench_tpu.symbolic.plan import plan_from_pattern


class NotPositiveDefiniteError(RuntimeError):
    """The numeric factorization hit a non-positive pivot.

    The reference treats dpotrf info != 0 as a first-class abort
    (parallel_PB_Cholesky_05.h:206-207, sereial_Cholesky_01.h:46-47); in
    the functional executors a failed pivot surfaces as NaN in the panel
    pools, detected by one device-side isfinite reduction after
    ``factorize``."""


class CholeskySolver:
    """Sparse SPD solver: A x = b via L L^T with fill-reducing ordering.

    >>> s = CholeskySolver(a, SolverConfig(ordering="amd")).factorize()
    >>> x = s.solve(b)
    """

    def __init__(self, a: CSC, config: SolverConfig | None = None):
        import time as _time
        self.config = config or SolverConfig()
        if not a.is_lower():
            a = a.lower_half()
        self.a = a
        #: per-stage inspector wall times (SURVEY §5.1 — the reference
        #: splits symbolic time into ordering vs analysis,
        #: choleskyTest01.cpp:136-138)
        self.timings: dict = {}
        _t0 = _time.perf_counter()

        def _mark(key):
            nonlocal _t0
            now = _time.perf_counter()
            self.timings[key] = round(now - _t0, 3)
            _t0 = now
        # ---- inspector (host, once per pattern) -----------------------
        # fill-reducing ordering composed with a weighted postorder of the
        # etree (the reference fuses the same two permutations,
        # LSparsity.h:670-723) so supernode columns are contiguous.
        fill_perm = compute_ordering(a, self.config.ordering,
                                     self.config.given_perm)
        _mark("ordering_s")
        ap1 = a.permute(fill_perm)
        parent1 = etree(ap1)
        cc1 = col_counts(ap1, parent1)
        post = postorder(parent1, weights=cc1)
        self.perm = fill_perm[post]
        self.ap = ap1.permute(post)
        self.parent = etree(self.ap)
        self.cc = col_counts(self.ap, self.parent)
        _mark("etree_s")
        # the simplicial pattern is LAZY for the supernodal tier: the
        # layout's row patterns come from the native etree walk and only
        # verification paths (factor_residual / factor_csc) materialize
        # nnz(L) indices — the reference analyze likewise never stores a
        # simplicial pattern on its supernodal path (LSparsity.h:256)
        self._lpat = None

        if self.config.tier == "supernodal":
            from parsy_bench_tpu.ops.supernodal import SupernodalExecutor
            from parsy_bench_tpu.symbolic.splan import build_supernodal_plan
            self.plan = build_supernodal_plan(
                self.ap, self.parent, self.cc, None, self.config)
            _mark("plan_s")
            if self.config.verify:
                from parsy_bench_tpu.symbolic.verify import verify_plan
                verify_plan(self.plan)
                _mark("verify_s")
            self.executor = SupernodalExecutor(self.plan,
                                               dtype=self.config.dtype)
            _mark("executor_init_s")
        else:
            from parsy_bench_tpu.symbolic.etree import tree_levels
            lev = tree_levels(self.parent)
            self.plan = plan_from_pattern(self.lpat, lev, a=self.ap,
                                          with_updates=True)
            self.executor = SimplicialExecutor(self.plan,
                                               dtype=self.config.dtype)
        self.lx = None
        # scatter helpers: x[perm[r]] = xp[r]
        self._inv = np.empty(a.n, dtype=np.int64)
        self._inv[self.perm] = np.arange(a.n)

    @property
    def lpat(self):
        """Simplicial L pattern (csc), materialized on first use."""
        if self._lpat is None:
            import time as _time
            t0 = _time.perf_counter()
            self._lpat = symbolic_pattern(self.ap, self.parent)
            self.timings["pattern_s"] = round(_time.perf_counter() - t0, 3)
        return self._lpat

    # ------------------------------------------------------------ numeric
    def factorize(self, a: CSC | None = None,
                  check_spd: bool = True) -> "CholeskySolver":
        """Numeric factorization; ``a`` may carry new values on the same
        pattern (the inspector is reused, reference contract of analyze_p2
        once / factor many, choleskyTest01.cpp:199-277).

        ``check_spd`` (default): raise :class:`NotPositiveDefiniteError`
        when the factorization encountered a non-positive pivot — the
        dpotrf info != 0 abort of the reference executor
        (parallel_PB_Cholesky_05.h:206-207).  One fused device-side
        reduction (a single scalar fetch); it still blocks async dispatch,
        so pass False on hot re-factorization loops that gate elsewhere
        (the executor-level loop helpers never check)."""
        data = self.ap.data if a is None else a.permute(self.perm).data
        self.lx = self.executor.factorize(data)
        self._spd_ok = None
        if check_spd and not self.factor_ok():
            raise NotPositiveDefiniteError(
                "matrix is not positive definite (non-positive pivot "
                "during numeric factorization)")
        return self

    def solve(self, b: np.ndarray) -> np.ndarray:
        """x = A^{-1} b (factorize() must have run)."""
        if self.lx is None:
            raise RuntimeError("call factorize() first")
        bp = np.asarray(b)[self.perm]
        xp = self.executor.solve_spd(self.lx, bp)
        x = np.asarray(xp)[self._inv]
        for _ in range(self.config.refine_steps):
            r = b - self.a.matvec(x)
            xp = self.executor.solve_spd(self.lx, r[self.perm])
            x = x + np.asarray(xp)[self._inv]
        return x

    def _l_values(self) -> np.ndarray:
        """Simplicial-pattern L values, whichever tier produced them."""
        if self.lx is None:
            raise RuntimeError("call factorize() first")
        if self.config.tier == "supernodal":
            return np.asarray(self.executor.factor_values(self.lx),
                              dtype=np.float64)
        return np.asarray(self.lx, dtype=np.float64)

    # ----------------------------------------------------------- checking
    def factor_residual(self) -> float:
        """|| L L^T - A(p,p) ||_F / || A ||_F — the verification bar the
        reference implements via CHOLMOD elementwise comparison
        (choleskyTest01.cpp:529-546)."""
        import scipy.sparse as sp
        lx = self._l_values()
        l = sp.csc_matrix((lx, self.lpat.indices, self.lpat.indptr),
                          shape=(self.a.n, self.a.n))
        full = self.ap.symmetrize_from_lower().to_scipy()
        diff = (l @ l.T - full)
        denom = sp.linalg.norm(full)
        return float(sp.linalg.norm(diff) / denom)

    def solve_residual(self, b: np.ndarray, x: np.ndarray) -> float:
        r = b - self.a.matvec(x)
        return float(np.linalg.norm(r) / max(np.linalg.norm(b), 1e-30))

    def factor_ok(self) -> bool:
        """SPD failure detection: the reference aborts when dpotrf reports
        a non-positive pivot (parallel_PB_Cholesky_05.h:206-207); here a
        failed pivot surfaces as NaN in the factor pools, detected with
        ONE fused on-device isfinite reduction across all pools (a single
        scalar fetch, no host transfer of L).  Cached per factorization."""
        if self.lx is None:
            raise RuntimeError("call factorize() first")
        if getattr(self, "_spd_ok", None) is None:
            import jax
            import jax.numpy as jnp
            if not hasattr(CholeskySolver, "_spd_check_j"):
                CholeskySolver._spd_check_j = jax.jit(
                    lambda parts: jnp.all(jnp.stack(
                        [jnp.all(jnp.isfinite(p)) for p in parts])))
            parts = self.lx if isinstance(self.lx, tuple) else (self.lx,)
            self._spd_ok = bool(CholeskySolver._spd_check_j(tuple(parts)))
        return self._spd_ok

    def factor_csc(self) -> CSC:
        """The numeric factor L (permuted ordering) as a host CSC."""
        return CSC(self.a.n, self.lpat.indptr.astype(np.int32),
                   self.lpat.indices.astype(np.int32), self._l_values())

    # ------------------------------------------------- analysis caching
    def save_analysis(self, path: str) -> None:
        """Serialize the inspector output (permutation + plan) — the
        checkpointable symbolic artifact (SURVEY §5.4; the reference's
        cacheable-ordering contract, common/Util.h:187)."""
        from parsy_bench_tpu.core.io import save_artifact
        # _lpat may be None (lazy): the artifact stays lean and the
        # pattern is recomputed on demand after a restore
        save_artifact(path, {"perm": self.perm, "plan": self.plan,
                             "lpat": self._lpat, "parent": self.parent,
                             "cc": self.cc},
                      meta={"n": self.a.n, "nnz": self.a.nnz,
                            "tier": self.config.tier})

    @classmethod
    def from_artifact(cls, a: CSC, path: str,
                      config: SolverConfig | None = None) -> "CholeskySolver":
        """Restore a solver from a saved analysis, skipping the whole
        inspector (ordering, symbolic, plan emission) — the resume half of
        the reference's cacheable-symbolic contract (common/Util.h:187,
        LSparsity.h:446 GIVEN path).  ``a`` must have the sparsity pattern
        the analysis was computed for; only its numeric values are used."""
        from parsy_bench_tpu.core.io import load_artifact
        obj, meta = load_artifact(path)
        if meta.get("n") != a.n or meta.get("nnz") != a.lower_half().nnz:
            raise ValueError(
                f"artifact is for n={meta.get('n')}/nnz={meta.get('nnz')}, "
                f"matrix has n={a.n}")
        self = cls.__new__(cls)
        art_tier = meta.get("tier", "supernodal")
        if config is not None and config.tier != art_tier:
            import warnings
            warnings.warn(
                f"artifact was analyzed for tier={art_tier!r}; overriding "
                f"config tier={config.tier!r}", stacklevel=2)
        self.config = (config or SolverConfig()).replace(tier=art_tier)
        self.a = a if a.is_lower() else a.lower_half()
        self.perm = obj["perm"]
        self.ap = self.a.permute(self.perm)
        self.parent = obj["parent"]
        self.cc = obj["cc"]
        self._lpat = obj["lpat"]
        self.timings = {}
        self.plan = obj["plan"]
        if self.config.tier == "supernodal":
            from parsy_bench_tpu.ops.supernodal import SupernodalExecutor
            if self.config.verify:
                from parsy_bench_tpu.symbolic.verify import verify_plan
                verify_plan(self.plan)
            self.executor = SupernodalExecutor(self.plan,
                                               dtype=self.config.dtype)
        else:
            self.executor = SimplicialExecutor(self.plan,
                                               dtype=self.config.dtype)
        self.lx = None
        self._inv = np.empty(a.n, dtype=np.int64)
        self._inv[self.perm] = np.arange(a.n)
        return self


class TriangularSolver:
    """Level-set parallel solver for a given lower-triangular L (general,
    possibly non-chordal DAG — reference: triangularTest_DAG_nonChordal.cpp
    and lsolvePar, Triangular_CSC.h:50).

    tier="simplicial": scalar level-scheduled executor (any pattern);
    tier="supernodal": blocked BCSC panels from value-pattern supernode
    detection (reference Inspection_Block.h:7 + Triangular_BCSC.h:171).
    """

    def __init__(self, l: CSC, config: SolverConfig | None = None):
        self.config = config or SolverConfig()
        self.l = l
        import jax
        import jax.numpy as jnp
        if self.config.tier == "supernodal":
            from parsy_bench_tpu.ops.supernodal import SupernodalExecutor
            from parsy_bench_tpu.symbolic.strisolve import build_trisolve_plan
            self.plan = build_trisolve_plan(l, self.config)
            self.executor = SupernodalExecutor(self.plan,
                                               dtype=self.config.dtype)
            # the "A scatter" of the layout maps L's entries straight into
            # the class pools — for trisolve the input IS the factor;
            # prepare_solve_pools stores the diag-block inverses the
            # solves read from the strict upper triangles
            self._lx = self.executor.prepare_solve_pools(
                self.executor._init_pools_j(jnp.asarray(l.data)))
        else:
            from parsy_bench_tpu.symbolic.plan import dag_levels
            import scipy.sparse as sp
            lpat = sp.csc_matrix(
                (np.ones(l.nnz, dtype=np.int8), l.indices, l.indptr),
                shape=(l.n, l.n))
            self.levels = dag_levels(lpat)
            sched = self.config.trisolve_schedule
            if sched == "auto":
                from parsy_bench_tpu.symbolic.dagplan import choose_schedule
                sched = choose_schedule(l, self.levels,
                                        self.config.coarse_width)
            self.schedule = sched
            if sched == "coarsened":
                from parsy_bench_tpu.ops.dagsolve import (
                    CoarseTrisolveExecutor)
                from parsy_bench_tpu.symbolic.dagplan import (
                    build_coarse_trisolve)
                self.plan = build_coarse_trisolve(
                    l, self.levels, self.config.coarse_width)
                self.executor = CoarseTrisolveExecutor(
                    self.plan, dtype=self.config.dtype)
                self._lx = jnp.asarray(l.data, dtype=self.executor.dtype)
            else:
                self.plan = plan_from_pattern(lpat, self.levels, a=None,
                                              with_updates=False)
                self.executor = SimplicialExecutor(self.plan,
                                                   dtype=self.config.dtype)
                self._lx = jnp.asarray(l.data, dtype=self.executor.dtype)

    @property
    def nlev(self) -> int:
        return self.plan.nlev

    def solve(self, b: np.ndarray) -> np.ndarray:
        """x = L^{-1} b (forward substitution, level-parallel)."""
        return np.asarray(self.executor.solve_lower(self._lx, b))

    def solve_transposed(self, b: np.ndarray) -> np.ndarray:
        """x = L^{-T} b (backward substitution)."""
        return np.asarray(self.executor.solve_upper(self._lx, b))

    def pruned(self, rhs_rows: np.ndarray):
        """Sparse-RHS solver restricted to the reach set of ``rhs_rows``
        (reference: reach + lsolve_reach_dec, common/Reach.h:14 and
        Triangular_CSC.h:225 — SURVEY P4).  The reach is computed once per
        RHS pattern; the returned object solves many numeric RHS with that
        pattern, touching only the active columns.

        tier="supernodal" returns the blocked pruned solver (reach over
        the supernode DAG + batched panel solve on the active subset —
        blockedPrunedLSolve, Triangular_BCSC.h:55)."""
        if self.config.tier == "supernodal":
            return PrunedBlockedTriangularSolve(
                self.l, self.plan, np.asarray(rhs_rows), self.config)
        return PrunedTriangularSolve(self.l, np.asarray(rhs_rows),
                                     self.config)


class PrunedBlockedTriangularSolve:
    """Blocked (BCSC) solve on the supernodal-reach-restricted subset
    (reference: blockedPrunedLSolve, Triangular_BCSC.h:55-109, with the
    reach mapped to supernodes by reach_sn, Reach.h:31).

    The active supernode set is closed under the supernode DAG, so every
    below-diagonal row of an active panel lands in an active column and
    the restricted submatrix keeps the full blocked structure; work is
    proportional to the active panels, not n."""

    def __init__(self, l: CSC, plan, rhs_rows: np.ndarray,
                 config: SolverConfig | None = None):
        import jax
        import jax.numpy as jnp
        from parsy_bench_tpu.ops.supernodal import SupernodalExecutor
        from parsy_bench_tpu.symbolic.reach import reach_sn
        from parsy_bench_tpu.symbolic.strisolve import build_trisolve_plan
        self.config = config or SolverConfig()
        lay = plan.layout
        part = lay.part
        self.n = l.n
        self.sn_reach = reach_sn(lay.rptr, lay.rows, part.sptr,
                                 part.col2sup, rhs_rows)
        cols = np.concatenate([
            np.arange(part.sptr[s], part.sptr[s + 1])
            for s in self.sn_reach]) if len(self.sn_reach) else \
            np.zeros(0, dtype=np.int64)
        self.cols = cols.astype(np.int64)
        sub = l.to_scipy()[np.ix_(self.cols, self.cols)].tocsc()
        sub.sort_indices()
        lsub = CSC(len(self.cols), sub.indptr.astype(np.int64),
                   sub.indices.astype(np.int64), sub.data)
        self.plan = build_trisolve_plan(lsub, self.config)
        self.executor = SupernodalExecutor(self.plan,
                                           dtype=self.config.dtype)
        self._lx = self.executor.prepare_solve_pools(
            self.executor._init_pools_j(jnp.asarray(lsub.data)))

    def solve(self, b: np.ndarray) -> np.ndarray:
        """x = L^{-1} b where b is nonzero only on the RHS pattern; work
        is proportional to the active supernodes, not n."""
        xr = np.asarray(self.executor.solve_lower(self._lx, b[self.cols]))
        x = np.zeros(self.n, dtype=xr.dtype)
        x[self.cols] = xr
        return x


class PrunedTriangularSolve:
    """Level-scheduled solve on the reach-restricted submatrix."""

    def __init__(self, l: CSC, rhs_rows: np.ndarray,
                 config: SolverConfig | None = None):
        import scipy.sparse as sp
        from parsy_bench_tpu.symbolic.reach import reach
        from parsy_bench_tpu.symbolic.plan import (dag_levels,
                                                   plan_from_pattern)
        self.config = config or SolverConfig()
        lpat = sp.csc_matrix(
            (np.ones(l.nnz, dtype=np.int8), l.indices, l.indptr),
            shape=(l.n, l.n))
        self.reach = reach(lpat, rhs_rows)
        self.n = l.n
        sub = l.to_scipy()[np.ix_(self.reach, self.reach)].tocsc()
        sub.sort_indices()
        lev = dag_levels(sp.csc_matrix(
            (np.ones(sub.nnz, dtype=np.int8), sub.indices, sub.indptr),
            shape=sub.shape))
        self.plan = plan_from_pattern(
            sp.csc_matrix((np.ones(sub.nnz, dtype=np.int8), sub.indices,
                           sub.indptr), shape=sub.shape),
            lev, a=None, with_updates=False)
        self.executor = SimplicialExecutor(self.plan,
                                           dtype=self.config.dtype)
        import jax.numpy as jnp
        self._lx = jnp.asarray(sub.data, dtype=self.executor.dtype)

    def solve(self, b: np.ndarray) -> np.ndarray:
        """x = L^{-1} b where b is nonzero only on the RHS pattern; work is
        proportional to the reach set, not n."""
        xr = np.asarray(self.executor.solve_lower(self._lx, b[self.reach]))
        x = np.zeros(self.n, dtype=xr.dtype)
        x[self.reach] = xr
        return x
