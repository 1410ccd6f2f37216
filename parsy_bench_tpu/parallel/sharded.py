"""SPMD simplicial executors over a jax.sharding.Mesh.

The reference's shared-memory parallelism (w-partitions executed by OpenMP
threads, conflicts resolved with ``omp atomic`` — SURVEY P2/P7) becomes:

* each wavefront level's **update set is sharded across devices** along the
  mesh axis ``"p"`` (the w-partition owner axis of SolverConfig);
* every device applies its update shard into a private zero accumulator;
* one ``psum`` over ``"p"`` reduces the accumulators — the TPU-native,
  race-free replacement for the atomic scatter (collectives ride ICI);
* the O(cols-per-level) scale/divide step is replicated (it is negligible
  next to the update work, exactly like the reference's serial in-partition
  node loop).

The factor values ``lx`` stay replicated across devices; only the update
streams are partitioned.  This is the update-parallel (data-parallel over
work items) scheme; the supernodal tier adds panel ownership partitioning
on top (SURVEY §7E).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from parsy_bench_tpu.symbolic.plan import SimplicialPlan
from parsy_bench_tpu.ops.simplicial import segment_levels, _pad_stack


def _pad_stack_sharded(flat, offsets, t0, t1, width, fill, nshards):
    """Like _pad_stack but width is rounded up to a multiple of nshards so
    each device receives an equal contiguous slice per step."""
    w = max(nshards, -(-width // nshards) * nshards)
    return _pad_stack(flat, offsets, t0, t1, w, fill)


class ShardedSupernodalExecutor:
    """Supernodal factorization over a 1-D device mesh.

    The plan must be built with ``config.num_partitions == mesh size``:
    update chunks are cost-packed over the shard axis at inspection time
    (splan.py ``_shard_of``, the reference's worstFitBinPack role,
    TreeUtils.h:217); each device scatter-adds its own chunks into a
    private delta window, and one contiguous-window ``psum`` per level
    step reduces them — the ICI collective that replaces the reference's
    shared-memory atomic scatter (P7).  Panel finalization (potrf/trsm) is
    replicated: every device runs the identical batched kernels so the
    pools stay consistent with no extra communication.
    """

    def __init__(self, plan, mesh: Mesh, dtype=jnp.float32):
        from parsy_bench_tpu.ops.supernodal import SupernodalExecutor
        if mesh.axis_names != ("p",):
            raise ValueError("mesh must have a single axis named 'p'")
        G = plan.nshards
        if mesh.shape["p"] != G:
            raise ValueError(
                f"plan built for {G} partitions, mesh has {mesh.shape['p']}")
        self.plan = plan
        self.mesh = mesh
        self._inner = SupernodalExecutor(plan, dtype=dtype)
        ex = self._inner

        rep = P()
        # the packed update-table buffer is (G, L): shard its G axis so
        # each device holds only its own partition's index tables
        self._factorize = jax.jit(jax.shard_map(
            lambda a_data, fr, fu: ex._factorize_impl(
                a_data, fr, fu, axis_name="p"),
            mesh=mesh, in_specs=(rep, rep, P("p", None)),
            out_specs=tuple(rep for _ in plan.classes), check_vma=False))
        pool_specs = tuple(rep for _ in plan.classes)
        # SPMD triangular solves: panel lanes owner-striped, per-step
        # additive psum (see _solve_lower_impl)
        self._solve = jax.jit(jax.shard_map(
            lambda pools, b, fr: ex._solve_upper_impl(
                pools, ex._solve_lower_impl(pools, b, fr, axis_name="p"),
                fr, axis_name="p"),
            mesh=mesh, in_specs=(pool_specs, rep, rep),
            out_specs=rep, check_vma=False))
        self._solve_lower = jax.jit(jax.shard_map(
            lambda pools, b, fr: ex._solve_lower_impl(
                pools, b, fr, axis_name="p"),
            mesh=mesh, in_specs=(pool_specs, rep, rep),
            out_specs=rep, check_vma=False))

    def factorize(self, a_data):
        """Replicated panel pools from the SPMD factorization."""
        return self._factorize(jnp.asarray(a_data), self._inner._flat_rep,
                               self._inner._flat_upd)

    def solve_spd(self, pools, b):
        """A^{-1} b via SPMD forward+backward blocked substitution."""
        return self._solve(pools, jnp.asarray(b), self._inner._flat_rep)

    def solve_lower(self, pools, b):
        """L^{-1} b, SPMD (the sharded blocked-trisolve headline path)."""
        return self._solve_lower(pools, jnp.asarray(b),
                                 self._inner._flat_rep)

    def factor_values(self, pools):
        return self._inner.factor_values(pools)


class ShardedSimplicialExecutor:
    """Numeric phase of a ``SimplicialPlan`` parallelised over ``mesh``.

    ``mesh`` must be a 1-D mesh with axis name ``"p"``; its size plays the
    role of the reference's thread count / innerParts (choleskyTest01 CLI
    arg, SURVEY §1 L4).
    """

    def __init__(self, plan: SimplicialPlan, mesh: Mesh, dtype=jnp.float32):
        if mesh.axis_names != ("p",):
            raise ValueError("mesh must have a single axis named 'p'")
        self.plan = plan
        self.mesh = mesh
        self.nshards = mesh.shape["p"]
        self.dtype = jnp.dtype(dtype)
        p = plan
        n, nnz, k = p.n, p.nnz, self.nshards

        ccnt = np.diff(p.col_off)
        ocnt = np.diff(p.off_off)
        ucnt = np.diff(p.upd_off)
        segs = segment_levels(np.stack([ccnt, ocnt, ucnt], axis=1))
        self._segs = []
        for (t0, t1) in segs:
            cw = int(ccnt[t0:t1].max(initial=0))
            ow = int(ocnt[t0:t1].max(initial=0))
            uw = int(ucnt[t0:t1].max(initial=0))
            self._segs.append(dict(
                diag=jnp.asarray(_pad_stack(p.diag, p.col_off, t0, t1, cw, nnz)),
                off_idx=jnp.asarray(
                    _pad_stack(p.off_idx, p.off_off, t0, t1, ow, nnz)),
                off_lcol=jnp.asarray(
                    _pad_stack(p.off_lcol, p.off_off, t0, t1, ow, 0)),
                # update stream: sharded axis — equal slice per device
                upd_a=jnp.asarray(_pad_stack_sharded(
                    p.upd_a, p.upd_off, t0, t1, uw, nnz, k)),
                upd_b=jnp.asarray(_pad_stack_sharded(
                    p.upd_b, p.upd_off, t0, t1, uw, nnz, k)),
                upd_dst=jnp.asarray(_pad_stack_sharded(
                    p.upd_dst, p.upd_off, t0, t1, uw, nnz, k)),
            ))
        self._a_map = jnp.asarray(p.a_map)

        spec_rep = P()          # replicated
        spec_upd = P(None, "p")  # (steps, stream) — stream axis sharded
        in_specs = []
        for _ in self._segs:
            in_specs.extend([spec_rep, spec_rep, spec_rep,
                             spec_upd, spec_upd, spec_upd])

        def _factorize(a_data, *seg_arrays):
            lx = jnp.zeros(nnz + 1, self.dtype)
            lx = lx.at[self._a_map].add(a_data.astype(self.dtype))

            def step(lx, xs):
                diag, oidx, olcol, ua, ub, udst = xs
                s = jnp.sqrt(lx[diag])
                lx = lx.at[diag].set(s)
                vals = lx[oidx] / s[olcol]
                lx = lx.at[oidx].set(vals)
                # local shard of the update stream -> private accumulator
                acc = jnp.zeros(nnz + 1, self.dtype)
                acc = acc.at[udst].add(-(lx[ua] * lx[ub]))
                # psum = the reference's conflict resolution (P7), on ICI
                lx = lx + jax.lax.psum(acc, "p")
                return lx.at[nnz].set(0), None

            it = iter(seg_arrays)
            for _ in range(len(self._segs)):
                diag, oidx, olcol, ua, ub, udst = (
                    next(it), next(it), next(it), next(it), next(it), next(it))
                lx, _ = jax.lax.scan(step, lx, (diag, oidx, olcol, ua, ub, udst))
            return lx[:nnz]

        sharded = jax.shard_map(
            _factorize, mesh=mesh,
            in_specs=tuple([spec_rep] + in_specs),
            out_specs=spec_rep,
            check_vma=False)
        flat_args = []
        for sg in self._segs:
            flat_args.extend([sg["diag"], sg["off_idx"], sg["off_lcol"],
                              sg["upd_a"], sg["upd_b"], sg["upd_dst"]])
        self._flat_args = flat_args
        self._factorize = jax.jit(
            functools.partial(sharded))

    def factorize(self, a_data) -> jax.Array:
        """Replicated L values from the sharded numeric factorization."""
        return self._factorize(jnp.asarray(a_data), *self._flat_args)
