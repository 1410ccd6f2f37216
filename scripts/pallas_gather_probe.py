#!/usr/bin/env python
"""Quantify the Pallas opportunity on the update-gather floor.

Round-3 measured ~25 ns/row for XLA index-driven row gathers — the
dominant factorize cost component.  Pallas now executes through the
tunnel (scripts/pallas_probe.py), so this probe compares, for the same
(8-row-packed gather -> sum) workload:

* the XLA path the executor uses today (take + reshape), and
* a Pallas kernel using scalar-prefetched indices + async DMA copies
  from an HBM-resident pool into VMEM (the PrefetchScalarGridSpec
  pattern), double-buffered.

Prints one JSON line per variant with rows/s.  If the Pallas rate is a
multiple of the XLA rate, rewriting _apply_updates as a Pallas kernel is
the next-round lever.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, c = 1 << 16, 128           # 32 MB f32 pool
    nidx = 1 << 12                   # gather 4096 packed starts x 8 rows
    reps = 20
    pool = jnp.ones((rows, c), jnp.float32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows // 8, nidx).astype(np.int32))

    # ---- XLA baseline: packed fat-row take (executor's gather) -------
    def xla_gather(pool, idx):
        p8 = pool.reshape(-1, 8 * c)

        def body(i, acc):
            g = p8[idx + (i & 1)]          # (nidx, 8c)
            return acc + g.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    f = jax.jit(xla_gather)
    jax.block_until_ready(f(pool, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(f(pool, idx))
    t_xla = (time.perf_counter() - t0) / reps
    print(json.dumps({"variant": "xla_take", "rows_per_s":
                      round(nidx * 8 / t_xla), "s_per_call": t_xla}),
          flush=True)

    # ---- Pallas: scalar-prefetch indices, DMA 8-row blocks ------------
    BLK = 8            # rows per index
    PER = 32           # indices handled per grid step

    def kernel(idx_ref, pool_ref, out_ref, scratch, sems):
        g = pl.program_id(0)

        def get(slot, k):
            r = idx_ref[g * PER + k]
            return pltpu.make_async_copy(
                pool_ref.at[pl.ds(r * BLK, BLK), :],
                scratch.at[slot], sems.at[slot])
        get(0, 0).start()
        get(1, 1).start()
        acc = jnp.zeros((BLK, c), jnp.float32)

        def body(k, acc):
            slot = k % 2

            @pl.when(k + 2 < PER)
            def _():
                get(slot, k + 2).start()
            get(slot, k).wait()
            return acc + scratch[slot]
        # simple sequential double-buffered accumulate
        acc = jax.lax.fori_loop(0, PER, body, acc)
        out_ref[...] = acc

    def pallas_gather(pool, idx):
        grid = nidx // PER
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((BLK, c),
                                       lambda g, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, BLK, c), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((BLK, c), jnp.float32),
        )(idx, pool)

    try:
        f2 = jax.jit(pallas_gather)
        jax.block_until_ready(f2(pool, idx))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f2(pool, idx)
        jax.block_until_ready(out)
        t_pl = (time.perf_counter() - t0) / reps
        print(json.dumps({"variant": "pallas_dma", "rows_per_s":
                          round(nidx * 8 / t_pl), "s_per_call": t_pl,
                          "speedup_vs_xla": round(t_xla / t_pl, 2)}),
              flush=True)
    except Exception as e:  # noqa: BLE001 - probe records failures
        print(json.dumps({"variant": "pallas_dma", "status": "error",
                          "error": f"{type(e).__name__}: {e}"[:400]}),
              flush=True)


if __name__ == "__main__":
    main()
