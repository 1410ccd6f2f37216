"""Minimal Pallas-on-TPU probe (VERDICT r3 next-step #9).

Round-3 finding: Pallas kernels lower and compile but HANG at execution
through the axon tunnel, so the whole numeric tier is pure XLA and pays
XLA dispatch floors (~25 ns/row gathers, ~0.1 us/lane, 5-8 us/chain op).
This probe is re-run every round: two tiny kernels (vector copy, 128x128
matmul), each executed under a hard timeout so a hang is recorded as a
result instead of killing the round.

Run: python scripts/pallas_probe.py   (prints one JSON line per kernel)
"""
from __future__ import annotations

import json
import multiprocessing as mp
import time


def _copy_kernel_result():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    x = jnp.arange(1024, dtype=jnp.float32).reshape(8, 128)
    fn = pl.pallas_call(
        copy_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
    out = jax.block_until_ready(fn(x))
    return bool(jnp.all(out == x))


def _matmul_kernel_result():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def mm_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    a = jnp.ones((128, 128), jnp.float32)
    b = jnp.eye(128, dtype=jnp.float32) * 2.0
    fn = pl.pallas_call(
        mm_kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))
    out = jax.block_until_ready(fn(a, b))
    return bool(jnp.allclose(out, 2.0))


def _worker(name, q):
    try:
        t0 = time.perf_counter()
        ok = {"copy": _copy_kernel_result,
              "matmul": _matmul_kernel_result}[name]()
        q.put({"kernel": name, "status": "ok" if ok else "wrong_result",
               "elapsed_s": round(time.perf_counter() - t0, 2)})
    except Exception as e:  # noqa: BLE001 - probe records any failure mode
        q.put({"kernel": name, "status": "error",
               "error": f"{type(e).__name__}: {e}"[:300]})


def main(timeout_s: float = 120.0):
    import jax
    results = []
    for name in ("copy", "matmul"):
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        p = ctx.Process(target=_worker, args=(name, q))
        p.start()
        p.join(timeout_s)
        if p.is_alive():
            p.kill()
            p.join()
            res = {"kernel": name, "status": "hang",
                   "detail": f"no result within {timeout_s:.0f}s "
                             "(execution hang; lowering/compile succeed)"}
        else:
            res = q.get() if not q.empty() else {
                "kernel": name, "status": "died",
                "exitcode": p.exitcode}
        res["platform"] = jax.devices()[0].platform
        results.append(res)
        print(json.dumps(res), flush=True)
    return results


if __name__ == "__main__":
    main()
