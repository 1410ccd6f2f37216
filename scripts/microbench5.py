"""Round-3 hypothesis tests: VPU mult-reduce vs dot_general for batched
small matmuls; dynamic- vs static-offset window updates on big carries."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, state, reps=20):
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, reps, fn, s))
    jax.block_until_ready(run(state))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / reps


def main():
    rng = np.random.default_rng(0)

    # ---- batched matmul formulations --------------------------------
    print("== batched matmul: dot_general vs mult-reduce (pmk,pqk->pmq)")
    for P, Mc, K, Q in ((3118, 16, 32, 8), (3118, 16, 32, 32),
                        (512, 64, 32, 32), (512, 64, 128, 128),
                        (64, 256, 128, 128), (5305, 32, 32, 32)):
        A = jnp.asarray(rng.standard_normal((P, Mc, K)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((P, Q, K)), jnp.float32)
        fl = 2 * P * Mc * K * Q

        def dot(i, s, A=A, B=B):
            C = jnp.einsum("pmk,pqk->pmq", A, B + 0 * s,
                           preferred_element_type=jnp.float32)
            return C.ravel()[0]
        t1 = bench(dot, jnp.float32(0))

        def mr(i, s, A=A, B=B):
            # broadcast-multiply + reduce over k: VPU, batched over p
            C = (A[:, :, None, :] * (B + 0 * s)[:, None, :, :]).sum(-1)
            return C.ravel()[0]
        t2 = bench(mr, jnp.float32(0))
        print(f"P={P:5d} {Mc:3d}x{K:3d}x{Q:3d}: dot {t1*1e6:8.1f}us "
              f"({fl/t1/1e12:6.2f}TF/s)  multred {t2*1e6:8.1f}us "
              f"({fl/t2/1e12:6.2f}TF/s)")

    # ---- dynamic vs static dus on a large carry ---------------------
    print("== window update on 32MB pool carry")
    R, c = 1 << 18, 32
    W = 1 << 16
    pool = jnp.asarray(rng.standard_normal((R, c)), jnp.float32)

    def dyn(i, s):
        w = jax.lax.dynamic_slice(s, (i % 8, 0), (W, c))
        return jax.lax.dynamic_update_slice(s, w * 1.0001, (i % 8, 0))
    t = bench(dyn, pool)
    print(f"dynamic-offset dus: {t*1e6:8.1f} us")

    def stat(i, s):
        w = jax.lax.dynamic_slice(s, (4, 0), (W, c))
        return jax.lax.dynamic_update_slice(s, w * 1.0001, (4, 0))
    t = bench(stat, pool)
    print(f"static-offset dus:  {t*1e6:8.1f} us")

    # bigger pool, same window: does time scale with pool size?
    pool2 = jnp.asarray(rng.standard_normal((4 * R, c)), jnp.float32)
    t = bench(dyn, pool2)
    print(f"dynamic-offset dus, 4x pool: {t*1e6:8.1f} us")
    t = bench(stat, pool2)
    print(f"static-offset dus,  4x pool: {t*1e6:8.1f} us")

    # ---- row gather at 32 vs packed 128 with chunk reshape ----------
    print("== chunked gather: contiguous-chunk reshape vs row gather")
    NR = 1 << 16
    idx = jnp.asarray(rng.integers(0, R - 64, NR), jnp.int32)

    def g_rows(i, s, pool=pool):
        g = pool[(idx + i) % (R - 64)]
        return s + g.sum()
    t = bench(g_rows, jnp.float32(0))
    print(f"row gather {NR}x{c}: {t*1e6:8.1f} us  "
          f"{NR*c/t/1e9:6.2f} Gelem/s")

    # gather Mc=16-row chunks: NR/16 chunk starts, reshape trick
    idx16 = jnp.asarray(rng.integers(0, (R - 64) // 16, NR // 16) * 16,
                        jnp.int32)
    def g_chunk(i, s, pool=pool):
        g = pool.reshape(R // 16, 16 * c)[(idx16 // 16 + i) % ((R - 64) // 16)]
        return s + g.sum()
    t = bench(g_chunk, jnp.float32(0))
    print(f"chunk gather {NR//16}x(16x{c}) packed: {t*1e6:8.1f} us  "
          f"{NR*c/t/1e9:6.2f} Gelem/s")

    # ---- scatter-add rows at width 32 vs 128 ------------------------
    print("== row scatter-add")
    for w_ in (32, 128):
        Rp = (1 << 22) // w_
        NRs = 1 << 15
        p2 = jnp.asarray(rng.standard_normal((Rp, w_)), jnp.float32)
        sidx = jnp.asarray(rng.choice(Rp, NRs, replace=False), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((NRs, w_)), jnp.float32)

        def sc(i, s, upd=upd, sidx=sidx, Rp=Rp):
            return s.at[(sidx + i) % Rp].add(upd)
        t = bench(sc, p2)
        print(f"scatter-add {NRs}x{w_}: {t*1e6:8.1f} us  "
              f"{NRs*w_/t/1e9:6.2f} Gelem/s")


if __name__ == "__main__":
    main()
