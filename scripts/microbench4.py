"""Round-3 microbenchmarks: lane-padding of narrow pools, batched small
Cholesky, and per-step fixed costs — the hypotheses from diag_r3."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 50


def bench(fn, *args, reps=REPS):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda i, s: fn(i, s, *a[1:]), a[0]))
    jax.block_until_ready(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / reps


def main():
    rng = np.random.default_rng(0)
    R = 1 << 18  # 262144 rows

    # 1. full-array copy rate: (R,32) vs (R/4,128)
    a32 = jnp.asarray(rng.standard_normal((R, 32)), jnp.float32)
    a128 = jnp.asarray(rng.standard_normal((R // 4, 128)), jnp.float32)
    t = bench(lambda i, s: s + 1.0, a32)
    print(f"copy (R,32):    {t*1e6:8.1f} us  {R*32*8/t/1e9:7.1f} GB/s")
    t = bench(lambda i, s: s + 1.0, a128)
    print(f"copy (R/4,128): {t*1e6:8.1f} us  {R*32*8/t/1e9:7.1f} GB/s")

    # 2. row gather: 32-wide rows vs packed 128-wide rows
    NR = 1 << 16
    idx = jnp.asarray(rng.integers(0, R, NR), jnp.int32)
    idx4 = jnp.asarray(rng.integers(0, R // 4, NR // 4), jnp.int32)

    def g32(i, s, pool):
        return s + pool[(idx + i) % R].sum()
    t = bench(g32, jnp.float32(0), a32)
    print(f"row gather {NR}x32:   {t*1e6:8.1f} us  {NR*32/t/1e9:6.2f} Gelem/s")

    def g128(i, s, pool):
        return s + pool[(idx4 + i) % (R // 4)].sum()
    t = bench(g128, jnp.float32(0), a128)
    print(f"row gather {NR//4}x128: {t*1e6:8.1f} us  {NR*32/t/1e9:6.2f} Gelem/s")

    # 3. dynamic slice + update of a big window on (R,32) vs (R/4,128)
    W = 169760
    def win32(i, s):
        w = jax.lax.dynamic_slice(s, (i % 8, 0), (W, 32))
        return jax.lax.dynamic_update_slice(s, w + 1.0, (i % 8, 0))
    t = bench(win32, a32)
    print(f"win slice+upd (W,32):    {t*1e6:8.1f} us  {W*32*4*4/t/1e9:6.1f} GB/s")
    W4 = W // 4
    def win128(i, s):
        w = jax.lax.dynamic_slice(s, (i % 8, 0), (W4, 128))
        return jax.lax.dynamic_update_slice(s, w + 1.0, (i % 8, 0))
    t = bench(win128, a128)
    print(f"win slice+upd (W/4,128): {t*1e6:8.1f} us  {W*32*4*4/t/1e9:6.1f} GB/s")

    # 4. batched small cholesky_inverse: (P,32,32) vs packed (P/4,128,128)?
    from parsy_bench_tpu.ops.dense import cholesky_inverse, masked_spd
    for P, c in ((5305, 32), (1344, 64), (332, 128)):
        A = rng.standard_normal((P, c, c))
        D = jnp.asarray(A @ A.transpose(0, 2, 1) + c * np.eye(c), jnp.float32)
        def chol(i, s, D):
            L, Li = cholesky_inverse(D + 0.0 * s)
            return L.ravel()[0]
        t = bench(chol, jnp.float32(0), D, reps=10)
        fl = P * (c**3 / 3 * 4 + 0)
        print(f"cholesky_inverse ({P},{c},{c}): {t*1e3:8.3f} ms "
              f"{fl/t/1e9:7.1f} GF/s")

    # 5. batched einsum MXU rate at the bucket shapes
    for P, Mc, K, Q in ((3118, 16, 32, 8), (512, 64, 32, 32),
                        (64, 256, 128, 128)):
        A = jnp.asarray(rng.standard_normal((P, Mc, K)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((P, Q, K)), jnp.float32)
        def ein(i, s, A, B):
            C = jnp.einsum("pmk,pqk->pmq", A + 0.0 * s, B,
                           preferred_element_type=jnp.float32)
            return C.ravel()[0]
        t = bench(ein, jnp.float32(0), A, B, reps=20)
        fl = 2 * P * Mc * K * Q
        print(f"einsum P={P} {Mc}x{K}x{Q}: {t*1e6:8.1f} us {fl/t/1e12:6.2f} TF/s")

    # 6. empty-ish scan step cost (per-step overhead)
    xs = jnp.zeros((64, 8), jnp.float32)
    def scan_only(i, s):
        def step(c, x):
            return c + x.sum(), None
        out, _ = jax.lax.scan(step, s, xs)
        return out
    t = bench(scan_only, jnp.float32(0))
    print(f"64-step trivial scan: {t*1e6:8.1f} us ({t/64*1e6:.2f} us/step)")


if __name__ == "__main__":
    main()
