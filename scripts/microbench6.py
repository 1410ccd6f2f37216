"""Round-3 rates with dispatch PROPERLY amortized: subtract the measured
empty-program dispatch floor and use enough reps that it is noise."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

DISPATCH = None


def measure(fn, state, reps):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, reps, fn, s))
    jax.block_until_ready(run(state))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def bench(fn, state, reps=100):
    """Per-iteration time with the dispatch floor subtracted."""
    t = measure(fn, state, reps)
    return max(t - DISPATCH, 1e-9) / reps


def main():
    global DISPATCH
    rng = np.random.default_rng(0)
    # dispatch floor: nearly-empty program
    DISPATCH = measure(lambda i, s: s + 1.0, jnp.float32(0), 1)
    print(f"dispatch floor: {DISPATCH*1e3:.2f} ms")

    print("== row gather rates (real)")
    for R, w, NR in ((1 << 18, 32, 1 << 16), (1 << 16, 128, 1 << 14),
                     (1 << 16, 128, 1 << 16), (1 << 13, 128, 1 << 16)):
        pool = jnp.asarray(rng.standard_normal((R, w)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, R, NR), jnp.int32)

        def g(i, s, pool=pool, idx=idx, R=R):
            return s + pool[(idx + i) % R].sum()
        t = bench(g, jnp.float32(0))
        print(f"  gather {NR}x{w} from ({R},{w}): {t*1e6:8.1f} us  "
              f"{NR*w/t/1e9:6.2f} Gelem/s")

    print("== 2-level gather (chunk starts + iota) as in executor")
    pool = jnp.asarray(rng.standard_normal((1 << 18, 32)), jnp.float32)
    for P, Mc in ((3118, 16), (512, 64), (64, 256)):
        starts = jnp.asarray(
            rng.integers(0, (1 << 18) - Mc, P), jnp.int32)

        def g2(i, s, starts=starts, P=P, Mc=Mc):
            g = pool[((starts + i) % ((1 << 18) - Mc))[:, None]
                     + jax.lax.iota(jnp.int32, Mc)]
            return s + g.sum()
        t = bench(g2, jnp.float32(0))
        print(f"  chunkgather P={P} Mc={Mc} w=32: {t*1e6:8.1f} us  "
              f"{P*Mc*32/t/1e9:6.2f} Gelem/s")

    print("== scatter-add rates (real)")
    for w in (32, 128):
        Rp = (1 << 22) // w
        NRs = 1 << 15
        p2 = jnp.asarray(rng.standard_normal((Rp, w)), jnp.float32)
        sidx = jnp.asarray(rng.choice(Rp, NRs, replace=False), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((NRs, w)), jnp.float32)

        def sc(i, s, upd=upd, sidx=sidx, Rp=Rp):
            return s.at[(sidx + i) % Rp].add(upd)
        t = bench(sc, p2, reps=60)
        print(f"  scatter-add {NRs}x{w}: {t*1e6:8.1f} us  "
              f"{NRs*w/t/1e9:6.2f} Gelem/s")

    print("== batched einsum (real)")
    for P, Mc, K, Q in ((3118, 16, 32, 8), (5305, 32, 32, 32),
                        (512, 64, 128, 128), (64, 256, 128, 128)):
        A = jnp.asarray(rng.standard_normal((P, Mc, K)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((P, Q, K)), jnp.float32)
        fl = 2 * P * Mc * K * Q

        def dot(i, s, A=A, B=B):
            C = jnp.einsum("pmk,pqk->pmq", A, B + 0 * s,
                           preferred_element_type=jnp.float32)
            return C.ravel()[0]
        t = bench(dot, jnp.float32(0), reps=60)
        print(f"  dot P={P:5d} {Mc:3d}x{K:3d}x{Q:3d}: {t*1e6:8.1f} us "
              f"({fl/t/1e12:6.2f} TF/s, {t/P*1e9:6.0f} ns/lane)")

    print("== cholesky_inverse (real)")
    from parsy_bench_tpu.ops.dense import cholesky_inverse
    for P, c in ((5305, 32), (332, 128)):
        A = rng.standard_normal((P, c, c))
        D = jnp.asarray(A @ A.transpose(0, 2, 1) + c * np.eye(c),
                        jnp.float32)

        def chol(i, s, D=D):
            L, Li = cholesky_inverse(D + 0.0 * s)
            return L.ravel()[0]
        t = bench(chol, jnp.float32(0), reps=30)
        print(f"  cholinv ({P},{c}): {t*1e6:8.1f} us")

    print("== big window ops (real)")
    W = 169760
    pool = jnp.asarray(rng.standard_normal((W + 64, 32)), jnp.float32)

    def win(i, s):
        w = jax.lax.dynamic_slice(s, (i % 8, 0), (W, 32))
        return jax.lax.dynamic_update_slice(s, w * 1.0001, (i % 8, 0))
    t = bench(win, pool, reps=60)
    print(f"  win slice+update (W,32): {t*1e6:8.1f} us "
          f"({W*32*4*2/t/1e9:5.1f} GB/s logical)")


if __name__ == "__main__":
    main()
