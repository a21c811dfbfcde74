"""Round-5 microbenchmarks on the real TPU for the device Bloom-bank build.

Staged and unbuffered: each probe prints as it completes, so a timeout
still leaves the numbers gathered so far.  Run me alone — the axon TPU
tunnel is single-client.
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

U = jnp.uint64


def say(msg):
    print(msg, flush=True)


def timeit(f, *args, reps=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / reps


def main():
    which = set(sys.argv[1:]) or {"scatter", "mod", "sort"}
    say(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    if "scatter" in which:
        # bench-headline scale first (1.2M keys x 6 hashes), then realistic
        for NPOS, BITS in ((7_200_000, 10_500_000), (52_000_000, 76_000_000)):
            pos_np = rng.integers(0, BITS, size=NPOS, dtype=np.uint64)
            pos = jax.device_put(pos_np)
            cap = 1 << (BITS - 1).bit_length()

            @jax.jit
            def set1(ps, bm):
                return bm.at[ps].set(jnp.uint8(1), mode="drop")

            bm0 = jnp.zeros(cap, jnp.uint8)
            t0 = time.time()
            jax.block_until_ready(set1(pos, bm0))
            say(f"  scatter-set1 compile+first: {time.time()-t0:.1f}s")
            t = timeit(set1, pos, bm0, reps=3, warm=1)
            say(f"E2-set1 {NPOS/1e6:.0f}Mpos->{BITS/1e6:.0f}Mbits: "
                f"{t*1e3:.0f} ms ({NPOS/t/1e6:.0f} Mpos/s)")
            got = np.asarray(set1(pos, bm0))
            want = np.zeros(cap, np.uint8)
            want[pos_np] = 1
            say(f"  correct: {bool((got == want).all())}")

    if "mod" in which:
        N, S = 1 << 16, 65
        h = jax.device_put(
            rng.integers(0, 1 << 63, size=(N, S), dtype=np.uint64))
        L = 12_345_677

        f_const = jax.jit(lambda x: (x % U(L)).astype(jnp.uint32).max())
        t = timeit(f_const, h, reps=5, warm=2)
        say(f"E1a mod-by-CONSTANT u64: {t*1e3:.2f} ms for {N*S/1e6:.1f}M "
            f"({t/N/S*1e9:.2f} ns/mod)")

        f_var = jax.jit(lambda x, l: (x % l).astype(jnp.uint32).max())
        t = timeit(f_var, h, U(L), reps=5, warm=2)
        say(f"E1b mod-by-SCALAR-ARG u64: {t*1e3:.2f} ms "
            f"({t/N/S*1e9:.2f} ns/mod)")

        def magic_u64(d: int):
            for s_ in range(64):
                M = ((1 << (64 + s_)) + d - 1) // d
                if M < (1 << 64) and M * d - (1 << (64 + s_)) <= (1 << s_):
                    return M, s_
            raise ValueError(d)

        M, s_ = magic_u64(L)

        def mulhi64(a, b):
            a0, a1 = a & U(0xFFFFFFFF), a >> U(32)
            b0, b1 = b & U(0xFFFFFFFF), b >> U(32)
            mid = ((a0 * b0) >> U(32)) + ((a0 * b1) & U(0xFFFFFFFF)) + (
                (a1 * b0) & U(0xFFFFFFFF))
            return a1 * b1 + ((a0 * b1) >> U(32)) + ((a1 * b0) >> U(32)) + (
                mid >> U(32))

        def fastmod(x, Mv, sv, Lv):
            return x - (mulhi64(x, Mv) >> sv) * Lv

        f_fast = jax.jit(lambda x, Mv, sv, Lv: fastmod(
            x, Mv, sv, Lv).astype(jnp.uint32).max())
        args = (h, U(M), U(s_), U(L))
        t = timeit(f_fast, *args, reps=5, warm=2)
        say(f"E1c fastmod (magic mul, scalar args): {t*1e3:.2f} ms "
            f"({t/N/S*1e9:.2f} ns/mod)")
        a = np.asarray(fastmod(h[:64], U(M), U(s_), U(L)))
        b = np.asarray(h[:64]) % L
        say(f"E1c exact: {bool((a == b).all())}")

    if "sort" in which:
        NPOS = 13_000_000
        pos = jax.device_put(
            rng.integers(0, 1 << 40, size=NPOS, dtype=np.uint64))
        t = timeit(jax.jit(jnp.sort), pos, reps=2, warm=1)
        say(f"E3 jnp.sort {NPOS/1e6:.0f}M u64: {t*1e3:.0f} ms")


if __name__ == "__main__":
    main()
