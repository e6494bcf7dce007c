"""HONEST gather micro-bench (process poisoned first so block_until_ready
actually waits): per-lane cost of 1-lane vs contiguous row gathers."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # poison: force honest completion tracking
    _ = jax.device_get(jnp.zeros(4) + 1)

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    M = 1_880_000
    NQ = 128 * 5120
    tab1 = jnp.asarray(rng.integers(0, 2**31, M, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, M, NQ, dtype=np.int32)).reshape(128, 5120)

    f1 = jax.jit(lambda t, i: t[i])
    dt = timeit(f1, tab1, idx)
    print(f"1-lane gather  [128,5120]: {dt*1000:6.2f} ms  ({dt/NQ*1e9:5.1f} ns/q)")

    f2 = jax.jit(lambda t, i: (t[i], t[jnp.flip(i, 1)]))
    dt = timeit(f2, tab1, idx)
    print(f"2 indep 1-lane gathers:    {dt*1000:6.2f} ms  ({dt/NQ*1e9:5.1f} ns/q)")

    for w in (2, 4):
        tabw = jnp.asarray(rng.integers(0, 2**31, (M, w), dtype=np.int32))
        fw = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(fw, tabw, idx)
        print(f"row gather width {w}:        {dt*1000:6.2f} ms  ({dt/NQ*1e9:5.1f} ns/q)")

    # interleaved pair via reshape: tab [2M] -> gather 2 lanes at 2i, 2i+1
    tab2 = jnp.asarray(rng.integers(0, 2**31, 2 * M, dtype=np.int32))
    fint = jax.jit(lambda t, i: (t[2 * i], t[2 * i + 1]))
    dt = timeit(fint, tab2, idx)
    print(f"interleaved 2x 1-lane:     {dt*1000:6.2f} ms  ({dt/NQ*1e9:5.1f} ns/q)")

    # fewer lanes scaling check (is it linear?)
    idx_s = idx[:, :1024]
    dt = timeit(f1, tab1, idx_s)
    print(f"1-lane gather [128,1024]:  {dt*1000:6.2f} ms  ({dt/(128*1024)*1e9:5.1f} ns/q)")

    # int8 table gather (strand): same lanes cheaper?
    tab8 = jnp.asarray(rng.integers(0, 127, M, dtype=np.int8))
    f8 = jax.jit(lambda t, i: t[i])
    dt = timeit(f8, tab8, idx)
    print(f"int8 gather   [128,5120]:  {dt*1000:6.2f} ms  ({dt/NQ*1e9:5.1f} ns/q)")


if __name__ == "__main__":
    main()
