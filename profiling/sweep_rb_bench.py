"""Row-block sweep vs slab-global sweep at production shapes, on the chip.

Scenarios: full slab (all candidates real, max events), half-padded slab,
sparse slab (few real candidates) — the distributions the engine's routed
slabs actually see.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.l2_pallas import (
        l2_event_sweep_batch, l2_event_sweep_rb,
    )

    jax.device_get(jnp.zeros(4) + 1)

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    rng = np.random.default_rng(5)
    for name, K, R, SP, n_real, ev_frac in (
        ("full      ", 112, 1792, 1152, 112, 1.0),
        ("half-pad  ", 112, 1792, 1152, 56, 1.0),
        ("sparse    ", 112, 1792, 1152, 8, 1.0),
        ("short-ev  ", 112, 1792, 1152, 112, 0.4),
        ("big-full  ", 224, 1792, 1152, 224, 1.0),
        ("big-half  ", 224, 1792, 1152, 112, 1.0),
    ):
        E2 = 2 * R
        meta = np.zeros((K, 4), np.int32)
        qrank = np.zeros((K, E2), np.int32)
        signinq = np.zeros((K, E2), np.int32)
        rows = np.full((K, E2), 2**31 - 1, np.int32)
        for i in range(n_real):
            ne = int(E2 * ev_frac)
            r = np.sort(rng.integers(0, 500000, ne)).astype(np.int32)
            rows[i, :ne] = r
            qrank[i, :ne] = rng.integers(0, SP - 1, ne)
            signinq[i, :ne] = rng.choice([1, -1, 2, -2], ne)
            meta[i] = (900, 0, 500000, ne)
        args = tuple(map(jnp.asarray, (meta, qrank, signinq, rows)))
        t_b, ob = timeit(partial(l2_event_sweep_batch, sp=SP), *args)
        t_r, orr = timeit(partial(l2_event_sweep_rb, sp=SP), *args)
        eq = bool(np.array_equal(np.asarray(ob), np.asarray(orr)))
        print(f"{name} K={K:3d} real={n_real:3d} ev={ev_frac:.1f}: "
              f"batch {t_b*1000:7.2f} ms  rb {t_r*1000:7.2f} ms  "
              f"({t_b/t_r:.2f}x) eq={eq}")


if __name__ == "__main__":
    main()
