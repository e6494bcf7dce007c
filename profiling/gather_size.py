import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.device_get(jnp.zeros(4) + 1)
def timeit(fn, *a, n=30):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 1 << 20, (128, 1280)).astype(np.int32))
for logn in (20, 22, 23, 24, 25, 26):
    tab = jnp.asarray(rng.integers(0, 2**31, 1 << logn).astype(np.int32))
    mask = (1 << logn) - 1
    f = jax.jit(lambda i, t=tab, m=mask: t[((i * 1103515245) >> 8) & m])
    t = timeit(f, idx)
    print(f"table 2^{logn} ({4 * (1 << logn) // 2**20:5d} MB): "
          f"{t * 1000:6.2f} ms  ({t / (128 * 1280) * 1e9:5.1f} ns/lane)")
