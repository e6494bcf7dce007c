"""Driver benchmark: prints ONE JSON line with the headline metric.

Current headline: device winnow+sketch throughput (the per-read hot path's
first stage) in Mbases/s on one chip. Will graduate to end-to-end mapping
reads/s/chip once the batched L1/L2 kernels land. The reference publishes no
numbers (BASELINE.md), so vs_baseline is a placeholder ratio of 1.0.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from metamaps_tpu.ops.winnow import winnow_dense

    k, w = 16, 16
    L = 8192
    B = 64

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(65, 85, size=(B, L), dtype=np.uint8))

    @jax.jit
    def sketch_batch(x):
        def one(seq):
            emit, h, p, s, m = winnow_dense(seq, k, w, 4)
            return emit.sum()

        return jax.vmap(one)(x)

    # warmup/compile
    sketch_batch(batch).block_until_ready()

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = sketch_batch(batch)
    r.block_until_ready()
    dt = time.perf_counter() - t0

    mbases_per_s = (B * L * n_iter) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "winnow_sketch_throughput",
                "value": round(mbases_per_s, 2),
                "unit": "Mbases/s/chip",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
