"""Find the expensive part of the lockstep sweep: c-update / m-update /
shared-reduce, register-resident vs scratch-resident planes."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _ = jax.device_get(jnp.zeros(4) + 1)  # honest mode

    N, SP, E2, BLK = 56, 1152, 4480, 128
    rng = np.random.default_rng(0)
    qrank = jnp.asarray(rng.integers(0, 1024, (N, E2), dtype=np.int32))
    signinq = jnp.asarray(rng.choice([1, -1, 2, -2], (N, E2)).astype(np.int32))
    rows = jnp.asarray(np.sort(rng.integers(0, 3584, (N, E2)), axis=1).astype(np.int32))
    meta = jnp.asarray(
        np.stack([np.full(N, 900), np.zeros(N), np.full(N, 3583), np.full(N, E2)],
                 axis=1).astype(np.int32))

    def make(mode):
        def kern(meta_ref, qr_ref, si_ref, row_ref, out_ref, c_plane, m_plane, fold):
            i = pl.program_id(0)
            n_prog = pl.num_programs(0)
            s = meta_ref[:, 0:1]
            lin = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)

            @pl.when(i == 0)
            def _init():
                c_plane[:] = jnp.zeros_like(c_plane)
                m_plane[:] = jnp.zeros_like(m_plane)
                fold[:] = jnp.zeros_like(fold)

            row_lo = meta_ref[:, 1:2]
            row_hi = meta_ref[:, 2:3]
            c = c_plane[:]
            m = m_plane[:]
            acc = fold[:, 0:1]
            best = fold[:, 0:1]
            first = fold[:, 1:2]
            last = fold[:, 2:3]
            prev_row = fold[:, 3:4]
            shared0 = fold[:, 4:5]
            shared = shared0
            for e in range(BLK):
                qr = qr_ref[:, e:e+1]
                si = si_ref[:, e:e+1]
                is_inq = (si == 2) | (si == -2)
                sign = jnp.where(si > 0, 1, -1)
                if "f" in mode:
                    row = row_ref[:, e:e+1]
                    seg_a = jnp.maximum(prev_row, row_lo)
                    seg_b = jnp.minimum(row - 1, row_hi)
                    nonempty = seg_a <= seg_b
                    better = nonempty & (shared > best)
                    equal = nonempty & (shared == best) & (best > 0)
                    first = jnp.where(better, seg_a, first)
                    last = jnp.where(better | equal, seg_b, last)
                    best = jnp.where(better, shared, best)
                    prev_row = jnp.maximum(prev_row, row)
                if "c" in mode:
                    c = c + jnp.where((~is_inq) & (lin >= qr), sign, 0)
                if "m" in mode:
                    m = m + jnp.where(is_inq & (lin == qr), sign, 0)
                if "s" in mode:
                    shared = jnp.sum((m > 0) & ((lin + c) < s), axis=1,
                                     dtype=jnp.int32, keepdims=True)
                    acc = jnp.maximum(acc, shared)
            c_plane[:] = c
            m_plane[:] = m
            fold[:, 0:1] = jnp.maximum(acc, best)
            fold[:, 1:2] = first
            fold[:, 2:3] = last
            fold[:, 3:4] = prev_row
            fold[:, 4:5] = shared

            @pl.when(i == n_prog - 1)
            def _fin():
                out_ref[:] = jnp.broadcast_to(acc, (N, 4))

        return pl.pallas_call(
            kern,
            grid=(E2 // BLK,),
            out_shape=jax.ShapeDtypeStruct((N, 4), jnp.int32),
            in_specs=[
                pl.BlockSpec((N, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, 4), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((N, SP), jnp.int32),
                pltpu.VMEM((N, SP), jnp.int32),
                pltpu.VMEM((N, 8), jnp.int32),
            ],
        )

    def timeit(f, n=10):
        out = f(meta, qrank, signinq, rows)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(meta, qrank, signinq, rows)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    for mode in ("cms", "cmsf"):
        f = jax.jit(make(mode))
        dt = timeit(f)
        print(f"mode={mode:4s}: {dt*1000:7.2f} ms  ({dt/E2*1e6:.2f} us/step)")


if __name__ == "__main__":
    main()
