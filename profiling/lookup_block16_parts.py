"""Decompose the block16 lookup cost on the cached large-bench DB:
dir gather vs kv32 row gathers vs remix arithmetic vs reductions.

Run after bench.py has populated .bench_cache (real chip)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db_large  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_lookup, batch_sketch,
        remix_keys_jax,
    )

    shard, tables, reads, _ = build_db_large()
    dev = DeviceShard.from_tables(tables)
    assert dev.lookup_mode in ("block16", "block9p"), dev.lookup_mode
    cfg = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    B = 256
    r = np.full((B, 8192), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate((reads * 2)[:B]):
        r[i, : len(s)] = s
        lens[i] = len(s)
    jax.device_get(jnp.zeros(4) + 1)  # rule #1: force first D2H

    q_hash, _, _, _ = jax.block_until_ready(
        batch_sketch(cfg, jnp.asarray(r), jnp.asarray(lens))
    )

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1000

    e = dev.remix_e
    shift = dev.bucket_shift

    # rule #4: big device arrays ride as ARGUMENTS, never jit closures
    @jax.jit
    def p_remix(qh):
        return remix_keys_jax(qh, e) >> shift

    @jax.jit
    def p_dir(dirp, qh):
        b = (remix_keys_jax(qh, e) >> shift).astype(jnp.int32)
        return dirp[b]

    @jax.jit
    def p_rowA(dirp, kv32, qh):
        b = (remix_keys_jax(qh, e) >> shift).astype(jnp.int32)
        d = dirp[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        r0 = lo >> 3
        return jnp.take(kv32, r0, axis=0).sum(axis=-1)

    @jax.jit
    def p_rowAB(dirp, kv32, qh):
        b = (remix_keys_jax(qh, e) >> shift).astype(jnp.int32)
        d = dirp[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        r0 = lo >> 3
        rowA = jnp.take(kv32, r0, axis=0)
        rowB = jnp.take(kv32, r0 + 2, axis=0)
        return rowA.sum(axis=-1) + rowB.sum(axis=-1)

    def p_full(qh):
        return batch_lookup(cfg, dev, qh)

    print(f"B={B} S={cfg.sketch_max} remix_e={e} nb={32 - shift}")
    print(f"remix+shift only:   {timeit(p_remix, q_hash):7.2f} ms")
    print(f"+ dir gather:       {timeit(p_dir, dev.dir_packed, q_hash):7.2f} ms")
    print(f"+ kv32 rowA:        {timeit(p_rowA, dev.dir_packed, dev.kv32, q_hash):7.2f} ms")
    print(f"+ kv32 rowA+rowB:   {timeit(p_rowAB, dev.dir_packed, dev.kv32, q_hash):7.2f} ms")
    print(f"full batch_lookup:  {timeit(p_full, q_hash):7.2f} ms")


if __name__ == "__main__":
    main()
