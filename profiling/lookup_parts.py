"""Decompose batch_lookup (block8 mode) on the chip: directory gather,
kv32 row gather, row reductions, and the qkey extras, timed in isolation at
the bench shape (B=128, S=1280, 16 Mbp DB)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_sketch, batch_lookup,
    )

    jax.device_get(jnp.zeros(4) + 1)

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    rng = np.random.default_rng(7)
    genomes, shard = build_db(rng, n_genomes=8, genome_len=2_000_000)
    reads = make_reads(rng, genomes, 128)
    cfg = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    dev = DeviceShard.from_host(shard)
    assert dev.lookup_mode == "block8"
    B = 128
    r = np.full((B, 8192), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads):
        r[i, : len(s)] = s
        lens[i] = len(s)
    q_hash, _, _, _ = batch_sketch(cfg, jnp.asarray(r), jnp.asarray(lens))
    jax.block_until_ready(q_hash)
    S = cfg.sketch_max
    print(f"B={B} S={S} U~{dev.kv32.shape[0] * 8} nb_bits={32 - dev.bucket_shift}")

    t, _ = timeit(lambda: batch_lookup(cfg, dev, q_hash))
    print(f"batch_lookup total         : {t * 1000:6.2f} ms")

    @jax.jit
    def part_dir(qh):
        b = (qh >> dev.bucket_shift).astype(jnp.int32)
        return dev.dir_packed[b]

    t, d = timeit(part_dir, q_hash)
    print(f"  dir gather [B,S]         : {t * 1000:6.2f} ms")

    @jax.jit
    def part_rows(qh):
        b = (qh >> dev.bucket_shift).astype(jnp.int32)
        dd = dev.dir_packed[b]
        lo = (dd & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        r0 = lo >> 3
        return jnp.take(dev.kv32, r0, axis=0)

    t, _ = timeit(part_rows, q_hash)
    print(f"  dir + kv32 row gather    : {t * 1000:6.2f} ms")

    @jax.jit
    def part_nokey(qh):
        # lookup without the qkey extras (cnt_lt / arow one-hot)
        b = (qh >> dev.bucket_shift).astype(jnp.int32)
        dd = dev.dir_packed[b]
        lo = (dd & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        hi = lo + (dd >> jnp.uint32(28)).astype(jnp.int32)
        r0 = lo >> 3
        row = jnp.take(dev.kv32, r0, axis=0)
        k16 = row[..., :16]
        s16 = row[..., 16:].astype(jnp.int32)
        g = (r0 << 3)[..., None] + jnp.arange(16, dtype=jnp.int32)
        m = (k16 == qh[..., None]) & (g >= lo[..., None]) & (g < hi[..., None])
        start = jnp.sum(jnp.where(m, s16, 0), axis=-1).astype(jnp.int32)
        nxt = jnp.concatenate([s16[..., 1:], s16[..., :1]], axis=-1)
        count = jnp.sum(jnp.where(m, nxt - s16, 0), axis=-1).astype(jnp.int32)
        return start, count

    t, _ = timeit(part_nokey, q_hash)
    print(f"  full minus qkey extras   : {t * 1000:6.2f} ms")


if __name__ == "__main__":
    main()
