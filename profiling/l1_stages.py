"""Time production batch_sketch / batch_l1 / map_batch_stage1 on the chip.

``--large`` loads the cached 1 Gbp structured bench DB (run bench.py once
first) instead of the 16 Mbp uniform-random quick DB.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db_quick, build_db_large, make_reads_quick  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_sketch, batch_l1, map_batch_stage1,
    )
    from metamaps_tpu.engine.mapper_jax import _minhits_table

    # measurement rule #1 (profiling/README.md): before the first D2H
    # transfer, "timings" are enqueue costs only
    jax.device_get(jnp.zeros(4) + 1)

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    rng = np.random.default_rng(7)
    if "--large" in sys.argv:
        shard, tables, all_reads, _ = build_db_large()
        reads = all_reads[:128]
        dev = DeviceShard.from_tables(tables)
    else:
        genomes, shard = build_db_quick(rng, n_genomes=8, genome_len=2_000_000)
        reads = make_reads_quick(rng, genomes, 128)
        dev = DeviceShard.from_host(shard)
    cfg = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    print(f"lookup_mode={dev.lookup_mode} nb_bits={32-dev.bucket_shift}")
    B = 128
    r = np.full((B, 8192), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads):
        r[i, : len(s)] = s
        lens[i] = len(s)
    reads_d = jnp.asarray(r)
    lens_d = jnp.asarray(lens)
    mh = jnp.asarray(_minhits_table(cfg.sketch_max, 16, 80.0))

    t, sk = timeit(lambda: batch_sketch(cfg, reads_d, lens_d))
    q_hash, q_strand, s_size, s_ovf = sk
    print(f"batch_sketch:     {t*1000:.2f} ms")

    # --- sketch sub-parts --------------------------------------------------
    from metamaps_tpu.ops.winnow import winnow_dense
    from metamaps_tpu.ops.batch_map import U32_MAX, batch_lookup, \
        batch_l1_expand

    k_, w_, S = cfg.kmer_size, cfg.window_size, cfg.sketch_max

    @jax.jit
    def part_winnow(reads, read_lens):
        def one(seq, rlen):
            emit, h, p, st, m, _ = winnow_dense(
                seq, k_, w_, cfg.alphabet_size, rlen - k_ + 1)
            return jnp.where(emit, h, U32_MAX), st
        return jax.vmap(one)(reads, read_lens)

    t, (key_d, st_d) = timeit(part_winnow, reads_d, lens_d)
    print(f"  winnow_dense:   {t*1000:.2f} ms")

    @jax.jit
    def part_sort1(key, st):
        B2, nw = key.shape
        wid = jnp.broadcast_to(jnp.arange(nw, dtype=jnp.int32), (B2, nw))
        return jax.lax.sort((key, wid, st.astype(jnp.int32)),
                            dimension=1, num_keys=2)

    t, _ = timeit(part_sort1, key_d, st_d)
    print(f"  hash sort (full width): {t*1000:.2f} ms")

    t, l1 = timeit(lambda: batch_l1(cfg, dev, q_hash, s_size, lens_d, mh))
    print(f"batch_l1:         {t*1000:.2f} ms")
    ncand = int((np.asarray(l1[0]) >= 0).sum())
    print(f"  cands={ncand}")

    t, lk = timeit(lambda: batch_lookup(cfg, dev, q_hash))
    print(f"  batch_lookup:   {t*1000:.2f} ms")
    start_d, count_d = lk[0], lk[1]
    t, _ = timeit(lambda: batch_l1_expand(
        cfg, dev, start_d, count_d, s_size, lens_d, mh))
    print(f"  batch_l1_expand (H={cfg.hits_max}): {t*1000:.2f} ms")

    t, s1 = timeit(lambda: map_batch_stage1(cfg, dev, reads_d, lens_d, mh))
    print(f"map_batch_stage1: {t*1000:.2f} ms")

    # --- engine-shaped stage1a/1b at B=256 --------------------------------
    import dataclasses

    from metamaps_tpu.ops.batch_map import map_batch_stage1a, map_batch_stage1b

    if "--large" in sys.argv:
        reads2 = (all_reads * 2)[:256]
    else:
        reads2 = make_reads_quick(rng, genomes, 256)
    r2 = np.full((256, 8192), ord("A"), np.uint8)
    l2_ = np.zeros(256, np.int32)
    for i, s in enumerate(reads2):
        r2[i, : len(s)] = s
        l2_[i] = len(s)
    reads2_d = jnp.asarray(r2)
    lens2_d = jnp.asarray(l2_)
    t, s1a = timeit(lambda: map_batch_stage1a(cfg, dev, reads2_d, lens2_d))
    print(f"map_batch_stage1a (B=256): {t*1000:.2f} ms")
    rows_d = jnp.arange(256, dtype=jnp.int32)
    for tier in (512, 1024):
        cfg_h = dataclasses.replace(cfg, hits_max=tier)
        t, _ = timeit(lambda cfg_h=cfg_h: map_batch_stage1b(
            cfg_h, dev, rows_d, s1a[4], s1a[5], s1a[2], lens2_d, mh))
        print(f"map_batch_stage1b (B=256, H={tier}): {t*1000:.2f} ms")


if __name__ == "__main__":
    main()
