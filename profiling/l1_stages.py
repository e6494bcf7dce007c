"""Time production batch_sketch / batch_l1 / map_batch_stage1 on the chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_sketch, batch_l1, map_batch_stage1,
    )
    from metamaps_tpu.engine.mapper_jax import _minhits_table

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
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
    t, l1 = timeit(lambda: batch_l1(cfg, dev, q_hash, s_size, lens_d, mh))
    print(f"batch_l1:         {t*1000:.2f} ms")
    ncand = int((np.asarray(l1[0]) >= 0).sum())
    print(f"  cands={ncand}")
    t, s1 = timeit(lambda: map_batch_stage1(cfg, dev, reads_d, lens_d, mh))
    print(f"map_batch_stage1: {t*1000:.2f} ms")


if __name__ == "__main__":
    main()
