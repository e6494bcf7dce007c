"""Per-stage device timings for the fused mapping pipeline on the bench workload."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_sketch, batch_l1, batch_l2_slab,
        map_batch_fused,
    )
    from metamaps_tpu.engine.mapper_jax import _minhits_table

    rng = np.random.default_rng(7)
    genomes, shard = build_db(rng, n_genomes=2, genome_len=1_000_000)
    reads = make_reads(rng, genomes, 128)

    cfg = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    print(f"cfg: S={cfg.sketch_max} H={cfg.hits_max} R={cfg.range_max} "
          f"C={cfg.cands_max} l2={cfg.l2_path}", file=sys.stderr)
    dev = DeviceShard.from_host(shard)
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
    print(f"sketch: {t*1000:.1f} ms/batch ({t/B*1000:.2f} ms/read)")

    t, l1 = timeit(lambda: batch_l1(cfg, dev, q_hash, s_size, lens_d, mh))
    c_seq, c_start, c_end, n_c, l1_ovf = l1
    ncand = int((np.asarray(c_seq) >= 0).sum())
    print(f"l1: {t*1000:.1f} ms/batch ({t/B*1000:.2f} ms/read), cands={ncand}")

    # flatten candidates like map_batch_fused
    K = 2 * B
    flat_seq = np.asarray(c_seq).reshape(-1)
    order = np.argsort(flat_seq < 0, kind="stable")
    sel = order[:K]
    rd = (sel // cfg.cands_max).astype(np.int32)
    cs = jnp.asarray(np.asarray(c_start).reshape(-1)[sel])
    ce = jnp.asarray(np.asarray(c_end).reshape(-1)[sel])
    cq = jnp.asarray(flat_seq[sel])
    qh2, ss2, ln2 = q_hash[rd], s_size[rd], lens_d[rd]

    t, _ = timeit(lambda: batch_l2_slab(cfg, dev, qh2, ss2, ln2, cq, cs, ce))
    print(f"l2[{cfg.l2_path}] K={K}: {t*1000:.1f} ms/batch "
          f"({t/max(ncand,1)*1000:.2f} ms/cand)")

    t, _ = timeit(lambda: map_batch_fused(cfg, dev, reads_d, lens_d, mh))
    print(f"fused: {t*1000:.1f} ms/batch ({t/B*1000:.2f} ms/read) "
          f"-> {B/t:.0f} reads/s device-side")


if __name__ == "__main__":
    main()
