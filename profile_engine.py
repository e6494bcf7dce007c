"""End-to-end engine timing on the bench workload (real device)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def main():
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.params import Parameters

    rng = np.random.default_rng(7)
    genomes, shard = build_db(rng, n_genomes=2, genome_len=1_000_000)
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    engine = JaxMapperEngine(shard, params, read_len_buckets=(8192,))
    reads = make_reads(rng, genomes, 256)

    t0 = time.perf_counter()
    engine.map_reads(reads[:128])
    print(f"warmup(compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        results = engine.map_reads(reads)
        dt = min(dt, time.perf_counter() - t0)
    n_mapped = sum(1 for r in results if r)
    print(f"map 256 reads: {dt:.3f}s -> {256/dt:.1f} reads/s  (mapped={n_mapped})")


if __name__ == "__main__":
    main()
