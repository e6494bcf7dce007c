"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: end-to-end mapping throughput (reads/s/chip) of the batched
device engine — sketch + L1 + L2 + acceptance — on a REALISTIC-SCALE
synthetic database (default 1 Gbp, HBM-resident index): structured content
(near-identical duplicated genomes, shared homologous segments, repeat
families dense enough to trigger the top-0.001% minimizer frequency
threshold — winSketch.hpp:452-495) and ONT-like reads with substitutions +
indels. The expensive host-side index derivation is disk-cached under
.bench_cache/ (first run builds it once).

`python bench.py --quick` runs the legacy 2 Mbp uniform-random bench.
The reference publishes no numbers (BASELINE.md), so vs_baseline is a
placeholder 1.0.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
LARGE_BASES = int(os.environ.get("METAMAPS_TPU_BENCH_BASES", 1_000_000_000))
LARGE_SEED = 20260820


def build_db_quick(rng, n_genomes=8, genome_len=2_000_000):
    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.ops.winnow import winnow_fast

    shard = SketchShard()
    parts = []
    genomes = []
    for i in range(n_genomes):
        g = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=genome_len)
        genomes.append(g)
        h, p, s = winnow_fast(g, 16, 16)
        parts.append((h, p, s, i))
        shard.contig_names.append(f"C{i}|kraken:taxid|{1000+i}|B{i}.1")
        shard.contig_lengths.append(len(g))
    shard.finalize(parts)
    return genomes, shard


def make_reads_quick(rng, genomes, n_reads, min_len=3000, max_len=8000, sub=0.10):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(n_reads):
        g = genomes[rng.integers(0, len(genomes))]
        L = int(rng.integers(min_len, max_len))
        pos = int(rng.integers(0, len(g) - L))
        r = g[pos : pos + L].copy()
        nmut = int(sub * L)
        idx = rng.integers(0, L, nmut)
        r[idx] = bases[rng.integers(0, 4, nmut)]
        reads.append(r)
    return reads


def _shard_from_tables(t, contig_names, contig_lengths):
    """Reconstruct a SketchShard from cached host tables (no sorts)."""
    from metamaps_tpu.engine.index import SketchShard

    sh = SketchShard()
    sh.contig_names = list(contig_names)
    sh.contig_lengths = [int(x) for x in contig_lengths]
    sh.wpos = np.asarray(t["wpos"])
    sh.strand = np.asarray(t["strand_pos"])
    sh.hash_pos_order = np.asarray(t["hash_pos"])
    sh.hash_sorted = np.asarray(t["hash_sorted"])
    pair = np.asarray(t["pair_byhash"])
    sh.seqid_byhash = pair[:, 0]
    sh.wpos_byhash = pair[:, 1]
    co = np.asarray(t["contig_offsets"]).astype(np.int64)
    sh.contig_offsets = co
    sh.seqid = np.repeat(
        np.arange(len(co) - 1, dtype=np.int32), np.diff(co)
    )
    sh.freq_threshold = int(t["freq_threshold"])
    return sh


def build_db_large(total_bases=LARGE_BASES, n_reads=1536, verbose=True):
    """Build (or load from cache) the structured DB + ONT reads. Returns
    (shard, device_tables, reads, build_info)."""
    from concurrent.futures import ThreadPoolExecutor

    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.io.native import winnow_native
    from metamaps_tpu.ops.batch_map import DeviceShard
    from metamaps_tpu.ops.winnow import winnow_fast
    from metamaps_tpu.sim.synth_db import make_ont_reads, synth_structured_db

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f"db_{total_bases}_{LARGE_SEED}_{n_reads}"
    tab_fn = os.path.join(CACHE_DIR, tag + "_tables.npz")
    reads_fn = os.path.join(CACHE_DIR, tag + "_reads.npz")
    info = {}

    if os.path.exists(tab_fn) and os.path.exists(reads_fn):
        t0 = time.perf_counter()
        z = np.load(tab_fn, allow_pickle=True)
        tables = {k: z[k] for k in z.files if k not in (
            "contig_names", "contig_lengths")}
        names = [str(x) for x in z["contig_names"]]
        lens = z["contig_lengths"]
        rz = np.load(reads_fn, allow_pickle=True)
        reads = [np.asarray(r) for r in rz["reads"]]
        info["cache"] = "hit"
        info["load_s"] = round(time.perf_counter() - t0, 1)
        return _shard_from_tables(tables, names, lens), tables, reads, info

    rng = np.random.default_rng(LARGE_SEED)
    t0 = time.perf_counter()
    genomes, names = synth_structured_db(rng, total_bases=total_bases)
    info["synth_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    nthreads = max(2, os.cpu_count() or 2)
    with ThreadPoolExecutor(nthreads) as ex:
        outs = list(ex.map(lambda g: winnow_fast(g, 16, 16), genomes))
    info["winnow_s"] = round(time.perf_counter() - t0, 1)

    shard = SketchShard()
    parts = []
    for i, (g, (h, p, s)) in enumerate(zip(genomes, outs)):
        parts.append((h, p, s, i))
        shard.contig_names.append(names[i])
        shard.contig_lengths.append(len(g))
    t0 = time.perf_counter()
    shard.finalize(parts)
    info["finalize_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    from metamaps_tpu.ops.batch_map import DeviceShard

    tables = DeviceShard.host_tables(shard)
    info["tables_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    # max_len leaves room for the ~2.5% insertion stretch under the 8192
    # read-length bucket (longer reads would fall back to the host oracle)
    reads = make_ont_reads(rng, genomes, n_reads, min_len=3000, max_len=7600)
    reads = [r[:8192] for r in reads]
    info["reads_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    np.savez(
        tab_fn, **tables,
        contig_names=np.array(shard.contig_names, dtype=object),
        contig_lengths=np.array(shard.contig_lengths, np.int64),
    )
    np.savez(reads_fn, reads=np.array(reads, dtype=object))
    info["cache_save_s"] = round(time.perf_counter() - t0, 1)
    info["cache"] = "miss"
    if verbose:
        print(f"# build: {info}", file=sys.stderr)
    return shard, tables, reads, info


def em_bench(rng):
    """EM iteration time on a synthetic device-resident table
    (1M read-location lines, 5k taxa, 250k reads)."""
    from metamaps_tpu.engine.em import MappingTable, make_em_iterate_jax

    n_lines, n_reads_em, n_tax = 1_000_000, 250_000, 5_000
    table = MappingTable(
        lines=[], contig_of_line=[], read_ids=["r"] * n_reads_em,
        taxon_list=["t"] * n_tax,
        read_of_line=np.repeat(np.arange(n_reads_em), n_lines // n_reads_em),
        taxon_of_line=rng.integers(0, n_tax, n_lines).astype(np.int32),
        mapq=rng.random(n_lines).astype(np.float64),
        inv_locations=np.full(n_lines, 1e-6),
        identity=np.zeros(n_lines), start=np.zeros(n_lines, np.int64),
        stop=np.zeros(n_lines, np.int64),
        read_len=np.zeros(n_lines, np.int64),
    )
    step = make_em_iterate_jax(table)
    import jax

    f = np.full(n_tax, 1.0 / n_tax, np.float32)
    jax.block_until_ready(step(f))  # compile
    t0 = time.perf_counter()
    for _ in range(10):
        out_em = step(f)
    jax.block_until_ready(out_em)
    return (time.perf_counter() - t0) / 10 * 1000


def run_mapping_bench(engine, reads, warm=2):
    for _ in range(warm):
        engine.map_reads(reads[:256])
    dt = float("inf")
    results = None
    for _ in range(3):
        t0 = time.perf_counter()
        results = engine.map_reads(reads)
        dt = min(dt, time.perf_counter() - t0)
    return dt, results


def main():
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.params import Parameters

    quick = "--quick" in sys.argv
    rng = np.random.default_rng(7)
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)

    if quick:
        t0 = time.perf_counter()
        genomes, shard = build_db_quick(rng, n_genomes=2, genome_len=1_000_000)
        t_db = time.perf_counter() - t0
        engine = JaxMapperEngine(shard, params, read_len_buckets=(8192,))
        reads = make_reads_quick(rng, genomes, 512)
        dt, results = run_mapping_bench(engine, reads)
        detail = {
            "mode": "quick",
            "db_bases": sum(len(g) for g in genomes),
            "db_build_s": round(t_db, 2),
        }
    else:
        shard, tables, reads, info = build_db_large()
        t0 = time.perf_counter()
        from metamaps_tpu.ops.batch_map import DeviceShard

        dshard = DeviceShard.from_tables(tables)
        import jax

        jax.block_until_ready(dshard.hash_sorted)
        t_up = time.perf_counter() - t0
        engine = JaxMapperEngine(
            shard, params, read_len_buckets=(8192,), device_shard=dshard,
            hits_max=16384,
        )
        dt, results = run_mapping_bench(engine, reads)
        detail = {
            "mode": "large",
            "db_bases": sum(shard.contig_lengths),
            "n_minimizers": int(shard.n_minimizers),
            "lookup_mode": dshard.lookup_mode,
            "freq_threshold": int(shard.freq_threshold),
            "upload_s": round(t_up, 1),
            "oracle_fallbacks": engine.stats["oracle_fallbacks"],
            **info,
        }

    n_mapped = sum(1 for r in results if r)
    mean_cands = float(np.mean([len(r) for r in results]))
    reads_per_s = len(reads) / dt
    em_ms = em_bench(rng)

    detail.update({
        "n_reads": len(reads),
        "n_mapped": n_mapped,
        "mean_mappings_per_read": round(mean_cands, 2),
        "map_s": round(dt, 3),
        "em_iter_ms_1Mlines": round(em_ms, 2),
    })
    print(json.dumps({
        "metric": "mapping_throughput",
        "value": round(reads_per_s, 2),
        "unit": "reads/s/chip",
        "vs_baseline": 1.0,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
