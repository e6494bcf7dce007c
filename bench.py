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
# dense read-length ladder over the bench's 3000-8000 bp ONT reads: every
# kernel shape (sketch width, lookup lanes, L2 columns) derives from the
# read's bucket, so a single 8192 bucket ran ~5500 bp mean reads at
# worst-case-length shapes (~2x padding on the lookup's gather lanes)
BENCH_BUCKETS = (3072, 4096, 5120, 6144, 7168, 8192)
# bump whenever DeviceShard.host_tables layout changes (stale .bench_cache
# entries are rebuilt — or migrated when cheap — instead of silently
# loading an old table format); version 2 == the remix/block9p layout
# (detected by 'remix_e' presence in pre-marker caches); version 3 ==
# 5-row i32 pos_tab; version 4 == hs32 + uint16 chain deltas
# (build_chain_deltas) replacing pos_tab; version 5 == the DISK diet:
# hash_sorted and strand_pos are dropped (exactly rehydrated at load from
# hash_pos / hs32's packed strand bit) and pair_byhash is stored as the
# packed uint32 gpos plane when it fits (pack_gpos) — ~40 -> ~31
# B/minimizer on disk, which is what lets a 26.76 Gbp (reference
# miniSeq+H scale) shard-cache set fit this image's disk
CACHE_FORMAT = 5


def _migrate_cache_v2_to_v3(tab_fn, z):
    """v2 -> v3 without the 15-min rebuild: pack strand into pos_tab's hrow
    row, drop the dead standalone chain planes, stamp the version."""
    from metamaps_tpu.ops.batch_map import pack_hrow_strand

    print("# migrating bench cache v2 -> v3 (pos_tab pack)", flush=True)
    tables = {k: z[k] for k in z.files if k not in (
        "prev_w_same", "chain_b", "next_w_same", "hrow_pos",
        "format_version", "allow_pickle")}
    old = tables["pos_tab"]
    assert old.shape[0] == 6
    tables["pos_tab"] = np.concatenate([
        old[:1],
        pack_hrow_strand(old[1], old[5])[None],
        old[2:5],
    ])
    np.savez(tab_fn + ".tmp.npz", **tables, format_version=np.int64(3))
    os.replace(tab_fn + ".tmp.npz", tab_fn)
    return np.load(tab_fn, allow_pickle=True)


def _migrate_cache_v3_to_v4(tab_fn, z):
    """v3 -> v4 without the 15-min rebuild: the uint16 chain deltas are
    pure arithmetic over the old absolute-position pos_tab rows
    (wpos, hrow|strand, prev_w_same, chain_b, next_w_same)."""
    print("# migrating bench cache v3 -> v4 (chain deltas)", flush=True)
    i32min, i32max = np.int32(-(2**31)), np.int32(2**31 - 1)
    tables = {k: z[k] for k in z.files if k not in (
        "pos_tab", "format_version", "allow_pickle")}
    pt = z["pos_tab"]
    w64 = pt[0].astype(np.int64)
    has_p = pt[2] != i32min
    has_n = pt[4] != i32max
    gap_prev = np.where(
        has_p, np.clip(w64 - pt[3].astype(np.int64) - 1, 0, 65535), 65535
    ).astype(np.uint16)
    delta_pw = np.where(
        has_p, np.clip(w64 - pt[2].astype(np.int64), 0, 65535), 65535
    ).astype(np.uint16)
    delta_nw = np.where(
        has_n, np.clip(pt[4].astype(np.int64) - w64, 0, 65535), 65535
    ).astype(np.uint16)
    tables["hs32"] = pt[1]
    tables["chains16"] = np.stack([gap_prev, delta_pw, delta_nw])
    co = tables["contig_offsets"].astype(np.int64)
    max_step = 0
    for i in range(len(co) - 1):
        if co[i + 1] - co[i] > 1:
            max_step = max(max_step,
                           int(np.diff(w64[co[i]:co[i + 1]]).max()))
    tables["max_step"] = np.int64(max_step)
    np.savez(tab_fn + ".tmp.npz", **tables,
             format_version=np.int64(4))
    os.replace(tab_fn + ".tmp.npz", tab_fn)
    return np.load(tab_fn, allow_pickle=True)


def _diet_tables(tables: dict) -> dict:
    """Full in-memory table dict -> the v5 DISK layout: drop the planes
    that are exactly reconstructible at load (hash_sorted = sort of
    hash_pos; strand_pos = hs32's packed strand bit) and pack pair_byhash
    into the uint32 gpos plane when the shard fits (pack_gpos — the
    many-contig fallback keeps pair_byhash). ~40 -> ~31 B/minimizer on
    disk and proportionally faster swap reloads."""
    from metamaps_tpu.ops.batch_map import pack_gpos

    d = {k: v for k, v in tables.items()
         if k not in ("hash_sorted", "strand_pos", "gpos", "gpos_wb")}
    if "gpos" in tables and int(tables.get("gpos_wb", 0)):
        d["gpos"] = tables["gpos"]
        d["gpos_wb"] = np.int64(int(tables["gpos_wb"]))
        d.pop("pair_byhash", None)
        return d
    pair = np.asarray(tables["pair_byhash"])
    gp, wb = pack_gpos(pair, int(tables["contig_offsets"].shape[0]) - 1)
    if wb:
        d["gpos"] = gp
        d["gpos_wb"] = np.int64(wb)
        d.pop("pair_byhash", None)
    return d


def _migrate_cache_v4_to_v5(tab_fn, z):
    """v4 -> v5 without the rebuild: pure drops + the gpos pack."""
    print("# migrating bench cache v4 -> v5 (disk diet)", flush=True)
    tables = {k: z[k] for k in z.files if k not in (
        "format_version", "allow_pickle")}
    np.savez(tab_fn + ".tmp.npz", **_diet_tables(tables),
             format_version=np.int64(CACHE_FORMAT))
    os.replace(tab_fn + ".tmp.npz", tab_fn)
    return np.load(tab_fn, allow_pickle=True)


def _rehydrate_tables(d: dict):
    """v5 disk layout -> full in-memory table dict, WITHOUT the
    hash-order sort.

    The O(M) reconstructions are exact inverses of what the build
    dropped: strand_pos decodes hs32's bit 30 (pack_hrow_strand packs
    ``strand > 0`` and winnowing emits strictly {+1,-1}); pair_byhash
    unpacks gpos (pack_gpos is lossless when it engaged). hash_sorted is
    deliberately NOT materialized: the accelerator block-lookup path never
    reads it, DeviceShard.from_tables re-sorts hash_pos on the rare paths
    that do, and the SketchShard's hash-order views are derived lazily by
    ensure_hash_order_views() only if an oracle fallback actually fires —
    skipping the ~45 s/swap argsort at 3.3 Gbp/shard."""
    from metamaps_tpu.ops.batch_map import HROW_STRAND_BIT

    t = dict(d)
    hs32 = np.asarray(t["hs32"])
    # signed intermediate: no reliance on uint32 wraparound (ADVICE r4)
    t["strand_pos"] = (
        ((hs32 >> HROW_STRAND_BIT) & 1).astype(np.int8) * 2 - 1
    )
    if "gpos" in t:
        wb = int(t["gpos_wb"])
        gp = np.asarray(t["gpos"])
        t["pair_byhash"] = np.stack(
            [(gp >> np.uint32(wb)).astype(np.int32),
             (gp & np.uint32((1 << wb) - 1)).astype(np.int32)], axis=1,
        )
    return t


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
    """Reconstruct a SketchShard from cached host tables — sort-free.

    hash_sorted/strand_byhash stay None: they only serve the serial-oracle
    fallback, and SketchShard.ensure_hash_order_views() derives them
    lazily the first time that path actually runs (the ~45 s/swap argsort
    at 3.3 Gbp/shard is thereby skipped on the 0-fallback steady state)."""
    from metamaps_tpu.engine.index import SketchShard

    sh = SketchShard()
    sh.contig_names = list(contig_names)
    sh.contig_lengths = [int(x) for x in contig_lengths]
    sh.wpos = np.asarray(t["wpos"])
    sh.strand = np.asarray(t["strand_pos"])
    sh.hash_pos_order = np.asarray(t["hash_pos"])
    if "hash_sorted" in t:
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


def _migrate_legacy_names(total_bases, seed):
    """Pre-round-4 caches coupled the table file name to the read count
    (db_<bases>_<seed>_1536_tables.npz); tables are read-count-independent,
    so rename into the decoupled scheme instead of rebuilding 15 min/shard."""
    new_tab = os.path.join(CACHE_DIR, f"db_{total_bases}_{seed}_tables.npz")
    old_tab = os.path.join(CACHE_DIR, f"db_{total_bases}_{seed}_1536_tables.npz")
    if not os.path.exists(new_tab) and os.path.exists(old_tab):
        os.rename(old_tab, new_tab)
    old_rd = os.path.join(CACHE_DIR, f"db_{total_bases}_{seed}_1536_reads.npz")
    new_rd = os.path.join(CACHE_DIR, f"reads_{total_bases}_{seed}_1536.npz")
    if not os.path.exists(new_rd) and os.path.exists(old_rd):
        os.rename(old_rd, new_rd)


def _find_reads_cache(total_bases, seed, n_reads):
    """Path of a cached read set with >= n_reads reads (reads are drawn
    sequentially from the seeded rng, so the first n of a larger cache are
    exactly the smaller cache), or None."""
    import glob

    exact = os.path.join(CACHE_DIR, f"reads_{total_bases}_{seed}_{n_reads}.npz")
    if os.path.exists(exact):
        return exact
    best = None
    best_n = None
    for fn in glob.glob(
        os.path.join(CACHE_DIR, f"reads_{total_bases}_{seed}_*.npz")
    ):
        try:
            n = int(fn.rsplit("_", 1)[1].split(".")[0])
        except ValueError:
            continue
        if n >= n_reads and (best_n is None or n < best_n):
            best, best_n = fn, n
    return best


def build_db_large(total_bases=LARGE_BASES, n_reads=1536, verbose=True,
                   seed=LARGE_SEED):
    """Build (or load from cache) the structured DB + ONT reads. Returns
    (shard, device_tables, reads, build_info). ``seed`` names the shard —
    the multishard bench builds N independent 1 Gbp shards with distinct
    seeds (the reference's memory-bounded temporal shards,
    winSketch.hpp:298-329). Tables and reads are cached independently: a
    read-count change reuses the (15-min) table build and only redraws
    reads."""
    from concurrent.futures import ThreadPoolExecutor

    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.io.native import winnow_native
    from metamaps_tpu.ops.batch_map import DeviceShard
    from metamaps_tpu.ops.winnow import winnow_fast
    from metamaps_tpu.sim.synth_db import make_ont_reads, synth_structured_db

    os.makedirs(CACHE_DIR, exist_ok=True)
    _migrate_legacy_names(total_bases, seed)
    tab_fn = os.path.join(CACHE_DIR, f"db_{total_bases}_{seed}_tables.npz")
    reads_fn = _find_reads_cache(total_bases, seed, n_reads)
    info = {}

    if os.path.exists(tab_fn) and reads_fn is None:
        # tables cached but no read set this large: resynthesize the genomes
        # (deterministic from the seed; the expensive winnow/finalize/table
        # passes are skipped) and draw the reads
        rng = np.random.default_rng(seed)
        t0 = time.perf_counter()
        genomes, _names = synth_structured_db(rng, total_bases=total_bases)
        reads = make_ont_reads(rng, genomes, n_reads, min_len=3000,
                               max_len=7600)
        reads = [r[:8192] for r in reads]
        del genomes
        reads_fn = os.path.join(
            CACHE_DIR, f"reads_{total_bases}_{seed}_{n_reads}.npz")
        np.savez(reads_fn, reads=np.array(reads, dtype=object))
        info["reads_regen_s"] = round(time.perf_counter() - t0, 1)
        if verbose:
            print(f"# reads regenerated: {info}", flush=True)

    if os.path.exists(tab_fn) and reads_fn is not None:
        t0 = time.perf_counter()
        try:
            z = np.load(tab_fn, allow_pickle=True)
            z.files  # force the zip directory read
        except Exception as e:
            # a truncated/corrupt cache is a miss, not a crash (ADVICE r4)
            print(f"# cache unreadable ({e}); rebuilding", flush=True)
            z = None
        # table-format versioning: entries written before the current
        # DeviceShard layout must be rebuilt, not silently loaded with
        # stale lookup tables (a pre-remix cache would pin remix_e=0 and
        # never pick up the equalized layout)
        ver = -1 if z is None else (
            int(z["format_version"])
            if "format_version" in z.files
            else (2 if "remix_e" in z.files else 0)
        )
        if ver == 2:
            z = _migrate_cache_v2_to_v3(tab_fn, z)
            ver = 3
        if ver == 3:
            z = _migrate_cache_v3_to_v4(tab_fn, z)
            ver = 4
        if ver == 4:
            z = _migrate_cache_v4_to_v5(tab_fn, z)
            ver = CACHE_FORMAT
        if ver == CACHE_FORMAT:
            raw = {k: z[k] for k in z.files if k not in (
                "contig_names", "contig_lengths", "format_version",
                "allow_pickle")}
            tables = _rehydrate_tables(raw)
            names = [str(x) for x in z["contig_names"]]
            lens = z["contig_lengths"]
            rz = np.load(reads_fn, allow_pickle=True)
            reads = [np.asarray(r) for r in rz["reads"][:n_reads]]
            info["cache"] = "hit"
            info["load_s"] = round(time.perf_counter() - t0, 1)
            return _shard_from_tables(tables, names, lens), tables, reads, info
        if verbose:
            print(f"# cache format {ver} != {CACHE_FORMAT}; rebuilding",
                  flush=True)

    rng = np.random.default_rng(seed)
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
    diet = _diet_tables(tables)
    # tmp + atomic replace: a crash mid-write must not leave a truncated
    # cache that later runs np.load-fail on instead of rebuilding (ADVICE r4)
    np.savez(
        tab_fn + ".tmp.npz", **diet,
        contig_names=np.array(shard.contig_names, dtype=object),
        contig_lengths=np.array(shard.contig_lengths, np.int64),
        format_version=np.int64(CACHE_FORMAT),
    )
    os.replace(tab_fn + ".tmp.npz", tab_fn)
    # hand the packed gpos plane to from_tables too (skips its re-pack)
    if "gpos" in diet:
        tables["gpos"] = diet["gpos"]
        tables["gpos_wb"] = diet["gpos_wb"]
    del diet
    reads_fn = os.path.join(
        CACHE_DIR, f"reads_{total_bases}_{seed}_{n_reads}.npz")
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
    jax.device_get(out_em[1])  # true completion, not enqueue (README rule 1)
    return (time.perf_counter() - t0) / 10 * 1000


def _tables_common_spec(stats_list):
    """Common padded shapes + unified static pytree metadata from per-shard
    table STATS (dicts of shapes/scalars — `_table_stats`), so the spec can
    be computed without every shard's arrays resident."""
    nb = {s["bucket_shift"] for s in stats_list}
    mode = {s["lookup_mode"] for s in stats_list}
    remix = {s["remix_e"] for s in stats_list}
    assert len(nb) == 1 and len(mode) == 1 and len(remix) == 1, (
        "shards disagree on lookup layout; rebuild with pinned "
        f"nb_bits/remix (nb={nb}, mode={mode}, remix={remix})"
    )
    return {
        "m_max": max(s["m"] for s in stats_list),
        "u_max": max(s["u"] for s in stats_list),
        "c_max": max(s["c"] for s in stats_list),
        "kv_max": max(s["kv"] for s in stats_list),
        # a common (stricter) threshold keeps freq_threshold — static
        # pytree metadata — equal across shards so the jit cache is shared
        "thr": min(s["freq_threshold"] for s in stats_list),
        "steps": max(s["bisect_steps"] for s in stats_list),
        "max_step": max(s["max_step"] for s in stats_list),
        # the packed-gpos hit plane survives padding only when every shard
        # packed with the SAME width (gp values must order identically
        # under one wb; bench shards share the synth config, so they do) —
        # otherwise fall back to pair_byhash as before
        "gpos_wb": (stats_list[0]["gpos_wb"]
                    if len({s["gpos_wb"] for s in stats_list}) == 1
                    else 0),
    }


def _table_stats(t):
    """Shape/scalar summary of one shard's host tables (for
    :func:`_tables_common_spec`)."""
    return {
        "m": int(t["wpos"].shape[0]),
        "u": int(t["uniq_hash"].shape[0]),
        "c": int(t["contig_offsets"].shape[0]),
        "kv": int(t["kv32"].shape[0]),
        "bucket_shift": int(t["bucket_shift"]),
        "lookup_mode": str(t["lookup_mode"]),
        "remix_e": int(t["remix_e"]),
        "freq_threshold": int(t["freq_threshold"]),
        "bisect_steps": int(t["bisect_steps"]),
        "max_step": int(t.get("max_step", 64)),
        "gpos_wb": int(t["gpos_wb"]) if "gpos_wb" in t else 0,
    }


def _pad_tables_to(t, spec):
    """Pad ONE shard's host tables to the common-spec shapes (stack_shards
    sentinels) and unify the static pytree metadata, so the jitted mapping
    kernels compile ONCE and are reused across the temporal device-table
    swap loop — the point of the reference's memory-bounded shard design is
    that per-shard cost is swap + map, not recompile (winSketch.hpp:298,
    mapWrap.h:417-429)."""
    from metamaps_tpu.ops.batch_map import HROW_PAD

    i32max = np.int32(2**31 - 1)
    m_max, u_max = spec["m_max"], spec["u_max"]

    def pad1(x, n, fill):
        if len(x) == n:
            return np.asarray(x)
        out = np.full((n,) + tuple(x.shape[1:]), fill, dtype=x.dtype)
        out[: len(x)] = x
        return out

    p = dict(t)
    if "hash_sorted" in t:
        # absent on v5 lazy loads — from_tables re-derives it from the
        # padded hash_pos on the rare paths that read it (the 0xFFFFFFFF
        # pads sort last either way)
        p["hash_sorted"] = pad1(t["hash_sorted"], m_max, np.uint32(0xFFFFFFFF))
    wb = int(spec.get("gpos_wb", 0))
    if wb and "gpos" in t and int(t.get("gpos_wb", 0)) == wb:
        # pad the packed hit plane directly: 0xFFFFFFFF is pack_gpos's
        # above-every-real-gp sentinel (seqid <= 2^(32-wb) - 2), so padded
        # rows sort last exactly like i32max pair rows did. Packing from
        # the PADDED pair would instead see max_pos = i32max and disable
        # gpos — which silently cost multishard runs 4 B/minimizer of HBM
        p["gpos"] = pad1(t["gpos"], m_max, np.uint32(0xFFFFFFFF))
        p["gpos_wb"] = np.int64(wb)
        p["pair_byhash"] = np.zeros((0, 2), np.int32)
    else:
        p.pop("gpos", None)
        p.pop("gpos_wb", None)
        p["pair_byhash"] = pad1(t["pair_byhash"], m_max, i32max)
    p["wpos"] = pad1(t["wpos"], m_max, i32max)
    p["hash_pos"] = pad1(t["hash_pos"], m_max, np.uint32(0xFFFFFFFF))
    p["strand_pos"] = pad1(t["strand_pos"], m_max, np.int8(1))
    p["hs32"] = pad1(t["hs32"], m_max, HROW_PAD)
    m = t["chains16"].shape[1]
    if m != m_max:
        ch = np.full((3, m_max), np.uint16(65535), np.uint16)
        ch[:, :m] = t["chains16"]
        p["chains16"] = ch
    p["max_step"] = np.int64(spec["max_step"])
    co = np.asarray(t["contig_offsets"])
    p["contig_offsets"] = pad1(co, spec["c_max"], co[-1])
    p["uniq_hash"] = pad1(t["uniq_hash"], u_max, np.uint32(0xFFFFFFFF))
    us = np.asarray(t["uniq_start"])
    p["uniq_start"] = pad1(us, max(u_max + 1, len(us)), us[-1])
    p["kv32"] = pad1(t["kv32"], spec["kv_max"], np.uint32(0))
    p["freq_threshold"] = np.int64(spec["thr"])
    p["bisect_steps"] = np.int64(spec["steps"])
    return p


def _pad_tables_common(tables_list, verbose=True):
    """All-resident wrapper over :func:`_tables_common_spec` +
    :func:`_pad_tables_to` (kept for tests/small scales; the bench's swap
    loop streams shards instead — one resident at a time)."""
    spec = _tables_common_spec([_table_stats(t) for t in tables_list])
    padded = []
    for i in range(len(tables_list)):
        t = tables_list[i]
        tables_list[i] = None  # consume destructively: at 8 x 1 Gbp shards
        # holding originals + padded copies together would double ~40 GB
        padded.append(_pad_tables_to(t, spec))
    if verbose:
        print(f"# multishard: common shapes M={spec['m_max']} "
              f"U={spec['u_max']} thr={spec['thr']}", flush=True)
    return padded


def run_multishard_bench(n_shards, n_reads=16384, verbose=True):
    """Map one read set against an N-shard database under a fixed HBM
    budget: one shard's device tables resident at a time, swapped between
    mapping passes; per-read candidates merged across shards and mapping
    qualities computed over the union — the reference's --maxmemory shard
    loop + unifyFiles + addMappingQualities contract (mapWrap.h:34-213,
    215-323) at realistic scale. Returns (detail dict, merged results).

    Shards STREAM through host RAM: pass 1 touches each shard's tables
    only long enough to record shapes + contig metadata (computing the
    common padded spec without all shards resident), pass 2 reloads,
    pads, uploads, maps, and releases one shard at a time. Peak host RAM
    is ~2 table sets regardless of N — the all-resident loop capped out
    near 8 x 1 Gbp on this image, while the reference-scale target
    (26.76 Gbp = 8 x 3.345 Gbp via METAMAPS_TPU_BENCH_BASES, block16w
    lookup) needs ~170 GB all-resident. The reference reloads each
    serialized sketch from disk per pass too (mapWrap.h:417-429)."""
    import gc
    from types import SimpleNamespace

    import jax

    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.ops.batch_map import DeviceShard
    from metamaps_tpu.params import Parameters

    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)

    detail = {"mode": "multishard", "n_shards": n_shards}
    per = n_reads // n_shards

    # pass 1 — shapes + contig metadata + the read draw per shard. A stats
    # sidecar (written on first full load) avoids np.load-ing every shard's
    # multi-GB table file twice: at 8 x 3.345 Gbp the full-load pass alone
    # costs ~12 min of disk reads that a 2 KB JSON replaces
    stats, meta, read_sets = [], [], []
    t0 = time.perf_counter()
    for i in range(n_shards):
        seed = LARGE_SEED + 7919 * i
        tab_fn = os.path.join(CACHE_DIR,
                              f"db_{LARGE_BASES}_{seed}_tables.npz")
        side_fn = tab_fn + ".stats.json"
        rd_fn = _find_reads_cache(LARGE_BASES, seed, per)
        side = None
        if os.path.exists(side_fn) and rd_fn is not None:
            try:
                with open(side_fn) as f:
                    side = json.load(f)
            except Exception:
                side = None
        if side is not None:
            stats.append(side["stats"])
            meta.append(SimpleNamespace(
                contig_names=[f"s{i}|{n}" for n in side["contig_names"]],
                contig_lengths=[int(x) for x in side["contig_lengths"]],
            ))
            rz = np.load(rd_fn, allow_pickle=True)
            read_sets.append([np.asarray(r) for r in rz["reads"][:per]])
            if verbose:
                print(f"# shard {i}: stats sidecar hit", flush=True)
            continue
        sh, tb, rd, info = build_db_large(seed=seed, n_reads=per,
                                          verbose=verbose)
        stats.append(_table_stats(tb))
        with open(side_fn + ".tmp", "w") as f:
            json.dump({"stats": stats[-1],
                       "contig_names": list(sh.contig_names),
                       "contig_lengths": [int(x) for x in
                                          sh.contig_lengths]}, f)
        os.replace(side_fn + ".tmp", side_fn)
        # globally unique contig names across shards (the reference DB has
        # globally unique contigs; synth shards reuse local names)
        meta.append(SimpleNamespace(
            contig_names=[f"s{i}|{n}" for n in sh.contig_names],
            contig_lengths=[int(x) for x in sh.contig_lengths],
        ))
        read_sets.append(rd[:per])
        if verbose:
            print(f"# shard {i}: {sh.n_minimizers} minimizers "
                  f"({info.get('cache', '?')})", flush=True)
        del sh, tb, rd
        gc.collect()
    spec = _tables_common_spec(stats)
    detail["load_s"] = round(time.perf_counter() - t0, 1)
    detail["db_bases"] = int(
        sum(sum(m.contig_lengths) for m in meta))
    if verbose:
        print(f"# multishard: common shapes M={spec['m_max']} "
              f"U={spec['u_max']} thr={spec['thr']}", flush=True)

    # reads drawn evenly from every shard's genomes (each read has a true
    # home shard; the others are realistic decoys)
    reads = [r for rs in read_sets for r in rs]

    on_accel = jax.default_backend() in ("tpu", "axon", "gpu")
    all_results = []  # [shard][read] -> list of ReadMapping
    swap_s, map_s, upload_s = [], [], []
    hbm_b = 0

    # next-shard PREFETCH: the disk reload + pad of shard i+1 runs on a
    # loader thread while shard i uploads and maps (np.load / numpy release
    # the GIL; the main thread is blocked in device transfers anyway). The
    # reference's shard loop serializes reload and map (mapWrap.h:417-429);
    # overlapping them is free parallelism the TPU host has to spare — at
    # 8 x 3.345 Gbp it hides ~150 s/shard of disk behind the ~140 s upload.
    # Peak host RAM: 2 padded table sets (the streaming contract holds).
    from concurrent.futures import ThreadPoolExecutor

    def _load_padded(i):
        seed = LARGE_SEED + 7919 * i
        # reload this shard's cached tables (the disk part of the swap) and
        # pad to the common spec; the SketchShard from build_db_large views
        # the UNPADDED planes — the oracle-fallback contract (its wpos/seqid
        # lengths must agree with contig_offsets, which padding breaks)
        sh_i, tb, _rd, _info = build_db_large(seed=seed, n_reads=per,
                                              verbose=False)
        padded_i = _pad_tables_to(tb, spec)
        del tb
        return sh_i, padded_i

    loader = ThreadPoolExecutor(1)
    fut = loader.submit(_load_padded, 0)
    for i in range(n_shards):
        t0 = time.perf_counter()
        sh, padded = fut.result()
        if i + 1 < n_shards:
            fut = loader.submit(_load_padded, i + 1)
        t_up = time.perf_counter()
        dshard = DeviceShard.from_tables(padded, drop_cpu_planes=on_accel)
        jax.block_until_ready((dshard.wpos, dshard.hs32, dshard.kv32))
        upload_s.append(round(time.perf_counter() - t_up, 1))
        swap_s.append(round(time.perf_counter() - t0, 1))
        hbm_b = dshard.hbm_bytes()
        engine = JaxMapperEngine(sh, params, read_len_buckets=BENCH_BUCKETS,
                                 device_shard=dshard, hits_max=16384)
        if i == 0:
            plans = load_bench_plans(
                f"ms{n_shards}x{LARGE_BASES}", LARGE_SEED, n_reads)
            if plans is not None:
                # frozen snapshot: fused path + known kernel set from the
                # first chunk (persistent-cache hits), one warm pass
                print("# frozen plans loaded (bench_plans.json)", flush=True)
                engine.import_plans(plans, freeze=True)
                engine.map_reads(reads)
            else:
                # full warm passes until the adaptive plans stop changing
                # (the first seeds the plans host-routed, the second
                # compiles the fused kernels, later ones absorb
                # plan-adoption recompiles) — so every shard's timed pass
                # measures mapping, not compilation
                for _ in range(4):
                    before = (dict(engine._exp_plan),
                              dict(engine._route_plan))
                    engine.map_reads(reads)
                    if (dict(engine._exp_plan),
                            dict(engine._route_plan)) == before:
                        break
                save_bench_plans(engine, f"ms{n_shards}x{LARGE_BASES}",
                                 LARGE_SEED, n_reads)
            warm_state = (engine._configs, engine._route_plan,
                          engine._route_rates, engine._spec_tier,
                          engine._spec_need, engine._exp_plan,
                          engine._exp_rates)
            engine.freeze_plans = True
        else:
            # inherit the warmed route plans/configs: identical compiled
            # shapes across the swap loop, so later shards route straight
            # to already-compiled kernels (a fresh engine would re-seed its
            # plan and could compile new L2 tiers mid-timing)
            (engine._configs, engine._route_plan,
             engine._route_rates, engine._spec_tier) = (
                dict(warm_state[0]), dict(warm_state[1]),
                {k: dict(v) for k, v in warm_state[2].items()},
                dict(warm_state[3]),
            )
            engine._spec_need = dict(warm_state[4])
            engine._exp_plan = dict(warm_state[5])
            engine._exp_rates = {k: dict(v) for k, v in warm_state[6].items()}
            engine.freeze_plans = True
        t0 = time.perf_counter()
        all_results.append(engine.map_reads(reads))
        map_s.append(round(time.perf_counter() - t0, 3))
        detail[f"shard{i}_fallbacks"] = engine.stats["oracle_fallbacks"]
        # per-shard engine phase decomposition (cumulative over warm+timed
        # for shard 0, timed-only for shards 1+): pinpoints whether a slow
        # shard lost time to escalation round trips, host-routed leftover
        # candidates (frozen route-plan overflow), or collect
        detail[f"shard{i}_esc_reads"] = engine.stats["esc_reads"]
        detail[f"shard{i}_leftover_cands"] = engine.stats["leftover_cands"]
        detail[f"shard{i}_phase_s"] = {
            k: round(v, 2) for k, v in engine.stats["phase_s"].items()}
        # free HBM + the host table planes before the next shard's reload
        del dshard, engine, sh, padded
        gc.collect()
        if verbose:
            print(f"# shard {i}: swap {swap_s[-1]}s "
                  f"(upload {upload_s[-1]}s) map {map_s[-1]}s", flush=True)

    loader.shutdown(wait=False)
    # the unifyFiles merge: per-read candidates concatenated in shard
    # order, report filter + mapping qualities over the union
    if verbose:
        print("# unify: merging per-read candidates", flush=True)
    t0 = time.perf_counter()
    merged_lines, n_mapped = unify_lines(params, all_results, meta,
                                         len(reads))
    detail["unify_s"] = round(time.perf_counter() - t0, 2)
    detail.update({
        "swap_s_per_shard": swap_s,
        "upload_s_per_shard": upload_s,
        "map_s_per_shard": map_s,
        "hbm_gb_per_shard": round(hbm_b / 1e9, 2),
        "n_reads": len(reads),
        "n_mapped": n_mapped,
        "mean_mappings_per_read": round(
            len(merged_lines) / max(1, len(reads)), 2),
        "map_s": round(sum(map_s), 3),
    })
    total_s = sum(map_s) + sum(swap_s) + detail["unify_s"]
    detail["reads_per_s_map"] = round(len(reads) / sum(map_s), 2)
    detail["reads_per_s_amortized"] = round(len(reads) / total_s, 2)
    return detail, merged_lines, meta


def em_bench_realdist(merged_lines, shards, min_lines=5_000_000):
    """EM iteration time on a table with the REAL bench mapping
    distribution (fEM.h:501-661 hot loop at production scale): the merged
    mapping lines go through the production parser (native columnar +
    taxonInfo resolution) into a MappingTable, which is then read-block
    tiled to >= min_lines — distinct read ids, identical per-read
    raggedness / mapQ / identity / taxon mix — and the jitted device EM
    round (the >=5M-line auto backend) is timed."""
    import tempfile

    import jax

    from metamaps_tpu.engine.em import (
        MappingTable,
        load_mapping_table,
        make_em_iterate_jax,
    )
    from metamaps_tpu.taxonomy import extract_taxon_id

    taxon_info = {}
    for sh in shards:
        for name, length in zip(sh.contig_names, sh.contig_lengths):
            t = extract_taxon_id(name)
            taxon_info.setdefault(t, {})[name] = int(length)
    with tempfile.NamedTemporaryFile("w", suffix=".mappings",
                                     delete=False) as f:
        f.write("\n".join(merged_lines) + "\n")
        fn = f.name
    try:
        base = load_mapping_table(fn, taxon_info)
    finally:
        os.unlink(fn)
    print("# em_realdist: table parsed", flush=True)
    n0 = len(base.mapq)
    r0 = len(base.read_ids)
    if n0 == 0:
        return None
    k = max(1, -(-min_lines // n0))
    # widen the taxon table to reference scale as well: a miniSeq+H-class
    # DB's EM iterates over thousands of taxa (fEM.h:501-661), not the
    # synth DB's dozens — tile block j keeps the real per-read raggedness /
    # mapQ / identity mix but maps into its own copy of the taxon set
    # (j mod t_rep), so the timed table has >= 1000 distinct taxa with the
    # real per-taxon line distribution (VERDICT r4 item 7)
    n_tax0 = len(base.taxon_list)
    t_rep = min(k, max(1, -(-1000 // n_tax0)))
    tiled = MappingTable(
        lines=[], contig_of_line=[],
        read_ids=["r"] * (r0 * k),
        taxon_list=[f"{t}.{j}" for j in range(t_rep)
                    for t in base.taxon_list],
        read_of_line=np.concatenate(
            [base.read_of_line + j * r0 for j in range(k)]),
        taxon_of_line=np.concatenate(
            [base.taxon_of_line + (j % t_rep) * n_tax0 for j in range(k)]),
        mapq=np.tile(base.mapq, k),
        inv_locations=np.tile(base.inv_locations, k),
        identity=np.tile(base.identity, k),
        start=np.tile(base.start, k), stop=np.tile(base.stop, k),
        read_len=np.tile(base.read_len, k),
    )
    print(f"# em_realdist: tiled to {n0 * k} lines; compiling", flush=True)
    step = make_em_iterate_jax(tiled)
    n_tax = len(tiled.taxon_list)
    f0 = np.full(n_tax, 1.0 / n_tax, np.float32)
    jax.block_until_ready(step(f0))
    print("# em_realdist: compiled; timing", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(f0)
    # a real device->host fetch: on the tunnel, block_until_ready alone
    # can report enqueue completion (profiling/README.md rule 1)
    jax.device_get(out[1])
    ms = (time.perf_counter() - t0) / 10 * 1000
    return {
        "em_iter_ms_realdist": round(ms, 2),
        "em_lines_realdist": n0 * k,
        "em_taxa_realdist": n_tax,
    }


PLANS_FN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_plans.json")


def _plans_key(total_bases, seed, n_reads):
    return f"{total_bases}_{seed}_{n_reads}"


def load_bench_plans(total_bases, seed, n_reads):
    """Committed frozen-plan snapshot for this bench config, or None.

    With a snapshot, the engine dispatches the fused steady-state path from
    the very first chunk and its compiled-kernel set is identical run to
    run — every compile is a persistent-cache (.jax_cache) hit, so a cold
    container pays seconds, not the ~1 min/kernel tunnel compiles that
    timed out the round-4 driver bench (BENCH_r04.json rc=124)."""
    try:
        with open(PLANS_FN) as f:
            d = json.load(f)
        return d.get(_plans_key(total_bases, seed, n_reads))
    except Exception:
        return None


def save_bench_plans(engine, total_bases, seed, n_reads):
    try:
        with open(PLANS_FN) as f:
            d = json.load(f)
    except Exception:
        d = {}
    d[_plans_key(total_bases, seed, n_reads)] = engine.export_plans()
    with open(PLANS_FN + ".tmp", "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
    os.replace(PLANS_FN + ".tmp", PLANS_FN)
    print(f"# plans saved -> {PLANS_FN}", flush=True)


def run_mapping_bench(engine, reads, warm=2, passes=3, plans=None):
    """Warm twice on a 256-read slice (first pass seeds the route/expansion
    plans host-side, second compiles the fused kernels the plans select),
    then once on the FULL read set (the full set's chunk statistics can
    adapt the plans once more — let any recompile land outside the timed
    passes), then time ``passes`` full passes. Returns (times list,
    results): callers report median + min/max — a single best-of number
    hides the shared tunnel's ±15% variance (profiling/README.md).

    With a frozen ``plans`` snapshot (load_bench_plans), the adaptive warm
    loop is skipped entirely: import + freeze, ONE full-set warm pass (all
    compiles — persistent-cache hits when .jax_cache is seeded), then the
    timed passes."""
    if plans is not None:
        engine.import_plans(plans, freeze=True)
        engine.map_reads(reads)
    else:
        for _ in range(warm):
            engine.map_reads(reads[:256])
        # full-set warm passes until the adaptive plans stop changing (a
        # plan adoption mid-timed-pass recompiles the fused kernel and
        # poisons that pass with ~1 min of compilation)
        for _ in range(4):
            plans_before = (dict(engine._exp_plan), dict(engine._route_plan))
            engine.map_reads(reads)
            if (dict(engine._exp_plan),
                    dict(engine._route_plan)) == plans_before:
                break
        engine.freeze_plans = True
    times = []
    results = None
    for _ in range(passes):
        t0 = time.perf_counter()
        results = engine.map_reads(reads)
        times.append(time.perf_counter() - t0)
    return times, results


def unify_lines(params, all_results, shards, n_reads):
    """The unifyFiles merge (mapWrap.h:34-213): per-read candidates
    concatenated in shard order, report filter + mapping qualities over the
    union. Returns (merged mapping lines, n_mapped)."""
    from metamaps_tpu.engine import mapper_oracle
    from metamaps_tpu.engine.mapwrap import add_mapping_qualities
    from metamaps_tpu.io.mappings import MappingLine

    merged_lines = []
    n_mapped = 0
    for r in range(n_reads):
        cands = []
        for i, res in enumerate(all_results):
            ms = mapper_oracle.report_filter(res[r], params.report_all)
            for m in ms:
                cands.append(MappingLine(
                    read_id=f"read{r}",
                    read_len=m.query_len,
                    strand=m.strand,
                    contig_id=shards[i].contig_names[m.ref_seqid],
                    contig_len=shards[i].contig_lengths[m.ref_seqid],
                    ref_start=m.ref_start,
                    ref_end=m.ref_end,
                    identity=m.nuc_identity,
                    intersection=m.conserved,
                    sketch_size=m.sketch_size,
                ).format())
        if cands:
            n_mapped += 1
            merged_lines.extend(add_mapping_qualities(params, cands))
    return merged_lines, n_mapped


def _multishard_cache_ready(n_shards, n_reads_per_shard):
    """True when every shard's host tables + reads are already disk-cached —
    a cold multishard build is ~15 min/shard on this image's 2 CPUs, too
    slow for the driver's bench window (the caches are built once by
    `python bench.py --prebuild-shards N`)."""
    for i in range(n_shards):
        seed = LARGE_SEED + 7919 * i
        _migrate_legacy_names(LARGE_BASES, seed)
        tab = os.path.join(CACHE_DIR, f"db_{LARGE_BASES}_{seed}_tables.npz")
        if not (os.path.exists(tab)
                and _find_reads_cache(LARGE_BASES, seed, n_reads_per_shard)):
            return False
    return True


def main():
    import jax

    # persistent compilation cache: the engine's routed kernels + the EM
    # scan compile in ~2-5 min through the tunnel on first use; cached
    # entries load in ms on later runs (cache dir survives across runs)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.params import Parameters

    quick = "--quick" in sys.argv
    # default 1 shard (1 Gbp): keeps the headline series comparable across
    # rounds (reads/s against the same DB size) and inside the driver's
    # bench window — each extra shard adds a 30-500 s device-table swap
    # through the shared tunnel. The memory-bounded multishard capability
    # (`--shards N`, N x 1 Gbp with table swap + unify) is recorded in the
    # committed BENCH_multishard.json
    n_shards = int(os.environ.get("METAMAPS_TPU_BENCH_SHARDS", "1"))
    if "--shards" in sys.argv:
        n_shards = int(sys.argv[sys.argv.index("--shards") + 1])
    n_reads = int(os.environ.get("METAMAPS_TPU_BENCH_READS", "16384"))
    if "--reads" in sys.argv:
        n_reads = int(sys.argv[sys.argv.index("--reads") + 1])
    if "--prebuild-shards" in sys.argv:
        n = int(sys.argv[sys.argv.index("--prebuild-shards") + 1])
        for i in range(n):
            build_db_large(seed=LARGE_SEED + 7919 * i,
                           n_reads=(n_reads if i == 0 else n_reads // n))
        print(f"# {n} shard caches ready")
        return
    multishard = (
        not quick and n_shards > 1
        and _multishard_cache_ready(n_shards, n_reads // n_shards)
    )
    rng = np.random.default_rng(7)
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)

    def emit(value, detail):
        # the driver tail-parses the LAST JSON line: the headline is printed
        # as soon as the mapping numbers exist and again after the EM
        # enrichment — a timeout mid-EM can no longer null the round's
        # headline (BENCH_r04.json rc=124, VERDICT r4 item 1)
        print(json.dumps({
            "metric": "mapping_throughput",
            "value": value,
            "unit": "reads/s/chip",
            "vs_baseline": 1.0,
            "detail": detail,
        }), flush=True)

    if multishard:
        detail, merged_lines, ms_shards = run_multishard_bench(
            n_shards, n_reads=n_reads)
        emit(detail["reads_per_s_map"], detail)
        print("# em_bench (synthetic 1M lines)", flush=True)
        em_ms = em_bench(rng)
        detail["em_iter_ms_1Mlines"] = round(em_ms, 2)
        print("# em_bench_realdist (tiled real mapping table)", flush=True)
        em_real = em_bench_realdist(merged_lines, ms_shards)
        if em_real:
            detail.update(em_real)
        emit(detail["reads_per_s_map"], detail)
        return

    if quick:
        t0 = time.perf_counter()
        genomes, shard = build_db_quick(rng, n_genomes=2, genome_len=1_000_000)
        t_db = time.perf_counter() - t0
        engine = JaxMapperEngine(shard, params, read_len_buckets=BENCH_BUCKETS)
        reads = make_reads_quick(rng, genomes, 512)
        times, results = run_mapping_bench(engine, reads)
        detail = {
            "mode": "quick",
            "db_bases": sum(len(g) for g in genomes),
            "db_build_s": round(t_db, 2),
        }
        shards_for_em = None
    else:
        shard, tables, reads, info = build_db_large(n_reads=n_reads)
        t0 = time.perf_counter()
        import jax

        from metamaps_tpu.ops.batch_map import DeviceShard

        on_accel = jax.default_backend() in ("tpu", "axon", "gpu")
        dshard = DeviceShard.from_tables(tables, drop_cpu_planes=on_accel)
        jax.block_until_ready((dshard.wpos, dshard.hs32, dshard.kv32))
        t_up = time.perf_counter() - t0
        hbm_b = dshard.hbm_bytes()
        print(
            f"# device index: {hbm_b / 1e9:.2f} GB HBM, "
            f"{hbm_b / max(1, shard.n_minimizers):.1f} B/minimizer",
            flush=True,
        )
        engine = JaxMapperEngine(
            shard, params, read_len_buckets=BENCH_BUCKETS, device_shard=dshard,
            hits_max=16384,
        )
        plans = load_bench_plans(LARGE_BASES, LARGE_SEED, n_reads)
        if plans is not None:
            print("# frozen plans loaded (bench_plans.json)", flush=True)
        times, results = run_mapping_bench(engine, reads, plans=plans)
        if plans is None:
            save_bench_plans(engine, LARGE_BASES, LARGE_SEED, n_reads)
        detail = {
            "mode": "large",
            "db_bases": sum(shard.contig_lengths),
            "n_minimizers": int(shard.n_minimizers),
            "lookup_mode": dshard.lookup_mode,
            "freq_threshold": int(shard.freq_threshold),
            "upload_s": round(t_up, 1),
            "hbm_gb": round(hbm_b / 1e9, 2),
            "bytes_per_minimizer": round(hbm_b / max(1, shard.n_minimizers), 1),
            "oracle_fallbacks": engine.stats["oracle_fallbacks"],
            **info,
        }
        shards_for_em = [shard]

    n_mapped = sum(1 for r in results if r)
    mean_cands = float(np.mean([len(r) for r in results]))
    dt_med = float(np.median(times))
    reads_per_s = len(reads) / dt_med

    detail.update({
        "n_reads": len(reads),
        "n_mapped": n_mapped,
        "mean_mappings_per_read": round(mean_cands, 2),
        # median of the timed passes is the headline; min/max expose the
        # shared-tunnel variance band (±15%, profiling/README.md)
        "map_s": round(dt_med, 3),
        "map_s_passes": [round(t, 3) for t in times],
        "map_s_min": round(min(times), 3),
        "map_s_max": round(max(times), 3),
        "reads_per_s_best": round(len(reads) / min(times), 2),
    })
    # headline out FIRST (the driver tail-parses the last JSON line; the
    # EM enrichment below re-emits)
    emit(round(reads_per_s, 2), detail)
    print("# em_bench (synthetic 1M lines)", flush=True)
    detail["em_iter_ms_1Mlines"] = round(em_bench(rng), 2)
    if shards_for_em is not None:
        print("# unify + em_bench_realdist (real mapping table)", flush=True)
        t0 = time.perf_counter()
        merged_lines, _ = unify_lines(params, [results], shards_for_em,
                                      len(reads))
        detail["unify_s"] = round(time.perf_counter() - t0, 2)
        if "--dump-mappings" in sys.argv:
            from metamaps_tpu.io.mappings import (
                write_meta,
                write_parameters_file,
                write_unmapped_lengths,
            )

            fn = sys.argv[sys.argv.index("--dump-mappings") + 1]
            with open(fn, "w") as f:
                f.write("\n".join(merged_lines) + "\n")
            mapped_ids = {ln.split(" ", 1)[0] for ln in merged_lines}
            write_meta(fn, len(reads), 0, len(mapped_ids),
                       len(reads) - len(mapped_ids))
            write_unmapped_lengths(fn, [
                (len(reads[r]), f"read{r}") for r in range(len(reads))
                if f"read{r}" not in mapped_ids
            ])
            params.reference_size = detail["db_bases"]
            write_parameters_file(fn, params)
            print(f"# mappings dumped: {len(merged_lines)} lines -> {fn}",
                  flush=True)
        em_real = em_bench_realdist(merged_lines, shards_for_em)
        if em_real:
            detail.update(em_real)
    emit(round(reads_per_s, 2), detail)


if __name__ == "__main__":
    main()
