"""Stage-level timing of the host-side index derivation (DeviceShard.
host_tables + SketchShard.finalize) on a scaled-down structured DB.

The 26.76 Gbp miniSeq+H-scale goal is gated by the HOST build cost, not
HBM: round-4's fresh-container 1 Gbp build measured
synth 17 s / winnow 141 s / finalize 73 s / tables 615 s — host_tables
dominates. This script breaks tables_s into its sub-stages at a smaller
scale (default 100 Mbp, ~12M minimizers; costs scale ~linearly in M) so
the hotspot is attributable without a 10-minute run.

Usage: python profiling/host_tables_profile.py [total_bases]
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.ops import batch_map as bm
from metamaps_tpu.ops.winnow import winnow_fast
from metamaps_tpu.sim.synth_db import synth_structured_db


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    rng = np.random.default_rng(20260822)
    t0 = time.perf_counter()
    genomes, names = synth_structured_db(rng, total_bases=total)
    t_synth = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max(2, os.cpu_count() or 2)) as ex:
        outs = list(ex.map(lambda g: winnow_fast(g, 16, 16), genomes))
    t_winnow = time.perf_counter() - t0

    shard = SketchShard()
    parts = []
    for i, (g, (h, p, s)) in enumerate(zip(genomes, outs)):
        parts.append((h, p, s, i))
        shard.contig_names.append(names[i])
        shard.contig_lengths.append(len(g))
    t0 = time.perf_counter()
    shard.finalize(parts)
    t_finalize = time.perf_counter() - t0
    M = shard.n_minimizers
    print(f"M = {M} minimizers  ({total/1e6:.0f} Mbp)")
    print(f"synth      {t_synth:8.1f} s")
    print(f"winnow     {t_winnow:8.1f} s")
    print(f"finalize   {t_finalize:8.1f} s")

    # --- host_tables sub-stages (mirrors DeviceShard.host_tables) ---
    hs_u32 = np.asarray(shard.hash_sorted, dtype=np.uint32)

    t0 = time.perf_counter()
    uniq, uniq_start, bucket_start, shift, steps, remix_e = (
        bm.build_uniq_tables(hs_u32)
    )
    t_uniq = time.perf_counter() - t0
    print(f"  uniq+dir {t_uniq:8.1f} s   (U={len(uniq)}, nb={32-shift}, "
          f"remix_e={remix_e})")

    t0 = time.perf_counter()
    mode, uniq2, uniq_start2, bucket_start2, kv32, dir_packed = (
        bm.finalize_lookup_tables(
            uniq, uniq_start, bucket_start, int(shard.freq_threshold))
    )
    t_fin = time.perf_counter() - t0
    print(f"  blocktab {t_fin:8.1f} s   (mode={mode})")

    t0 = time.perf_counter()
    pair = np.stack(
        [np.asarray(shard.seqid_byhash, np.int32),
         np.asarray(shard.wpos_byhash, np.int32)], axis=1)
    t_pair = time.perf_counter() - t0

    t0 = time.perf_counter()
    chains16, max_step = bm.build_chain_deltas(
        np.asarray(shard.wpos), np.asarray(shard.hash_pos_order),
        np.asarray(shard.contig_offsets))
    t_chain = time.perf_counter() - t0
    print(f"  pair     {t_pair:8.1f} s")
    print(f"  chains   {t_chain:8.1f} s   (max_step={max_step})")

    t0 = time.perf_counter()
    # mirrors host_tables' permutation path (O(M) run-first scatter)
    order = shard.hash_order
    new_run = np.empty(hs_u32.size, np.bool_)
    new_run[0] = True
    np.not_equal(hs_u32[1:], hs_u32[:-1], out=new_run[1:])
    run_first = np.maximum.accumulate(
        np.where(new_run, np.arange(hs_u32.size, dtype=np.int32), 0))
    hrow = np.empty(hs_u32.size, np.int32)
    hrow[order] = run_first
    t_hrow = time.perf_counter() - t0
    t0 = time.perf_counter()
    hs32 = bm.pack_hrow_strand(hrow, np.asarray(shard.strand))
    t_pack = time.perf_counter() - t0
    print(f"  hrow     {t_hrow:8.1f} s")
    print(f"  pack     {t_pack:8.1f} s")
    tot = t_uniq + t_fin + t_pair + t_chain + t_hrow + t_pack
    print(f"host_tables total {tot:8.1f} s "
          f"({tot / M * 1e9:.1f} ns/minimizer)")


if __name__ == "__main__":
    main()
