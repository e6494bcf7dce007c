"""Speed-of-light accounting for the 1 Gbp bench (VERDICT r2 item 4).

Decomposes the headline per-read cost into pipeline stages measured at the
bench's production shapes, and puts each stage next to a derived floor:

- gather-bound stages (lookup, expansion): the chip issues random gather
  LANES at ~18 ns each regardless of table size (profiling/gather_size.py:
  flat 4 MB..128 MB); an aligned row of 2..32 values costs one lane
  (gather_microbench.py). Floor = (lanes issued) x 18 ns.
- compute-bound stages (winnow/sketch sort, L2 sweep): floor = HBM bytes
  moved / 800 GB/s (v5e ~819 GB/s) vs measured — these are far from
  memory-bound, so the print also shows work items/s to compare against
  VPU issue limits.

Run (chip, after bench.py cached the DB): python profiling/sol_large.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GATHER_NS_PER_LANE = 18.0  # gather_size.py finding, flat in table size
HBM_GBPS = 819.0  # v5e spec


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_db_large
    from metamaps_tpu.engine.mapper_jax import (
        JaxMapperEngine,
        _minhits_table,
    )
    from metamaps_tpu.ops.batch_map import (
        DeviceShard,
        MapKernelConfig,
        batch_l1_expand,
        batch_lookup,
        batch_sketch,
    )
    from metamaps_tpu.params import Parameters

    jax.device_get(jnp.zeros(4) + 1)  # measurement rule #1

    shard, tables, reads, info = build_db_large()
    on_accel = jax.default_backend() in ("tpu", "axon", "gpu")
    dev = DeviceShard.from_tables(tables, drop_cpu_planes=on_accel)
    jax.block_until_ready(dev.hash_sorted if dev.hash_sorted.size else
                          dev.wpos)
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    cfg = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    import dataclasses

    cfg = dataclasses.replace(cfg, hits_max=16384)
    B = 256
    S = cfg.sketch_max

    r = np.full((B, 8192), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        s = reads[i % len(reads)]
        r[i, : len(s)] = s
        lens[i] = len(s)
    reads_d, lens_d = jnp.asarray(r), jnp.asarray(lens)
    mh = jnp.asarray(_minhits_table(S, 16, 80.0))

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    rows = []

    def add(stage, meas_s, floor_s, note):
        rows.append((stage, meas_s / B * 1e6, floor_s / B * 1e6, note))

    # --- stage: sketch (winnow + compaction sorts; compute-bound) ----------
    t_sk, sk = timeit(lambda: batch_sketch(cfg, reads_d, lens_d))
    q_hash, q_strand, s_size, s_ovf = sk
    # floor: reads in + sketch out over HBM
    bytes_moved = B * 8192 + B * S * 5
    add("sketch", t_sk, bytes_moved / (HBM_GBPS * 1e9), "HBM floor (compute-bound stage)")

    # --- stage: lookup (2 gather lanes per sketch slot) --------------------
    t_lk, lk = timeit(lambda: batch_lookup(cfg, dev, q_hash))
    start_d, count_d, total_d, qkey_d = lk
    lanes = 2 * B * S
    add("lookup", t_lk, lanes * GATHER_NS_PER_LANE * 1e-9,
        f"{2 * S} gather lanes/read @ {GATHER_NS_PER_LANE:.0f} ns")

    # --- stage: L1 expansion (hit-pair row gathers + segment sort) ---------
    t_ex, ex = timeit(lambda: batch_l1_expand(
        cfg, dev, start_d, count_d, s_size, lens_d, mh))
    n_hits = float(np.asarray(count_d).sum()) / B  # real hit rows per read
    lanes_ex = B * cfg.hits_max  # padded issue width (compiled shape)
    add("expand", t_ex, lanes_ex * GATHER_NS_PER_LANE * 1e-9,
        f"{cfg.hits_max} pair-row lanes/read (real hits {n_hits:.0f})")

    # --- stage: full stage1 (fused dispatch; overlap check) ----------------
    from metamaps_tpu.ops.batch_map import map_batch_stage1a

    t_s1, _ = timeit(lambda: map_batch_stage1a(cfg, dev, reads_d, lens_d))
    add("stage1a fused", t_s1,
        (bytes_moved / (HBM_GBPS * 1e9)) + lanes * GATHER_NS_PER_LANE * 1e-9,
        "sketch+lookup in one dispatch")

    # --- stage: L2 (engine-routed slabs at real candidate mix) -------------
    engine = JaxMapperEngine(shard, params, read_len_buckets=(8192,),
                             device_shard=dev, hits_max=16384)
    sub = reads[:B]
    engine.map_reads(sub)  # compile + seed route plan
    t0 = time.perf_counter()
    res = engine.map_reads(sub)
    t_e2e = time.perf_counter() - t0
    n_cand = sum(len(x) for x in res)
    # measured L2 cost = e2e - stage1 fused - host tail; floor: the sweep's
    # occurrence-window slice traffic (5 x R x 4 B per candidate) over HBM
    r_bytes = 5 * cfg.range_max * 4
    t_l2 = max(0.0, t_e2e - t_s1)
    add("e2e minus stage1a", t_l2,
        n_cand / B * r_bytes / (HBM_GBPS * 1e9),
        f"L2+routing+host; {n_cand / B:.2f} cands/read, window slice "
        f"{r_bytes // 1024} KB/cand")

    total_meas = t_e2e / B * 1e6
    print(f"\nSOL table — 1 Gbp bench, B={B} reads/chunk "
          f"(e2e {total_meas:.0f} us/read, "
          f"{B / t_e2e:.0f} reads/s single-chunk)\n")
    print(f"{'stage':<20} {'us/read':>9} {'floor us':>9} {'x over':>7}  note")
    for stage, meas, floor, note in rows:
        ratio = meas / floor if floor > 0 else float("inf")
        print(f"{stage:<20} {meas:9.1f} {floor:9.2f} {ratio:7.1f}  {note}")
    print(
        "\nnotes: floors are lane-issue/HBM bounds, not roofline compute; "
        "tunnel variance +-15%; dispatch overhead ~2.5 ms/chain amortized "
        f"over B={B} reads = {2500 / B:.1f} us/read baseline."
    )


if __name__ == "__main__":
    main()
