"""Lookup-mode parity: block8 / block16 / bisect must agree exactly.

block16 serves realistic-scale indices (~10^8 unique hashes) whose widest
radix directory under the memory cap still has buckets of 9..16 uniques;
the tiny-DB tests never exercise it, so this one crafts hash sets that
force each mode and pins (start, count, total, qkey) across modes and
against a host oracle.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.ops.batch_map import (
    DeviceShard,
    LOOKUP_KMAX,
    MapKernelConfig,
    batch_lookup,
    build_uniq_tables,
)


def _shard_from_hashes(hashes: np.ndarray) -> SketchShard:
    sh = SketchShard()
    n = len(hashes)
    sh.contig_names = ["c0"]
    sh.contig_lengths = [16 * n + 100]
    parts = [(
        hashes.astype(np.uint32),
        np.arange(n, dtype=np.int32),
        np.ones(n, np.int8),
        0,
    )]
    sh.finalize(parts)
    return sh


def _force_mode(ds: DeviceShard, shard: SketchShard, mode: str) -> DeviceShard:
    uniq, uniq_start, bucket_start, shift, steps, remix_e = build_uniq_tables(
        np.asarray(shard.hash_sorted, np.uint32)
    )
    return dataclasses.replace(
        ds,
        lookup_mode=mode,
        uniq_hash=jnp.asarray(uniq),
        uniq_start=jnp.asarray(uniq_start),
        bucket_start=jnp.asarray(bucket_start),
        bucket_shift=shift,
        bisect_steps=steps,
        remix_e=remix_e,
    )


def _oracle_lookup(shard: SketchShard, q: np.ndarray, thr: int):
    hs = np.asarray(shard.hash_sorted, np.uint32)
    start = np.searchsorted(hs, q, side="left")
    end = np.searchsorted(hs, q, side="right")
    count = (end - start).astype(np.int32)
    found = count > 0
    count = np.where(found & (count < thr), count, 0)
    qkey = np.where(
        q != np.uint32(0xFFFFFFFF),
        2 * start.astype(np.int64) + found,
        np.int64(2**31 - 1),
    )
    return np.where(found, start, 0).astype(np.int32), count, qkey


@pytest.mark.parametrize("cluster", [0, 12, 16])
def test_lookup_modes_agree(cluster):
    rng = np.random.default_rng(cluster + 1)
    base = rng.integers(0, 2**32, 4000, dtype=np.uint64).astype(np.uint32)
    # a cluster of uniques differing only in the low 6 bits forces buckets
    # > 8 at ANY directory width <= 26 bits -> block16 (or bisect if > 16)
    clus = (np.uint32(0xABCD1234) & np.uint32(0xFFFFFFC0)) + np.arange(
        cluster, dtype=np.uint32
    )
    hashes = np.concatenate([base, clus, clus[: cluster // 2]])  # some dups
    shard = _shard_from_hashes(hashes)
    ds = DeviceShard.from_host(shard)
    # block16-regime shards upload in the wide-row block16w layout
    # (DeviceShard.from_tables converts — see build_block16w_tables)
    expect = "block8" if cluster <= 8 else (
        "block16w" if cluster <= 16 else "bisect"
    )
    assert ds.lookup_mode == expect

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    # queries: mix of present hashes (incl. the cluster), absent ones, pads
    qs = np.full((3, S), np.uint32(0xFFFFFFFF))
    qs[0, :cluster] = clus[:cluster]
    qs[0, cluster : cluster + 64] = rng.choice(base, 64)
    qs[1, :128] = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    qs[2, :32] = np.sort(rng.choice(hashes, 32))

    outs = {}
    for mode in ("bisect", ds.lookup_mode):
        d = _force_mode(ds, shard, mode)
        start, count, total, qkey = batch_lookup(cfg, d, jnp.asarray(qs))
        outs[mode] = tuple(np.asarray(x) for x in (start, count, total, qkey))

    # the live contract: count/total everywhere, start wherever count > 0
    # (slots with count 0 are never expanded), qkey for real query slots
    # (padded slots are masked to I32_MAX by valid_q in all modes)
    b_start, b_count, b_total, b_qkey = outs["bisect"]
    g_start, g_count, g_total, g_qkey = outs[ds.lookup_mode]
    np.testing.assert_array_equal(b_count, g_count)
    np.testing.assert_array_equal(b_total, g_total)
    live = b_count > 0
    np.testing.assert_array_equal(b_start[live], g_start[live])
    realq = qs != np.uint32(0xFFFFFFFF)
    np.testing.assert_array_equal(b_qkey[realq], g_qkey[realq])

    o_start, o_count, o_qkey = _oracle_lookup(
        shard, qs.reshape(-1), shard.freq_threshold
    )
    valid = o_count.reshape(3, S) > 0
    np.testing.assert_array_equal(g_count, o_count.reshape(3, S))
    np.testing.assert_array_equal(
        g_start[valid], o_start.reshape(3, S)[valid]
    )
    np.testing.assert_array_equal(
        g_qkey[realq], o_qkey.reshape(3, S)[realq]
    )


def test_remix_keys_host_device_identical():
    """remix_keys_np and remix_keys_jax must agree bit-for-bit (the bucket
    of a query is computed on device, of an index entry on host)."""
    from metamaps_tpu.ops.batch_map import remix_keys_jax, remix_keys_np

    rng = np.random.default_rng(5)
    h = np.concatenate([
        rng.integers(0, 2**32, 5000, dtype=np.uint64).astype(np.uint32),
        np.array([0, 1, 2, 0xFFFFFFFF, 0xFFFFFFFE, 0x80000000], np.uint32),
    ])
    for e in (2, 3, 4, 8, 12, 16, 24, 32):
        kh = remix_keys_np(h, e)
        kd = np.asarray(remix_keys_jax(jnp.asarray(h), e))
        np.testing.assert_array_equal(kh, kd)
        # monotone: sorted input -> sorted keys (bucket contiguity)
        hs = np.sort(h)
        ks = remix_keys_np(hs, e)
        assert np.all(np.diff(ks.astype(np.int64)) >= 0)
    # e <= 1 is the identity
    np.testing.assert_array_equal(remix_keys_np(h, 0), h)
    np.testing.assert_array_equal(remix_keys_np(h, 1), h)


def test_remix_equalizes_minimizer_skew():
    """Minimizer hashes are min-of-w order statistics; at a pinned directory
    width the raw top-bit buckets run ~w deep while the remixed buckets stay
    near-Poisson — and the remixed block lookup agrees with bisect and a
    host oracle."""
    from metamaps_tpu.ops.batch_map import build_block_tables

    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**32, (200_000, 16), dtype=np.uint64).min(
        axis=1
    ).astype(np.uint32)
    shard = _shard_from_hashes(h)
    hs = np.asarray(shard.hash_sorted, np.uint32)

    u0, us0, bs0, _, _, e0 = build_uniq_tables(hs, nb_bits=16, remix_e=0)
    mb0 = int(np.max(np.diff(bs0)))
    u1, us1, bs1, sh1, st1, e1 = build_uniq_tables(hs, nb_bits=16)
    mb1 = int(np.max(np.diff(bs1)))
    assert e1 > 1, "equalizer not selected on min-of-w input"
    assert mb1 * 3 < mb0, (mb1, mb0)
    assert mb1 <= 16, mb1  # block16-eligible at this width

    ds = DeviceShard.from_host(shard)
    kv32, dirp = build_block_tables(u1, us1, bs1)
    ds16 = dataclasses.replace(
        ds, lookup_mode="block16", uniq_hash=jnp.asarray(u1),
        uniq_start=jnp.asarray(us1), bucket_start=jnp.asarray(bs1),
        kv32=jnp.asarray(kv32), dir_packed=jnp.asarray(dirp),
        bucket_shift=sh1, bisect_steps=st1, remix_e=e1,
    )
    dsb = dataclasses.replace(ds16, lookup_mode="bisect")

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    qs = np.full((2, S), np.uint32(0xFFFFFFFF))
    qs[0, :256] = rng.choice(h, 256)
    qs[1, :256] = rng.integers(0, 2**32, 256, dtype=np.uint64).astype(
        np.uint32
    )
    outs = {}
    for name, d in (("block16", ds16), ("bisect", dsb)):
        start, count, total, qkey = batch_lookup(cfg, d, jnp.asarray(qs))
        outs[name] = tuple(np.asarray(x) for x in (start, count, total, qkey))
    b_start, b_count, b_total, b_qkey = outs["bisect"]
    g_start, g_count, g_total, g_qkey = outs["block16"]
    np.testing.assert_array_equal(b_count, g_count)
    np.testing.assert_array_equal(b_total, g_total)
    live = b_count > 0
    np.testing.assert_array_equal(b_start[live], g_start[live])
    realq = qs != np.uint32(0xFFFFFFFF)
    np.testing.assert_array_equal(b_qkey[realq], g_qkey[realq])

    o_start, o_count, o_qkey = _oracle_lookup(
        shard, qs.reshape(-1), shard.freq_threshold
    )
    valid = o_count.reshape(2, S) > 0
    np.testing.assert_array_equal(g_count, o_count.reshape(2, S))
    np.testing.assert_array_equal(g_start[valid], o_start.reshape(2, S)[valid])
    np.testing.assert_array_equal(g_qkey[realq], o_qkey.reshape(2, S)[realq])


def _force_block9p(shard, nb_lo=14, thr=None):
    """Build a block9p DeviceShard at the narrowest pinned directory width
    whose remixed max bucket is <= 9, plus its bisect twin."""
    from metamaps_tpu.ops.batch_map import build_block9p_tables

    hs = np.asarray(shard.hash_sorted, np.uint32)
    for nb in range(nb_lo, 24):
        u1, us1, bs1, sh1, st1, e1 = build_uniq_tables(hs, nb_bits=nb)
        if int(np.max(np.diff(bs1))) <= 9:
            break
    else:
        raise AssertionError("no width reached max bucket <= 9")
    kv32, dirp = build_block9p_tables(u1, us1, bs1)
    ds = DeviceShard.from_host(shard)
    ds9 = dataclasses.replace(
        ds, lookup_mode="block9p", uniq_hash=jnp.asarray(u1),
        uniq_start=jnp.asarray(us1), bucket_start=jnp.asarray(bs1),
        kv32=jnp.asarray(kv32), dir_packed=jnp.asarray(dirp),
        bucket_shift=sh1, bisect_steps=st1, remix_e=e1,
        freq_threshold=thr if thr is not None else ds.freq_threshold,
    )
    return ds9, dataclasses.replace(ds9, lookup_mode="bisect")


def test_block9p_parity():
    """The single-row packed mode must agree exactly with bisect and the
    host oracle when no count saturates (counts < 32)."""
    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**32, (150_000, 16), dtype=np.uint64).min(
        axis=1
    ).astype(np.uint32)
    shard = _shard_from_hashes(h)
    ds9, dsb = _force_block9p(shard)

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    rngq = np.random.default_rng(12)
    qs = np.full((2, S), np.uint32(0xFFFFFFFF))
    qs[0, :256] = rngq.choice(h, 256)
    qs[1, :256] = rngq.integers(0, 2**32, 256, dtype=np.uint64).astype(
        np.uint32
    )
    outs = {}
    for name, d in (("block9p", ds9), ("bisect", dsb)):
        start, count, total, qkey = batch_lookup(cfg, d, jnp.asarray(qs))
        outs[name] = tuple(np.asarray(x) for x in (start, count, total, qkey))
    b_start, b_count, b_total, b_qkey = outs["bisect"]
    g_start, g_count, g_total, g_qkey = outs["block9p"]
    np.testing.assert_array_equal(b_count, g_count)
    np.testing.assert_array_equal(b_total, g_total)
    live = b_count > 0
    np.testing.assert_array_equal(b_start[live], g_start[live])
    realq = qs != np.uint32(0xFFFFFFFF)
    np.testing.assert_array_equal(b_qkey[realq], g_qkey[realq])

    o_start, o_count, o_qkey = _oracle_lookup(
        shard, qs.reshape(-1), shard.freq_threshold
    )
    valid = o_count.reshape(2, S) > 0
    np.testing.assert_array_equal(g_count, o_count.reshape(2, S))
    np.testing.assert_array_equal(g_start[valid], o_start.reshape(2, S)[valid])
    np.testing.assert_array_equal(g_qkey[realq], o_qkey.reshape(2, S)[realq])


def test_block9p_saturated_count_rank_semantics():
    """With an entry whose count saturates the 5-bit field (>= 32), the
    stored rank past it is inexact by design — but must still order
    identically against every entry's first row in the qkey compare
    (qkey < 2r+1 / == 2r+1), and the saturated entry itself must be culled
    by the frequency threshold in both modes."""
    rng = np.random.default_rng(13)
    base = rng.integers(0, 0xE0000000, 3000, dtype=np.uint64).astype(np.uint32)
    V = np.uint32(0xFFF00000)  # isolated top bucket, repeated 40x
    h = np.concatenate([base, np.full(40, V, np.uint32)])
    shard = _shard_from_hashes(h)
    ds9, dsb = _force_block9p(shard, thr=20)

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    qs = np.full((1, S), np.uint32(0xFFFFFFFF))
    probes = np.array(
        [V, V + 1, V - 1, V + 12345, np.uint32(0xFFFFFFF0)], np.uint32
    )
    qs[0, : len(probes)] = probes
    out9 = [np.asarray(x) for x in batch_lookup(cfg, ds9, jnp.asarray(qs))]
    outb = [np.asarray(x) for x in batch_lookup(cfg, dsb, jnp.asarray(qs))]
    # count of the saturated entry is culled in both modes
    np.testing.assert_array_equal(out9[1], outb[1])
    assert out9[1][0, 0] == 0  # V: count 40 >= thr 20 -> culled
    # qkey ordering vs every entry's first row agrees with exact bisect
    hs = np.asarray(shard.hash_sorted, np.uint32)
    first_rows = np.unique(np.searchsorted(hs, np.unique(hs)))
    q9 = out9[3][0, : len(probes)].astype(np.int64)
    qb = outb[3][0, : len(probes)].astype(np.int64)
    for r in first_rows:
        np.testing.assert_array_equal(q9 < 2 * r + 1, qb < 2 * r + 1)
        np.testing.assert_array_equal(q9 == 2 * r + 1, qb == 2 * r + 1)
    # found entries keep exact qkeys
    assert q9[0] == qb[0] and q9[0] % 2 == 1


def test_block16_full_l1_pipeline():
    """A mini end-to-end check: mapping results must not change when the
    index is forced into block16 (the L1 candidates feed from the same
    (start, count) contract)."""
    from metamaps_tpu.engine.mapper_oracle import map_read
    from metamaps_tpu.params import Parameters
    from metamaps_tpu.ops.batch_map import batch_l1, batch_sketch
    from metamaps_tpu.engine.mapper_jax import _minhits_table

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = rng.choice(bases, size=60000)
    from metamaps_tpu.ops.winnow import winnow_np

    sh = SketchShard()
    h, p, s = winnow_np(g, 16, 16)
    sh.contig_names = ["c0|kraken:taxid|7|x"]
    sh.contig_lengths = [len(g)]
    sh.finalize([(h, p, s, 0)])
    ds8 = DeviceShard.from_host(sh)
    assert ds8.lookup_mode == "block8"
    ds16 = dataclasses.replace(ds8, lookup_mode="block16")

    cfg = MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")
    reads = np.full((4, 4096), ord("A"), np.uint8)
    lens = np.zeros(4, np.int32)
    for i in range(4):
        L = int(rng.integers(2500, 4000))
        pos = int(rng.integers(0, len(g) - L))
        r = g[pos : pos + L].copy()
        idx = rng.integers(0, L, int(0.08 * L))
        r[idx] = bases[rng.integers(0, 4, len(idx))]
        reads[i, :L] = r
        lens[i] = L
    mh = jnp.asarray(_minhits_table(cfg.sketch_max, 16, 80.0))
    qh, qst, ss, _ = batch_sketch(cfg, jnp.asarray(reads), jnp.asarray(lens))
    outs = []
    for d in (ds8, ds16):
        outs.append([
            np.asarray(x)
            for x in batch_l1(cfg, d, qh, ss, jnp.asarray(lens), mh)
        ])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_block9w_parity_and_rewindow():
    """The wide-row mode (stride-24/width-32 rows, 10.7 B/unique) must be
    query-for-query identical to block9p and bisect, and the upload-time
    rewindow of cached block9p rows (block9p_rows_to_9w) must reproduce the
    directly-built block9w table on every row that covers real entries."""
    from metamaps_tpu.ops.batch_map import (
        BLOCK9W_STRIDE, block9p_rows_to_9w, build_block9w_tables,
    )

    rng = np.random.default_rng(21)
    h = rng.integers(0, 2**32, (120_000, 16), dtype=np.uint64).min(
        axis=1
    ).astype(np.uint32)
    shard = _shard_from_hashes(h)
    ds9, dsb = _force_block9p(shard)

    hs = np.asarray(shard.hash_sorted, np.uint32)
    for nb in range(14, 24):
        u1, us1, bs1, sh1, st1, e1 = build_uniq_tables(hs, nb_bits=nb)
        if int(np.max(np.diff(bs1))) <= 9:
            break
    kv64, dirw = build_block9w_tables(u1, us1, bs1)
    kv64_rw = block9p_rows_to_9w(np.asarray(ds9.kv32))
    rows_needed = (len(u1) - 1) // BLOCK9W_STRIDE + 1
    np.testing.assert_array_equal(kv64[:rows_needed], kv64_rw[:rows_needed])
    ds9w = dataclasses.replace(
        ds9, lookup_mode="block9w", kv32=jnp.asarray(kv64),
        dir_packed=jnp.asarray(dirw),
    )

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    rngq = np.random.default_rng(22)
    qs = np.full((2, S), np.uint32(0xFFFFFFFF))
    qs[0, :256] = rngq.choice(h, 256)
    qs[1, :256] = rngq.integers(0, 2**32, 256, dtype=np.uint64).astype(
        np.uint32
    )
    out9 = [np.asarray(x) for x in batch_lookup(cfg, ds9, jnp.asarray(qs))]
    outw = [np.asarray(x) for x in batch_lookup(cfg, ds9w, jnp.asarray(qs))]
    outb = [np.asarray(x) for x in batch_lookup(cfg, dsb, jnp.asarray(qs))]
    for k in range(4):
        np.testing.assert_array_equal(out9[k], outw[k])
    np.testing.assert_array_equal(outb[1], outw[1])
    live = outb[1] > 0
    np.testing.assert_array_equal(outb[0][live], outw[0][live])
    realq = qs != np.uint32(0xFFFFFFFF)
    np.testing.assert_array_equal(outb[3][realq], outw[3][realq])


def test_gpos_pack_and_expand_identity():
    """pack_gpos round-trips (seqid, wpos), falls back when the bit budget
    doesn't fit, and batch_l1_expand over a gpos shard returns candidates
    identical to the pair_byhash path."""
    import dataclasses as _dc

    from metamaps_tpu.engine.mapper_jax import _minhits_table
    from metamaps_tpu.ops.batch_map import (
        batch_l1_expand, batch_lookup, batch_sketch, pack_gpos,
    )
    from metamaps_tpu.ops.winnow import winnow_np

    pair = np.stack(
        [np.repeat(np.arange(50, dtype=np.int32), 100),
         np.tile(np.arange(100, dtype=np.int32) * 977, 50)], axis=1
    )
    gp, wb = pack_gpos(pair, 50)
    assert wb > 0
    np.testing.assert_array_equal((gp >> wb).astype(np.int32), pair[:, 0])
    np.testing.assert_array_equal(
        (gp & ((1 << wb) - 1)).astype(np.int32), pair[:, 1]
    )
    # 70k contigs with 2^26 positions cannot fit 32 bits
    big = np.stack([np.array([69999], np.int32),
                    np.array([1 << 26], np.int32)], axis=1)
    assert pack_gpos(big, 70000)[1] == 0

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    sh = SketchShard()
    parts = []
    genomes = []
    for i in range(3):
        g = rng.choice(bases, size=50_000)
        genomes.append(g)
        hh, pp, ss = winnow_np(g, 16, 16)
        parts.append((hh, pp, ss, i))
        sh.contig_names.append(f"c{i}|kraken:taxid|{i+1}|x")
        sh.contig_lengths.append(len(g))
    sh.finalize(parts)
    ds = DeviceShard.from_host(sh)
    assert ds.gpos_bits > 0 and ds.pair_byhash.shape[0] == 0
    pair_plane = np.stack(
        [np.asarray(sh.seqid_byhash, np.int32),
         np.asarray(sh.wpos_byhash, np.int32)], axis=1
    )
    ds_pair = _dc.replace(
        ds, gpos=None, gpos_bits=0, pair_byhash=jnp.asarray(pair_plane)
    )

    cfg = MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")
    B = 4
    reads = np.full((B, 4096), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        L = int(rng.integers(2500, 4000))
        g = genomes[i % 3]
        pos = int(rng.integers(0, len(g) - L))
        r = g[pos : pos + L].copy()
        idx = rng.integers(0, L, int(0.08 * L))
        r[idx] = bases[rng.integers(0, 4, len(idx))]
        reads[i, :L] = r
        lens[i] = L
    qh, qs_, s_size, s_ovf = batch_sketch(
        cfg, jnp.asarray(reads), jnp.asarray(lens)
    )
    start, count, total, qkey = batch_lookup(cfg, ds, qh)
    mh = jnp.asarray(_minhits_table(cfg.sketch_max, 16, 80.0))
    out_g = batch_l1_expand(cfg, ds, start, count, s_size,
                            jnp.asarray(lens), mh)
    out_p = batch_l1_expand(cfg, ds_pair, start, count, s_size,
                            jnp.asarray(lens), mh)
    for a, b in zip(out_g, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(out_g[3]).sum()) > 0  # real candidates found


def test_block16w_parity_and_rewindow():
    """The wide block16 rows (one [128] row gather, 10.7 B/unique) must be
    query-for-query identical to block16 and bisect, and the upload-time
    conversion of cached block16 rows must reproduce the directly-built
    table on every row that covers real entries."""
    from metamaps_tpu.ops.batch_map import (
        BLOCK16W_STRIDE, block16_rows_to_16w, build_block16w_tables,
        build_block_tables,
    )

    rng = np.random.default_rng(31)
    base = rng.integers(0, 2**32, 60_000, dtype=np.uint64).astype(np.uint32)
    # clusters deep enough to force buckets of 9..16 at any width
    cl1 = (np.uint32(0x13570000) & np.uint32(0xFFFFFFC0)) + np.arange(
        13, dtype=np.uint32
    )
    cl2 = (np.uint32(0xEE440000) & np.uint32(0xFFFFFFC0)) + np.arange(
        16, dtype=np.uint32
    )
    h = np.concatenate([base, cl1, cl1[:6], cl2])
    shard = _shard_from_hashes(h)
    hs = np.asarray(shard.hash_sorted, np.uint32)
    for nb in range(12, 26):
        u1, us1, bs1, sh1, st1, e1 = build_uniq_tables(hs, nb_bits=nb)
        mb = int(np.max(np.diff(bs1)))
        if 9 <= mb <= 16:
            break
    assert 9 <= mb <= 16
    kv32, dirp = build_block_tables(u1, us1, bs1)
    kv128, dirw = build_block16w_tables(u1, us1, bs1)
    np.testing.assert_array_equal(dirp, dirw)
    kv128_rw = block16_rows_to_16w(kv32)
    rows_needed = (len(u1) - 1) // BLOCK16W_STRIDE + 1
    np.testing.assert_array_equal(kv128[:rows_needed], kv128_rw[:rows_needed])

    ds = DeviceShard.from_host(shard)
    mk = lambda mode, kv, dp: dataclasses.replace(
        ds, lookup_mode=mode, uniq_hash=jnp.asarray(u1),
        uniq_start=jnp.asarray(us1), bucket_start=jnp.asarray(bs1),
        kv32=jnp.asarray(kv), dir_packed=jnp.asarray(dp),
        bucket_shift=sh1, bisect_steps=st1, remix_e=e1,
    )
    ds16 = mk("block16", kv32, dirp)
    dsw = mk("block16w", kv128, dirw)
    dsb = dataclasses.replace(ds16, lookup_mode="bisect")

    cfg = MapKernelConfig.for_read_len(2048, 16, 16, l2_impl="scatter")
    S = cfg.sketch_max
    rngq = np.random.default_rng(32)
    qs = np.full((3, S), np.uint32(0xFFFFFFFF))
    qs[0, :64] = np.concatenate([cl1, cl2, rngq.choice(base, 35)])
    qs[1, :256] = rngq.integers(0, 2**32, 256, dtype=np.uint64).astype(
        np.uint32
    )
    qs[2, :128] = rngq.choice(h, 128)
    out16 = [np.asarray(x) for x in batch_lookup(cfg, ds16, jnp.asarray(qs))]
    outw = [np.asarray(x) for x in batch_lookup(cfg, dsw, jnp.asarray(qs))]
    outb = [np.asarray(x) for x in batch_lookup(cfg, dsb, jnp.asarray(qs))]
    # the live contract (as in test_lookup_modes_agree): count/total
    # everywhere, start wherever count > 0, qkey for real query slots —
    # padded q = U32_MAX slots return masked garbage starts in every mode
    live = outb[1] > 0
    realq = qs != np.uint32(0xFFFFFFFF)
    for other in (out16, outb):
        np.testing.assert_array_equal(other[1], outw[1])
        np.testing.assert_array_equal(other[2], outw[2])
        np.testing.assert_array_equal(other[0][live], outw[0][live])
        np.testing.assert_array_equal(other[3][realq], outw[3][realq])
