"""The v5 disk-cache diet must be lossless: savez(_diet_tables(t)) ->
_rehydrate_tables must reproduce every plane of the full in-memory table
dict bit-exactly (hash_sorted re-sorted from hash_pos, strand_pos decoded
from hs32's packed bit, pair_byhash unpacked from gpos), and the padded
multishard path must keep the packed gpos plane alive instead of silently
falling back to pair_byhash."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def built():
    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.ops.batch_map import DeviceShard
    from metamaps_tpu.ops.winnow import winnow_fast

    rng = np.random.default_rng(271828)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    sh = SketchShard()
    parts = []
    genomes = []
    for ci in range(3):
        g = rng.choice(bases, size=40000 + 5000 * ci)
        genomes.append(g)
        h, p, s = winnow_fast(g, 16, 16)
        parts.append((h, p, s, ci))
        sh.contig_names.append(f"c{ci}|kraken:taxid|{100 + ci}|X")
        sh.contig_lengths.append(len(g))
    sh.finalize(parts)
    return sh, DeviceShard.host_tables(sh), genomes


@pytest.fixture(scope="module")
def tables(built):
    return built[1]


def test_diet_roundtrip_bitexact(tables, tmp_path):
    from bench import _diet_tables, _rehydrate_tables

    diet = _diet_tables(tables)
    assert "hash_sorted" not in diet and "strand_pos" not in diet
    assert "gpos" in diet and "pair_byhash" not in diet

    fn = os.path.join(tmp_path, "t.npz")
    np.savez(fn, **diet)
    z = np.load(fn)
    back = _rehydrate_tables({k: z[k] for k in z.files})

    for k, v in tables.items():
        if k == "hash_sorted":
            continue  # lazy: not materialized at load
        got = back[k]
        assert np.asarray(got).dtype == np.asarray(v).dtype, k
        assert np.array_equal(np.asarray(got), np.asarray(v)), k
    assert "hash_sorted" not in back
    # the lazy reconstruction (values-only sort) is exact
    assert np.array_equal(
        np.sort(np.asarray(back["hash_pos"], np.uint32)),
        tables["hash_sorted"],
    )


def test_diet_device_shard_identical(tables, tmp_path):
    """from_tables over the rehydrated dict (with its pre-packed gpos)
    must equal from_tables over the original host tables, plane for
    plane."""
    import jax

    from bench import _diet_tables, _rehydrate_tables
    from metamaps_tpu.ops.batch_map import DeviceShard

    fn = os.path.join(tmp_path, "t.npz")
    np.savez(fn, **_diet_tables(tables))
    z = np.load(fn)
    back = _rehydrate_tables({k: z[k] for k in z.files})

    a = DeviceShard.from_tables(dict(tables))
    b = DeviceShard.from_tables(back)
    assert a.lookup_mode == b.lookup_mode
    assert a.gpos_bits == b.gpos_bits
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_padded_tables_keep_gpos(tables):
    from bench import _pad_tables_to, _table_stats, _tables_common_spec
    from metamaps_tpu.ops.batch_map import DeviceShard, pack_gpos

    t = dict(tables)
    gp, wb = pack_gpos(
        np.asarray(t["pair_byhash"]), int(t["contig_offsets"].shape[0]) - 1
    )
    assert wb
    t["gpos"], t["gpos_wb"] = gp, np.int64(wb)
    spec = _tables_common_spec([_table_stats(t)])
    assert spec["gpos_wb"] == wb
    spec = dict(spec)
    spec["m_max"] += 512  # force real padding
    p = _pad_tables_to(t, spec)
    assert p["gpos"].shape[0] == spec["m_max"]
    assert np.all(p["gpos"][-512:] == np.uint32(0xFFFFFFFF))
    d = DeviceShard.from_tables(p)
    assert d.gpos_bits == wb and d.gpos is not None
    # real rows unchanged, sentinel rows above every real packed position
    assert np.array_equal(np.asarray(d.gpos)[: len(gp)], gp)
    assert gp.max() < np.uint32(0xFFFFFFFF)


def test_lazy_shard_serves_oracle(built):
    """_shard_from_tables leaves the hash-order views unmaterialized;
    the serial oracle must transparently derive them on first use and
    produce exactly the mappings of the fully-finalized shard."""
    from bench import _diet_tables, _rehydrate_tables, _shard_from_tables
    from metamaps_tpu.engine.mapper_oracle import map_read, report_filter
    from metamaps_tpu.params import Parameters

    sh_full, tables, genomes = built
    back = _rehydrate_tables(_diet_tables(tables))
    sh = _shard_from_tables(back, sh_full.contig_names,
                            sh_full.contig_lengths)
    assert sh.hash_sorted is None and sh.strand_byhash is None
    assert sh.n_minimizers == sh_full.n_minimizers

    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(4):
        g = genomes[i % 3]
        r = g[1000 + 3000 * i : 1000 + 3000 * i + 2600].copy()
        idx = rng.integers(0, len(r), 50)
        r[idx] = bases[rng.integers(0, 4, 50)]
        got = report_filter(map_read(sh, params, r), True)
        want = report_filter(map_read(sh_full, params, r), True)
        assert repr(got) == repr(want)
        assert want, "fixture read must map"
    # first use materialized the views, bit-equal to finalize()'s
    assert np.array_equal(sh.hash_sorted, sh_full.hash_sorted)
    assert np.array_equal(sh.strand_byhash, sh_full.strand_byhash)
