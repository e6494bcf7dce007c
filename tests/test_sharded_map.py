"""Sharded (multi-device) mapping on a virtual CPU mesh."""
import numpy as np
import pytest

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.ops.batch_map import MapKernelConfig, DeviceShard, batch_sketch, batch_l1, batch_l2_slab
from metamaps_tpu.ops.winnow import winnow_np
from metamaps_tpu.parallel.mesh import make_mesh_2d, sharded_em_step, make_mesh
from metamaps_tpu.parallel.sharded_map import partition_contigs, sharded_map_step, stack_shards
from metamaps_tpu.params import Parameters
from metamaps_tpu.engine.mapper_jax import _minhits_table

from util_sim import random_genome, sample_reads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    genomes = [random_genome(rng, 15000) for _ in range(8)]
    params = Parameters(kmer_size=16, window_size=16, percentage_identity=80.0)
    full = SketchShard()
    parts = []
    for i, g in enumerate(genomes):
        h, p, s = winnow_np(g, 16, 16)
        parts.append((h, p, s, i))
        full.contig_names.append(f"C{i}|kraken:taxid|{i}|Z.1")
        full.contig_lengths.append(len(g))
    full.finalize(parts)
    return rng, genomes, params, full


def test_partition_preserves_minimizers(setup):
    rng, genomes, params, full = setup
    parts = partition_contigs(full, 4)
    assert sum(p.n_minimizers for p in parts) == full.n_minimizers
    assert sum(len(p.contig_names) for p in parts) == len(full.contig_names)
    for p in parts:
        assert p.seqid.min() == 0 if p.n_minimizers else True


def test_sharded_step_matches_per_partition(setup):
    import jax.numpy as jnp

    rng, genomes, params, full = setup
    parts = partition_contigs(full, 4)
    stacked = stack_shards(parts)
    mesh = make_mesh_2d(4, 2)

    cfg = MapKernelConfig.for_read_len(2048, 16, 16)
    reads_raw = sample_reads(rng, genomes, 6, min_len=1200, max_len=1900, sub=0.05)
    B = len(reads_raw)
    reads = np.full((B, 2048), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (seq, *_class) in enumerate(reads_raw):
        reads[i, : len(seq)] = seq
        lens[i] = len(seq)

    minhits = _minhits_table(cfg.sketch_max, 16, 80.0)
    g_seq, g_shared, g_pos = sharded_map_step(
        mesh, stacked, cfg, jnp.asarray(reads), jnp.asarray(lens),
        jnp.asarray(minhits),
    )
    g_seq, g_shared, g_pos = (np.asarray(x) for x in (g_seq, g_shared, g_pos))
    assert g_seq.shape == (4, B, cfg.cands_max)

    # reference: run the single-shard kernels per partition
    for d, part in enumerate(parts):
        dshard = DeviceShard.from_host(part)
        q_hash, q_strand, s_size, _ = batch_sketch(cfg, jnp.asarray(reads), jnp.asarray(lens))
        c_seq, c_start, c_end, n_c, ovf = batch_l1(
            cfg, dshard, q_hash, s_size, jnp.asarray(lens), jnp.asarray(minhits)
        )
        B_, C = c_seq.shape
        rd = np.repeat(np.arange(B_), C)
        sh, mp, ob, oe, ov2 = batch_l2_slab(
            cfg, dshard, q_hash[jnp.asarray(rd)], s_size[jnp.asarray(rd)],
            jnp.asarray(lens[rd]), c_seq.reshape(-1), c_start.reshape(-1),
            c_end.reshape(-1),
        )
        np.testing.assert_array_equal(g_seq[d], np.asarray(c_seq))
        np.testing.assert_array_equal(g_shared[d], np.asarray(sh).reshape(B_, C))
        np.testing.assert_array_equal(g_pos[d], np.asarray(mp).reshape(B_, C))

    # every read found somewhere in the merged candidates
    found = (g_seq >= 0).any(axis=(0, 2))
    assert found.all()


def test_sharded_em_psum(setup):
    rng, *_ = setup
    mesh = make_mesh(8)
    n_lines, n_reads, n_tax = 256, 64, 6
    read_of_line = np.repeat(np.arange(n_reads), n_lines // n_reads).astype(np.int32)
    tax = rng.integers(0, n_tax, n_lines).astype(np.int32)
    mapq = rng.random(n_lines).astype(np.float32)
    inv = np.full(n_lines, 1e-5, np.float32)
    f = np.full(n_tax, 1.0 / n_tax, np.float32)
    f_next, ll = sharded_em_step(mesh, read_of_line, tax, mapq, inv, f, n_reads)
    assert abs(f_next.sum() - 1.0) < 1e-4
    # must equal the single-host computation
    l = f[tax] * inv * mapq
    per_read = np.bincount(read_of_line, weights=l, minlength=n_reads)
    ll_ref = np.log(per_read).sum()
    p = l / per_read[read_of_line]
    f_ref = np.bincount(tax, weights=p, minlength=n_tax)
    f_ref /= f_ref.sum()
    np.testing.assert_allclose(f_next, f_ref, rtol=2e-5)
    assert abs(ll - ll_ref) < 1e-3
