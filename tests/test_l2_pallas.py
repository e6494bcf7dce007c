"""Pallas L2 event-sweep kernel vs the scatter reference path (and thereby
the serial oracle, which the scatter path is pinned to elsewhere)."""
import dataclasses

import numpy as np
import pytest

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.engine.mapper_jax import _minhits_table
from metamaps_tpu.ops.batch_map import (
    DeviceShard,
    MapKernelConfig,
    batch_l1,
    batch_l2_slab,
    batch_sketch,
)
from metamaps_tpu.ops.winnow import winnow_np

from util_sim import random_genome, revcomp, sample_reads


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    rng = np.random.default_rng(2024)
    genomes = [random_genome(rng, 25000) for _ in range(3)]
    shard = SketchShard()
    parts = []
    for i, g in enumerate(genomes):
        h, p, s = winnow_np(g, 16, 16)
        parts.append((h, p, s, i))
        shard.contig_names.append(f"C{i}")
        shard.contig_lengths.append(len(g))
    shard.finalize(parts)
    return rng, genomes, DeviceShard.from_host(shard)


def _run_both(rng, genomes, ds, seqs):
    import jax.numpy as jnp

    cfg_sc = MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")
    cfg_pl = dataclasses.replace(cfg_sc, l2_impl="pallas", l2_interpret=True)
    B = len(seqs)
    reads = np.full((B, 4096), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, sq in enumerate(seqs):
        reads[i, : len(sq)] = sq
        lens[i] = len(sq)
    mh = jnp.asarray(_minhits_table(cfg_sc.sketch_max, 16, 80.0))
    qh, qs, ss, _ = batch_sketch(cfg_sc, jnp.asarray(reads), jnp.asarray(lens))
    cs, cst, cen, nc, ovf = batch_l1(cfg_sc, ds, qh, ss, jnp.asarray(lens), mh)
    rd = np.repeat(np.arange(B), cfg_sc.cands_max)
    args = (qh[jnp.asarray(rd)], ss[jnp.asarray(rd)], jnp.asarray(lens[rd]),
            cs.reshape(-1), cst.reshape(-1), cen.reshape(-1))
    return batch_l2_slab(cfg_sc, ds, *args), batch_l2_slab(cfg_pl, ds, *args)


def test_pallas_matches_scatter_noisy(setup):
    rng, genomes, ds = setup
    seqs = [r[0] for r in sample_reads(rng, genomes, 6, min_len=2500,
                                       max_len=3800, sub=0.08)]
    o_sc, o_pl = _run_both(rng, genomes, ds, seqs)
    for a, b in zip(o_sc, o_pl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_fused_votes_match(setup):
    """batch_l2_gather's pallas path computes strand votes fused into the
    candidate-window slice (row-space compares); it must equal the scatter
    path's merge-sort votes (_make_strand_votes) on every output, including
    reads with revcomp segments and tandem repeats (duplicate window
    hashes — the last-occurrence-strand rule)."""
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import batch_l2_gather, batch_lookup

    rng, genomes, ds = setup
    g = genomes[1]
    seqs = [r[0] for r in sample_reads(rng, genomes, 5, min_len=2500,
                                       max_len=3800, sub=0.08)]
    seqs += [
        revcomp(g[4000:7200]),
        np.tile(g[9000:9360], 9),
        np.concatenate([g[1000:2600], revcomp(g[15000:16600])]),
    ]
    cfg_sc = MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")
    cfg_pl = dataclasses.replace(cfg_sc, l2_impl="pallas", l2_interpret=True)
    B = len(seqs)
    reads = np.full((B, 4096), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, sq in enumerate(seqs):
        reads[i, : len(sq)] = sq
        lens[i] = len(sq)
    mh = jnp.asarray(_minhits_table(cfg_sc.sketch_max, 16, 80.0))
    qh, qs, ss, _ = batch_sketch(cfg_sc, jnp.asarray(reads), jnp.asarray(lens))
    _, _, _, qk = batch_lookup(cfg_sc, ds, qh)
    cs, cst, cen, nc, ovf = batch_l1(cfg_sc, ds, qh, ss, jnp.asarray(lens), mh)
    rd = jnp.asarray(np.repeat(np.arange(B), cfg_sc.cands_max))
    lens_d = jnp.asarray(lens)
    args = (qh, qs, ss, lens_d, rd, cs.reshape(-1), cst.reshape(-1),
            cen.reshape(-1), qk)
    out_sc = np.asarray(batch_l2_gather(cfg_sc, ds, *args))
    out_pl = np.asarray(batch_l2_gather(cfg_pl, ds, *args))
    np.testing.assert_array_equal(out_sc, out_pl)
    assert (out_sc[5] != 0).any()  # votes are actually exercised


def test_pallas_matches_scatter_adversarial(setup):
    rng, genomes, ds = setup
    g = genomes[0]
    seqs = [
        np.tile(g[1000:1350], 10),          # tandem repeats (chain events)
        revcomp(g[5000:8500]),              # exact revcomp
        np.concatenate([g[2000:3800], g[20000:21800]]),  # chimera
    ]
    o_sc, o_pl = _run_both(rng, genomes, ds, seqs)
    for a, b in zip(o_sc, o_pl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
