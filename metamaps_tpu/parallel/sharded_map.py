"""Multi-chip sharded mapping: contig-partitioned index over a device mesh.

TPU-native version of the reference's memory-bounded index shards
(winSketch.hpp:298-329 + mapWrap unifyFiles): shards become SPATIAL — the
reference is partitioned by contigs across the mesh's "shard" axis, reads
stream data-parallel along the "data" axis, every (shard, data) device maps
its read block against its index partition (sketch + L1 + L2 locally), and
per-read candidate lists are merged with an all_gather over the shard axis.
Mapping qualities are computed only after the merge — the same contract as
the reference's per-read shard union (mapWrap.h:145,215).

The single-chip kernels from metamaps_tpu.ops.batch_map run unchanged
inside shard_map; only the frequency threshold becomes a traced per-shard
scalar.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..engine.index import SketchShard
from ..ops.batch_map import (
    DeviceShard,
    MapKernelConfig,
    batch_l1,
    batch_l2_slab,
    batch_sketch,
    build_uniq_tables,
)


def partition_contigs(shard: SketchShard, n_parts: int) -> List[SketchShard]:
    """Split one host index into n contig-partitioned shards, balanced by
    minimizer count (greedy). Shard-local seqids restart at 0, mirroring the
    reference's per-shard numbering."""
    n_contigs = len(shard.contig_names)
    sizes = [
        int(shard.contig_offsets[i + 1] - shard.contig_offsets[i])
        for i in range(n_contigs)
    ]
    order = np.argsort(sizes)[::-1]
    assignment = [[] for _ in range(n_parts)]
    load = [0] * n_parts
    for ci in order:
        tgt = int(np.argmin(load))
        assignment[tgt].append(int(ci))
        load[tgt] += sizes[ci]

    parts = []
    for contig_ids in assignment:
        contig_ids = sorted(contig_ids)
        sub = SketchShard()
        sub_parts = []
        for local, ci in enumerate(contig_ids):
            lo, hi = int(shard.contig_offsets[ci]), int(shard.contig_offsets[ci + 1])
            sub_parts.append(
                (
                    shard.hash_pos_order[lo:hi],
                    shard.wpos[lo:hi],
                    shard.strand[lo:hi],
                    local,
                )
            )
            sub.contig_names.append(shard.contig_names[ci])
            sub.contig_lengths.append(shard.contig_lengths[ci])
        sub.finalize(sub_parts)
        parts.append(sub)
    return parts


def stack_shards(parts: List[SketchShard]):
    """Pad per-shard arrays to a common size and stack with a leading shard
    axis; returns (arrays dict, contig maps). Padding entries use sentinel
    values that never match lookups."""
    import jax.numpy as jnp

    D = len(parts)
    m_max = max(max(p.n_minimizers, 1) for p in parts)
    c_max = max(max(len(p.contig_names), 1) for p in parts)

    def pad1(x, n, fill):
        out = np.full((n,), fill, dtype=x.dtype if hasattr(x, "dtype") else None)
        out[: len(x)] = x
        return out

    arrs = {
        "hash_sorted": [],
        "pair_byhash": [],
        "wpos": [],
        "hash_pos": [],
        "strand_pos": [],
        "hs32": [],
        "chains16": [],
        "contig_offsets": [],
        "freq_threshold": [],
    }
    # unique-hash tables with a COMMON directory width across shards (the
    # bucket_shift/bisect_steps/lookup_mode are static metadata shared by
    # every device)
    from ..ops.batch_map import LOOKUP_KMAX, LOOKUP_U_CAP, build_block_tables

    uniq_parts = []
    nb_bits = min(
        22, max(8, int(np.ceil(np.log2(max(1, m_max)))) + 2)
    )
    steps_common = 1
    max_bucket = 0
    # The bucket-key equalizer exponent must be common across shards; pick
    # it by minimizing the max bucket across ALL shards at the common
    # directory width (an exponent chosen from shard 0 alone could silently
    # force the whole stack to bisect when a later shard's remixed buckets
    # overflow at that exponent).
    from ..ops.batch_map import LOOKUP_KMAX as _KMAX
    from ..ops.batch_map import REMIX_LADDER, remix_keys_np

    uniq_by_shard = [
        np.unique(np.asarray(p.hash_sorted, np.uint32)) for p in parts
    ]

    def _pooled_max_bucket(e: int) -> int:
        mb = 0
        for uq in uniq_by_shard:
            if not len(uq):
                continue
            kk = remix_keys_np(uq, e) >> np.uint32(32 - nb_bits)
            edges = np.flatnonzero(np.diff(kk))
            bounds = np.concatenate([[-1], edges, [len(kk) - 1]])
            mb = max(mb, int(np.max(np.diff(bounds))))
        return mb

    remix_common = None  # bucket-key equalizer must be common across shards
    best_mb = None
    for e in REMIX_LADDER:
        mb_e = _pooled_max_bucket(e)
        if best_mb is None or mb_e < best_mb:
            remix_common, best_mb = e, mb_e
        if mb_e <= _KMAX:
            break
    for p in parts:
        hs_pad = np.full(m_max, np.uint32(0xFFFFFFFF), np.uint32)
        hs_pad[: p.n_minimizers] = p.hash_sorted
        uniq, uniq_start, bucket_start, shift, steps, remix_common = (
            build_uniq_tables(hs_pad, nb_bits=nb_bits, remix_e=remix_common)
        )
        steps_common = max(steps_common, steps)
        if len(uniq):
            max_bucket = max(max_bucket, int(np.max(np.diff(bucket_start))))
        uniq_parts.append((uniq, uniq_start, bucket_start))
    u_max = max(len(u) for u, _, _ in uniq_parts)
    mode = "bisect"
    if u_max <= LOOKUP_U_CAP:
        if max_bucket <= LOOKUP_KMAX:
            mode = "block8"
        elif max_bucket <= 2 * LOOKUP_KMAX:
            mode = "block16"
    u_hash, u_start, b_start, kv32s, dirps = [], [], [], [], []
    for (uniq, uniq_start, bucket_start), p in zip(uniq_parts, parts):
        uq = pad1(uniq, u_max, np.uint32(0xFFFFFFFF))
        u_hash.append(uq)
        us = np.full(u_max + 1, uniq_start[-1], np.int32)
        us[: len(uniq_start)] = uniq_start
        u_start.append(us)
        # directory end indices clamp to this shard's unique count
        bs = np.minimum(bucket_start, np.int32(len(uniq)))
        b_start.append(bs)
        if mode != "bisect":
            kv32, dirp = build_block_tables(uq, us, bs)
            kv32s.append(kv32)
            dirps.append(dirp)
        else:
            kv32s.append(np.zeros((1, 32), np.uint32))
            dirps.append(np.zeros(1, np.uint32))

    max_step_common = 0
    for p in parts:
        arrs["hash_sorted"].append(pad1(p.hash_sorted, m_max, np.uint32(0xFFFFFFFF)))
        pair = np.full((m_max, 2), np.int32(2**31 - 1), np.int32)
        pair[: p.n_minimizers, 0] = p.seqid_byhash
        pair[: p.n_minimizers, 1] = p.wpos_byhash
        arrs["pair_byhash"].append(pair)
        # position-order arrays padded with a huge wpos in a virtual contig
        arrs["wpos"].append(pad1(p.wpos, m_max, np.int32(2**31 - 1)))
        arrs["hash_pos"].append(pad1(p.hash_pos_order, m_max, np.uint32(0xFFFFFFFF)))
        arrs["strand_pos"].append(pad1(p.strand, m_max, np.int8(1)))
        from ..ops.batch_map import (
            HROW_PAD,
            build_chain_deltas,
            pack_hrow_strand,
        )

        chains16, step_p = build_chain_deltas(
            np.asarray(p.wpos), np.asarray(p.hash_pos_order),
            np.asarray(p.contig_offsets),
        )
        max_step_common = max(max_step_common, step_p)
        hrow = np.searchsorted(
            np.asarray(p.hash_sorted, np.uint32),
            np.asarray(p.hash_pos_order, np.uint32),
        ).astype(np.int32)
        arrs["hs32"].append(
            pad1(pack_hrow_strand(hrow, np.asarray(p.strand)), m_max,
                 HROW_PAD))
        ch_pad = np.full((3, m_max), np.uint16(65535), np.uint16)
        ch_pad[:, : p.n_minimizers] = chains16
        arrs["chains16"].append(ch_pad)
        co = np.full(c_max + 1, p.n_minimizers, np.int32)
        co[: len(p.contig_offsets)] = p.contig_offsets.astype(np.int32)
        arrs["contig_offsets"].append(co)
        arrs["freq_threshold"].append(np.int32(min(p.freq_threshold, 2**31 - 1)))
    arrs["uniq_hash"] = u_hash
    arrs["uniq_start"] = u_start
    arrs["bucket_start"] = b_start
    arrs["kv32"] = kv32s
    arrs["dir_packed"] = dirps
    out = {k: jnp.asarray(np.stack(v)) for k, v in arrs.items()}
    out["bucket_shift"] = 32 - nb_bits
    out["bisect_steps"] = steps_common
    out["lookup_mode"] = mode
    out["remix_e"] = int(remix_common or 0)
    out["max_step"] = int(max_step_common)
    return out


def sharded_map_step(mesh, stacked, cfg: MapKernelConfig, reads, read_lens,
                     minhits_table):
    """One full sharded mapping step on a ('shard', 'data') mesh:

    reads [Bg, Lmax] sharded over 'data' (replicated over 'shard');
    index arrays sharded over 'shard' (replicated over 'data');
    returns per-read candidates (seqid, shared count, mean position)
    all-gathered over the shard axis — the spatial unifyFiles merge. The
    host maps shard-local seqids back to contigs and computes mapping
    qualities over the union, exactly as in the serial shard loop.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ax_shard, ax_data = mesh.axis_names

    def local(hash_sorted, pair_byhash, wpos, hash_pos, strand_pos,
              hs32, chains16, contig_offsets, uniq_hash, uniq_start,
              bucket_start, kv32, dir_packed, freq_thr, reads_l, lens_l,
              minhits):
        # leading shard axis of size 1 inside the shard_map body
        shard = DeviceShard(
            hash_sorted=hash_sorted[0],
            pair_byhash=pair_byhash[0],
            wpos=wpos[0],
            hash_pos=hash_pos[0],
            strand_pos=strand_pos[0],
            hs32=hs32[0],
            chains16=chains16[0],
            contig_offsets=contig_offsets[0],
            uniq_hash=uniq_hash[0],
            uniq_start=uniq_start[0],
            bucket_start=bucket_start[0],
            kv32=kv32[0],
            dir_packed=dir_packed[0],
            freq_threshold=0,  # unused; traced override below
            bucket_shift=stacked["bucket_shift"],
            bisect_steps=stacked["bisect_steps"],
            lookup_mode=stacked["lookup_mode"],
            remix_e=stacked.get("remix_e", 0),
            max_step=stacked.get("max_step", 64),
        )
        q_hash, q_strand, s_size, _ = batch_sketch(cfg, reads_l, lens_l)
        c_seq, c_start, c_end, n_c, ovf = batch_l1(
            cfg, shard, q_hash, s_size, lens_l, minhits,
            freq_threshold=freq_thr[0, 0],
        )
        B, C = c_seq.shape
        rd = jnp.repeat(jnp.arange(B), C)
        sh, mp, ob, oe, ovf2 = batch_l2_slab(
            cfg, shard, q_hash[rd], s_size[rd], lens_l[rd],
            c_seq.reshape(-1), c_start.reshape(-1), c_end.reshape(-1),
        )
        shared = sh.reshape(B, C)
        mean_pos = mp.reshape(B, C)

        # merge candidates across index shards (per read): the collective
        # equivalent of unifyFiles' per-read concatenation of shard outputs
        g_seq = jax.lax.all_gather(c_seq, ax_shard)  # [D, B, C]
        g_shared = jax.lax.all_gather(shared, ax_shard)
        g_pos = jax.lax.all_gather(mean_pos, ax_shard)
        return g_seq, g_shared, g_pos

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax_shard),) * 14 + (P(ax_data), P(ax_data), P()),
        out_specs=(P(None, ax_data), P(None, ax_data), P(None, ax_data)),
        check_vma=False,
    )
    import jax

    return jax.jit(fn)(
        stacked["hash_sorted"], stacked["pair_byhash"],
        stacked["wpos"], stacked["hash_pos"], stacked["strand_pos"],
        stacked["hs32"], stacked["chains16"],
        stacked["contig_offsets"], stacked["uniq_hash"], stacked["uniq_start"],
        stacked["bucket_start"], stacked["kv32"], stacked["dir_packed"],
        stacked["freq_threshold"].reshape(-1, 1),
        reads, read_lens, minhits_table,
    )
