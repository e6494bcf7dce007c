"""Spatial sharded mapping as a PRODUCT path.

The reference maps every read against every memory-bounded index shard,
concatenates candidates per read, and only then computes mapping qualities
and writes one unified output + sidecars (mapWrap.h:34-213 unifyFiles,
:215-323 addMappingQualities, shard callbacks :380-429). Here the shards
are SPATIAL: the reference index is partitioned into contiguous contig
blocks across the mesh's 'shard' axis, reads stream data-parallel along
'data', each device maps its read block against its partition (sketch + L1
+ L2 + strand votes on device), per-read candidate grids are merged with an
all_gather over the shard axis, and the existing host finisher (acceptance
CI -> report filter -> unify_files -> add_mapping_qualities) runs over the
union — producing byte-identical mapping files and sidecars.

Contiguous block partitioning (not greedy balancing) keeps the per-read
line order of the merged output equal to the single-device run: L1
candidates are emitted in (seqid, position) order, so concatenating shard
outputs in shard order reproduces the global order exactly.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .. import stats
from ..engine import mapper_oracle
from ..engine.index import SketchShard, build_shards
from ..engine.mapper_jax import _minhits_table
from ..engine.mapper_oracle import ReadMapping
from ..ops.batch_map import (
    DeviceShard,
    MapKernelConfig,
    batch_l1,
    batch_l2_slab,
    batch_sketch,
)
from ..params import Parameters
from .mesh import make_mesh_2d
from .sharded_map import stack_shards


def parse_mesh_spec(spec: str) -> Tuple[int, int]:
    """Parse 'shard=S,data=D' (either key optional, default 1)."""
    vals = {"shard": 1, "data": 1}
    for part in spec.split(","):
        if not part:
            continue
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in vals:
            raise ValueError(f"unknown mesh axis {k!r} (want shard=, data=)")
        vals[k] = int(v)
    if vals["shard"] < 1 or vals["data"] < 1:
        raise ValueError("mesh axes must be >= 1")
    return vals["shard"], vals["data"]


def partition_contigs_blocks(shard: SketchShard, n_parts: int) -> List[SketchShard]:
    """Split one host index into n_parts CONTIGUOUS contig blocks, balanced
    by minimizer count (the same shape as the reference's sequential
    memory-budget shard cuts, winSketch.hpp:298-329). Contiguity preserves
    global (seqid, pos) candidate order across the shard-order merge.
    Shard-local seqids restart at 0 per block."""
    n_contigs = len(shard.contig_names)
    sizes = np.asarray(
        [
            int(shard.contig_offsets[i + 1] - shard.contig_offsets[i])
            for i in range(n_contigs)
        ],
        dtype=np.int64,
    )
    total = int(sizes.sum())
    # cut after the contig whose cumulative load crosses i/n_parts of total
    cuts = [0]
    csum = np.cumsum(sizes)
    for i in range(1, n_parts):
        target = total * i / n_parts
        pos = int(np.searchsorted(csum, target, side="left")) + 1
        pos = max(pos, cuts[-1])  # keep monotone; empty blocks allowed
        pos = min(pos, n_contigs)
        cuts.append(pos)
    cuts.append(n_contigs)

    parts = []
    for b in range(n_parts):
        lo_c, hi_c = cuts[b], cuts[b + 1]
        sub = SketchShard()
        sub_parts = []
        for local, ci in enumerate(range(lo_c, hi_c)):
            lo = int(shard.contig_offsets[ci])
            hi = int(shard.contig_offsets[ci + 1])
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


def _make_sharded_step(mesh, cfg: MapKernelConfig, stacked):
    """Compile one full per-bucket sharded mapping step. Returns a jitted
    fn(reads [Bg, L], lens [Bg], minhits) -> (grid [D, 5, B, C], l1meta
    [D, 2, B], s_size [Bg], s_ovf [Bg]) where grid rows are (c_seq, shared,
    mean_pos, votes, l2_ovf) and l1meta rows are (n_c, l1_ovf)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ax_shard, ax_data = mesh.axis_names

    def local(hash_sorted, pair_byhash, wpos, hash_pos, strand_pos,
              hs32, chains16, contig_offsets, uniq_hash, uniq_start,
              bucket_start, kv32, dir_packed, freq_thr, reads_l, lens_l,
              minhits):
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
            freq_threshold=0,  # unused; traced per-shard override below
            bucket_shift=stacked["bucket_shift"],
            bisect_steps=stacked["bisect_steps"],
            lookup_mode=stacked["lookup_mode"],
            remix_e=stacked.get("remix_e", 0),
            max_step=stacked.get("max_step", 64),
        )
        q_hash, q_strand, s_size, s_ovf = batch_sketch(cfg, reads_l, lens_l)
        c_seq, c_start, c_end, n_c, l1_ovf = batch_l1(
            cfg, shard, q_hash, s_size, lens_l, minhits,
            freq_threshold=freq_thr[0, 0],
        )
        B, C = c_seq.shape
        rd = jnp.repeat(jnp.arange(B), C)
        # strand votes ride the L2 slab (the pallas path reuses the
        # already-sliced occurrence window instead of a second vmapped
        # slice+merge per candidate — r3's mesh-path perf gap)
        sh, mp, ob, oe, l2o, votes = batch_l2_slab(
            cfg, shard, q_hash[rd], s_size[rd], lens_l[rd],
            c_seq.reshape(-1), c_start.reshape(-1), c_end.reshape(-1),
            q_strand=q_strand[rd],
        )
        grid = jnp.stack(
            [
                c_seq,
                sh.reshape(B, C),
                mp.reshape(B, C),
                votes.reshape(B, C),
                l2o.reshape(B, C).astype(jnp.int32),
            ]
        )  # [5, B, C]
        l1meta = jnp.stack([n_c, l1_ovf.astype(jnp.int32)])  # [2, B]
        # the spatial unifyFiles merge: per-read candidates from every
        # index partition side by side (mapWrap.h:145 contract)
        g_grid = jax.lax.all_gather(grid, ax_shard)  # [D, 5, B, C]
        g_l1 = jax.lax.all_gather(l1meta, ax_shard)  # [D, 2, B]
        return g_grid, g_l1, s_size, s_ovf

    sh = P(ax_shard)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(sh,) * 14 + (P(ax_data), P(ax_data), P()),
        out_specs=(
            P(None, None, ax_data),
            P(None, None, ax_data),
            P(ax_data),
            P(ax_data),
        ),
        check_vma=False,
    )
    import jax

    jfn = jax.jit(fn)

    def run(reads, lens, minhits):
        return jfn(
            stacked["hash_sorted"], stacked["pair_byhash"], stacked["wpos"],
            stacked["hash_pos"], stacked["strand_pos"], stacked["hs32"],
            stacked["chains16"],
            stacked["contig_offsets"], stacked["uniq_hash"],
            stacked["uniq_start"], stacked["bucket_start"], stacked["kv32"],
            stacked["dir_packed"], stacked["freq_threshold"].reshape(-1, 1),
            reads, lens, minhits,
        )

    return run


class ShardedMapperEngine:
    """Maps read batches against a contig-partitioned index on a
    ('shard', 'data') device mesh; map_reads returns per-SHARD per-read
    mapping lists so the caller can keep the reference's per-shard output
    files + unifyFiles contract."""

    def __init__(self, full_shard: SketchShard, params: Parameters,
                 n_shard: int, n_data: int,
                 read_len_buckets: Sequence[int] = (2048, 4096, 8192, 16384,
                                                    32768, 65536),
                 rows_per_device: int = 32):
        import jax

        self.params = params
        self.n_shard = n_shard
        self.n_data = n_data
        self.parts = partition_contigs_blocks(full_shard, n_shard)
        self.stacked = stack_shards(self.parts)
        self.mesh = make_mesh_2d(n_shard, n_data)
        platforms = {d.platform for d in np.asarray(self.mesh.devices).ravel()}
        self._l2_impl = (
            "pallas" if platforms & {"tpu", "axon", "gpu"} else "scatter"
        )
        self.buckets = tuple(sorted(read_len_buckets))
        self.rows_per_device = rows_per_device
        self.global_chunk = rows_per_device * n_data
        self._configs: Dict[int, MapKernelConfig] = {}
        self._steps = {}

    def _bucket_of(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return -1

    def _step_for(self, bucket: int):
        if bucket not in self._steps:
            cfg = MapKernelConfig.for_read_len(
                bucket, self.params.kmer_size, self.params.window_size,
                self.params.alphabet_size, l2_impl=self._l2_impl,
            )
            self._configs[bucket] = cfg
            self._steps[bucket] = _make_sharded_step(self.mesh, cfg,
                                                     self.stacked)
        return self._configs[bucket], self._steps[bucket]

    def _oracle_all_shards(self, seq) -> List[List[ReadMapping]]:
        return [
            mapper_oracle.map_read(part, self.params, seq)
            for part in self.parts
        ]

    def map_reads(self, seqs: List[np.ndarray]) -> List[List[List[ReadMapping]]]:
        """Returns results[shard][read] = list of ReadMapping (unfiltered;
        caller applies report_filter per shard), in input read order."""
        import jax.numpy as jnp

        D = self.n_shard
        results: List[List[List[ReadMapping]]] = [
            [None] * len(seqs) for _ in range(D)
        ]
        by_bucket: Dict[int, List[int]] = {}
        for i, s in enumerate(seqs):
            b = self._bucket_of(len(s))
            if b < 0:
                per = self._oracle_all_shards(s)
                for d in range(D):
                    results[d][i] = per[d]
            else:
                by_bucket.setdefault(b, []).append(i)

        k = self.params.kmer_size
        pi = float(self.params.percentage_identity)
        for bucket, idxs in by_bucket.items():
            cfg, step = self._step_for(bucket)
            minhits = jnp.asarray(_minhits_table(cfg.sketch_max, k, pi))
            Bg = self.global_chunk
            for lo in range(0, len(idxs), Bg):
                chunk = idxs[lo : lo + Bg]
                reads = np.full((Bg, bucket), ord("A"), np.uint8)
                lens = np.zeros(Bg, np.int32)
                # padding rows stay empty (lens 0 -> zero sketch, no L1
                # hits, no L2 work) instead of re-mapping chunk[0]
                for r in range(len(chunk)):
                    i = chunk[r]
                    reads[r, : len(seqs[i])] = seqs[i]
                    lens[r] = len(seqs[i])
                g_grid, g_l1, s_size, s_ovf = step(
                    jnp.asarray(reads), jnp.asarray(lens), minhits
                )
                self._collect_chunk(
                    cfg, chunk, seqs, results,
                    np.asarray(g_grid), np.asarray(g_l1),
                    np.asarray(s_size), np.asarray(s_ovf),
                )
        return results

    def _collect_chunk(self, cfg, chunk, seqs, results, g_grid, g_l1,
                       s_size, s_ovf):
        """Assemble per-(shard, read) mappings from the gathered grids —
        the same acceptance/strand/position semantics as the single-chip
        engine's _collect (identical to the serial oracle)."""
        D = self.n_shard
        B = len(chunk)
        k = self.params.kmer_size
        pi = float(self.params.percentage_identity)
        for d in range(D):
            c_seq, shared, mean_pos, votes, l2_ovf = (
                g_grid[d, 0], g_grid[d, 1], g_grid[d, 2], g_grid[d, 3],
                g_grid[d, 4],
            )
            n_c, l1_ovf = g_l1[d, 0], g_l1[d, 1]
            nuc_all, ub_all, ok_all = stats.acceptance_vec(
                shared[:B], s_size[:B, None], k, pi
            )
            for r in range(B):
                i = chunk[r]
                if s_ovf[r] or l1_ovf[r] or l2_ovf[r, : n_c[r]].any():
                    results[d][i] = mapper_oracle.map_read(
                        self.parts[d], self.params, seqs[i]
                    )
                    continue
                s = int(s_size[r])
                if s == 0:
                    results[d][i] = []
                    continue
                out: List[ReadMapping] = []
                ln = len(seqs[i])
                for c in range(int(n_c[r])):
                    if not ok_all[r, c]:
                        continue
                    sh = int(shared[r, c])
                    if sh > 0:
                        strand = 1 if votes[r, c] > 0 else -1
                        pos = int(mean_pos[r, c])
                    else:
                        strand = -1
                        pos = 0
                    out.append(
                        ReadMapping(
                            query_len=ln,
                            ref_start=pos,
                            ref_end=pos + ln - 1,
                            ref_seqid=int(c_seq[r, c]),
                            nuc_identity=float(nuc_all[r, c]),
                            nuc_identity_ub=float(ub_all[r, c]),
                            sketch_size=s,
                            conserved=sh,
                            strand=strand,
                        )
                    )
                results[d][i] = out


def map_directly_sharded(params: Parameters, n_shard: int, n_data: int,
                         read_len_buckets: Sequence[int] = None,
                         rows_per_device: int = None,
                         progress: bool = False):
    """mapDirectly over a device mesh: one full index built and partitioned
    spatially, reads streamed data-parallel, per-shard outputs unified with
    the standard unify_files + add_mapping_qualities host finisher —
    byte-identical files and sidecars (mapWrap.h:34-213,215-323 contract
    with shards in space instead of time).

    ``read_len_buckets``/``rows_per_device`` override the engine's compiled
    shapes — dryruns and tests on virtual CPU meshes use small buckets to
    keep XLA-CPU compile time inside the driver budget. ``progress`` prints
    time-stamped phase lines to stderr."""
    import sys
    import time as _time

    _t0 = _time.time()

    def _p(msg):
        if progress:
            print(f"[mesh {_time.time() - _t0:6.1f}s] {msg}",
                  file=sys.stderr, flush=True)
    from ..engine.mapwrap import unify_files
    from ..io.fasta import read_sequences
    from ..io.mappings import MappingLine

    prefixes = params.out_file_name.split(",")
    queries = (
        params.query_sequences[0].split(",")
        if len(params.query_sequences) == 1
        else params.query_sequences
    )
    assert len(prefixes) == len(queries)

    shards: List[SketchShard] = []
    _p("building index")
    build_shards(params, 0, lambda s, n: shards.append(s))
    assert len(shards) == 1
    _p(f"index built ({shards[0].n_minimizers} minimizers); "
       f"partitioning over shard={n_shard}, data={n_data}")
    kw = {}
    if read_len_buckets is not None:
        kw["read_len_buckets"] = tuple(read_len_buckets)
    if rows_per_device is not None:
        kw["rows_per_device"] = int(rows_per_device)
    engine = ShardedMapperEngine(shards[0], params, n_shard, n_data, **kw)
    _p("engine ready (index stacked on mesh)")

    for prefix, query in zip(prefixes, queries):
        out_files = [f"{prefix}.shard{d}" for d in range(n_shard)]
        outs = [open(f, "w") for f in out_files]

        def flush(pending):
            per_shard = engine.map_reads([s for _, s in pending])
            for d in range(n_shard):
                part = engine.parts[d]
                for (name, _), ms in zip(pending, per_shard[d]):
                    ms = mapper_oracle.report_filter(ms, params.report_all)
                    for m in ms:
                        ml = MappingLine(
                            read_id=name,
                            read_len=m.query_len,
                            strand=m.strand,
                            contig_id=part.contig_names[m.ref_seqid],
                            contig_len=part.contig_lengths[m.ref_seqid],
                            ref_start=m.ref_start,
                            ref_end=m.ref_end,
                            identity=m.nuc_identity,
                            intersection=m.conserved,
                            sketch_size=m.sketch_size,
                        )
                        outs[d].write(ml.format() + "\n")

        pending = []
        n_flushed = 0
        for name, seq in read_sequences(query):
            if (
                len(seq) < params.window_size
                or len(seq) < params.kmer_size
                or len(seq) < params.min_read_length
            ):
                continue
            pending.append((name, seq))
            if len(pending) >= engine.global_chunk:
                flush(pending)
                n_flushed += len(pending)
                _p(f"mapped {n_flushed} reads")
                pending = []
        if pending:
            flush(pending)
            n_flushed += len(pending)
            _p(f"mapped {n_flushed} reads (final chunk)")
        for f in outs:
            f.close()

        local = Parameters(**{**params.__dict__})
        local.query_sequences = [query]
        local.out_file_name = prefix
        unify_files(prefix, local, out_files, [query])
        _p(f"unified {prefix}")
