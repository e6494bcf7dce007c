"""Batched device mapping engine.

Drives the kernels in metamaps_tpu.ops.batch_map over length-bucketed read
batches; acceptance statistics (CI bounds) and strand votes run on host
(cached scipy / tiny per-accepted-candidate work). Reads that overflow the
static kernel shapes fall back to the serial oracle — outputs are identical
to :mod:`metamaps_tpu.engine.mapper_oracle` either way.

Set METAMAPS_TPU_PROFILE=1 for per-batch stage timings on stderr (the
analog of the reference's ENABLE_TIME_PROFILE_L1_L2,
map_parameters.hpp:13 / computeMap.hpp:230-263).
"""
from __future__ import annotations

import os
import sys
import time
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np

_PROFILE = os.environ.get("METAMAPS_TPU_PROFILE", "0") == "1"

from .. import stats
from ..ops.batch_map import DeviceShard, MapKernelConfig
from . import mapper_oracle
from .mapper_oracle import ReadMapping


@lru_cache(maxsize=None)
def _minhits_table(s_max: int, k: int, pi: float) -> np.ndarray:
    t = np.zeros(s_max + 1, np.int32)
    for s in range(1, s_max + 1):
        t[s] = stats.estimate_minimum_hits_relaxed(s, k, pi)
    return t


@lru_cache(maxsize=None)
def _acceptance(shared: int, s: int, k: int, pi: float) -> Tuple[float, float, bool]:
    """(nucIdentity, upper bound, accepted) for a (shared, sketch) pair —
    float32 semantics as in doL2Mapping (computeMap.hpp:404-415)."""
    mash = stats.j2md(np.float32(1.0) * shared / s, k)
    mash_lb = stats.md_lower_bound(mash, s, k, 0.9)
    nuc = float(np.float32(100 * (1 - np.float32(mash))))
    ub = float(np.float32(100 * (1 - np.float32(mash_lb))))
    return nuc, ub, ub >= pi


class JaxMapperEngine:
    """Maps batches of reads against one shard on the default JAX device."""

    def __init__(self, shard, params, read_len_buckets: Sequence[int] = (2048, 4096, 8192, 16384, 32768, 65536)):
        self.shard = shard
        self.params = params
        self.device_shard = DeviceShard.from_host(shard)
        self.buckets = tuple(sorted(read_len_buckets))
        self._configs: Dict[int, MapKernelConfig] = {}

    def _config_for(self, bucket: int) -> MapKernelConfig:
        if bucket not in self._configs:
            self._configs[bucket] = MapKernelConfig.for_read_len(
                bucket, self.params.kmer_size, self.params.window_size,
                self.params.alphabet_size,
            )
        return self._configs[bucket]

    def _bucket_of(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return -1  # longer than the largest bucket -> oracle

    def map_reads(self, seqs: List[np.ndarray]) -> List[List[ReadMapping]]:
        """Map a list of reads (uint8 arrays); returns per-read mapping lists
        in input order (unfiltered — caller applies report_filter)."""
        results: List[List[ReadMapping]] = [None] * len(seqs)
        by_bucket: Dict[int, List[int]] = {}
        for i, s in enumerate(seqs):
            b = self._bucket_of(len(s))
            if b < 0:
                results[i] = mapper_oracle.map_read(self.shard, self.params, s)
            else:
                by_bucket.setdefault(b, []).append(i)

        # pipeline: enqueue every chunk of a bucket on the device (JAX async
        # dispatch) before the first fetch, so device compute overlaps
        # transfers and host post-processing
        for bucket, idxs in by_bucket.items():
            cfg = self._config_for(bucket)
            chunks = [idxs[i : i + self.CHUNK]
                      for i in range(0, len(idxs), self.CHUNK)]
            pending = [
                (chunk, self._dispatch_bucket(cfg, bucket, chunk, seqs))
                for chunk in chunks
            ]
            cfg = self._configs[bucket]  # may have fallen back from pallas
            for chunk, out in pending:
                self._collect_bucket(cfg, bucket, chunk, seqs, results, out)
        return results

    CHUNK = 128  # reads per device dispatch

    def _dispatch_bucket(self, cfg, bucket, idxs, seqs):
        import jax.numpy as jnp

        from ..ops.batch_map import map_batch_fused

        B = len(idxs)
        # round the batch up to a power of two (capped at CHUNK) so XLA
        # compiles at most ~5 shapes per bucket instead of one per distinct
        # chunk size; padding rows repeat a real read and are never read back
        b_pad = 8
        while b_pad < B:
            b_pad *= 2
        b_pad = min(max(b_pad, B), self.CHUNK)
        reads = np.full((b_pad, bucket), ord("A"), np.uint8)
        lens = np.zeros(b_pad, np.int32)
        for r in range(b_pad):
            i = idxs[r] if r < B else idxs[0]
            reads[r, : len(seqs[i])] = seqs[i]
            lens[r] = len(seqs[i])

        minhits = _minhits_table(
            cfg.sketch_max, self.params.kmer_size,
            float(self.params.percentage_identity),
        )
        if _PROFILE:
            t0 = time.perf_counter()
            reads_d = jnp.asarray(reads)
            lens_d = jnp.asarray(lens)
            mh_d = jnp.asarray(minhits)
            import jax as _jax

            _jax.block_until_ready(reads_d)
            print(
                f"PROFILE mapper_jax: upload B={b_pad} "
                f"{time.perf_counter() - t0:.3f}s",
                file=sys.stderr,
            )
            t0 = time.perf_counter()
            out = map_batch_fused(cfg, self.device_shard, reads_d, lens_d, mh_d)
            print(
                f"PROFILE mapper_jax: dispatch(trace) "
                f"{time.perf_counter() - t0:.3f}s",
                file=sys.stderr,
            )
            return out
        try:
            return map_batch_fused(
                cfg, self.device_shard, jnp.asarray(reads), jnp.asarray(lens),
                jnp.asarray(minhits),
            )
        except Exception:
            if cfg.l2_path == "pallas":
                # pallas unavailable on this backend: permanently fall back
                # to the scatter path for this bucket
                import dataclasses

                cfg = dataclasses.replace(cfg, l2_impl="scatter")
                self._configs[bucket] = cfg
                return map_batch_fused(
                    cfg, self.device_shard, jnp.asarray(reads),
                    jnp.asarray(lens), jnp.asarray(minhits),
                )
            raise

    def _collect_bucket(self, cfg, bucket, idxs, seqs, results, out):
        import jax

        B = len(idxs)
        lens = np.array([len(seqs[i]) for i in idxs], np.int32)
        t_fetch = time.perf_counter()
        (q_hash, q_strand, s_size, s_ovf, c_seq, n_c, l1_ovf,
         shared, mean_pos, opt_beg, opt_end, l2_ovf, budget_ovf) = jax.device_get(out)
        if _PROFILE:
            print(
                f"PROFILE mapper_jax: bucket={bucket} B={B} "
                f"fetch+wait={time.perf_counter() - t_fetch:.3f}s "
                f"cands={int((np.asarray(c_seq) >= 0).sum())}",
                file=sys.stderr,
            )

        t_post = time.perf_counter()
        if bool(budget_ovf):
            for i in idxs:
                results[i] = mapper_oracle.map_read(self.shard, self.params, seqs[i])
            return

        k = self.params.kmer_size
        pi = float(self.params.percentage_identity)
        # one vectorized acceptance pass over every candidate slot (float32
        # narrowing identical to the scalar _acceptance; see stats fuzz)
        nuc_all, ub_all, ok_all = stats.acceptance_vec(
            np.asarray(shared), np.asarray(s_size)[:, None], k, pi
        )
        n_fallback = 0
        t_votes = 0.0
        for r, i in enumerate(idxs):
            if s_ovf[r] or l1_ovf[r] or l2_ovf[r].any():
                n_fallback += 1
                results[i] = mapper_oracle.map_read(self.shard, self.params, seqs[i])
                continue
            s = int(s_size[r])
            if s == 0:
                results[i] = []
                continue
            out: List[ReadMapping] = []
            qs = q_hash[r, :s]
            qst = q_strand[r, :s]
            for c in range(int(n_c[r])):
                sh = int(shared[r, c])
                if not ok_all[r, c]:
                    continue
                nuc, ub = float(nuc_all[r, c]), float(ub_all[r, c])
                if sh > 0:
                    tv = time.perf_counter()
                    votes, _ = mapper_oracle._strand_votes(
                        self.shard, qs, qst, s, int(opt_beg[r, c]), int(opt_end[r, c])
                    )
                    t_votes += time.perf_counter() - tv
                    strand = 1 if votes > 0 else -1
                    pos = int(mean_pos[r, c])
                else:
                    strand = -1
                    pos = 0
                out.append(
                    ReadMapping(
                        query_len=int(lens[r]),
                        ref_start=pos,
                        ref_end=pos + int(lens[r]) - 1,
                        ref_seqid=int(c_seq[r, c]),
                        nuc_identity=nuc,
                        nuc_identity_ub=ub,
                        sketch_size=s,
                        conserved=sh,
                        strand=strand,
                    )
                )
            results[i] = out
        if _PROFILE:
            print(
                f"PROFILE mapper_jax: postprocess B={B} "
                f"{time.perf_counter() - t_post:.3f}s "
                f"fallbacks={n_fallback} votes={t_votes:.3f}s",
                file=sys.stderr,
            )
