"""Batched device mapping kernels: sketch -> L1 candidates -> L2 scoring.

TPU-first reformulation of the reference's per-read serial algorithm
(src/map/include/computeMap.hpp), operating on fixed-shape padded batches:

Stage A (:func:`batch_sketch`): dense winnowing per read (vmap over the
batch) and unique-hash sketch extraction by sort + neighbor-compare.

Stage B (:func:`batch_l1`): vectorized binary search of all sketch hashes in
the hash-sorted shard arrays, CSR-style hit expansion to a fixed budget,
two-key sort, run-of-minimumHits candidate detection and overlap merging —
exactly computeL1CandidateRegions (computeMap.hpp:346-386) in data-parallel
form.

Stage C (:func:`batch_l2`): the sliding ordered-map (slidingMap.hpp) is
re-derived as an *event-interval* algorithm. At iterator state p the map
holds the contiguous occurrence range [max occurrence <= p, first occurrence
>= p+L); hence each occurrence x is "active" for p in [x-L+1, next_occ-1],
and hash-presence is the union of its occurrences' intervals (the ordered
map's wposR-revision/delete-NOOP semantics collapse to exactly this union).
The shared sketch count at p is

    shared(p) = #{ j : q_j present(p)  and  j + C(p, q_j) < s }

with C = number of distinct ref-only hashes < q_j present at p — i.e. the
bottom-s rule expressed through union ranks. Presence (M) and rank shift (C)
for ALL iterator stop positions are computed at once as two int8
matmuls over an event-activation matrix (MXU work), and the optimum
reproduces the reference's first/last-maximum mean-position and tie rules.

All shapes are static (`MapKernelConfig`); overflow conditions are flagged
for host fallback to the serial oracle.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .winnow import winnow_dense

I32_MAX = np.int32(2**31 - 1)
U32_MAX = np.uint32(0xFFFFFFFF)
I32_MIN = np.int32(-(2**31))

# max supported (minimumHits - 1) shift in the L1 run detector; reads whose
# minhits exceed this fall back to the serial oracle (never seen in practice)
MINHITS_SHIFT_MAX = 32


def remix_keys_np(h: np.ndarray, e: int) -> np.ndarray:
    """Monotone equalizing bucket key for minimizer-skewed hashes.

    Winnowed minimizer hashes are min-of-~w order statistics, so their
    density piles up near 0 (CDF ~ 1-(1-x)^w) and a uniform radix directory
    on the raw hash overloads its low buckets ~w-fold. This computes
    key = (2^32-1) - ((2^32-1-h)/2^32)^e in exact 0.32 fixed point
    (binary exponentiation; each product keeps the high 32 bits), which
    flattens that CDF. Every step is monotone non-decreasing in ``h``
    (floor of products of monotone factors), so equal hashes share a key
    and bucket runs stay CONTIGUOUS in hash-sorted order — the block-mode
    invariants are preserved. :func:`remix_keys_jax` is the bit-identical
    device twin (same operation order).

    ``e == 0`` or ``1`` is the identity (no remix)."""
    if e <= 1:
        return np.asarray(h, np.uint32)
    top = np.uint64(0xFFFFFFFF)
    y = (top - np.asarray(h, np.uint64)) & top
    acc, base, ee = None, y, e
    while ee:
        if ee & 1:
            acc = base if acc is None else ((acc * base) >> np.uint64(32))
        ee >>= 1
        if ee:
            base = (base * base) >> np.uint64(32)
    return (top - acc).astype(np.uint32)


def remix_keys_jax(h, e: int):
    """Device twin of :func:`remix_keys_np` on uint32 lanes (exact mulhi
    via 16-bit limbs — see u64._mul32_full); identical truncation order."""
    from .u64 import _mul32_full

    if e <= 1:
        return h
    top = jnp.uint32(0xFFFFFFFF)
    y = top - h
    acc, base, ee = None, y, e
    while ee:
        if ee & 1:
            acc = base if acc is None else _mul32_full(acc, base)[0]
        ee >>= 1
        if ee:
            base = _mul32_full(base, base)[0]
    return top - acc


REMIX_LADDER = (0, 4, 8, 12, 16, 24, 32)


def build_uniq_tables(hash_sorted: np.ndarray, nb_bits: int = None,
                      remix_e: int = None):
    """Host-side construction of the unique-hash table + radix directory
    for :class:`DeviceShard`. Returns (uniq_hash [U], uniq_start [U+1],
    bucket_start [2^nb_bits + 1], bucket_shift, bisect_steps, remix_e).

    The directory width is grown (up to ``LOOKUP_NB_CAP``) until every bucket
    holds <= LOOKUP_KMAX unique hashes, enabling the bisection-free aligned
    8-block lookup in :func:`batch_l1` (bisect_steps stays valid as the
    fallback for pathological hash distributions). When the raw hash can't
    get there (winnowed minimizer hashes are min-of-w skewed — at realistic
    index sizes the densest raw-hash buckets run ~w deep), bucket keys are
    remixed through the monotone equalizer :func:`remix_keys_np`, exponent
    picked empirically from ``REMIX_LADDER`` (smallest max bucket wins;
    ``remix_e`` pins it externally, e.g. for cross-shard-common tables)."""
    hs = np.asarray(hash_sorted, dtype=np.uint32)
    if hs.size and np.all(hs[:-1] <= hs[1:]):
        # input is already ascending (the DeviceShard contract): uniques
        # are run boundaries — O(M) instead of np.unique's re-sort
        new_run = np.empty(hs.size, np.bool_)
        new_run[0] = True
        np.not_equal(hs[1:], hs[:-1], out=new_run[1:])
        first_idx = np.flatnonzero(new_run)
        uniq = hs[first_idx]
    else:
        uniq, first_idx = np.unique(hs, return_index=True)
    uniq_start = np.concatenate([first_idx, [hs.shape[0]]]).astype(np.int32)
    n_u = max(1, len(uniq))

    def _max_bucket(keys, nb):
        # keys are sorted (monotone remix), so bucket sizes are run lengths
        # of their top bits
        kk = keys >> np.uint32(32 - nb)
        edges = np.flatnonzero(np.diff(kk))
        bounds = np.concatenate([[-1], edges, [len(kk) - 1]])
        return int(np.max(np.diff(bounds))) if len(kk) else 0

    def _grow(keys):
        if nb_bits is not None:
            return nb_bits, _max_bucket(keys, nb_bits)
        nb = min(LOOKUP_NB_CAP, max(8, int(np.ceil(np.log2(n_u))) + 2))
        while nb < LOOKUP_NB_CAP and _max_bucket(keys, nb) > LOOKUP_KMAX:
            nb += 1
        return nb, _max_bucket(keys, nb)

    if remix_e is None:
        best = None
        for e in REMIX_LADDER:
            keys_e = remix_keys_np(uniq, e)
            nb_e, mb_e = _grow(keys_e)
            if best is None or mb_e < best[2]:
                best = (e, nb_e, mb_e, keys_e)
            if mb_e <= LOOKUP_KMAX:
                break
        remix_e, nb, _, keys = best
    else:
        keys = remix_keys_np(uniq, remix_e)
        nb, _ = _grow(keys)
    shift = 32 - nb
    # bucket_start via bincount+cumsum: O(U + NB), vs 2^nb binary searches
    counts = np.bincount(
        (keys >> np.uint32(shift)).astype(np.int64), minlength=1 << nb
    )
    bucket_start = np.empty((1 << nb) + 1, np.int32)
    bucket_start[0] = 0
    bucket_start[1:] = np.cumsum(counts)
    max_bucket = int(np.max(np.diff(bucket_start))) if len(uniq) else 0
    steps = int(np.ceil(np.log2(max_bucket + 1))) + 1 if max_bucket else 1
    if len(uniq) == 0:  # degenerate empty shard
        uniq = np.zeros(1, np.uint32)
        uniq_start = np.zeros(2, np.int32)
    return uniq, uniq_start, bucket_start, shift, steps, remix_e


LOOKUP_KMAX = 8  # max bucket size for the bisection-free lookup path
LOOKUP_NB_CAP = 26  # directory width cap: 2^26 * 4 B = 256 MB
LOOKUP_U_CAP = (1 << 28) - 1  # dir_packed holds lo in 28 bits + count in 4


def build_block_tables(uniq: np.ndarray, uniq_start: np.ndarray,
                       bucket_start: np.ndarray):
    """Packed layouts for the bisection-free lookup:

    - kv32 [ceil(U/8)+1, 32] uint32: row r = (uniq[8r:8r+16],
      uniq_start[8r:8r+16]) — each row carries its own 8-block AND the next
      one (entries stored twice), so a bucket's two possible blocks arrive
      in ONE aligned 32-wide row gather (width 2-32 aligned row gathers cost
      the same as a single lane — profiling/README.md). Keys padded
      U32_MAX, starts padded with uniq_start[-1];
    - dir_packed [NB] uint32: bucket lo index in bits 0..27, bucket size
      (<= 8) in bits 28..31 — one lane gather replaces two.

    A bucket [lo, hi) with hi-lo <= 8 spans at most unique indices
    8*(lo//8) .. 8*(lo//8)+15, i.e. row lo//8's 16 entries; successor
    starts g+1 are at offsets <= 15 of the same row since hi <= lo+8.

    The same tables serve the 'block16' mode for big indices whose widest
    directory under the memory cap still has buckets of 9..16 uniques
    (realistic-scale references, ~10^8 uniques): there a lookup fetches
    rows lo//8 and lo//8 + 2 — 32 contiguous entries covering any bucket
    <= 16 (two extra rows are allocated so lo//8 + 2 is always valid). In
    block16 the count nibble is ignored (clamped at 15): an equal key
    cannot exist outside the query's own radix bucket, so the upper-bound
    test is redundant for the match mask and rank count."""
    U = len(uniq)
    rows_k = U // 8 + 3
    keys_flat = np.full((rows_k + 1) * 8, U32_MAX, np.uint32)
    keys_flat[:U] = uniq
    starts_flat = np.full((rows_k + 1) * 8, uniq_start[-1], np.uint32)
    starts_flat[: len(uniq_start)] = uniq_start.astype(np.uint32)
    kv32 = np.empty((rows_k, 32), np.uint32)
    # rows are stride-8 width-16 windows — views, no index materialization
    win_k = np.lib.stride_tricks.sliding_window_view(keys_flat, 16)
    win_s = np.lib.stride_tricks.sliding_window_view(starts_flat, 16)
    kv32[:, :16] = win_k[: rows_k * 8 : 8]
    kv32[:, 16:] = win_s[: rows_k * 8 : 8]
    lo = bucket_start[:-1].astype(np.uint32)
    cnt = np.minimum(
        (bucket_start[1:] - bucket_start[:-1]).astype(np.uint32),
        np.uint32(15),
    )
    dir_packed = lo | (cnt << np.uint32(28))
    return kv32, dir_packed


BLOCK9P_COUNT_CAP = 31  # 5-bit saturated per-entry counts
BLOCK9P_START_CAP = 1 << 27  # starts fit 27 bits alongside the count


def build_block9p_tables(uniq: np.ndarray, uniq_start: np.ndarray,
                         bucket_start: np.ndarray):
    """'block9p' layout: the ONE-row-gather lookup for remix-equalized big
    indices whose max bucket is 9 (the equalizer's Poisson floor at the
    directory width cap — exactly the realistic-scale regime, see
    remix_keys_np).

    Row r = (uniq[8r:8r+16], packed[8r:8r+16]) where packed = start << 5 |
    min(count, 31). Any bucket [lo, lo+sz) with sz <= 9 lies within row
    lo//8's 16 entries, and because each entry carries its own count, the
    match count and the row-space rank never need the successor entry —
    unlike block8/16's successor-start subtraction, which is what forces
    the second row fetch when sz can reach 9.

    Applicability (gated by the caller): sz_max <= 9, total minimizers
    < 2^27 (start field), and frequency threshold <= 31 — the count
    saturation is then invisible: saturated counts (>= 31 >= thr) are
    culled by the threshold either way, and a not-found query's rank
    computed past a saturated last entry (s_last + c_stored <= true
    successor row, > predecessor's first row) still orders correctly
    against every entry's first-row in the L2 qrank compare (any value in
    (pred_first_row, succ_first_row] is equivalent there)."""
    U = len(uniq)
    assert int(uniq_start[-1]) < BLOCK9P_START_CAP
    rows_k = U // 8 + 3
    keys_flat = np.full((rows_k + 1) * 8, U32_MAX, np.uint32)
    keys_flat[:U] = uniq
    counts = np.minimum(
        (uniq_start[1:].astype(np.int64) - uniq_start[:-1]).astype(np.int64),
        BLOCK9P_COUNT_CAP,
    ).astype(np.uint32)
    packed = (uniq_start[:-1].astype(np.uint32) << np.uint32(5)) | counts
    # pads rank as "past everything": start = M, count 0
    packed_flat = np.full(
        (rows_k + 1) * 8, np.uint32(uniq_start[-1]) << np.uint32(5), np.uint32
    )
    packed_flat[:U] = packed
    kv32 = np.empty((rows_k, 32), np.uint32)
    win_k = np.lib.stride_tricks.sliding_window_view(keys_flat, 16)
    win_p = np.lib.stride_tricks.sliding_window_view(packed_flat, 16)
    kv32[:, :16] = win_k[: rows_k * 8 : 8]
    kv32[:, 16:] = win_p[: rows_k * 8 : 8]
    lo = bucket_start[:-1].astype(np.uint32)
    sz = (bucket_start[1:] - bucket_start[:-1]).astype(np.uint32)  # <= 9
    dir_packed = lo | (sz << np.uint32(28))
    return kv32, dir_packed


BLOCK9W_STRIDE = 24  # uniques per kv64 row step
BLOCK9W_WIDTH = 32  # key (and value) lanes per kv64 row


def build_block9w_tables(uniq: np.ndarray, uniq_start: np.ndarray,
                         bucket_start: np.ndarray):
    """'block9w' layout: block9p's one-row-gather lookup at 2/3 the HBM.

    block9p rows advance 8 uniques but carry 16 (every entry stored twice,
    16 B/unique). Here rows advance BLOCK9W_STRIDE=24 uniques and carry
    BLOCK9W_WIDTH=32 — duplication 32/24, 10.7 B/unique — in a [R, 64]
    uint32 row (32 keys + 32 packed start<<5|count values, 256 B, still one
    aligned row gather; random-gather cost is issue-rate bound, not
    row-size bound — profiling/README.md gather findings). Coverage: any
    bucket [lo, lo+9) with r0 = lo // 24 has lo - 24*r0 <= 23, so its
    entries live at in-row offsets <= 23 + 8 = 31. Same applicability
    gates and rank semantics as block9p (build_block9p_tables)."""
    U = len(uniq)
    rows_k = U // BLOCK9W_STRIDE + 3
    flat_len = rows_k * BLOCK9W_STRIDE + BLOCK9W_WIDTH
    keys_flat = np.full(flat_len, U32_MAX, np.uint32)
    keys_flat[:U] = uniq
    counts = np.minimum(
        (uniq_start[1:].astype(np.int64) - uniq_start[:-1].astype(np.int64)),
        BLOCK9P_COUNT_CAP,
    ).astype(np.uint32)
    packed_flat = np.full(
        flat_len, np.uint32(uniq_start[-1]) << np.uint32(5), np.uint32
    )
    packed_flat[:U] = (
        uniq_start[:-1].astype(np.uint32) << np.uint32(5)
    ) | counts
    kv64 = _rewindow_block9w(keys_flat, packed_flat, rows_k)
    lo = bucket_start[:-1].astype(np.uint32)
    sz = (bucket_start[1:] - bucket_start[:-1]).astype(np.uint32)  # <= 9
    dir_packed = lo | (sz << np.uint32(28))
    return kv64, dir_packed


def _rewindow_block9w(keys_flat: np.ndarray, packed_flat: np.ndarray,
                      rows_k: int) -> np.ndarray:
    """Window padded flat (key, packed) planes into block9w's [R, 64]
    rows (stride-24 width-32 views — no index materialization)."""
    return _rewindow_wide(keys_flat, packed_flat, rows_k,
                          BLOCK9W_STRIDE, BLOCK9W_WIDTH)


BLOCK16W_STRIDE = 48  # uniques per kv128 row step
BLOCK16W_WIDTH = 64  # key (and start) lanes per kv128 row


def build_block16w_tables(uniq: np.ndarray, uniq_start: np.ndarray,
                          bucket_start: np.ndarray):
    """'block16w' layout: block16's lookup for big shards (max bucket
    9..16 at the directory cap — the > ~1.1 Gbp/shard regime where
    block9p's 27-bit packed start no longer fits) in ONE [R, 128] uint32
    row gather instead of two kv32 rows, at 10.7 B/unique instead of 16.

    Rows advance BLOCK16W_STRIDE=48 uniques carrying BLOCK16W_WIDTH=64
    (keys | raw uniq_start values). Coverage: r0 = lo // 48 puts the
    bucket's first entry at in-row offset <= 47; its last entry at
    <= 47 + 15 = 62 and the successor start (block16's count derivation)
    at <= 63. Same match/rank semantics as block16: no upper-bound test
    (equal keys cannot exist outside the query's own radix bucket)."""
    U = len(uniq)
    rows_k = U // BLOCK16W_STRIDE + 3
    flat_len = rows_k * BLOCK16W_STRIDE + BLOCK16W_WIDTH
    keys_flat = np.full(flat_len, U32_MAX, np.uint32)
    keys_flat[:U] = uniq
    starts_flat = np.full(flat_len, np.uint32(uniq_start[-1]), np.uint32)
    starts_flat[: len(uniq_start)] = uniq_start.astype(np.uint32)
    kv128 = _rewindow_wide(keys_flat, starts_flat, rows_k,
                           BLOCK16W_STRIDE, BLOCK16W_WIDTH)
    lo = bucket_start[:-1].astype(np.uint32)
    cnt = np.minimum(
        (bucket_start[1:] - bucket_start[:-1]).astype(np.uint32),
        np.uint32(15),
    )
    dir_packed = lo | (cnt << np.uint32(28))
    return kv128, dir_packed


def _rewindow_wide(keys_flat: np.ndarray, vals_flat: np.ndarray,
                   rows_k: int, stride: int, width: int) -> np.ndarray:
    """Window padded flat (key, value) planes into wide [R, 2*width] rows
    (stride/width views — no index materialization)."""
    out = np.empty((rows_k, 2 * width), np.uint32)
    win_k = np.lib.stride_tricks.sliding_window_view(keys_flat, width)
    win_v = np.lib.stride_tricks.sliding_window_view(vals_flat, width)
    out[:, :width] = win_k[: rows_k * stride : stride]
    out[:, width:] = win_v[: rows_k * stride : stride]
    return out


def block16_rows_to_16w(kv32: np.ndarray) -> np.ndarray:
    """Convert cached block16 rows (build_block_tables layout) to block16w
    without the uniq tables: block rows advance 8 uniques carrying 16, so
    lanes [:8] / [16:24] are the contiguous flat key/start planes."""
    keys_flat = np.ascontiguousarray(kv32[:, :8]).reshape(-1)
    starts_flat = np.ascontiguousarray(kv32[:, 16:24]).reshape(-1)
    n = len(keys_flat)
    rows_k = n // BLOCK16W_STRIDE + 1
    need = rows_k * BLOCK16W_STRIDE + BLOCK16W_WIDTH
    keys_flat = np.concatenate(
        [keys_flat, np.full(need - n, U32_MAX, np.uint32)]
    )
    starts_flat = np.concatenate(
        [starts_flat, np.full(need - n, starts_flat[-1], np.uint32)]
    )
    return _rewindow_wide(keys_flat, starts_flat, rows_k,
                          BLOCK16W_STRIDE, BLOCK16W_WIDTH)


def block9p_rows_to_9w(kv32: np.ndarray) -> np.ndarray:
    """Convert cached block9p rows to the block9w layout without the uniq
    tables (disk caches keep the v4 block9p format; the diet happens at
    upload). block9p row r carries uniques [8r, 8r+16), so lanes [:8] /
    [16:24] of each row are exactly the contiguous flat key/value planes."""
    keys_flat = np.ascontiguousarray(kv32[:, :8]).reshape(-1)
    packed_flat = np.ascontiguousarray(kv32[:, 16:24]).reshape(-1)
    n = len(keys_flat)
    rows_k = n // BLOCK9W_STRIDE + 1
    need = rows_k * BLOCK9W_STRIDE + BLOCK9W_WIDTH
    # extend with block9p's own pad convention (pad keys U32_MAX; pad
    # values inherit the last entry's "past everything" rank)
    keys_flat = np.concatenate(
        [keys_flat, np.full(need - n, U32_MAX, np.uint32)]
    )
    packed_flat = np.concatenate(
        [packed_flat,
         np.full(need - n, packed_flat[-1] & ~np.uint32(31), np.uint32)]
    )
    return _rewindow_block9w(keys_flat, packed_flat, rows_k)


def pack_gpos(pair: np.ndarray, n_contigs: int):
    """Pack the hit table's (seqid, wpos) rows into single uint32 global
    positions gp = seqid << wb | wpos — half the HBM of pair_byhash, ONE
    sort operand in the expansion's (seqid, wpos) hit sort, and the same
    single-lane gather cost. Returns (gpos [M] uint32, wb) or (None, 0)
    when the shard's (contig count, max position) don't fit 32 bits (the
    many-contig fallback keeps pair_byhash). wb is sized so the padding
    sentinel 0xFFFFFFFF exceeds every real gp (seqid <= 2^(32-wb) - 2)."""
    if pair.size == 0:
        return None, 0
    max_pos = int(pair[:, 1].max(initial=0))
    wb = max(1, int(np.ceil(np.log2(max_pos + 2))))
    if n_contigs > (1 << (32 - wb)) - 1:
        return None, 0
    gp = (
        (pair[:, 0].astype(np.int64) << wb) | pair[:, 1].astype(np.int64)
    ).astype(np.uint32)
    return gp, wb


def finalize_lookup_tables(uniq, uniq_start, bucket_start, freq_threshold):
    """Pick the lookup mode for built uniq tables and materialize the block
    tables; returns (mode, uniq, uniq_start, bucket_start, kv32,
    dir_packed) with dead tables shrunk to dummies (shared by
    DeviceShard.host_tables and cache-migration tooling)."""
    max_bucket = int(np.max(np.diff(bucket_start))) if len(uniq) else 0
    mode = "bisect"
    if len(uniq) <= LOOKUP_U_CAP:
        if max_bucket <= LOOKUP_KMAX:
            mode = "block8"
        elif (max_bucket <= 9
              and int(uniq_start[-1]) < BLOCK9P_START_CAP
              and 0 < freq_threshold <= BLOCK9P_COUNT_CAP):
            mode = "block9p"
        elif max_bucket <= 2 * LOOKUP_KMAX:
            mode = "block16"
    if mode == "block9p":
        kv32, dir_packed = build_block9p_tables(uniq, uniq_start, bucket_start)
    elif mode != "bisect":
        kv32, dir_packed = build_block_tables(uniq, uniq_start, bucket_start)
    if mode != "bisect":
        # the bisect tables are dead in block modes; don't ship them to HBM
        uniq = np.zeros(1, np.uint32)
        uniq_start = np.zeros(2, np.int32)
        bucket_start = np.zeros(2, np.int32)
    else:
        kv32 = np.zeros((1, 32), np.uint32)
        dir_packed = np.zeros(1, np.uint32)
    return mode, uniq, uniq_start, bucket_start, kv32, dir_packed


@dataclass(frozen=True)
class MapKernelConfig:
    kmer_size: int
    window_size: int
    read_len_max: int  # padded read length
    sketch_max: int  # max unique sketch hashes per read
    hits_max: int  # max L1 hits per read
    cands_max: int  # max candidate regions per read
    range_max: int  # max minimizer occurrences per L2 candidate range
    alphabet_size: int = 4
    l2_chunk: int = 8  # candidates scored concurrently in stage C
    l2_slab: int = 32  # fixed candidate-slab size (compiled shape)
    l2_matmul: bool = False  # legacy flag: selects 'matmul' when l2_impl empty
    l2_impl: str = ""  # 'pallas' | 'scatter' | 'matmul' ('' -> from l2_matmul)
    l2_interpret: bool = False  # pallas interpreter mode (CPU testing)
    # matmul-path shape trims (0 = untrimmed). sketch_cols caps the scored
    # query-rank columns (exact when every slab read has s <= sketch_cols);
    # event_cap compacts dead chain-event columns (exact when live events
    # fit, else the candidate is flagged for host fallback)
    sketch_cols: int = 0
    event_cap: int = 0

    @property
    def l2_path(self) -> str:
        return self.l2_impl or ("matmul" if self.l2_matmul else "scatter")

    @classmethod
    def for_read_len(cls, read_len_max: int, k: int, w: int, alphabet_size: int = 4,
                     l2_impl: str = None):
        """Shape heuristics from the winnowing density 2/(w+1). The L2
        compute path defaults to the Pallas event-sweep kernel on
        accelerators and scatter+cumsum on CPU (XLA TPU scatter serializes
        updates; the [P,E]x[E,S] matmul does O(P*E*S) work)."""
        if l2_impl is None:
            import jax

            on_accel = jax.default_backend() in ("tpu", "axon", "gpu")
            # measured on TPU v5e (K=54 slab, R=1792, sc=1024): lockstep
            # pallas sweep 0.145 ms/cand < matmul 0.235 < scatter (worse);
            # the gap widens with range (sweep is O(E*S), matmul O(R^2*S)).
            # On CPU the scatter path wins by a wide margin
            l2_impl = "pallas" if on_accel else "scatter"
        n_min = int(2.5 * read_len_max / (w + 1)) + 64
        return cls(
            kmer_size=k,
            window_size=w,
            read_len_max=read_len_max,
            sketch_max=_round_up(n_min, 128),
            hits_max=_round_up(max(4 * n_min, 2048), 128),
            cands_max=16,
            # merged L1 regions can span ~2x the read length and the L2
            # content window extends another read length, so a candidate
            # range can hold ~3x the per-read-length minimizer count
            range_max=_round_up(3 * n_min + 128, 128),
            alphabet_size=alphabet_size,
            l2_impl=l2_impl,
        )


def _round_up(x, m):
    return (x + m - 1) // m * m


HROW_STRAND_BIT = 30  # hs32 packs (hrow | strand_plus << 30)
HROW_MASK = (1 << HROW_STRAND_BIT) - 1
HROW_PAD = np.int32(2**31 - 1) // 4  # decodes to a huge hrow, strand -1


def pack_hrow_strand(hrow: np.ndarray, strand: np.ndarray) -> np.ndarray:
    """Pack the per-entry strand sign into hrow's spare top bits (hrow <=
    M <= 2^28 < 2^30): one hs32 plane instead of two. Decode on device:
    hrow = v & HROW_MASK, strand = (v >> 30 & 1) * 2 - 1."""
    assert int(hrow.max(initial=0)) < (1 << HROW_STRAND_BIT)
    return (
        hrow.astype(np.int32)
        | ((strand.astype(np.int32) > 0).astype(np.int32) << HROW_STRAND_BIT)
    )


def build_chain_tables(wpos: np.ndarray, hash_pos: np.ndarray,
                       contig_offsets: np.ndarray):
    """Host-side same-hash chain links over the position-sorted index.

    For entry g (within its contig), with p = previous occurrence of the
    same hash in the same contig and r = the next one:

    - ``prev_w_same[g]`` = wpos[p] (INT32_MIN if none) — within a candidate
      window [beg0, last_end), "p is in the window" is exactly
      prev_w_same[g] >= wpos[beg0] because wpos is strictly increasing per
      contig;
    - ``chain_b[g]``     = wpos[p+1] - 1, p's activation-interval end (the
      position-sorted successor of p is always <= g, hence in-window and
      in-contig whenever g is);
    - ``next_w_same[g]`` = wpos[r] (INT32_MAX if none).

    These three arrays let the L2 event construction resolve the reference's
    duplicate-minimizer semantics (slidingMap.hpp wposR-revision — a hash is
    active over the union of its occurrences' intervals) with contiguous
    slices instead of a per-candidate hash sort."""
    M = len(wpos)
    wpos = np.asarray(wpos, np.int64)
    n_contigs = len(contig_offsets) - 1
    cid = np.repeat(np.arange(n_contigs, dtype=np.int64),
                    np.diff(np.asarray(contig_offsets, np.int64)))
    # stable sort on ONE packed (cid, hash) uint64 key: ties keep position
    # order (== lexsort((arange, hash, cid))), at a third of the radix
    # passes of the three-key lexsort
    key = (cid.astype(np.uint64) << np.uint64(32)) | np.asarray(
        hash_pos, np.uint32
    ).astype(np.uint64)
    order = np.argsort(key, kind="stable")
    same = (cid[order[1:]] == cid[order[:-1]]) & (
        np.asarray(hash_pos)[order[1:]] == np.asarray(hash_pos)[order[:-1]]
    )
    prev_idx = np.full(M, -1, np.int64)
    prev_idx[order[1:][same]] = order[:-1][same]
    next_idx = np.full(M, -1, np.int64)
    next_idx[order[:-1][same]] = order[1:][same]
    has_p = prev_idx >= 0
    has_n = next_idx >= 0
    prev_w_same = np.full(M, np.iinfo(np.int32).min, np.int32)
    prev_w_same[has_p] = wpos[prev_idx[has_p]]
    chain_b = np.full(M, -2, np.int32)
    if M:
        chain_b[has_p] = wpos[np.minimum(prev_idx[has_p] + 1, M - 1)] - 1
    next_w_same = np.full(M, np.iinfo(np.int32).max, np.int32)
    next_w_same[has_n] = wpos[next_idx[has_n]]
    return prev_w_same, chain_b, next_w_same


CHAIN_U16_MAX = np.uint16(65535)  # chain-delta clamp / "none or far" sentinel


def build_chain_deltas(wpos: np.ndarray, hash_pos: np.ndarray,
                       contig_offsets: np.ndarray):
    """Same-hash chain links as clamped 16-bit position DELTAS — 6 B/entry
    where the absolute-position tables (build_chain_tables) cost 12.

    For entry g with same-hash previous occurrence p / next occurrence r in
    the same contig:

    - ``gap_prev[g]``  = wpos[g] - wpos[p+1]  (p's activation-interval gap);
    - ``delta_pw[g]``  = wpos[g] - wpos[p];
    - ``delta_nw[g]``  = wpos[r] - wpos[g];

    each clamped to 65535, which doubles as the "no link" sentinel. The
    clamp is EXACT for every decision the L2 setup makes, for any read
    bucket up to 65536 bp, because each field is only consulted under a
    gate bounded by L - 2 + max_step where L <= 65506 and max_step (the
    largest adjacent-minimizer gap, <= w+1 by the winnowing density
    guarantee) is tiny — see _make_candidate_setup_pos. Returns
    ([3, M] uint16, max_step); callers must verify
    L_max + max_step + 2 <= 65535 for each read bucket they enable
    (JaxMapperEngine routes larger buckets to the host oracle)."""
    prev_w, chain_b, next_w = build_chain_tables(wpos, hash_pos,
                                                 contig_offsets)
    wpos = np.asarray(wpos, np.int64)
    has_p = prev_w != np.iinfo(np.int32).min
    has_n = next_w != np.iinfo(np.int32).max
    gap_prev = np.where(
        has_p, np.clip(wpos - chain_b.astype(np.int64) - 1, 0, 65535), 65535
    ).astype(np.uint16)
    delta_pw = np.where(
        has_p, np.clip(wpos - prev_w.astype(np.int64), 0, 65535), 65535
    ).astype(np.uint16)
    delta_nw = np.where(
        has_n, np.clip(next_w.astype(np.int64) - wpos, 0, 65535), 65535
    ).astype(np.uint16)
    co = np.asarray(contig_offsets, np.int64)
    max_step = 0
    for i in range(len(co) - 1):
        if co[i + 1] - co[i] > 1:
            max_step = max(max_step, int(np.diff(wpos[co[i]:co[i + 1]]).max()))
    return np.stack([gap_prev, delta_pw, delta_nw]), max_step


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "hash_sorted",
        "pair_byhash",
        "wpos",
        "hash_pos",
        "strand_pos",
        "hs32",
        "chains16",
        "contig_offsets",
        "uniq_hash",
        "uniq_start",
        "bucket_start",
        "kv32",
        "dir_packed",
        "gpos",
    ],
    meta_fields=["freq_threshold", "bucket_shift", "bisect_steps",
                 "lookup_mode", "remix_e", "max_step", "gpos_bits"],
)
@dataclass
class DeviceShard:
    """Shard arrays resident on device (HBM); pytree with the frequency
    threshold as static metadata.

    TPU gathers are the scalarized cost of L1 (~6-12 ns per fetched lane,
    but a width-2..8 *aligned row* gather costs about the same as a single
    lane), so the tables are laid out for minimal gather count:

    - ``pair_byhash`` [M, 2]: (seqid, wpos) in hash order — one row gather
      per hit instead of two table gathers;
    - ``kv32``/``dir_packed``: the unique-hash table in packed aligned
      8-blocks (each 32-wide row carries its block and the next, keys and
      starts together; bucket lo + size in one directory word — see
      build_block_tables). The radix directory is sized at build time so
      every bucket holds <= 8 unique hashes (build_uniq_tables), hence a
      bucket's entries all live in one kv32 row and a lookup is 1 directory
      lane gather + 1 packed row gather — no bisection
      (``lookup_mode == 'block8'``). For pathological
      distributions where no directory width under the memory cap achieves
      bucket <= 8 (or > 2^28 unique hashes), ``lookup_mode == 'bisect'``
      falls back to per-bucket binary search over uniq_hash/uniq_start."""

    hash_sorted: jnp.ndarray  # [M] uint32. On the fused accelerator path
    # (block-mode lookup + pallas L2 with the lookup's q_key) this plane is
    # never gathered — it only backs the q_key=None searchsorted fallback
    # and bisect-mode qkey derivation — so drop_cpu_planes uploads a
    # zero-size dummy for block-mode shards
    pair_byhash: jnp.ndarray  # [M, 2] int32: (seqid, wpos) in hash order
    wpos: jnp.ndarray  # [M] int32 (position order) — standalone because the
    # L1/L2 window bisections are dependent-gather loops whose operand must
    # stay a flat contiguous buffer (a pos_tab row slice risks an M-sized
    # copy per dispatch)
    hash_pos: jnp.ndarray  # [M] uint32 (position order). CPU-only plane:
    # consumed by the scatter/matmul L2 paths and the standalone strand-vote
    # merge; the pallas path gets membership from pos_tab's hrow row, so
    # accelerator uploads may pass a zero-size dummy (from_tables
    # drop_cpu_planes=True)
    strand_pos: jnp.ndarray  # [M] int8 (position order; CPU-only, see above)
    hs32: jnp.ndarray  # [M] int32: hrow|strand<<30 in position order (see
    # pack_hrow_strand) — the L2 setup's qrank/membership/strand source
    chains16: jnp.ndarray  # [3, M] uint16: same-hash chain links as clamped
    # position deltas (gap_prev, delta_pw, delta_nw; build_chain_deltas) —
    # 6 B/entry where round-3's absolute-position pos_tab rows cost 12, the
    # core of the 44.7 -> sub-30 B/minimizer device-index diet. The L2
    # setup slices hs32/chains16/wpos windows per candidate (contiguous
    # dynamic slices, not gathers)
    contig_offsets: jnp.ndarray  # [n_contigs+1] int32
    uniq_hash: jnp.ndarray  # [U] uint32 (sorted; dummy in block8 mode)
    uniq_start: jnp.ndarray  # [U+1] int32 (CSR; dummy in block8 mode)
    bucket_start: jnp.ndarray  # [NB+1] int32 (dummy in block8 mode)
    kv32: jnp.ndarray  # [ceil(U/8)+1, 32] uint32 (dummy in bisect mode)
    dir_packed: jnp.ndarray  # [NB] uint32 (dummy in bisect mode)
    freq_threshold: int
    bucket_shift: int  # hash >> shift = bucket id
    bisect_steps: int  # bisection iterations within a bucket (fallback path)
    lookup_mode: str  # 'block8' | 'block9p' | 'block16' | 'bisect'
    remix_e: int = 0  # bucket-key equalizer exponent (0 = raw top bits);
    # see remix_keys_np — minimizer hashes are min-of-w skewed
    max_step: int = 64  # largest adjacent-minimizer position gap in any
    # contig — bounds the chain-delta clamp validity (build_chain_deltas);
    # the engine routes read buckets with L_max + max_step + 2 > 65535 to
    # the host oracle
    gpos: jnp.ndarray = None  # [M] uint32: seqid << gpos_bits | wpos in
    # hash order (pack_gpos) — replaces pair_byhash (half the HBM, one
    # sort operand) when the shard's contig count / max position fit;
    # None (with gpos_bits == 0) keeps the pair_byhash path
    gpos_bits: int = 0  # wpos bit width of the gpos packing (0 = unpacked)

    @classmethod
    def host_tables(cls, shard) -> dict:
        """All derived host-side tables as numpy arrays + scalar metadata —
        the expensive part of :meth:`from_host`, separated so large-index
        builds can disk-cache it (minutes of sorts at 10^8 minimizers)."""
        uniq, uniq_start, bucket_start, shift, steps, remix_e = (
            build_uniq_tables(np.asarray(shard.hash_sorted, dtype=np.uint32))
        )
        mode, uniq, uniq_start, bucket_start, kv32, dir_packed = (
            finalize_lookup_tables(
                uniq, uniq_start, bucket_start, int(shard.freq_threshold)
            )
        )
        pair = np.stack(
            [np.asarray(shard.seqid_byhash, np.int32),
             np.asarray(shard.wpos_byhash, np.int32)], axis=1,
        )
        chains16, max_step = build_chain_deltas(
            np.asarray(shard.wpos), np.asarray(shard.hash_pos_order),
            np.asarray(shard.contig_offsets),
        )
        # hrow: each position-order minimizer's FIRST row in hash-sorted
        # order. With finalize's argsort permutation this is an O(M)
        # run-first scatter (hash_sorted[j] == hash_pos_order[order[j]], so
        # position order[j] gets the start of j's equal-hash run); restored
        # shards without the permutation fall back to the binary search —
        # identical output, ~25x slower at 10^8 minimizers.
        hs_u32 = np.asarray(shard.hash_sorted, np.uint32)
        order = getattr(shard, "hash_order", None)
        if order is not None and order.size == hs_u32.size and hs_u32.size:
            new_run = np.empty(hs_u32.size, np.bool_)
            new_run[0] = True
            np.not_equal(hs_u32[1:], hs_u32[:-1], out=new_run[1:])
            run_first = np.maximum.accumulate(
                np.where(new_run, np.arange(hs_u32.size, dtype=np.int32), 0)
            )
            hrow = np.empty(hs_u32.size, np.int32)
            hrow[order] = run_first
        else:
            hrow = np.searchsorted(
                hs_u32, np.asarray(shard.hash_pos_order, np.uint32),
            ).astype(np.int32)
        return {
            "hash_sorted": np.asarray(shard.hash_sorted),
            "pair_byhash": pair,
            "wpos": np.asarray(shard.wpos),
            "hash_pos": np.asarray(shard.hash_pos_order),
            "strand_pos": np.asarray(shard.strand),
            "hs32": pack_hrow_strand(hrow, np.asarray(shard.strand)),
            "chains16": chains16,
            "contig_offsets": shard.contig_offsets.astype(np.int32),
            "uniq_hash": uniq,
            "uniq_start": uniq_start,
            "bucket_start": bucket_start,
            "kv32": kv32,
            "dir_packed": dir_packed,
            "freq_threshold": np.int64(shard.freq_threshold),
            "bucket_shift": np.int64(shift),
            "bisect_steps": np.int64(steps),
            "lookup_mode": np.array(mode),
            "remix_e": np.int64(remix_e),
            "max_step": np.int64(max_step),
        }

    @classmethod
    def from_tables(cls, t: dict, drop_cpu_planes: bool = False) -> "DeviceShard":
        """Upload precomputed :meth:`host_tables` output to device.

        ``drop_cpu_planes=True`` replaces ``hash_pos``/``strand_pos``
        (and, in block modes, ``hash_sorted``) with zero-size dummies —
        correct whenever every kernel traced against the shard uses the
        pallas L2 path (which reads the hs32/chains16 planes instead);
        saves ~9 B/minimizer of HBM AND of host->device transfer (the
        dummies are created device-side, nothing dead is uploaded).
        ``t`` may be the v5 disk-diet dict (bench._rehydrate_tables):
        ``hash_sorted`` absent (re-derived by a values-only sort of
        ``hash_pos`` on the rare paths that read it) and ``gpos`` +
        ``gpos_wb`` pre-packed (used as-is instead of re-packing).

        Two HBM diets apply here (the transforms are cheap strided numpy):

        - block9p kv rows re-window into the block9w layout
          (build_block9w_tables: 16 -> 10.7 B/unique, same one-row-gather
          lookup);
        - pair_byhash packs into the uint32 ``gpos`` plane when the
          shard's contig count / positions fit (pack_gpos: 8 -> 4 B/entry,
          one sort operand in the expansion)."""
        mode = str(t["lookup_mode"])
        arrays = {
            k: jnp.asarray(t[k])
            for k in (
                "wpos", "hs32", "chains16", "contig_offsets",
                "uniq_hash", "uniq_start", "bucket_start", "dir_packed",
            )
        }
        # planes the accelerator path never reads are not uploaded at all
        # (they used to be transferred and then replaced with dummies —
        # ~9 B/minimizer of dead tunnel traffic per device-table swap)
        if drop_cpu_planes:
            arrays["hash_pos"] = jnp.zeros(0, jnp.uint32)
            arrays["strand_pos"] = jnp.zeros(0, jnp.int8)
        else:
            arrays["hash_pos"] = jnp.asarray(t["hash_pos"])
            arrays["strand_pos"] = jnp.asarray(t["strand_pos"])
        if drop_cpu_planes and mode != "bisect":
            # block-mode lookups never touch hash_sorted; the pallas L2
            # gets row-space keys from the lookup stage (q_key)
            arrays["hash_sorted"] = jnp.zeros(0, jnp.uint32)
        elif "hash_sorted" in t:
            arrays["hash_sorted"] = jnp.asarray(t["hash_sorted"])
        else:
            # v5 disk caches omit the plane; it is by definition the
            # sorted hash values (values only — no permutation needed)
            arrays["hash_sorted"] = jnp.asarray(
                np.sort(np.asarray(t["hash_pos"], np.uint32))
            )
        if mode == "block9p":
            arrays["kv32"] = jnp.asarray(
                block9p_rows_to_9w(np.asarray(t["kv32"]))
            )
            mode = "block9w"
        elif mode == "block16":
            arrays["kv32"] = jnp.asarray(
                block16_rows_to_16w(np.asarray(t["kv32"]))
            )
            mode = "block16w"
        else:
            arrays["kv32"] = jnp.asarray(t["kv32"])
        if "gpos" in t and t["gpos"] is not None and int(t.get("gpos_wb", 0)):
            # pre-packed by the cache layer (disk v5 / padded multishard)
            gp, wb = np.asarray(t["gpos"]), int(t["gpos_wb"])
        else:
            pair = np.asarray(t["pair_byhash"])
            gp, wb = pack_gpos(
                pair, int(np.asarray(t["contig_offsets"]).shape[0]) - 1
            )
        if wb:
            arrays["gpos"] = jnp.asarray(gp)
            arrays["pair_byhash"] = jnp.zeros((0, 2), jnp.int32)
        else:
            arrays["gpos"] = None
            arrays["pair_byhash"] = jnp.asarray(t["pair_byhash"])
        return cls(
            **arrays,
            freq_threshold=int(t["freq_threshold"]),
            bucket_shift=int(t["bucket_shift"]),
            bisect_steps=int(t["bisect_steps"]),
            lookup_mode=mode,
            remix_e=int(t["remix_e"]) if "remix_e" in t else 0,
            max_step=int(t["max_step"]) if "max_step" in t else 64,
            gpos_bits=wb,
        )

    @classmethod
    def from_host(cls, shard, drop_cpu_planes: bool = False):
        return cls.from_tables(cls.host_tables(shard),
                               drop_cpu_planes=drop_cpu_planes)

    def hbm_bytes(self) -> int:
        """Total bytes of the device-resident tables (the reference's
        getMemoryOf analog, winSketch.hpp:165)."""
        import jax

        total = 0
        for leaf in jax.tree_util.tree_leaves(self):
            total += leaf.size * leaf.dtype.itemsize
        return total


# ---------------------------------------------------------------------------
# Stage A: batched sketch
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def batch_sketch(cfg: MapKernelConfig, reads, read_lens):
    """reads [B, Lmax] uint8 (right-padded), read_lens [B] int32.

    Returns q_hash [B, S] (sorted unique, padded U32_MAX), q_strand [B, S],
    sketch_size [B], sketch_overflow [B] bool.

    Gather-free: the sort carries the strand as a payload (lax.sort with
    extra operands is a sorting network — no scalarized index gathers), and
    the unique-compaction is a second stable sort by the duplicate mask.
    """
    k, w = cfg.kmer_size, cfg.window_size
    S = cfg.sketch_max
    B = reads.shape[0]

    def one(seq, rlen):
        n_kmers_valid = rlen - k + 1
        emit, h, p, st, m, _ = winnow_dense(seq, k, w, cfg.alphabet_size, n_kmers_valid)
        return jnp.where(emit, h, U32_MAX), st

    key, st = jax.vmap(one)(reads, read_lens)
    nw = key.shape[1]
    # pack the strand into the window-id payload's low bit (wid is distinct
    # per column, so ordering is unchanged) — one fewer operand through the
    # full-width sort
    wid2 = (
        jnp.broadcast_to(
            jnp.arange(nw, dtype=jnp.int32) * 2, (B, nw)
        )
        + (st > 0).astype(jnp.int32)
    )
    # sort by (hash, window pos): first occurrence of each hash leads
    ks, wid2s = jax.lax.sort((key, wid2), dimension=1, num_keys=2)
    sts = jnp.where((wid2s & 1) == 1, jnp.int32(1), jnp.int32(-1))
    uniq = (ks != U32_MAX) & jnp.concatenate(
        [jnp.ones((B, 1), bool), ks[:, 1:] != ks[:, :-1]], axis=1
    )
    n_unique = uniq.sum(axis=1).astype(jnp.int32)
    # the compaction sort's cost scales with its width: the first S unique
    # hashes live in the first 2S sorted columns unless the read is
    # pathologically duplicate-heavy (flagged for host fallback)
    W2 = min(nw, 2 * S)
    if W2 < nw:
        n_uniq_w2 = uniq[:, :W2].sum(axis=1).astype(jnp.int32)
        trunc_ovf = n_uniq_w2 < jnp.minimum(n_unique, S)
        ks, sts, uniq = ks[:, :W2], sts[:, :W2], uniq[:, :W2]
    else:
        trunc_ovf = jnp.zeros((B,), bool)
    # compact unique entries to the front: stable sort by the duplicate mask
    # (preserves hash order among uniques)
    _, ks2, sts2 = jax.lax.sort(
        ((~uniq).astype(jnp.int32), ks, sts),
        dimension=1, num_keys=1, is_stable=True,
    )
    if W2 < S:  # tiny read bucket: fewer windows than sketch slots
        ks2 = jnp.pad(ks2, ((0, 0), (0, S - W2)), constant_values=U32_MAX)
        sts2 = jnp.pad(sts2, ((0, 0), (0, S - W2)))
    slot_valid = jnp.arange(S)[None, :] < n_unique[:, None]
    hs_c = jnp.where(slot_valid, ks2[:, :S], U32_MAX)
    st_c = jnp.where(slot_valid, sts2[:, :S], 0).astype(jnp.int8)
    overflow = (n_unique > S) | trunc_ovf
    return hs_c, st_c, jnp.minimum(n_unique, S), overflow


# ---------------------------------------------------------------------------
# Stage B: batched L1
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def batch_lookup(cfg: MapKernelConfig, shard: DeviceShard, q_hash,
                 freq_threshold=None):
    """Index lookup of every sketch hash: radix directory + aligned 8-block
    probe (1 lane gather + 1 packed 32-wide row gather per query — see
    DeviceShard docstring; 'bisect' mode is the fallback for pathological
    hash distributions). ``freq_threshold`` overrides the shard's static
    threshold with a traced scalar (sharded path).

    Returns (start [B, S] int32, count [B, S] int32, total [B] int32,
    qkey [B, S] int32) — counts zeroed for missing hashes, padded queries,
    and hashes at/above the frequency threshold; ``total`` drives the host's
    H-tier routing of the expansion stage.

    ``qkey`` encodes each sketch hash's ROW-SPACE rank for the L2
    qrank/membership compare: 2 * lower_bound(hash_sorted, qh) + present
    (I32_MAX for padded slots). For an index entry with first row r,
    qkey < 2r+1 iff the sketch hash is strictly smaller, qkey == 2r+1 iff
    equal — so per-occurrence query ranks reduce to integer compares against
    the contiguously sliced ``hrow_pos`` window (no per-candidate sort).
    Unlike count, qkey is NOT frequency-thresholded (sketch membership in
    the sliding map is threshold-independent, slidingMap.hpp init).
    """
    if freq_threshold is not None and shard.lookup_mode in ("block9p",
                                                            "block9w"):
        # block9p stores 5-bit saturated counts (count = min(true, 31)); an
        # override above BLOCK9P_COUNT_CAP would silently KEEP truly
        # frequent entries (true count >= 32 reports 31 < thr). Build-time
        # selection guarantees the static threshold fits (mode selection in
        # build_device_shard); overrides must fit too.
        try:
            conc = int(freq_threshold)
        except (TypeError, jax.errors.TracerIntegerConversionError):
            raise ValueError(
                "block9p lookup does not support traced freq_threshold "
                "overrides (5-bit saturated counts); rebuild the shard "
                "with lookup_mode='block16'/'bisect' for override use"
            )
        if conc > BLOCK9P_COUNT_CAP:
            raise ValueError(
                f"freq_threshold override {conc} exceeds block9p's "
                f"saturated count cap {BLOCK9P_COUNT_CAP}"
            )
    thr = shard.freq_threshold if freq_threshold is None else freq_threshold
    U = shard.uniq_hash.shape[0]
    bkey = remix_keys_jax(q_hash, shard.remix_e)
    b = (bkey >> shard.bucket_shift).astype(jnp.int32)

    if shard.lookup_mode == "block8":
        # one packed directory gather gives (lo, bucket size <= 8); the
        # bucket's two possible 8-blocks arrive in ONE 32-wide row gather
        # (each kv32 row duplicates the next block), so a lookup is 2
        # gathers total
        d = shard.dir_packed[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        hi = lo + (d >> jnp.uint32(28)).astype(jnp.int32)
        r0 = lo >> 3
        row = jnp.take(shard.kv32, r0, axis=0)  # [B, S, 32]
        k16 = row[..., :16]
        s16 = row[..., 16:].astype(jnp.int32)
        g = (r0 << 3)[..., None] + jnp.arange(16, dtype=jnp.int32)
        m = (k16 == q_hash[..., None]) & (g >= lo[..., None]) & (g < hi[..., None])
        found = m.any(axis=-1)
        start = jnp.sum(jnp.where(m, s16, 0), axis=-1).astype(jnp.int32)
        # successor start s[g+1] lives in the same 16 fetched values
        # (g <= 8*r0+14 since hi <= lo+8 <= 8*r0+15)
        nxt = jnp.concatenate([s16[..., 1:], s16[..., :1]], axis=-1)
        count = jnp.sum(jnp.where(m, nxt - s16, 0), axis=-1).astype(jnp.int32)
        # row-space lower bound from the same fetched values: the insertion
        # unique-index is lo + #{bucket keys < qh} (== hi when qh exceeds the
        # bucket — the next bucket's first unique has larger top bits), and
        # its start row is s16 at that offset (always within the 16)
        cnt_lt = jnp.sum(
            ((k16 < q_hash[..., None]) & (g >= lo[..., None]) & (g < hi[..., None])
             ).astype(jnp.int32),
            axis=-1,
        )
        idx16 = lo + cnt_lt - (r0 << 3)
        arow = jnp.sum(
            jnp.where(
                jnp.arange(16, dtype=jnp.int32) == idx16[..., None], s16, 0
            ),
            axis=-1,
        )
    elif shard.lookup_mode == "block9p":
        # single-row mode (see build_block9p_tables): 16 keys + 16 packed
        # (start << 5 | count<=31) words cover any bucket of size <= 9, and
        # per-entry counts make both the match count and the row-space rank
        # successor-free — a lookup is 2 gathers even where block8's
        # successor-start trick would need the next row
        d = shard.dir_packed[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        sz = (d >> jnp.uint32(28)).astype(jnp.int32)
        r0 = lo >> 3
        row = jnp.take(shard.kv32, r0, axis=0)  # [B, S, 32]
        k16 = row[..., :16]
        p16 = row[..., 16:]
        s16 = (p16 >> jnp.uint32(5)).astype(jnp.int32)
        c16 = (p16 & jnp.uint32(BLOCK9P_COUNT_CAP)).astype(jnp.int32)
        g = (r0 << 3)[..., None] + jnp.arange(16, dtype=jnp.int32)
        in_b = (g >= lo[..., None]) & (g < (lo + sz)[..., None])
        m = (k16 == q_hash[..., None]) & in_b
        found = m.any(axis=-1)
        start = jnp.sum(jnp.where(m, s16, 0), axis=-1).astype(jnp.int32)
        count = jnp.sum(jnp.where(m, c16, 0), axis=-1).astype(jnp.int32)
        cnt_lt = jnp.sum(
            ((k16 < q_hash[..., None]) & in_b).astype(jnp.int32), axis=-1
        )
        # rank: the insertion entry s[lo + cnt_lt] when it's inside the
        # bucket (or the empty bucket's own lo, which is the successor's
        # first entry); past a non-empty bucket, last start + stored count
        # — exact when unsaturated, and still strictly between the
        # predecessor's and successor's first rows when saturated, which
        # is all the qkey compare needs (see build_block9p_tables)
        past = (cnt_lt == sz) & (sz > 0)
        idx16 = jnp.where(past, lo + sz - 1, lo + cnt_lt) - (r0 << 3)
        sel = jnp.arange(16, dtype=jnp.int32) == idx16[..., None]
        arow = jnp.sum(
            jnp.where(
                sel, jnp.where(past[..., None], s16 + c16, s16), 0
            ),
            axis=-1,
        )
    elif shard.lookup_mode == "block9w":
        # wide-row variant of block9p (build_block9w_tables): rows advance
        # 24 uniques carrying 32, so any bucket of size <= 9 lives at
        # in-row offsets <= 31 of row lo // 24 — still 2 gathers per
        # lookup at 2/3 the table HBM. Match/count/rank semantics are
        # block9p's with 32-lane windows.
        d = shard.dir_packed[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        sz = (d >> jnp.uint32(28)).astype(jnp.int32)
        r0 = lo // BLOCK9W_STRIDE
        row = jnp.take(shard.kv32, r0, axis=0)  # [B, S, 64]
        k32 = row[..., :BLOCK9W_WIDTH]
        p32 = row[..., BLOCK9W_WIDTH:]
        s32 = (p32 >> jnp.uint32(5)).astype(jnp.int32)
        c32 = (p32 & jnp.uint32(BLOCK9P_COUNT_CAP)).astype(jnp.int32)
        g = (r0 * BLOCK9W_STRIDE)[..., None] + jnp.arange(
            BLOCK9W_WIDTH, dtype=jnp.int32
        )
        in_b = (g >= lo[..., None]) & (g < (lo + sz)[..., None])
        m = (k32 == q_hash[..., None]) & in_b
        found = m.any(axis=-1)
        start = jnp.sum(jnp.where(m, s32, 0), axis=-1).astype(jnp.int32)
        count = jnp.sum(jnp.where(m, c32, 0), axis=-1).astype(jnp.int32)
        cnt_lt = jnp.sum(
            ((k32 < q_hash[..., None]) & in_b).astype(jnp.int32), axis=-1
        )
        past = (cnt_lt == sz) & (sz > 0)
        idx32 = (
            jnp.where(past, lo + sz - 1, lo + cnt_lt) - r0 * BLOCK9W_STRIDE
        )
        sel = jnp.arange(BLOCK9W_WIDTH, dtype=jnp.int32) == idx32[..., None]
        arow = jnp.sum(
            jnp.where(
                sel, jnp.where(past[..., None], s32 + c32, s32), 0
            ),
            axis=-1,
        )
    elif shard.lookup_mode == "block16w":
        # wide-row variant of block16 (build_block16w_tables): one [128]
        # row gather covers any 9..16 bucket plus its successor start.
        d = shard.dir_packed[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        r0 = lo // BLOCK16W_STRIDE
        row = jnp.take(shard.kv32, r0, axis=0)  # [B, S, 128]
        k64 = row[..., :BLOCK16W_WIDTH]
        s64 = row[..., BLOCK16W_WIDTH:].astype(jnp.int32)
        g = (r0 * BLOCK16W_STRIDE)[..., None] + jnp.arange(
            BLOCK16W_WIDTH, dtype=jnp.int32
        )
        in_b = g >= lo[..., None]
        m = (k64 == q_hash[..., None]) & in_b
        found = m.any(axis=-1)
        start = jnp.sum(jnp.where(m, s64, 0), axis=-1).astype(jnp.int32)
        nxt = jnp.concatenate([s64[..., 1:], s64[..., :1]], axis=-1)
        count = jnp.sum(jnp.where(m, nxt - s64, 0), axis=-1).astype(jnp.int32)
        cnt_lt = jnp.sum(
            ((k64 < q_hash[..., None]) & in_b).astype(jnp.int32), axis=-1
        )
        idx64 = lo + cnt_lt - r0 * BLOCK16W_STRIDE
        arow = jnp.sum(
            jnp.where(
                jnp.arange(BLOCK16W_WIDTH, dtype=jnp.int32)
                == idx64[..., None],
                s64, 0,
            ),
            axis=-1,
        )
    elif shard.lookup_mode == "block16":
        # big-index mode (buckets of 9..16 uniques at the capped directory
        # width): rows lo//8 and lo//8+2 give 32 contiguous entries
        # covering any bucket <= 16. No upper-bound test: an equal key
        # cannot live outside the query's own radix bucket, and entries
        # past the bucket belong to later buckets (larger top bits), so
        # they are > q_hash and never perturb the match or the rank count.
        d = shard.dir_packed[b]
        lo = (d & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
        r0 = lo >> 3
        rowA = jnp.take(shard.kv32, r0, axis=0)  # [B, S, 32]
        rowB = jnp.take(shard.kv32, r0 + 2, axis=0)
        k32 = jnp.concatenate([rowA[..., :16], rowB[..., :16]], axis=-1)
        s32 = jnp.concatenate(
            [rowA[..., 16:], rowB[..., 16:]], axis=-1
        ).astype(jnp.int32)
        g = (r0 << 3)[..., None] + jnp.arange(32, dtype=jnp.int32)
        in_b = g >= lo[..., None]
        m = (k32 == q_hash[..., None]) & in_b
        found = m.any(axis=-1)
        start = jnp.sum(jnp.where(m, s32, 0), axis=-1).astype(jnp.int32)
        nxt = jnp.concatenate([s32[..., 1:], s32[..., :1]], axis=-1)
        count = jnp.sum(jnp.where(m, nxt - s32, 0), axis=-1).astype(jnp.int32)
        cnt_lt = jnp.sum(
            ((k32 < q_hash[..., None]) & in_b).astype(jnp.int32), axis=-1
        )
        idx32 = lo + cnt_lt - (r0 << 3)
        arow = jnp.sum(
            jnp.where(
                jnp.arange(32, dtype=jnp.int32) == idx32[..., None], s32, 0
            ),
            axis=-1,
        )
    else:
        lo = shard.bucket_start[b]
        hi = shard.bucket_start[b + 1]

        def bisect_body(_, lh):
            lo_, hi_ = lh
            mid = (lo_ + hi_) // 2
            v = shard.uniq_hash[jnp.minimum(mid, U - 1)]
            go = v < q_hash
            lo2 = jnp.where((lo_ < hi_) & go, mid + 1, lo_)
            hi2 = jnp.where((lo_ < hi_) & ~go, mid, hi_)
            return lo2, hi2

        lo_f, _ = jax.lax.fori_loop(0, shard.bisect_steps, bisect_body, (lo, hi))
        ic = jnp.minimum(lo_f, U - 1)
        found = (lo_f < U) & (shard.uniq_hash[ic] == q_hash)
        start = jnp.where(found, shard.uniq_start[ic], 0).astype(jnp.int32)
        count = jnp.where(
            found, shard.uniq_start[jnp.minimum(ic + 1, U)] - start, 0
        ).astype(jnp.int32)
        arow = shard.uniq_start[jnp.minimum(lo_f, U)].astype(jnp.int32)
    valid_q = q_hash != U32_MAX
    qkey = jnp.where(
        valid_q, 2 * arow + found.astype(jnp.int32), I32_MAX
    ).astype(jnp.int32)
    count = jnp.where(valid_q & found & (count < thr), count, 0)
    return start, count, jnp.sum(count, axis=1, dtype=jnp.int32), qkey


@partial(jax.jit, static_argnames=("cfg",))
def batch_l1_expand(cfg: MapKernelConfig, shard: DeviceShard, start, count,
                    sketch_size, read_lens, minhits_table):
    """Hit expansion + candidate detection for looked-up reads, sized to
    cfg.hits_max — the host routes reads here by their lookup ``total`` so
    the expansion sorts/gathers run at the smallest sufficient H tier.

    Returns (cand_seq, cand_start, cand_end) [B, C] int32 (padded -1),
    n_cands [B], overflow [B] bool.

    TPU formulation (semantically identical to computeL1CandidateRegions,
    computeMap.hpp:346-386, and bit-checked against the serial oracle):

    - CSR hit expansion = a merge-via-sort: run-start markers and hit slots
      are co-sorted, run payloads (table start / CSR offset, both
      nondecreasing) are spread to slots with running maxima, and the slots
      are extracted with one stable sort — no batched searchsorted;
    - the run-of-minimumHits detector selects the (m-1)-shifted neighbor via
      a one-hot sum over static shifts (m <= MINHITS_SHIFT_MAX, else the
      read is flagged for host fallback);
    - overlap-merge bookkeeping uses a segmented running max (contig-id
      segments) instead of index gathers, and the per-region reduction is a
      one-hot masked min/max over the C candidate slots.
    """
    H, C, S = cfg.hits_max, cfg.cands_max, cfg.sketch_max
    B = start.shape[0]

    # ---- CSR expansion to H hit slots via merge-sort ---------------------
    offsets = jnp.cumsum(count, axis=1)
    total = offsets[:, -1]
    overflow = total > H
    prev = offsets - count
    # run markers sort just before their first slot (type key 0 < 1);
    # zero-count runs are pushed past every slot value
    run_val = jnp.where(count > 0, prev, H + 1)
    t = jnp.arange(H, dtype=jnp.int32)
    m_val = jnp.concatenate([run_val, jnp.broadcast_to(t, (B, H))], axis=1)
    m_typ = jnp.concatenate(
        [jnp.zeros((B, S), jnp.int32), jnp.ones((B, H), jnp.int32)], axis=1
    )
    p_start = jnp.concatenate(
        [jnp.where(count > 0, start, -1), jnp.full((B, H), -1, jnp.int32)], axis=1
    )
    p_prev = jnp.concatenate(
        [jnp.where(count > 0, prev, -1), jnp.full((B, H), -1, jnp.int32)], axis=1
    )
    _, styp, ps, pp = jax.lax.sort(
        (m_val, m_typ, p_start, p_prev), dimension=1, num_keys=2
    )
    # spread run payloads to their slots: both are nondecreasing over
    # nonzero runs, so a running max is an exact fill-forward
    fstart = jax.lax.cummax(ps, axis=1)
    fprev = jax.lax.cummax(pp, axis=1)
    # extract slot rows (in slot order) with one stable sort
    _, fstart, fprev = jax.lax.sort(
        (1 - styp, fstart, fprev), dimension=1, num_keys=1, is_stable=True
    )
    fstart, fprev = fstart[:, :H], fprev[:, :H]
    hit_valid = t[None, :] < total[:, None]
    idx = jnp.where(hit_valid, fstart + (t[None, :] - fprev), 0)
    if shard.gpos_bits:
        # packed plane: one u32 lane gather per hit AND one sort operand —
        # gp = seqid << wb | wpos sorts in exactly the (seqid, wpos)
        # lexicographic order (pack_gpos sizes wb so the 0xFFFFFFFF pad
        # exceeds every real gp)
        wb = shard.gpos_bits
        gp = jnp.where(
            hit_valid, jnp.take(shard.gpos, idx), jnp.uint32(0xFFFFFFFF)
        )
        gp = jax.lax.sort(gp, dimension=1)
        pad = gp == jnp.uint32(0xFFFFFFFF)
        h_seq = jnp.where(pad, I32_MAX, (gp >> wb).astype(jnp.int32))
        h_pos = jnp.where(
            pad, I32_MAX,
            (gp & jnp.uint32((1 << wb) - 1)).astype(jnp.int32),
        )
    else:
        pair = jnp.take(shard.pair_byhash, idx, axis=0)  # [B,H,2] row gather
        h_seq = jnp.where(hit_valid, pair[..., 0], I32_MAX)
        h_pos = jnp.where(hit_valid, pair[..., 1], I32_MAX)

        # ---- sort hits by (seqid, wpos) ----------------------------------
        h_seq, h_pos = jax.lax.sort((h_seq, h_pos), dimension=1, num_keys=2)

    # ---- run-of-minimumHits candidate detection --------------------------
    m = jnp.maximum(minhits_table[sketch_size], 1).astype(jnp.int32)  # [B]
    d = m - 1
    m_ovf = d >= MINHITS_SHIFT_MAX
    seq_j = jnp.full((B, H), I32_MAX, jnp.int32)
    pos_j = jnp.full((B, H), I32_MAX, jnp.int32)
    for dd in range(MINHITS_SHIFT_MAX):
        sel = (d == dd)[:, None]
        if dd == 0:
            sj, pj = h_seq, h_pos
        else:
            fill = jnp.full((B, dd), I32_MAX, jnp.int32)
            sj = jnp.concatenate([h_seq[:, dd:], fill], axis=1)
            pj = jnp.concatenate([h_pos[:, dd:], fill], axis=1)
        seq_j = jnp.where(sel, sj, seq_j)
        pos_j = jnp.where(sel, pj, pos_j)
    # I32_MAX padding makes the out-of-range/seq-change checks implicit
    cand = (
        (h_seq != I32_MAX)
        & (seq_j == h_seq)
        & ((pos_j - h_pos) < read_lens[:, None])
    )
    c_start = jnp.maximum(0, pos_j - read_lens[:, None] + 1)
    c_end = h_pos

    # ---- overlap merge via segmented running max -------------------------
    # prev candidate in the same contig has the max c_end so far (hits are
    # (seq,pos)-sorted, so c_end is nondecreasing within a contig run)
    def seg_comb(a, bb):
        sa, va = a
        sb, vb = bb
        return sb, jnp.where(sa == sb, jnp.maximum(va, vb), vb)

    _, seg_max = jax.lax.associative_scan(
        seg_comb, (h_seq, jnp.where(cand, c_end, I32_MIN)), axis=1
    )
    prev_seg = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), h_seq[:, :-1]], axis=1
    )
    prev_end = jnp.concatenate(
        [jnp.full((B, 1), I32_MIN, jnp.int32), seg_max[:, :-1]], axis=1
    )
    merged_into_prev = cand & (prev_seg == h_seq) & (prev_end >= c_start)
    new_region = cand & ~merged_into_prev

    rid = jnp.cumsum(new_region.astype(jnp.int32), axis=1) - 1
    n_regions = jnp.where(cand.any(axis=1), rid[:, -1] + 1, 0)
    region_overflow = n_regions > C

    # ---- per-region reduction: one-hot over the C slots ------------------
    r_seq = jnp.full((B, C), -1, jnp.int32)
    r_start = jnp.zeros((B, C), jnp.int32)
    r_end = jnp.zeros((B, C), jnp.int32)
    for c in range(C):
        mask = cand & (rid == c)
        any_c = mask.any(axis=1)
        r_seq = r_seq.at[:, c].set(
            jnp.where(any_c, jnp.max(jnp.where(mask, h_seq, -1), axis=1), -1)
        )
        r_start = r_start.at[:, c].set(
            jnp.where(
                any_c,
                jnp.min(jnp.where(mask, c_start, I32_MAX), axis=1),
                0,
            )
        )
        r_end = r_end.at[:, c].set(
            jnp.where(any_c, jnp.max(jnp.where(mask, c_end, -1), axis=1), 0)
        )
    n_r = jnp.minimum(n_regions, C).astype(jnp.int32)
    return r_seq, r_start, r_end, n_r, overflow | region_overflow | m_ovf


@partial(jax.jit, static_argnames=("cfg",))
def batch_l1(cfg: MapKernelConfig, shard: DeviceShard, q_hash, sketch_size,
             read_lens, minhits_table, freq_threshold=None):
    """L1 candidate regions per read: lookup + expansion in one dispatch at
    the config's worst-case H (the engine's pipelined path splits the two
    and routes reads to right-sized expansion tiers instead)."""
    start, count, _, _ = batch_lookup(cfg, shard, q_hash, freq_threshold)
    return batch_l1_expand(
        cfg, shard, start, count, sketch_size, read_lens, minhits_table
    )


# ---------------------------------------------------------------------------
# Stage C: batched L2 (event-interval kernel)
# ---------------------------------------------------------------------------


def _bisect_range(arr, lo, hi, val, side_right=False):
    """Binary search for val in sorted arr[lo:hi) with traced bounds.
    ``val`` may be a vector (lo/hi broadcast): independent searches share
    one loop, halving the dependent-gather latency chain per search."""
    val = jnp.asarray(val)
    lo = jnp.broadcast_to(jnp.asarray(lo), val.shape)
    hi = jnp.broadcast_to(jnp.asarray(hi), val.shape)

    def body(_, state):
        lo_, hi_ = state
        mid = (lo_ + hi_) // 2
        v = arr[jnp.minimum(mid, arr.shape[0] - 1)]
        go_right = jnp.where(side_right, v <= val, v < val)
        lo2 = jnp.where((lo_ < hi_) & go_right, mid + 1, lo_)
        hi2 = jnp.where((lo_ < hi_) & ~go_right, mid, hi_)
        return lo2, hi2

    n_iter = int(np.ceil(np.log2(max(2, int(arr.shape[0]) + 1)))) + 1
    lo_f, _ = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo_f


def _make_candidate_setup(cfg: MapKernelConfig, shard: DeviceShard):
    """Event/grid construction for one candidate (scatter / matmul paths).

    Gather-free (TPU gathers are scalarized): the occurrence window is a
    dynamic_slice + realignment roll; the previous-same-hash chain links come
    from a payload-carrying (hash, wpos) sort; query ranks and membership
    come from a merge-via-sort of the (sorted) sketch with the (sorted)
    occurrence hashes. Event ORDER differs from the reference formulation —
    all downstream paths treat events as an unordered sum.

    Slabs are sketch-size-homogeneous: when the caller guarantees every
    read's sketch fits in cfg.sketch_cols, the sketch merge only needs those
    leading columns (real entries are front-compacted, padding sorts last)."""
    k, w = cfg.kmer_size, cfg.window_size
    R = cfg.range_max
    S = cfg.sketch_max
    SC = cfg.sketch_cols or S

    def setup(qh, s, rlen, c_seq, c_start, c_end):
        valid_cand = c_seq >= 0
        c_seq_c = jnp.maximum(c_seq, 0)
        lo = shard.contig_offsets[c_seq_c]
        hi = shard.contig_offsets[c_seq_c + 1]
        L = rlen - (w - 1) - (k - 1)

        beg0 = _bisect_range(shard.wpos, lo, hi, c_start)
        last_end = _bisect_range(shard.wpos, lo, hi, c_end + rlen)
        n_occ = last_end - beg0
        overflow = n_occ > R
        n_occ_c = jnp.minimum(n_occ, R)

        # contiguous occurrence window as a slice (clamped start realigned
        # with a roll) instead of a scalarized [R] gather
        if shard.hash_pos.shape[0] == 0 and shard.wpos.shape[0] > 0:
            raise ValueError(
                "the scatter/matmul L2 paths need the hash_pos plane; this "
                "shard was uploaded with drop_cpu_planes=True (pallas-only)"
            )
        M = shard.wpos.shape[0]
        if M < R:
            wp = jnp.concatenate(
                [shard.wpos, jnp.full(R - M, I32_MAX, shard.wpos.dtype)]
            )
            hp = jnp.concatenate(
                [shard.hash_pos, jnp.full(R - M, U32_MAX, shard.hash_pos.dtype)]
            )
            start2 = jnp.minimum(beg0, 0)
        else:
            wp, hp = shard.wpos, shard.hash_pos
            start2 = jnp.minimum(beg0, M - R)
        shift = beg0 - start2
        occ_v = jnp.arange(R) < n_occ_c
        occ_w = jnp.roll(jax.lax.dynamic_slice(wp, (start2,), (R,)), -shift)
        occ_h = jnp.roll(jax.lax.dynamic_slice(hp, (start2,), (R,)), -shift)
        occ_w = jnp.where(occ_v, occ_w, I32_MAX)
        occ_h = jnp.where(occ_v, occ_h, U32_MAX)

        empty = n_occ_c <= 0
        p0 = jnp.where(empty, 0, occ_w[0])
        w_last = jnp.where(
            empty, -I32_MAX, shard.wpos[jnp.maximum(last_end - 1, 0)]
        )
        p_max = w_last - L

        # activation intervals: a_r = x_r - L + 1, b_r = nextglobal - 1
        next_w = jnp.concatenate([occ_w[1:], jnp.array([I32_MAX])])
        # last valid occurrence: activation capped by p_max anyway
        b_r = jnp.where(occ_v, jnp.minimum(next_w - 1, I32_MAX - 1), -2)
        a_r = jnp.where(occ_v, occ_w - L + 1, -1)

        h_srt, w_srt, b_srt = jax.lax.sort(
            (occ_h, occ_w, b_r), num_keys=2
        )
        a_srt = w_srt - L + 1
        srt_v = occ_v  # same count, sorted to the front
        same_prev = jnp.concatenate(
            [jnp.zeros(1, bool), h_srt[1:] == h_srt[:-1]]
        ) & srt_v
        chain_b = jnp.concatenate([jnp.array([-2], jnp.int32), b_srt[:-1]])
        chain_valid = same_prev & (a_srt <= chain_b)

        # event arrays [E=2R]: R plus-events then R minus-events, both in
        # hash-sorted occurrence order
        ev_a = jnp.concatenate([a_srt, jnp.where(chain_valid, a_srt, 0)])
        ev_b = jnp.concatenate([b_srt, jnp.where(chain_valid, chain_b, -1)])
        ev_sign = jnp.concatenate(
            [
                jnp.where(srt_v, jnp.int8(1), jnp.int8(0)),
                jnp.where(chain_valid, jnp.int8(-1), jnp.int8(0)),
            ]
        )

        # query rank (#sketch hashes < occurrence hash) and membership via a
        # merge of the two sorted lists: occurrence elements sort before
        # equal sketch elements, sketch padding is typed out of both counts
        mval = jnp.concatenate([h_srt, qh[:SC]])
        mtyp = jnp.concatenate(
            [
                jnp.zeros(R, jnp.int32),
                jnp.where(jnp.arange(SC) < s, 1, 2),
            ]
        )
        v_s, t_s = jax.lax.sort((mval, mtyp), num_keys=2)
        isq = (t_s == 1).astype(jnp.int32)
        qrank_m = jnp.cumsum(isq) - isq  # sketch hashes strictly before
        # membership: does my equal-value run contain a sketch element?
        # (the sketch element is last in its run -> backward segmented any)
        def seg_any(aa, bb):
            va, fa = aa
            vb, fb = bb
            return vb, jnp.where(va == vb, jnp.maximum(fa, fb), fb)

        _, anyq_rev = jax.lax.associative_scan(
            seg_any, (v_s[::-1], isq[::-1])
        )
        anyq = anyq_rev[::-1]
        # extract the R occurrence rows (merged order preserves h_srt order)
        _, qrank_h, inq_h = jax.lax.sort(
            (t_s, qrank_m, anyq), num_keys=1, is_stable=True
        )
        qrank = jnp.concatenate([qrank_h[:R], qrank_h[:R]])
        in_q = jnp.concatenate([inq_h[:R] > 0, inq_h[:R] > 0])

        # grid of iterator stops: x_r and x_r - L + 1
        grid = jnp.concatenate([occ_w, a_r])
        grid = jnp.sort(
            jnp.where(jnp.concatenate([occ_v, occ_v]), grid, I32_MAX)
        )
        grid_valid = (grid >= p0) & (grid <= p_max) & (grid != I32_MAX)

        return dict(
            valid_cand=valid_cand, overflow=overflow, beg0=beg0, L=L,
            occ_w=occ_w, grid=grid, grid_valid=grid_valid,
            ev_a=ev_a, ev_b=ev_b, ev_sign=ev_sign, qrank=qrank, in_q=in_q,
            s=s,
        )

    return setup


def _bitonic_merge_sorted(key_x, key_y, pays_x, pays_y):
    """Merge two equally-sized ASCENDING int32 key arrays (with int32
    payload tuples) into one sorted array — a bitonic merge network of
    log2(2R) compare-exchange stages, each expressed as lane rotates +
    selects (no gathers, no reshape relayouts). ~8x fewer stages than a
    full jax.lax.sort of the concatenation.

    Non-power-of-two inputs are padded with I32_MAX keys (zero payloads) for
    the network and truncated back afterwards — valid because the callers'
    I32_MAX-key events all sort last and are interchangeable no-ops."""
    r = int(key_x.shape[0])
    r2 = 1 << (r - 1).bit_length()
    if r2 != r:
        pad_k = jnp.full(r2 - r, I32_MAX, key_x.dtype)
        pad_p = jnp.zeros(r2 - r, jnp.int32)
        key_x = jnp.concatenate([key_x, pad_k])
        key_y = jnp.concatenate([key_y, pad_k])
        pays_x = [jnp.concatenate([p, pad_p]) for p in pays_x]
        pays_y = [jnp.concatenate([p, pad_p]) for p in pays_y]
    n = r2 * 2
    key = jnp.concatenate([key_x, key_y[::-1]])
    pays = [jnp.concatenate([px, py[::-1]]) for px, py in zip(pays_x, pays_y)]
    iota = jnp.arange(n, dtype=jnp.int32)
    d = n // 2
    while d >= 1:
        up_k = jnp.roll(key, -d)
        down_k = jnp.roll(key, d)
        is_lo = (iota & d) == 0  # first half of its 2d block (d = power of 2)
        swap_lo = key > up_k
        swap_hi = down_k > key
        new_key = jnp.where(
            is_lo, jnp.minimum(key, up_k), jnp.maximum(key, down_k)
        )
        new_pays = []
        for p in pays:
            up_p = jnp.roll(p, -d)
            down_p = jnp.roll(p, d)
            new_pays.append(jnp.where(
                is_lo,
                jnp.where(swap_lo, up_p, p),
                jnp.where(swap_hi, down_p, p),
            ))
        key, pays = new_key, new_pays
        d //= 2
    if r2 != r:
        key = key[: 2 * r]
        pays = [p[: 2 * r] for p in pays]
    return key, pays


def _make_candidate_setup_pos(cfg: MapKernelConfig, shard: DeviceShard):
    """Sort-light event construction for the Pallas sweep, in POSITION space.

    Three structural reductions over :func:`_make_candidate_setup`:

    1. **Chain links come from host-precomputed tables** (build_chain_tables)
       sliced contiguously with the occurrence window — no per-candidate
       (hash, wpos) sort.
    2. **Plus and chain events cancel pairwise.** The reference semantics
       (a hash is active over the union of its occurrences' activation
       intervals, slidingMap.hpp) expand to +1 over [a_r, b_r] per
       occurrence and -1 over [a_r, b_p] per overlapping same-hash pair
       p < r. For such a pair the two transitions at a_r cancel and p's
       interval end at b_p+1 hands over to r's net start — so each slot t
       carries at most ONE transition at key a_t (when no overlapping
       predecessor) and ONE at key next_w[t] = b_t + 1 (a removal when no
       overlapping successor). E = 2R total, and BOTH transition families
       are already ascending in t, so the event stream is one bitonic merge
       — no event sort.
    3. **The optimum folds directly over positions.** Every event boundary
       is an iterator stop and occ_w ⊆ stops, so clamping segments to
       [p0, p_max] and decoding with "largest occurrence <= p" reproduces
       the grid-row fold (computeMap.hpp:509-537 tie rules) exactly,
       without materializing grid ranks.
    4. **Query ranks and membership are row-space compares, not a sort.**
       The lookup stage already computed, per sketch slot, qkey =
       2*lower_bound(hash_sorted, qh) + present (see batch_lookup); the
       occurrence side's first-row table hrow_pos slices contiguously with
       the window. qrank(occ) = #{qkey < 2*hrow+1} and membership =
       any(qkey == 2*hrow+1) — one [R, SC] broadcast compare-reduce on the
       VPU replaces the two (R+SC)-wide payload sorts per candidate.
    """
    k, w = cfg.kmer_size, cfg.window_size
    R = cfg.range_max
    S = cfg.sketch_max
    SC = cfg.sketch_cols or S

    def setup(qk, s, rlen, c_seq, c_start, c_end):
        valid_cand = c_seq >= 0
        c_seq_c = jnp.maximum(c_seq, 0)
        lo = shard.contig_offsets[c_seq_c]
        hi = shard.contig_offsets[c_seq_c + 1]
        L = rlen - (w - 1) - (k - 1)

        # both window bounds in ONE bisection loop (the loop body is a
        # dependent gather chain; stacking halves its length)
        bounds = _bisect_range(
            shard.wpos, lo, hi, jnp.stack([c_start, c_end + rlen])
        )
        beg0, last_end = bounds[0], bounds[1]
        n_occ = last_end - beg0
        overflow = n_occ > R
        n_occ_c = jnp.minimum(n_occ, R)
        occ_v = jnp.arange(R) < n_occ_c

        M = shard.wpos.shape[0]

        # three contiguous window slices + realignment rolls fetch the whole
        # occurrence state: wpos [R] i32, hrow|strand [R] i32, chain deltas
        # [3, R] u16 (16 B/entry total vs round-3's 24 — the chain links are
        # clamped deltas, build_chain_deltas)
        wp, hs, ch = shard.wpos, shard.hs32, shard.chains16
        if M < R:
            wp = jnp.concatenate([wp, jnp.full(R - M, I32_MAX, jnp.int32)])
            hs = jnp.concatenate([hs, jnp.full(R - M, HROW_PAD, jnp.int32)])
            ch = jnp.concatenate(
                [ch, jnp.full((3, R - M), CHAIN_U16_MAX, jnp.uint16)], axis=1
            )
            start2 = jnp.minimum(beg0, 0)
        else:
            start2 = jnp.minimum(beg0, M - R)
        shift = beg0 - start2
        occ_w_raw = jnp.roll(
            jax.lax.dynamic_slice(wp, (start2,), (R,)), -shift
        )
        hsl = jnp.roll(jax.lax.dynamic_slice(hs, (start2,), (R,)), -shift)
        chl = jnp.roll(
            jax.lax.dynamic_slice(ch, (0, start2), (3, R)), -shift, axis=1
        ).astype(jnp.int32)
        occ_w = jnp.where(occ_v, occ_w_raw, I32_MAX)
        occ_hrow = hsl & HROW_MASK
        occ_strand = ((hsl >> HROW_STRAND_BIT) & 1) * 2 - 1
        gap_prev, delta_pw, delta_nw = chl[0], chl[1], chl[2]

        empty = n_occ_c <= 0
        p0 = jnp.where(empty, 0, occ_w[0])
        w_last = shard.wpos[jnp.maximum(last_end - 1, 0)]
        p_max = jnp.where(empty, -1, w_last - L)

        next_w = jnp.concatenate([occ_w[1:], jnp.array([I32_MAX])])
        a_t = occ_w - L + 1

        # query rank (#sketch hashes < occurrence hash) and membership as a
        # row-space broadcast compare against the lookup-stage qkey (padded
        # slots are I32_MAX and never count); XLA fuses the [R, SC] compare
        # into the reduction — nothing is materialized
        v_occ = 2 * occ_hrow[:, None] + 1  # [R, 1]
        qk_c = qk[None, :SC]  # [1, SC]
        qrank = jnp.sum((qk_c < v_occ).astype(jnp.int32), axis=1)
        in_q = (qk_c == v_occ).any(axis=1)

        # the two transition families (both ascending in t):
        #   X at a_t: +base, unless an overlapping same-hash predecessor
        #   exists in the window (chain start cancels it);
        #   Y at next_w[t] = b_t + 1: -base, unless an overlapping same-hash
        #   successor exists (handover — the successor's net start).
        # Expressed over the clamped 16-bit deltas (build_chain_deltas):
        #   overlap with predecessor p:  a_t <= b_p    <=> gap_prev <= L - 2
        #   p in window:                 wpos[p] >= p0 <=> occ_w - delta_pw >= p0
        #   overlap with successor r:    a_r <= b_t    <=> delta_nw <= next_w - occ_w + L - 2
        #   r in window:                 wpos[r] <= w_last <=> occ_w + delta_nw <= w_last
        # Clamp-exactness: each delta is consulted only under a gate bounded
        # by L - 2 (+ max_step), which the engine keeps < 65535 per bucket —
        # the 65535 sentinel/"far" value then always fails the gate. For the
        # window's LAST entry next_w is I32_MAX so the overlap gate passes
        # vacuously, but occ_w == w_last makes the in-window test fail.
        base = jnp.where(in_q, jnp.int32(2), jnp.int32(1))
        chain_prev_ok = (
            occ_v & (gap_prev <= L - 2) & (occ_w_raw - delta_pw >= p0)
        )
        # (the step term is clamped before adding L so the last entry's
        # next_w = I32_MAX cannot overflow int32)
        chain_next_ok = (
            occ_v & (occ_w_raw + delta_nw <= w_last)
            & (delta_nw
               <= jnp.minimum(next_w - occ_w_raw, 1 << 20) + L - 2)
        )
        x_key = jnp.where(occ_v, a_t, I32_MAX)
        x_sign = jnp.where(occ_v & ~chain_prev_ok, base, 0)
        y_key = next_w
        y_sign = jnp.where(occ_v & ~chain_next_ok, -base, 0)

        ev_key, (ev_sign, ev_qrank) = _bitonic_merge_sorted(
            x_key, y_key, (x_sign, qrank), (y_sign, qrank)
        )
        n_ev = jnp.sum(ev_key != I32_MAX, dtype=jnp.int32)

        return dict(
            valid_cand=valid_cand, overflow=overflow, beg0=beg0, L=L,
            occ_w=occ_w, p0=p0, p_max=p_max, s=s, n_ev=n_ev,
            ev_key=ev_key, ev_sign=ev_sign, ev_qrank=ev_qrank,
            occ_hrow=occ_hrow, occ_dnw=delta_nw, occ_strand=occ_strand,
        )

    return setup


def _finish_candidate(cfg: MapKernelConfig, st, shared_p):
    """Optimum extraction from per-grid-row shared counts (the reference's
    first/last-maximum mean-position and tie rules)."""
    P = 2 * cfg.range_max
    grid, occ_w = st["grid"], st["occ_w"]
    shared_p = jnp.where(st["grid_valid"], shared_p, -1)
    best = jnp.max(shared_p)
    has_best = (best > 0) & st["valid_cand"]
    first_i = jnp.argmax(shared_p)
    last_i = P - 1 - jnp.argmax(shared_p[::-1])
    first_p = grid[first_i]
    last_p = grid[last_i]

    def rec_pos(p):
        # x_beg(p) = largest occurrence wpos <= p
        ii = jnp.searchsorted(occ_w, p, side="right") - 1
        return occ_w[jnp.maximum(ii, 0)]

    begin_opt = rec_pos(first_p)
    last_opt = rec_pos(last_p)
    mean_pos = jnp.where(has_best, (begin_opt + last_opt) // 2, 0)
    # optimal map range of the first maximal state (for strand votes)
    ob = st["beg0"] + jnp.maximum(
        jnp.searchsorted(occ_w, first_p, side="right") - 1, 0
    )
    oe = st["beg0"] + jnp.searchsorted(occ_w, first_p + st["L"], side="left")
    return (
        jnp.where(has_best, best, 0),
        mean_pos,
        jnp.where(has_best, ob, 0),
        jnp.where(has_best, oe, 0),
        st["overflow"] & st["valid_cand"],
    )


def _make_l2_one(cfg: MapKernelConfig, shard: DeviceShard):
    """Per-candidate L2 scorer (scatter / matmul paths)."""
    S = cfg.sketch_max
    P = 2 * cfg.range_max
    setup_fn = _make_candidate_setup(cfg, shard)

    def one(qh, s, rlen, c_seq, c_start, c_end):
        st = setup_fn(qh, s, rlen, c_seq, c_start, c_end)
        ev_a, ev_b = st["ev_a"], st["ev_b"]
        ev_sign, qrank, in_q = st["ev_sign"], st["qrank"], st["in_q"]
        grid = st["grid"]

        SC = cfg.sketch_cols or S
        jj = jnp.arange(SC, dtype=jnp.int32)
        if cfg.l2_path == "matmul":
            # MXU path: activation matrix [P, E] int8 against event-column
            # matrices [E, 2*SC]; one int8 matmul with int32 accumulation.
            ev_overflow = jnp.bool_(False)
            if cfg.event_cap and cfg.event_cap < ev_a.shape[0]:
                # compact dead (padding / invalid-chain) event columns away:
                # sort by liveness carrying the event fields, keep event_cap
                dead = (ev_sign == 0).astype(jnp.int32)
                n_live = ev_a.shape[0] - dead.sum()
                ev_overflow = n_live > cfg.event_cap
                _, ev_a, ev_b, sgn32, qrank, inq32 = jax.lax.sort(
                    (dead, ev_a, ev_b, ev_sign.astype(jnp.int32), qrank,
                     in_q.astype(jnp.int32)),
                    num_keys=1, is_stable=True,
                )
                ev_a = ev_a[: cfg.event_cap]
                ev_b = ev_b[: cfg.event_cap]
                ev_sign = sgn32[: cfg.event_cap].astype(jnp.int8)
                qrank = qrank[: cfg.event_cap]
                in_q = inq32[: cfg.event_cap].astype(bool)
            act = (grid[:, None] >= ev_a[None, :]) & (grid[:, None] <= ev_b[None, :])
            a_mat = jnp.where(act, ev_sign[None, :], jnp.int8(0))
            ref_le = ((~in_q)[:, None] & (qrank[:, None] <= jj[None, :])).astype(jnp.int8)
            inq_eq = (in_q[:, None] & (qrank[:, None] == jj[None, :])).astype(jnp.int8)
            b_mat = jnp.concatenate([ref_le, inq_eq], axis=1)
            cm = jax.lax.dot_general(
                a_mat,
                b_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            c_cnt = cm[:, :SC]
            m_ind = cm[:, SC:]
            st["overflow"] = st["overflow"] | ev_overflow
        else:
            # scatter + 2D-cumsum path, O(P*S + E): events become +-sign
            # entries in difference arrays over (grid row, query rank).
            row_a = jnp.searchsorted(grid, ev_a, side="left").astype(jnp.int32)
            row_end = jnp.searchsorted(grid, ev_b, side="right").astype(jnp.int32)
            sgn = ev_sign.astype(jnp.int32)
            live = ev_sign != 0
            refonly = live & ~in_q
            inq_ev = live & in_q
            qcol = jnp.minimum(qrank, S)  # col S = "above all query hashes"
            d = jnp.zeros((P + 1, S + 1), jnp.int32)
            d = d.at[row_a, qcol].add(jnp.where(refonly, sgn, 0))
            d = d.at[row_end, qcol].add(jnp.where(refonly, -sgn, 0))
            g = jnp.cumsum(d[:P], axis=0)
            c_cnt = jnp.cumsum(g, axis=1)[:, :SC]
            dm = jnp.zeros((P + 1, S + 1), jnp.int32)
            dm = dm.at[row_a, qcol].add(jnp.where(inq_ev, sgn, 0))
            dm = dm.at[row_end, qcol].add(jnp.where(inq_ev, -sgn, 0))
            m_ind = jnp.cumsum(dm[:P], axis=0)[:, :SC]

        below = (jj[None, :] + c_cnt) < s
        shared_p = jnp.sum(
            jnp.where(below & (m_ind > 0), 1, 0), axis=1, dtype=jnp.int32
        )
        return _finish_candidate(cfg, st, shared_p)

    return one


def _l2_pallas_batch(cfg: MapKernelConfig, shard: DeviceShard, q_key,
                     sketch_size, read_lens, cand_seq, cand_start, cand_end,
                     q_strand=None):
    """Pallas event-sweep path over a whole candidate batch: event
    construction stays in XLA (vmapped, sort-light — see
    _make_candidate_setup_pos); the O(E*S) lockstep sweep + optimum fold run
    as one pallas_call over the slab, directly in position space.

    With ``q_strand`` [N, S] int8 given, strand votes over each candidate's
    optimal map range are computed here too (row-space compares against the
    already-sliced occurrence window — no extra slice/sorts; see finish) and
    a sixth output is returned."""
    from .l2_pallas import l2_event_sweep_batch

    S = cfg.sketch_max
    SC = cfg.sketch_cols or S
    setup_fn = _make_candidate_setup_pos(cfg, shard)
    st = jax.vmap(setup_fn)(q_key, sketch_size, read_lens,
                            cand_seq, cand_start, cand_end)

    meta = jnp.stack(
        [sketch_size.astype(jnp.int32), st["p0"], st["p_max"], st["n_ev"]],
        axis=1,
    )
    qrank_s = jnp.minimum(st["ev_qrank"], SC)

    sp = _round_up(SC + 1, 128)
    out = l2_event_sweep_batch(meta, qrank_s, st["ev_sign"], st["ev_key"], sp,
                               interpret=cfg.l2_interpret)
    best = out[:, 0]
    first_p = out[:, 1]  # positions (the fold runs in position space)
    last_p = out[:, 2]

    R = cfg.range_max
    with_votes = q_strand is not None

    def finish(stt, qk_row, qs_row, s, b, fp, lp):
        occ_w = stt["occ_w"]
        has_best = (b > 0) & stt["valid_cand"]

        def rec_pos(p):
            # largest occurrence <= p (clamped to the first), as compare
            # reductions — a vmapped searchsorted is scalarized gathers
            return jnp.maximum(
                jnp.max(jnp.where(occ_w <= p, occ_w, I32_MIN)), occ_w[0]
            )

        mean_pos = jnp.where(
            has_best, (rec_pos(fp) + rec_pos(lp)) // 2, 0
        )
        ob = stt["beg0"] + jnp.maximum(
            jnp.sum((occ_w <= fp).astype(jnp.int32)) - 1, 0
        )
        oe = stt["beg0"] + jnp.sum((occ_w < fp + stt["L"]).astype(jnp.int32))
        ob = jnp.where(has_best, ob, 0)
        oe = jnp.where(has_best, oe, 0)
        res = (
            jnp.where(has_best, b, 0),
            mean_pos,
            ob,
            oe,
            stt["overflow"] & stt["valid_cand"],
        )
        if not with_votes:
            return res

        # strand votes over the optimal map range [ob, oe), entirely in row
        # space on the window already sliced by setup (computeStatistics
        # parity, slidingMap.hpp:232-254; host spec mapper_oracle
        # ._strand_votes). Per distinct window hash the voting ref strand is
        # the LAST position-order occurrence: rows with no same-hash
        # successor inside the range (next_w_same > last window position).
        # Query-side ranks come from the same 2*hrow+1 row-space compares as
        # the setup's qrank (the sketch is sorted, so "commons with smaller
        # hash" is a prefix count over slots).
        r_abs = stt["beg0"] + jnp.arange(R, dtype=jnp.int32)
        active = (r_abs >= ob) & (r_abs < oe) & has_best
        w_end = jnp.max(jnp.where(active, occ_w, I32_MIN))
        # "no same-hash successor inside the range" over the clamped delta:
        # w_end - occ_w <= L + max_step for active rows (the optimal map
        # range spans at most L positions), so the 65535 clamp/sentinel
        # always compares as "beyond the range" exactly
        is_last = active & (stt["occ_dnw"] > w_end - occ_w)
        v_occ = 2 * stt["occ_hrow"] + 1  # [R]
        qkc = qk_row[:SC]
        il = is_last[:, None]
        eq = il & (v_occ[:, None] == qkc[None, :])
        lt = il & (v_occ[:, None] < qkc[None, :])
        ref_lt = jnp.sum(lt.astype(jnp.int32), axis=0)  # [SC]
        present = eq.any(axis=0)
        strand_last = jnp.sum(
            jnp.where(eq, stt["occ_strand"][:, None], 0), axis=0
        )
        pres_i = present.astype(jnp.int32)
        commons_before = jnp.cumsum(pres_i) - pres_i
        rank = jnp.arange(SC, dtype=jnp.int32) + ref_lt - commons_before
        take = present & (rank < s)
        votes = jnp.sum(
            jnp.where(take, qs_row[:SC].astype(jnp.int32) * strand_last, 0),
            dtype=jnp.int32,
        )
        return res + (votes,)

    qs_arg = q_strand if with_votes else jnp.zeros_like(q_key, jnp.int8)
    return jax.vmap(finish)(
        st, q_key, qs_arg, sketch_size, best, first_p, last_p
    )


@partial(jax.jit, static_argnames=("cfg",))
def batch_l2_slab(cfg: MapKernelConfig, shard: DeviceShard, q_hash, sketch_size,
                  read_lens, cand_seq, cand_start, cand_end, q_key=None,
                  q_strand=None):
    """L2 scoring for flattened (read, candidate) pairs.

    Inputs: q_hash [N,S], sketch_size [N], read_lens [N], cand_* [N]
    (seq -1 for padding); q_key [N,S] = the lookup stage's row-space keys
    (see batch_lookup) — required by the pallas path; recomputed from q_hash
    with a batched searchsorted when omitted (CPU test path).

    Returns per candidate: shared [N] int32, mean_pos [N] int32,
    opt_beg [N] int32, opt_end [N] int32 (absolute occurrence indices of the
    first maximal state's map range), overflow [N] bool — plus strand votes
    [N] int32 as a sixth output when ``q_strand`` [N,S] is given (on the
    pallas path the votes ride the slab's already-sliced window,
    _l2_pallas_batch; the scatter/matmul paths fall back to the standalone
    vote merge).
    """
    if cfg.l2_path == "pallas":
        if q_key is None:
            if (shard.hash_sorted.shape[0] == 0
                    and shard.wpos.shape[0] > 0):
                raise ValueError(
                    "q_key=None pallas L2 needs hash_sorted; this shard "
                    "was uploaded with drop_cpu_planes=True — pass the "
                    "lookup stage's q_key instead"
                )
            arow = jnp.searchsorted(
                shard.hash_sorted, q_hash, side="left"
            ).astype(jnp.int32)
            M = shard.hash_sorted.shape[0]
            present = (
                shard.hash_sorted[jnp.minimum(arow, M - 1)] == q_hash
            ) & (arow < M)
            q_key = jnp.where(
                q_hash != U32_MAX,
                2 * arow + present.astype(jnp.int32),
                I32_MAX,
            )
        return _l2_pallas_batch(
            cfg, shard, q_key, sketch_size, read_lens,
            cand_seq, cand_start, cand_end, q_strand=q_strand,
        )
    one = _make_l2_one(cfg, shard)
    flat = (q_hash, sketch_size, read_lens, cand_seq, cand_start, cand_end)
    res = jax.lax.map(lambda xs: one(*xs), flat, batch_size=cfg.l2_chunk)
    if q_strand is None:
        return res
    votes = jax.vmap(_make_strand_votes(cfg, shard))(
        q_hash, q_strand, sketch_size, res[2], res[3]
    )
    return res + (votes,)


@partial(jax.jit, static_argnames=("cfg",))
def map_batch_stage1a(cfg: MapKernelConfig, shard: DeviceShard, reads,
                      read_lens):
    """Sketch + index lookup in one dispatch. The host fetches only the tiny
    per-read vectors (sketch size/overflow, hit total) and routes each read
    to a right-sized expansion tier (map_batch_stage1b) — the expansion
    sorts, hit gathers, and detector all scale with the H capacity.

    Returns (q_hash [B,S], q_strand [B,S], sketch_size [B], sketch_ovf [B],
    start [B,S], count [B,S], total [B], qkey [B,S])."""
    q_hash, q_strand, s_size, s_ovf = batch_sketch(cfg, reads, read_lens)
    start, count, total, qkey = batch_lookup(cfg, shard, q_hash)
    return q_hash, q_strand, s_size, s_ovf, start, count, total, qkey


def _stage1b_body(cfg: MapKernelConfig, shard: DeviceShard, rows, start,
                  count, sketch_size, read_lens, minhits_table):
    """Expansion + candidate detection + per-candidate occurrence counts for
    a row subset at this cfg's hits_max tier (shared by the standalone
    stage-1b dispatch and the fused chunk kernel)."""
    rows_c = jnp.maximum(rows, 0)
    st = start[rows_c]
    ct = count[rows_c]
    ss = sketch_size[rows_c]
    rl = read_lens[rows_c]
    c_seq, c_start, c_end, n_c, ovf = batch_l1_expand(
        cfg, shard, st, ct, ss, rl, minhits_table
    )

    def occ_one(cs, cst, cen, rlen):
        valid = cs >= 0
        csq = jnp.maximum(cs, 0)
        lo = shard.contig_offsets[csq]
        hi = shard.contig_offsets[csq + 1]
        beg0 = _bisect_range(shard.wpos, lo, hi, cst)
        last_end = _bisect_range(shard.wpos, lo, hi, cen + rlen)
        return jnp.where(valid, last_end - beg0, 0).astype(jnp.int32)

    n_occ = jax.vmap(
        lambda cs, cst, cen, rlen: jax.vmap(
            lambda a, b, c: occ_one(a, b, c, rlen)
        )(cs, cst, cen)
    )(c_seq, c_start, c_end, rl)
    return jnp.concatenate(
        [
            n_c[:, None], ovf.astype(jnp.int32)[:, None],
            c_seq, c_start, c_end, n_occ,
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("cfg",))
def map_batch_stage1b(cfg: MapKernelConfig, shard: DeviceShard, rows, start,
                      count, sketch_size, read_lens, minhits_table):
    """Standalone dispatch of :func:`_stage1b_body` (the engine's
    speculative/escalation expansion). ``rows`` [K] indexes into the
    stage-1a batch; start/count/sketch_size/read_lens are the full stage-1a
    device arrays.

    Returns ONE [K, 2+4C] int32 array — columns (n_c, l1_ovf, c_seq [C],
    c_start [C], c_end [C], n_occ [C]) — so the fetch is a single buffer."""
    return _stage1b_body(cfg, shard, rows, start, count, sketch_size,
                         read_lens, minhits_table)


@partial(jax.jit, static_argnames=("cfg", "exp_plan", "l2_plan"))
def map_batch_chunk(cfg: MapKernelConfig, shard: DeviceShard, reads,
                    read_lens, minhits_table, n_rows, exp_plan, l2_plan):
    """The steady-state chunk path: sketch + lookup + device-side
    EXPANSION-TIER routing + expansion at each planned tier + the L2 slab
    router + every planned L2 slab — ONE dispatch chain for the whole
    chunk (each host enqueue costs ~2.5 ms through the tunnel, and the
    expansion sorts scale with the tier, so right-sizing per READ instead
    of per chunk-max cuts both).

    ``exp_plan`` = static ((tier, K), ...) ascending by tier: each read
    lands in the smallest planned tier >= its hit total with a free slot
    (spill flows to larger tiers); reads left uncovered (plan overflow or
    total above the largest planned tier) come back with inert candidate
    rows and are escalated host-side (rare — the plan adapts).

    Returns (stage1a 8-tuple, spec_full [B, 2+4C], covered [B] bool,
    slab_coord, ovf_coord, [slab outs])."""
    q_hash, q_strand, s_size, s_ovf = batch_sketch(cfg, reads, read_lens)
    start, count, total, qkey = batch_lookup(cfg, shard, q_hash)
    out1a = (q_hash, q_strand, s_size, s_ovf, start, count, total, qkey)
    B = reads.shape[0]
    C = cfg.cands_max
    import dataclasses as _dc

    # inert init: candidate seqids -1 so uncovered reads route nothing
    spec_full = jnp.concatenate(
        [
            jnp.zeros((B, 2), jnp.int32),
            jnp.full((B, C), -1, jnp.int32),
            jnp.zeros((B, 3 * C), jnp.int32),
        ],
        axis=1,
    )
    covered = jnp.zeros((B,), bool)
    idx = jnp.arange(B, dtype=jnp.int32)
    for tier, K in exp_plan:
        need = (total <= tier) & ~covered
        key = jnp.where(need, idx, B + idx)
        rows = jnp.sort(key)[: min(K, B)]
        rows = jnp.where(rows < B, rows, -1)
        cfg_t = _dc.replace(cfg, hits_max=tier)
        out_t = _stage1b_body(cfg_t, shard, rows, start, count, s_size,
                              read_lens, minhits_table)
        tgt = jnp.where(rows >= 0, rows, B)
        spec_full = spec_full.at[tgt].set(out_t, mode="drop")
        covered = covered.at[tgt].set(True, mode="drop")

    # L2 routing + slabs over the combined expansion output; tier0 =
    # hits_max (uncovered reads are inert; true L1 overflow carries its
    # own flag)
    slab_fields, slab_coord, ovf_coord = l2_route_device(
        cfg, spec_full, s_size, s_ovf, total, jnp.int32(cfg.hits_max),
        n_rows, l2_plan,
    )
    outs = []
    off = 0
    for rr, sc, K in l2_plan:
        cfg_r = l2_cfg_for_tier(cfg, rr, sc)
        fl = slab_fields[off : off + K]
        outs.append(batch_l2_gather(
            cfg_r, shard, q_hash, q_strand, s_size, read_lens,
            fl[:, 0], fl[:, 1], fl[:, 2], fl[:, 3], qkey,
        ))
        off += K
    return out1a, spec_full, covered, slab_coord, ovf_coord, outs


@partial(jax.jit, static_argnames=("cfg", "slabs"))
def l2_route_device(cfg: MapKernelConfig, spec_out, s_size, s_ovf, total,
                    tier0, n_rows, slabs):
    """Device-side L2 slab routing: packs the chunk's candidates into a
    STATIC slab plan so the host round trip between L1 and L2 leaves the
    critical path (the L2 dispatches chain on the returned arrays directly;
    the host sees routing metadata only in the single combined fetch at the
    end of the chunk).

    ``slabs`` = static ((rr, sc, K), ...) laid out over the candidate stream
    sorted DESCENDING by (n_occ, sketch size) — the same cross-tier packing
    rule as the host router (_dispatch_l2): a slab absorbs following smaller
    candidates into its free slots. The plan comes from previously observed
    per-tier rates (engine._adapt_route_plan); slot t's static (rr, sc) must
    cover its actual member (n_occ <= rr and s <= sc) — members that land on
    a too-small slot (plan/chunk mismatch) and members beyond the plan's
    total capacity are emitted as overflow coords for the host's leftover
    path instead.

    Reads excluded from routing entirely (host handles them, rare): sketch
    overflow, L1 overflow, hit totals above tier0 (escalation), any
    candidate range above cfg.range_max (oracle fallback), batch padding
    rows (row >= n_rows).

    Returns (slab_fields [T, 4] int32 (read row, c_seq, c_start, c_end;
    padding/uncovered slots have c_seq = -1), slab_coord [T] int32
    (r * C + c, -1 padding), ovf_coord [N] int32 (-1 padded,
    front-compacted)), T = sum of slab Ks."""
    B = spec_out.shape[0]
    C = cfg.cands_max
    N = B * C
    T = sum(k for _, _, k in slabs)

    l1_ovf = spec_out[:, 1] > 0
    c_seq = spec_out[:, 2 : 2 + C]
    c_start = spec_out[:, 2 + C : 2 + 2 * C]
    c_end = spec_out[:, 2 + 2 * C : 2 + 3 * C]
    n_occ = spec_out[:, 2 + 3 * C : 2 + 4 * C]

    cand_real = c_seq >= 0
    read_bad = (
        s_ovf | l1_ovf | (total > tier0)
        | (cand_real & (n_occ > cfg.range_max)).any(axis=1)
        | (jnp.arange(B, dtype=jnp.int32) >= n_rows)  # batch padding rows
    )
    valid = cand_real & ~read_bad[:, None]

    # descending (n_occ, s) stream: key = n_occ << 16 | s (both < 2^16 by
    # construction), invalid candidates sort last
    s_bc = jnp.broadcast_to(s_size[:, None], (B, C))
    key = jnp.where(
        valid, -(n_occ * 65536 + s_bc), I32_MAX
    ).reshape(N)
    coord = jnp.arange(N, dtype=jnp.int32)
    row = coord // C
    (key_s, coord_s, row_s, cs_s, cst_s, cen_s, no_s, ss_s) = jax.lax.sort(
        (key, coord, row, c_seq.reshape(N), c_start.reshape(N),
         c_end.reshape(N), n_occ.reshape(N), s_bc.reshape(N)),
        num_keys=1, is_stable=True,
    )
    if T > N:  # plan sized for a bigger chunk: pad with invalid slots
        def padto(a, fill):
            return jnp.concatenate([a, jnp.full(T - N, fill, a.dtype)])

        key_s = padto(key_s, I32_MAX)
        coord_s, row_s = padto(coord_s, -1), padto(row_s, 0)
        cs_s, cst_s, cen_s = padto(cs_s, -1), padto(cst_s, 0), padto(cen_s, 0)
        no_s, ss_s = padto(no_s, I32_MAX), padto(ss_s, I32_MAX)
        N = T
    valid_s = key_s != I32_MAX

    # static per-slot cover shapes from the plan
    rr_at = np.concatenate([np.full(k, rr, np.int32) for rr, _, k in slabs])
    sc_at = np.concatenate([np.full(k, sc, np.int32) for _, sc, k in slabs])
    covered = (
        valid_s[:T] & (no_s[:T] <= rr_at) & (ss_s[:T] <= sc_at)
    )
    slab_fields = jnp.stack(
        [
            jnp.where(covered, row_s[:T], 0),
            jnp.where(covered, cs_s[:T], -1),
            jnp.where(covered, cst_s[:T], 0),
            jnp.where(covered, cen_s[:T], 0),
        ],
        axis=1,
    )
    slab_coord = jnp.where(covered, coord_s[:T], -1)

    # overflow: valid members on uncovered slots or beyond the plan
    ovf = valid_s & jnp.concatenate(
        [~covered, jnp.ones(max(N - T, 0), bool)]
    )
    _, ovf_coord = jax.lax.sort(
        (jnp.where(ovf, 0, 1), jnp.where(ovf, coord_s, -1)), num_keys=1,
        is_stable=True,
    )
    return slab_fields, slab_coord, ovf_coord


def l2_cfg_for_tier(cfg: MapKernelConfig, rr: int, sc: int) -> MapKernelConfig:
    """The slab kernel config for a (range, sketch-column) tier."""
    import dataclasses

    return dataclasses.replace(
        cfg, range_max=rr, sketch_cols=sc,
        event_cap=min(2 * rr, ((rr + rr // 4 + 127) // 128) * 128),
    )


@partial(jax.jit, static_argnames=("cfg", "plan"))
def l2_route_and_score(cfg: MapKernelConfig, shard: DeviceShard, q_hash,
                       q_strand, sketch_size, s_ovf, total, read_lens, q_key,
                       spec_out, tier0, n_rows, plan):
    """Device router + every planned L2 slab in ONE dispatch (each host
    enqueue costs ~2.5 ms of fixed overhead; the router and its slabs always
    run together). Returns (slab_coord [T], ovf_coord [N], [slab outs])."""
    slab_fields, slab_coord, ovf_coord = l2_route_device(
        cfg, spec_out, sketch_size, s_ovf, total, tier0, n_rows, plan
    )
    outs = []
    off = 0
    for rr, sc, K in plan:
        cfg_r = l2_cfg_for_tier(cfg, rr, sc)
        fl = slab_fields[off : off + K]
        outs.append(batch_l2_gather(
            cfg_r, shard, q_hash, q_strand, sketch_size, read_lens,
            fl[:, 0], fl[:, 1], fl[:, 2], fl[:, 3], q_key,
        ))
        off += K
    return slab_coord, ovf_coord, outs


@partial(jax.jit, static_argnames=("cfg",))
def map_batch_stage1(cfg: MapKernelConfig, shard: DeviceShard, reads, read_lens,
                     minhits_table):
    """Sketch + L1 + per-candidate occurrence counts in one dispatch.

    The occurrence count n_occ[B, C] (number of shard minimizers inside each
    candidate's L2 content window) lets the host route each candidate to an
    L2 kernel compiled for the smallest sufficient range capacity — the
    event matmul cost scales with range_max^2, so typical candidates are
    4-15x cheaper than the worst-case shape (cf. the temporal equivalent:
    the reference sizes its L2 window from the actual candidate span,
    computeMap.hpp:460-538).

    Returns (q_hash [B,S], q_strand [B,S], sketch_size [B], sketch_ovf [B],
    cand_seq/cand_start/cand_end [B,C], n_cands [B], l1_ovf [B], n_occ [B,C]).
    """
    q_hash, q_strand, s_size, s_ovf = batch_sketch(cfg, reads, read_lens)
    c_seq, c_start, c_end, n_c, l1_ovf = batch_l1(
        cfg, shard, q_hash, s_size, read_lens, minhits_table
    )

    def occ_one(cs, cst, cen, rlen):
        valid = cs >= 0
        csq = jnp.maximum(cs, 0)
        lo = shard.contig_offsets[csq]
        hi = shard.contig_offsets[csq + 1]
        beg0 = _bisect_range(shard.wpos, lo, hi, cst)
        last_end = _bisect_range(shard.wpos, lo, hi, cen + rlen)
        return jnp.where(valid, last_end - beg0, 0).astype(jnp.int32)

    n_occ = jax.vmap(
        lambda cs, cst, cen, rlen: jax.vmap(
            lambda a, b, c: occ_one(a, b, c, rlen)
        )(cs, cst, cen)
    )(c_seq, c_start, c_end, read_lens)
    return q_hash, q_strand, s_size, s_ovf, c_seq, c_start, c_end, n_c, l1_ovf, n_occ


def _make_strand_votes(cfg: MapKernelConfig, shard: DeviceShard):
    """Device strand votes over one candidate's optimal map range [beg, end)
    — computeStatistics parity (slidingMap.hpp:232-254, see the host oracle
    mapper_oracle._strand_votes). Votes come from the first s union keys
    present in both sketches; the ref strand for duplicate hashes is the
    last occurrence in position order. Merge-via-sort, gather-free.
    Like the L2 setup, only the leading sketch_cols sketch columns join the
    merge (slabs are sketch-size-homogeneous)."""
    R = cfg.range_max
    S = cfg.sketch_max
    SC = cfg.sketch_cols or S

    def votes_fn(qh, qs, s, beg, end):
        n = jnp.clip(end - beg, 0, R)
        if shard.hash_pos.shape[0] == 0 and shard.wpos.shape[0] > 0:
            raise ValueError(
                "strand votes need the hash_pos/strand_pos planes; this "
                "shard was uploaded with drop_cpu_planes=True (pallas-only)"
            )
        M = shard.hash_pos.shape[0]
        if M < R:
            hp = jnp.concatenate(
                [shard.hash_pos, jnp.full(R - M, U32_MAX, shard.hash_pos.dtype)]
            )
            sp = jnp.concatenate(
                [shard.strand_pos, jnp.zeros(R - M, shard.strand_pos.dtype)]
            )
            start2 = jnp.minimum(beg, 0)
        else:
            hp, sp = shard.hash_pos, shard.strand_pos
            start2 = jnp.minimum(beg, M - R)
        shift = beg - start2
        v = jnp.arange(R) < n
        rh = jnp.where(
            v, jnp.roll(jax.lax.dynamic_slice(hp, (start2,), (R,)), -shift),
            U32_MAX,
        )
        rs = jnp.where(
            v,
            jnp.roll(
                jax.lax.dynamic_slice(sp, (start2,), (R,)), -shift
            ).astype(jnp.int32),
            0,
        )
        # keep the LAST occurrence per ref hash (position order)
        rh_s, _, rs_s = jax.lax.sort(
            (rh, jnp.arange(R, dtype=jnp.int32), rs), num_keys=2
        )
        is_last = jnp.concatenate(
            [rh_s[1:] != rh_s[:-1], jnp.ones(1, bool)]
        ) & (rh_s != U32_MAX)

        # typed merge: ref-unique (0) before equal query (1); dups/pads (3)
        mval = jnp.concatenate([jnp.where(is_last, rh_s, U32_MAX), qh[:SC]])
        mtyp = jnp.concatenate(
            [
                jnp.where(is_last, 0, 3),
                jnp.where(jnp.arange(SC) < s, 1, 3),
            ]
        )
        mstr = jnp.concatenate([rs_s, qs[:SC].astype(jnp.int32)])
        v_s, t_s, s_s = jax.lax.sort((mval, mtyp, mstr), num_keys=2)
        prev_val = jnp.concatenate([jnp.full(1, U32_MAX, v_s.dtype), v_s[:-1]])
        prev_typ = jnp.concatenate([jnp.full(1, 3, t_s.dtype), t_s[:-1]])
        prev_str = jnp.concatenate([jnp.zeros(1, jnp.int32), s_s[:-1]])
        is_q = t_s == 1
        in_r = is_q & (prev_typ == 0) & (prev_val == v_s)
        cnt_ref_le = jnp.cumsum((t_s == 0).astype(jnp.int32))
        jrank = jnp.cumsum(is_q.astype(jnp.int32)) - is_q.astype(jnp.int32)
        commons_before = jnp.cumsum(in_r.astype(jnp.int32)) - in_r.astype(jnp.int32)
        # union rank of q_j = j + #(ref-only uniques < q_j)
        rank = jrank + cnt_ref_le - in_r.astype(jnp.int32) - commons_before
        take = in_r & (rank < s)
        return jnp.sum(jnp.where(take, s_s * prev_str, 0), dtype=jnp.int32)

    return votes_fn


@partial(jax.jit, static_argnames=("cfg",))
def batch_l2_gather(cfg: MapKernelConfig, shard: DeviceShard, q_hash,
                    q_strand, sketch_size, read_lens, rows, c_seq, c_start,
                    c_end, q_key=None):
    """L2 scoring of a host-routed candidate slab: gathers the per-read
    sketch rows on device (q_hash etc. stay device-resident between the
    stage-1 and stage-2 dispatches) and scores with this cfg's (smaller)
    range capacity. ``rows`` [K] indexes into the stage-1 batch.

    Returns ONE stacked [6, K] int32 array (shared, mean_pos, opt_beg,
    opt_end, overflow, strand_votes) — a single device buffer per slab
    keeps the device->host fetch to one round trip per read chunk."""
    rows_c = jnp.maximum(rows, 0)
    qh = q_hash[rows_c]
    qs = q_strand[rows_c]
    ss = sketch_size[rows_c]
    qk = None if q_key is None else q_key[rows_c]
    if cfg.l2_path == "pallas" and qk is not None:
        # fused path: votes ride the candidate-window slice the L2 setup
        # already fetched (no second slice, no merge sorts)
        sh, mp, ob, oe, ovf, votes = _l2_pallas_batch(
            cfg, shard, qk, ss, read_lens[rows_c], c_seq, c_start, c_end,
            q_strand=qs,
        )
    else:
        sh, mp, ob, oe, ovf = batch_l2_slab(
            cfg, shard, qh, ss, read_lens[rows_c], c_seq, c_start, c_end,
            q_key=qk,
        )
        votes = jax.vmap(_make_strand_votes(cfg, shard))(qh, qs, ss, ob, oe)
    return jnp.stack([sh, mp, ob, oe, ovf.astype(jnp.int32), votes])


@partial(jax.jit, static_argnames=("cfg",))
def map_batch_fused(cfg: MapKernelConfig, shard: DeviceShard, reads, read_lens,
                    minhits_table):
    """The full mapping pipeline for one read batch in a single dispatch:
    sketch -> L1 -> on-device candidate compaction -> L2, one host fetch.

    Device-side compaction: real candidates across the [B, C] grid are
    sorted to the front and only the first l2_budget = 4*B slots are scored
    (budget overflow is flagged; the engine falls back to the oracle for the
    whole batch in that rare case).

    Returns (q_hash [B,S], q_strand [B,S], sketch_size [B], sketch_ovf [B],
    cand_seq [B,C], n_cands [B], l1_ovf [B], shared [B,C], mean_pos [B,C],
    opt_beg [B,C], opt_end [B,C], l2_ovf [B,C], budget_ovf scalar).
    """
    B = reads.shape[0]
    C = cfg.cands_max
    K = 2 * B

    q_hash, q_strand, s_size, s_ovf = batch_sketch(cfg, reads, read_lens)
    c_seq, c_start, c_end, n_c, l1_ovf = batch_l1(
        cfg, shard, q_hash, s_size, read_lens, minhits_table
    )

    flat_seq = c_seq.reshape(-1)
    flat_valid = flat_seq >= 0
    n_real = flat_valid.sum()
    budget_ovf = n_real > K
    order = jnp.argsort(jnp.where(flat_valid, 0, 1).astype(jnp.int32), stable=True)
    sel = order[:K]
    sel_valid = jnp.arange(K) < n_real
    rd = sel // C

    sh, mp, ob, oe, ovf = batch_l2_slab(
        cfg, shard,
        q_hash[rd],
        s_size[rd],
        read_lens[rd],
        jnp.where(sel_valid, flat_seq[sel], -1),
        jnp.where(sel_valid, c_start.reshape(-1)[sel], 0),
        jnp.where(sel_valid, c_end.reshape(-1)[sel], 0),
    )

    def scatter(vals, fill):
        out = jnp.full((B * C,), fill, vals.dtype)
        return out.at[sel].set(jnp.where(sel_valid, vals, fill)).reshape(B, C)

    return (
        q_hash, q_strand, s_size, s_ovf, c_seq, n_c, l1_ovf,
        scatter(sh, jnp.int32(0)), scatter(mp, jnp.int32(0)),
        scatter(ob, jnp.int32(0)), scatter(oe, jnp.int32(0)),
        scatter(ovf, False), budget_ovf,
    )
