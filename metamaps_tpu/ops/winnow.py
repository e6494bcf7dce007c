"""Winnowed-minimizer extraction, bit-compatible with the reference.

Reference semantics (src/map/include/commonFunc.hpp:91-175 ``addMinimizers``):

- sequence is upper-cased; canonical k-mer hash = min(murmur(kmer),
  murmur(revcomp(kmer))), strand FWD if forward hash is strictly smaller;
  "symmetric" k-mers (fwd hash == rc hash) are skipped entirely — they never
  enter the winnowing queue AND the per-position window evaluation is skipped
  for them;
- a monotone deque keeps, per window of ``w`` consecutive k-mer positions,
  the minimum canonical hash; equal hashes are evicted on insertion, so among
  equal minima the RIGHTMOST occurrence wins;
- one record is emitted per "run": the window-minimum occurrence is saved the
  first time it becomes the front of the deque (its ``wpos`` = first window
  id where it is the minimum), and not re-saved while it stays the minimum.
  The dedupe compares all fields against the last emitted record, where the
  candidate's dummy wpos is 0 — so a record emitted at window 0 can suppress
  later same-hash/strand occurrences (the "wpos-0 chain", reproduced here).

This module provides three implementations with identical outputs:

- :func:`winnow_oracle` — direct deque transcription, the parity oracle;
- :func:`winnow_np` — vectorized numpy host implementation (windowed
  rightmost-argmin via sliding windows + run compression);
- :func:`winnow_dense` — JAX device implementation returning dense per-window
  arrays plus an emission mask (compacted by :func:`winnow_jax`).

Records are (hash: uint32, wpos: int32, strand: int8 {+1,-1}).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .murmur3 import hash_kmers, hash_kmers_np

UINT32_MAX = np.uint32(0xFFFFFFFF)

# byte LUTs ------------------------------------------------------------------

_UPPER_LUT = np.arange(256, dtype=np.uint8)
_UPPER_LUT[97:123] -= 32

_RC_LUT = np.arange(256, dtype=np.uint8)
for _a, _b in [(ord("A"), ord("T")), (ord("C"), ord("G"))]:
    _RC_LUT[_a], _RC_LUT[_b] = _b, _a


def upper_np(seq: np.ndarray) -> np.ndarray:
    return _UPPER_LUT[seq]


def revcomp_np(seq: np.ndarray) -> np.ndarray:
    """Reverse complement of an upper-cased uint8 sequence (A<->T, C<->G,
    other bytes unchanged — matches reference reverseComplement,
    commonFunc.hpp:38-55)."""
    return _RC_LUT[seq][::-1]


# ---------------------------------------------------------------------------
# canonical per-position hashes (shared by all implementations)
# ---------------------------------------------------------------------------


def canonical_hashes_np(seq: np.ndarray, k: int, alphabet_size: int = 4):
    """Per k-mer position: (canonical hash, strand, valid) numpy arrays.

    ``valid`` is False for symmetric k-mers (skipped by the reference).
    """
    sequ = upper_np(seq)
    fwd = hash_kmers_np(sequ, k)
    if alphabet_size == 4:
        rc = revcomp_np(sequ)
        bwd = hash_kmers_np(rc, k)[::-1]
    else:
        bwd = np.full_like(fwd, UINT32_MAX)
    valid = fwd != bwd
    canon = np.minimum(fwd, bwd)
    strand = np.where(fwd < bwd, np.int8(1), np.int8(-1))
    return canon, strand, valid


# ---------------------------------------------------------------------------
# oracle: direct deque algorithm
# ---------------------------------------------------------------------------


def winnow_oracle(seq: np.ndarray, k: int, w: int, alphabet_size: int = 4):
    """Monotone-deque winnowing, the exact reference algorithm.

    Returns (hashes uint32[N], wpos int32[N], strand int8[N]).
    """
    from collections import deque

    n = len(seq) - k + 1
    out_h, out_p, out_s = [], [], []
    if n <= 0:
        return (np.zeros(0, np.uint32), np.zeros(0, np.int32), np.zeros(0, np.int8))
    canon, strand, valid = canonical_hashes_np(seq, k, alphabet_size)

    Q = deque()  # entries: [hash, wpos(dummy 0), strand, kmer_pos]
    for i in range(n):
        if not valid[i]:
            continue
        wid = i - w + 1
        while Q and Q[0][3] <= i - w:
            Q.popleft()
        while Q and Q[-1][0] >= canon[i]:
            Q.pop()
        Q.append([int(canon[i]), 0, int(strand[i]), i])
        if wid >= 0:
            front = Q[0]
            last = (out_h[-1], out_p[-1], out_s[-1]) if out_h else None
            if last is None or (front[0], front[1], front[2]) != last:
                front[1] = wid
                out_h.append(front[0])
                out_p.append(front[1])
                out_s.append(front[2])
    return (
        np.array(out_h, np.uint32),
        np.array(out_p, np.int32),
        np.array(out_s, np.int8),
    )


# ---------------------------------------------------------------------------
# vectorized numpy
# ---------------------------------------------------------------------------


def _run_compress(m, keys, strands, evaluated, w):
    """Shared run-compression for the vectorized implementations (host side).

    m: [NW] winning k-mer position per window; keys/strands indexed by m;
    evaluated: [NW] mask of windows the reference actually evaluates.
    """
    ev_idx = np.flatnonzero(evaluated)
    if ev_idx.size == 0:
        return (np.zeros(0, np.uint32), np.zeros(0, np.int32), np.zeros(0, np.int8))
    m_ev = m[ev_idx]
    new_run = np.ones(ev_idx.size, dtype=bool)
    new_run[1:] = m_ev[1:] != m_ev[:-1]
    run_starts = ev_idx[new_run]
    run_m = m_ev[new_run]
    h = keys[run_m].astype(np.uint32)
    p = run_starts.astype(np.int32)
    s = strands[run_m].astype(np.int8)

    # wpos-0 chain suppression (see module docstring): if the first emitted
    # record has wpos 0, subsequent runs whose (hash, strand) match it are
    # suppressed until a differing run is emitted.
    if p.size > 1 and p[0] == 0:
        keep = np.ones(p.size, dtype=bool)
        j = 1
        while j < p.size and h[j] == h[0] and s[j] == s[0]:
            keep[j] = False
            j += 1
        if not keep.all():
            h, p, s = h[keep], p[keep], s[keep]
    return h, p, s


def winnow_np(seq: np.ndarray, k: int, w: int, alphabet_size: int = 4):
    """Vectorized numpy winnowing; identical output to :func:`winnow_oracle`."""
    n = len(seq) - k + 1
    if n <= 0 or n - w + 1 <= 0:
        return (np.zeros(0, np.uint32), np.zeros(0, np.int32), np.zeros(0, np.int8))
    canon, strand, valid = canonical_hashes_np(seq, k, alphabet_size)

    # invalid positions can never be window minima (they never enter the
    # deque); push them above every real hash.
    key = canon.astype(np.uint64)
    key[~valid] = np.uint64(1) << np.uint64(32)

    nw = n - w + 1
    win = np.lib.stride_tricks.sliding_window_view(key, w)  # [nw, w]
    rev_arg = np.argmin(win[:, ::-1], axis=1)  # first min of reversed = rightmost
    m = np.arange(nw) + (w - 1 - rev_arg)
    win_min = key[m]

    # windows are evaluated only when their last position is valid, and the
    # deque must be non-empty (some valid position in the window).
    evaluated = valid[w - 1:] & (win_min >> np.uint64(32) == 0)
    return _run_compress(m, canon, strand, evaluated, w)


# ---------------------------------------------------------------------------
# JAX device implementation
# ---------------------------------------------------------------------------


def upper_jax(seq):
    # arithmetic instead of a 256-entry LUT: byte gathers are scalarized on
    # TPU (~10 ns/element) while compares/selects run on the VPU
    return jnp.where((seq >= 97) & (seq < 123), seq - 32, seq)


def revcomp_jax(seq):
    A, T, C, G = 65, 84, 67, 71
    r = jnp.where(
        seq == A, jnp.uint8(T),
        jnp.where(seq == T, jnp.uint8(A),
                  jnp.where(seq == C, jnp.uint8(G),
                            jnp.where(seq == G, jnp.uint8(C), seq))),
    )
    return r[::-1]


def _lt(a, b):
    """Lexicographic (invalid, hash) strict less-than: a valid position beats
    any invalid one regardless of hash (invalid k-mers never enter the
    reference's deque), then smaller hash wins. a/b = (hash, invalid)."""
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def _leq(a, b):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] <= b[0]))


def _sel(cond, a, b):
    return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))


def _rightmost_windowed_argmin(key, inv, pos, w: int, strand=None):
    """Sliding-window min over windows of size w with rightmost tie-break.

    key: [n] uint32 canonical hashes; inv: [n] uint32 1 where the position is
    invalid (symmetric k-mer — must never win against a valid one); pos: [n]
    int32; strand: optional [n] int8 payload carried with the winner.
    Returns (min_key, min_inv, min_pos[, min_strand]) per window, shape
    [n-w+1]. Two-pass block prefix/suffix scan (O(n)), 32-bit lanes only,
    gather-free (payloads ride the scan selections).
    """
    n = key.shape[0]
    nb = -(-n // w)
    pad = nb * w - n
    keyp = jnp.pad(key, (0, pad), constant_values=UINT32_MAX)
    invp = jnp.pad(inv, (0, pad), constant_values=1)
    posp = jnp.pad(pos, (0, pad), constant_values=0)
    arrs = [keyp, invp, posp]
    if strand is not None:
        arrs.append(jnp.pad(strand, (0, pad), constant_values=0))
    blocks = tuple(x.reshape(nb, w) for x in arrs)

    def combine_prefix(a, b):
        # scan left-to-right; b is later in sequence and wins ties
        return _sel(_leq((b[0], b[1]), (a[0], a[1])), b, a)

    def combine_flipped(a, b):
        # scan over the flipped block: a aggregates original-later elements,
        # which must win ties; b replaces only when strictly smaller
        return _sel(_lt((b[0], b[1]), (a[0], a[1])), b, a)

    pre = jax.lax.associative_scan(combine_prefix, blocks, axis=1)
    suf_f = jax.lax.associative_scan(
        combine_flipped, tuple(x[:, ::-1] for x in blocks), axis=1
    )
    suf = tuple(x[:, ::-1] for x in suf_f)
    pre = tuple(x.reshape(-1) for x in pre)
    suf = tuple(x.reshape(-1) for x in suf)

    nw = n - w + 1
    s = tuple(x[:nw] for x in suf)
    e = tuple(x[w - 1 : w - 1 + nw] for x in pre)
    # prefix part covers the later positions → wins ties
    return _sel(_leq((e[0], e[1]), (s[0], s[1])), e, s)


@partial(jax.jit, static_argnums=(1, 2, 3))
def winnow_dense(seq, k: int, w: int, alphabet_size: int = 4, n_kmers_valid=None):
    """Device winnowing over a (possibly padded) uint8 sequence [L].

    Returns dense per-window arrays of length L-k+1-w+1:
    (emit_mask bool, hash uint32, wpos int32, strand int8, m int32,
    evaluated bool) where records = compact(emit_mask). The wpos-0 chain
    suppression is left
    to the host-side compaction (:func:`winnow_jax`) — it affects at most the
    first few records (and never the sketch's unique hash/strand set).

    ``n_kmers_valid`` (traced scalar) masks a right-padded sequence: k-mer
    positions >= n_kmers_valid are invalid and windows touching them are not
    evaluated.
    """
    sequ = upper_jax(seq)
    fwd = hash_kmers(sequ, k)
    if alphabet_size == 4:
        bwd = hash_kmers(revcomp_jax(sequ), k)[::-1]
    else:
        bwd = jnp.full_like(fwd, UINT32_MAX)
    valid = fwd != bwd
    if n_kmers_valid is not None:
        pos_all = jnp.arange(fwd.shape[0], dtype=jnp.int32)
        valid = valid & (pos_all < n_kmers_valid)
    canon = jnp.minimum(fwd, bwd)
    strand = jnp.where(fwd < bwd, jnp.int8(1), jnp.int8(-1))

    n = fwd.shape[0]
    inv = (~valid).astype(jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.int32)

    min_key, min_inv, m, min_strand = _rightmost_windowed_argmin(
        canon, inv, pos, w, strand
    )
    nw = n - w + 1
    evaluated = valid[w - 1:] & (min_inv == 0)

    # m (the deque front) is nondecreasing across windows, so the previous
    # evaluated window's m is a gather-free running max; lax.cummax lowers to
    # a single native HLO (associative_scan at this length explodes XLA
    # compile time: 450s at n=2e6)
    j = jnp.arange(nw, dtype=jnp.int32)
    prev_incl = jax.lax.cummax(jnp.where(evaluated, m, jnp.int32(-1)))
    prev_m = jnp.concatenate([jnp.array([-1], jnp.int32), prev_incl[:-1]])
    emit = evaluated & (m != prev_m)

    return emit, min_key.astype(jnp.uint32), j, min_strand, m, evaluated


@partial(jax.jit, static_argnums=(1, 2, 3))
def _winnow_chunk_batch(chunks, k: int, w: int, alphabet_size: int, n_valid):
    """vmap of winnow_dense over a fixed batch of fixed-size chunks — one
    dispatch per CHUNK_BATCH chunks of reference sequence."""
    return jax.vmap(lambda c, nv: winnow_dense(c, k, w, alphabet_size, nv))(
        chunks, n_valid
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 6))
def _winnow_chunk_batch_compact(chunks, k: int, w: int, alphabet_size: int,
                                n_valid, n_own, cap: int):
    """Winnow a batch of chunks AND compact the emitted records on device
    (stable sort by the emit mask), so the host fetches ~records instead of
    ~bases — the device->host tunnel is the indexing bottleneck.

    Returns per chunk: h [cap] uint32, wpos [cap] int32 (chunk-relative),
    strand [cap] int32, m [cap] int32 (k-mer position of the record's
    minimizer), n_emit int32 (clamped to cap), last_eval_m int32 (m of the
    last evaluated owned window, -1 if none), overflow bool.
    """
    def one(seq, nv, nown):
        emit, h, j, st, m, ev = winnow_dense(seq, k, w, alphabet_size, nv)
        own = j < nown
        emit = emit & own
        ev = ev & own
        n_emit = emit.sum().astype(jnp.int32)
        key = jnp.where(emit, 0, 1).astype(jnp.int32)
        _, _, h_s, st_s, m_s, j_s = jax.lax.sort(
            (key, j, h, st.astype(jnp.int32), m, j), num_keys=2
        )
        last_eval_m = jnp.max(jnp.where(ev, m, -1))
        return (
            h_s[:cap], j_s[:cap], st_s[:cap], m_s[:cap],
            jnp.minimum(n_emit, cap), last_eval_m, n_emit > cap,
        )

    return jax.vmap(one)(chunks, n_valid, n_own)


def _chain_suppress(h, p, s):
    """wpos-0 chain suppression on compacted records (host side)."""
    if p.size > 1 and p[0] == 0:
        keep = np.ones(p.size, dtype=bool)
        jj = 1
        while jj < p.size and h[jj] == h[0] and s[jj] == s[0]:
            keep[jj] = False
            jj += 1
        if not keep.all():
            return h[keep], p[keep], s[keep]
    return h, p, s


# fixed device chunk for long sequences: one compiled shape regardless of
# contig length. XLA compile time grows superlinearly with array length
# (~4s at 64k, ~450s at 2M), so keep the chunk small and amortize the single
# compile over many warm invocations.
WINNOW_CHUNK = 1 << 17


def winnow_jax(seq, k: int, w: int, alphabet_size: int = 4):
    """Host wrapper over :func:`winnow_dense`: compacts records and applies
    the wpos-0 chain suppression. Output identical to :func:`winnow_oracle`.

    Sequences longer than WINNOW_CHUNK are processed in fixed-size chunks
    with (k-1)+(w-1) overlap; each window is owned by exactly one chunk and
    runs spanning a boundary are stitched on the host.
    """
    n = len(seq) - k + 1
    if n <= 0 or n - w + 1 <= 0:
        return (np.zeros(0, np.uint32), np.zeros(0, np.int32), np.zeros(0, np.int8))
    seq = np.asarray(seq)
    if len(seq) <= WINNOW_CHUNK:
        emit, h, p, s, m, _ = winnow_dense(jnp.asarray(seq), k, w, alphabet_size)
        emit = np.asarray(emit)
        idx = np.flatnonzero(emit)
        h = np.asarray(h)[idx].astype(np.uint32)
        p = np.asarray(p)[idx].astype(np.int32)
        s = np.asarray(s)[idx].astype(np.int8)
        return _chain_suppress(h, p, s)

    overlap = (k - 1) + (w - 1)
    stride_windows = WINNOW_CHUNK - overlap  # windows owned per chunk
    nw_total = n - w + 1

    # assemble all chunks, process CHUNK_BATCH at a time in one dispatch each
    starts = list(range(0, nw_total, stride_windows))
    G = len(starts)
    chunks = np.full((G, WINNOW_CHUNK), ord("A"), np.uint8)
    n_valid = np.zeros(G, np.int32)
    for gi, start in enumerate(starts):
        piece = seq[start : start + WINNOW_CHUNK]
        chunks[gi, : len(piece)] = piece
        n_valid[gi] = min(len(seq), start + WINNOW_CHUNK) - start - k + 1

    out_h, out_p, out_s = [], [], []
    prev_last_eval_m = None  # absolute k-mer position of the last evaluated
    # window's minimum (the state the in-chunk run-compression cannot see)
    CB = 16
    # emission density is 2/(w+1); cap with 60% headroom, overflow falls
    # back to the dense fetch for that chunk
    cap = int(-(-(stride_windows * 2 * 1.6 / (w + 1)) // 128) * 128)
    n_own_all = np.minimum(stride_windows, nw_total - np.array(starts)).astype(np.int32)
    pending = []
    for g0 in range(0, G, CB):
        gsel = list(range(g0, min(g0 + CB, G)))
        pad_g = CB - len(gsel)
        cb = chunks[gsel[0] : gsel[-1] + 1]
        nv = n_valid[gsel[0] : gsel[-1] + 1]
        nown = n_own_all[gsel[0] : gsel[-1] + 1]
        if pad_g:
            cb = np.concatenate([cb, np.full((pad_g, WINNOW_CHUNK), ord("A"), np.uint8)])
            nv = np.concatenate([nv, np.full(pad_g, 1, np.int32)])
            nown = np.concatenate([nown, np.full(pad_g, 1, np.int32)])
        pending.append(
            (
                gsel,
                _winnow_chunk_batch_compact(
                    jnp.asarray(cb), k, w, alphabet_size, jnp.asarray(nv),
                    jnp.asarray(nown), cap,
                ),
            )
        )
    for _, out in pending:  # overlap the tunnel round trips
        for a in out:
            try:
                a.copy_to_host_async()
            except Exception:
                break
    for gsel, out in pending:
        h_b, p_b, s_b, m_b, ne_b, lastm_b, ovf_b = jax.device_get(out)
        for li, gi in enumerate(gsel):
            start = starts[gi]
            if ovf_b[li]:
                # rare dense fallback: recompute this chunk uncompacted
                own = int(n_own_all[gi])
                emit, h, p, s, m, ev = winnow_dense(
                    jnp.asarray(chunks[gi]), k, w, alphabet_size,
                    int(n_valid[gi]),
                )
                emit, h, p, s, m, ev = (
                    np.asarray(x) for x in (emit, h, p, s, m, ev)
                )
                idx = np.flatnonzero(emit[:own])
                ch, cp, cs = h[idx], p[idx].astype(np.int32), s[idx]
                cm = m[idx]
                ev_own = np.flatnonzero(ev[:own])
                last_m = int(m[ev_own[-1]]) if ev_own.size else -1
            else:
                ne = int(ne_b[li])
                ch = h_b[li][:ne].astype(np.uint32)
                cp = p_b[li][:ne].astype(np.int32)
                cs = s_b[li][:ne].astype(np.int8)
                cm = m_b[li][:ne]
                last_m = int(lastm_b[li])
            cp = cp + start
            cm = cm + start
            # stitch: the chunk's first evaluated window always emits (no
            # in-chunk predecessor); drop it when it continues the previous
            # chunk's minimum run (same absolute occurrence)
            if prev_last_eval_m is not None and cm.size and cm[0] == prev_last_eval_m:
                ch, cp, cs = ch[1:], cp[1:], cs[1:]
            if last_m >= 0:
                prev_last_eval_m = last_m + start
            out_h.append(ch)
            out_p.append(cp)
            out_s.append(cs.astype(np.int8))

    h = np.concatenate(out_h) if out_h else np.zeros(0, np.uint32)
    p = np.concatenate(out_p) if out_p else np.zeros(0, np.int32)
    s = np.concatenate(out_s) if out_s else np.zeros(0, np.int8)
    return _chain_suppress(h.astype(np.uint32), p.astype(np.int32), s.astype(np.int8))


def winnow_fast(seq: np.ndarray, k: int, w: int, alphabet_size: int = 4):
    """Fastest available host winnowing: the native C++ deque
    (native/winnow.cpp, bit-exact with :func:`winnow_oracle`) when the
    toolchain is available, :func:`winnow_np` otherwise. The DB-build hot
    path — ~100x over the numpy path at genome scale."""
    from ..io.native import winnow_native

    out = winnow_native(seq, k, w, alphabet_size)
    if out is not None:
        return out
    return winnow_np(seq, k, w, alphabet_size)
