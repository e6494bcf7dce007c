"""Bit-exact MurmurHash3_x64_128 k-mer hashing.

The reference engine hashes every k-mer with MurmurHash3_x64_128 (public
domain, Austin Appleby) with seed 42 and keeps the low 32 bits of h1 as the
sketch hash (reference: src/common/murmur3.h:226-303, and
src/map/include/commonFunc.hpp:71-81 ``getHash``). All downstream parity
(minimizers, index, Jaccard estimates) depends on reproducing those 32 bits
exactly, so this module provides

- :func:`hash_kmers_np` — vectorized numpy (native uint64) host implementation,
  hashing all k-mers of a byte sequence at once;
- :func:`hash_kmers` — the JAX implementation built on 32-bit lane pairs
  (``metamaps_tpu.ops.u64``) so it runs on TPU VPUs without 64-bit emulation.

Both return, for a uint8 sequence of length L, a uint32 array of L-k+1
hashes (position i = hash of bytes [i, i+k)).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u64 as u

SEED = 42  # reference: commonFunc.hpp:33

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


# ---------------------------------------------------------------------------
# numpy implementation (uint64 native)
# ---------------------------------------------------------------------------

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _np_rotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _np_fmix(k):
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xFF51AFD7ED558CCD)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xC4CEB9FE1A85EC53)
    k ^= k >> np.uint64(33)
    return k


def _np_words64(seq: np.ndarray, k: int, n: int, byte_off: int) -> np.ndarray:
    """LE uint64 words from bytes [i+byte_off, i+byte_off+8) for each kmer
    start i in [0, n); bytes at or beyond offset k within the kmer are 0."""
    out = np.zeros(n, dtype=np.uint64)
    for b in range(8):
        off = byte_off + b
        if off >= k:
            break
        out |= seq[off:off + n].astype(np.uint64) << np.uint64(8 * b)
    return out


def hash_kmers_np(seq: np.ndarray, k: int, seed: int = SEED) -> np.ndarray:
    """Hash all k-mers of ``seq`` (uint8, ASCII upper-case bases).

    Returns uint32 array of length len(seq)-k+1 (empty if seq shorter
    than k).
    """
    assert seq.dtype == np.uint8
    n = int(seq.shape[0]) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h1 = np.full(n, seed, dtype=np.uint64)
        h2 = np.full(n, seed, dtype=np.uint64)
        c1 = np.uint64(_C1)
        c2 = np.uint64(_C2)

        nblocks = k // 16
        for i in range(nblocks):
            k1 = _np_words64(seq, k, n, 16 * i)
            k2 = _np_words64(seq, k, n, 16 * i + 8)
            k1 *= c1
            k1 = _np_rotl(k1, 31)
            k1 *= c2
            h1 ^= k1
            h1 = _np_rotl(h1, 27)
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= c2
            k2 = _np_rotl(k2, 33)
            k2 *= c1
            h2 ^= k2
            h2 = _np_rotl(h2, 31)
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

        tail = k & 15
        if tail > 8:
            k2 = _np_words64(seq, k, n, nblocks * 16 + 8)
            k2 *= c2
            k2 = _np_rotl(k2, 33)
            k2 *= c1
            h2 ^= k2
        if tail > 0:
            k1 = _np_words64(seq, k, n, nblocks * 16)
            k1 *= c1
            k1 = _np_rotl(k1, 31)
            k1 *= c2
            h1 ^= k1

        h1 ^= np.uint64(k)
        h2 ^= np.uint64(k)
        h1 += h2
        h2 += h1
        h1 = _np_fmix(h1)
        h2 = _np_fmix(h2)
        h1 += h2
        # (h2 += h1 does not affect the returned low bits of h1)
    return (h1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)


# ---------------------------------------------------------------------------
# JAX implementation (uint32 pairs — TPU friendly)
# ---------------------------------------------------------------------------


def _jx_fmix(x):
    x = u.xor64(x, u.shr64(x, 33))
    x = u.mul64(x, u.const64(0xFF51AFD7ED558CCD))
    x = u.xor64(x, u.shr64(x, 33))
    x = u.mul64(x, u.const64(0xC4CEB9FE1A85EC53))
    x = u.xor64(x, u.shr64(x, 33))
    return x


def _jx_words64(seq, k: int, n: int, byte_off: int):
    """(hi, lo) uint32 pair of the LE uint64 at kmer offset byte_off."""
    seq32 = seq.astype(jnp.uint32)
    lo = jnp.zeros(n, dtype=jnp.uint32)
    hi = jnp.zeros(n, dtype=jnp.uint32)
    for b in range(8):
        off = byte_off + b
        if off >= k:
            break
        sl = jax.lax.dynamic_slice_in_dim(seq32, off, n)
        if b < 4:
            lo = lo | (sl << jnp.uint32(8 * b))
        else:
            hi = hi | (sl << jnp.uint32(8 * (b - 4)))
    return hi, lo


def hash_kmers(seq, k: int, seed: int = SEED):
    """JAX version of :func:`hash_kmers_np`.

    ``seq``: uint8 [L] array (may be padded; caller slices the valid range).
    Returns uint32 [L-k+1] hashes. Fully traceable; k and L static.
    """
    n = int(seq.shape[0]) - k + 1
    assert n > 0, "sequence shorter than k"
    seed64 = u.const64(seed)
    h1 = (jnp.full(n, seed64[0], jnp.uint32), jnp.full(n, seed64[1], jnp.uint32))
    h2 = h1
    c1 = u.const64(_C1)
    c2 = u.const64(_C2)

    nblocks = k // 16
    for i in range(nblocks):
        k1 = _jx_words64(seq, k, n, 16 * i)
        k2 = _jx_words64(seq, k, n, 16 * i + 8)
        k1 = u.mul64(k1, c1)
        k1 = u.rotl64(k1, 31)
        k1 = u.mul64(k1, c2)
        h1 = u.xor64(h1, k1)
        h1 = u.rotl64(h1, 27)
        h1 = u.add64(h1, h2)
        h1 = u.add64(u.mul64(h1, u.const64(5)), u.const64(0x52DCE729))
        k2 = u.mul64(k2, c2)
        k2 = u.rotl64(k2, 33)
        k2 = u.mul64(k2, c1)
        h2 = u.xor64(h2, k2)
        h2 = u.rotl64(h2, 31)
        h2 = u.add64(h2, h1)
        h2 = u.add64(u.mul64(h2, u.const64(5)), u.const64(0x38495AB5))

    tail = k & 15
    if tail > 8:
        k2 = _jx_words64(seq, k, n, nblocks * 16 + 8)
        k2 = u.mul64(k2, c2)
        k2 = u.rotl64(k2, 33)
        k2 = u.mul64(k2, c1)
        h2 = u.xor64(h2, k2)
    if tail > 0:
        k1 = _jx_words64(seq, k, n, nblocks * 16)
        k1 = u.mul64(k1, c1)
        k1 = u.rotl64(k1, 31)
        k1 = u.mul64(k1, c2)
        h1 = u.xor64(h1, k1)

    klen = u.const64(k)
    h1 = u.xor64(h1, (jnp.broadcast_to(klen[0], (n,)), jnp.broadcast_to(klen[1], (n,))))
    h2 = u.xor64(h2, (jnp.broadcast_to(klen[0], (n,)), jnp.broadcast_to(klen[1], (n,))))
    h1 = u.add64(h1, h2)
    h2 = u.add64(h2, h1)
    h1 = _jx_fmix(h1)
    h2 = _jx_fmix(h2)
    h1 = u.add64(h1, h2)
    return h1[1]  # low 32 bits of h1
