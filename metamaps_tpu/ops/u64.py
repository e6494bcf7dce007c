"""64-bit unsigned arithmetic as pairs of uint32 lanes, for JAX on TPU.

TPU VPU lanes are 32-bit; XLA emulates 64-bit integers slowly. We instead
represent a u64 as a ``(hi, lo)`` pair of uint32 arrays and implement the
handful of 64-bit ops MurmurHash3 needs (xor, add, mul, rotl, shifts) with
native 32-bit vector ops. All functions broadcast elementwise.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_MASK16 = 0xFFFF  # plain ints: no device arrays at import time


def const64(value: int):
    """A python int -> (hi, lo) numpy uint32 scalar pair (no backend use)."""
    import numpy as _np

    return _np.uint32((value >> 32) & 0xFFFFFFFF), _np.uint32(value & 0xFFFFFFFF)


def xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def add64(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(_U32)
    hi = a[0] + b[0] + carry
    return hi, lo


def shl64(a, s: int):
    """Left shift by a static amount 0 < s < 64."""
    if s == 0:
        return a
    if s < 32:
        hi = (a[0] << _U32(s)) | (a[1] >> _U32(32 - s))
        lo = a[1] << _U32(s)
        return hi, lo
    return a[1] << _U32(s - 32) if s > 32 else a[1], jnp.zeros_like(a[1])


def shr64(a, s: int):
    """Logical right shift by a static amount 0 < s < 64."""
    if s == 0:
        return a
    if s < 32:
        lo = (a[1] >> _U32(s)) | (a[0] << _U32(32 - s))
        hi = a[0] >> _U32(s)
        return hi, lo
    return jnp.zeros_like(a[0]), a[0] >> _U32(s - 32) if s > 32 else a[0]


def rotl64(a, r: int):
    left = shl64(a, r)
    right = shr64(a, 64 - r)
    return left[0] | right[0], left[1] | right[1]


def _mul32_full(a, b):
    """32x32 -> 64 bit product of uint32 arrays, via 16-bit limbs."""
    a_hi, a_lo = a >> _U32(16), a & _MASK16
    b_hi, b_lo = b >> _U32(16), b & _MASK16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + hl                      # may wrap: detect carry
    mid_carry = (mid < lh).astype(_U32)
    lo = ll + (mid << _U32(16))
    lo_carry = (lo < ll).astype(_U32)
    hi = hh + (mid >> _U32(16)) + (mid_carry << _U32(16)) + lo_carry
    return hi, lo


def mul64(a, b):
    """Low 64 bits of a*b for (hi, lo) uint32 pairs."""
    hi, lo = _mul32_full(a[1], b[1])
    hi = hi + a[1] * b[0] + a[0] * b[1]
    return hi, lo
