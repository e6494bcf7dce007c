"""Pallas TPU kernel for the L2 event sweep.

The event-interval reformulation (see metamaps_tpu.ops.batch_map) needs,
per candidate, the shared-sketch count at every iterator stop, and then the
maximum with the reference's first/last tie rule. The count is piecewise
constant between events, so the kernel sweeps the events in row order
keeping two VMEM state planes (laid out (8, S_pad/8) for full sublane
utilization; rank j lives at linear index j):

- C[j]: number of distinct ref-only hashes with query rank <= j currently
  active (suffix add/subtract per event — one VPU vector op);
- M[j]: 0/1 presence of query hash j among active reference minimizers
  (one-hot vector update);

evaluates shared_e = sum_j M[j] & (j + C[j] < s) after each event, and
folds the optimum online over the event's grid-row segment intersected with
the candidate's valid row range [row_lo, row_hi]:

- shared > best  -> best = shared, first = segment start, last = segment end
- shared == best -> last = segment end        (the reference's tie rule:
  mean of the FIRST and LAST maximal states, computeMap.hpp:509-537)

Padding events sort to the end (row = INT32_MAX) and the sweep stops at the
candidate's real event count. Events live in SMEM (dynamic scalar reads).
Total work is O(E_real * S) vector ops per candidate — no [P, S]
materialization, no XLA scatter, no O(P*E*S) matmul.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8


def _sweep_kernel(meta_ref, qrank_ref, signinq_ref, rows_ref, out_ref,
                  c_state, m_state):
    """One candidate per grid program.

    meta_ref [N, 4] int32 (scalar prefetch): (s, row_lo, row_hi, n_events).
    qrank_ref/signinq_ref/rows_ref [1, 1, E2] int32 (SMEM): events sorted by
    row, padding last; signinq packs sign/in_q: +-1 ref-only, +-2 in-q.
    out_ref [1, 1, 4] int32 (SMEM): best, first_row, last_row, _pad.
    Scratch: c_state/m_state [SUBLANES, S_pad/SUBLANES] int32.
    """
    rows_per, cols = c_state.shape
    E2 = qrank_ref.shape[2]
    i = pl.program_id(0)
    s = meta_ref[i, 0]
    row_lo = meta_ref[i, 1]
    row_hi = meta_ref[i, 2]
    n_ev = meta_ref[i, 3]

    c_state[:] = jnp.zeros_like(c_state)
    m_state[:] = jnp.zeros_like(m_state)
    # linear rank index j at (r, c) = r * cols + c
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (rows_per, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (rows_per, cols), 1)
    )

    def body(e, carry):
        best, first, last = carry
        qr = qrank_ref[0, 0, e]
        si = signinq_ref[0, 0, e]
        row = rows_ref[0, 0, e]
        row_next = jnp.where(
            e + 1 < n_ev, rows_ref[0, 0, jnp.minimum(e + 1, E2 - 1)], row_hi + 1
        )

        is_inq = (si == 2) | (si == -2)
        sign = jnp.where(si > 0, 1, jnp.where(si < 0, -1, 0))

        # ref-only event: suffix add over ranks >= qr; in-q event: one-hot
        c_state[:] = c_state[:] + jnp.where(is_inq, 0, sign) * (
            lin >= qr
        ).astype(jnp.int32)
        m_state[:] = m_state[:] + jnp.where(is_inq, sign, 0) * (
            lin == qr
        ).astype(jnp.int32)

        shared = jnp.sum(
            jnp.where((m_state[:] > 0) & ((lin + c_state[:]) < s), 1, 0),
            dtype=jnp.int32,
        )

        seg_a = jnp.maximum(row, row_lo)
        seg_b = jnp.minimum(row_next - 1, row_hi)
        nonempty = seg_a <= seg_b
        better = nonempty & (shared > best)
        equal = nonempty & (shared == best) & (best > 0)
        first = jnp.where(better, seg_a, first)
        last = jnp.where(better | equal, seg_b, last)
        best = jnp.where(better, shared, best)
        return best, first, last

    best, first, last = jax.lax.fori_loop(
        0, n_ev, body, (jnp.int32(0), jnp.int32(-1), jnp.int32(-1))
    )
    out_ref[0, 0, 0] = best
    out_ref[0, 0, 1] = first
    out_ref[0, 0, 2] = last
    out_ref[0, 0, 3] = 0


BLK = 128  # events per grid program (statically unrolled in the kernel;
           # TPU block shapes need the trailing dim to be a multiple of 128)
RB = 8     # candidates per row-block program (one sublane tile)


def _batch_sweep_kernel(meta_ref, qrank_ref, signinq_ref, rows_ref, out_ref,
                        c_plane, m_plane, fold):
    """Lockstep sweep over ALL candidates of a slab.

    Grid = event blocks (sequential on TPU). Each program receives one
    [BLK, N] block of the event-major arrays (auto-DMA'd by pallas) and
    applies its BLK events with statically-unrolled [N, SP] vector ops — no
    dynamic addressing, no scalar loops. State planes and the optimum fold
    persist in scratch across programs.

    Segments are closed LAZILY: before applying event e, the interval
    [prev_row, row_e - 1] is scored with the current shared count (the value
    after event e-1), which reproduces the eager kernel's
    evaluate-after-each-event semantics without needing row_{e+1}.

    All arrays are candidate-major (N on sublanes) so per-candidate vectors
    are [N, 1] columns and broadcast along the SP lane dimension with no
    lane<->sublane relayout.

    meta_ref [N, 4] int32: (s, row_lo, row_hi, unused) columns.
    out_ref [N, 4] int32: (best, first_row, last_row, 0).
    Scratch: c_plane/m_plane [N, SP] int32; fold [N, 8] int32 holding
    (best, first, last, prev_row, shared) columns.
    """
    N, SP = c_plane.shape
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    s = meta_ref[:, 0:1]
    row_lo = meta_ref[:, 1:2]
    row_hi = meta_ref[:, 2:3]
    lin = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)

    @pl.when(i == 0)
    def _init():
        c_plane[:] = jnp.zeros_like(c_plane)
        m_plane[:] = jnp.zeros_like(m_plane)
        z = jnp.zeros((N, 1), jnp.int32)
        fold[:, 0:1] = z          # best
        fold[:, 1:2] = z - 1      # first
        fold[:, 2:3] = z - 1      # last
        fold[:, 3:4] = z + jnp.int32(-(2**31))  # prev_row
        fold[:, 4:5] = z          # shared

    # skip blocks that are padding-only across the whole slab: padding
    # events (row I32_MAX, sign 0) are state no-ops and the trailing
    # segment close happens in _finish, so such a block (always a suffix —
    # events are row-sorted with padding last) can be skipped entirely.
    # events are event-major, so this prunes the slab's common tail.
    row_all = rows_ref[:]

    @pl.when(jnp.min(row_all) != jnp.int32(2**31 - 1))
    def _process():
        # carry ALL state as values across the unrolled block (vector
        # registers); scratch is read/written once per program — a per-step
        # scratch RMW costs ~16x (measured 14.7 us/step vs 0.9)
        qr_all = qrank_ref[:]
        si_all = signinq_ref[:]
        c = c_plane[:]
        m = m_plane[:]
        best = fold[:, 0:1]
        first = fold[:, 1:2]
        last = fold[:, 2:3]
        prev_row = fold[:, 3:4]
        shared = fold[:, 4:5]

        for e in range(BLK):
            qr = qr_all[:, e : e + 1]
            si = si_all[:, e : e + 1]
            row = row_all[:, e : e + 1]

            # close the segment ending just before this event's row
            seg_a = jnp.maximum(prev_row, row_lo)
            seg_b = jnp.minimum(row - 1, row_hi)
            nonempty = seg_a <= seg_b
            better = nonempty & (shared > best)
            equal = nonempty & (shared == best) & (best > 0)
            first = jnp.where(better, seg_a, first)
            last = jnp.where(better | equal, seg_b, last)
            best = jnp.where(better, shared, best)
            prev_row = jnp.maximum(prev_row, row)

            is_inq = (si == 2) | (si == -2)
            sign = jnp.where(si > 0, 1, jnp.where(si < 0, -1, 0))
            c = c + jnp.where(((~is_inq) & (sign != 0)) & (lin >= qr), sign, 0)
            m = m + jnp.where(is_inq & (lin == qr), sign, 0)
            shared = jnp.sum(
                (m > 0) & ((lin + c) < s),
                axis=1, dtype=jnp.int32, keepdims=True,
            )

        c_plane[:] = c
        m_plane[:] = m
        fold[:, 0:1] = best
        fold[:, 1:2] = first
        fold[:, 2:3] = last
        fold[:, 3:4] = prev_row
        fold[:, 4:5] = shared

    @pl.when(i == n_prog - 1)
    def _finish():
        best = fold[:, 0:1]
        first = fold[:, 1:2]
        last = fold[:, 2:3]
        prev_row = fold[:, 3:4]
        shared = fold[:, 4:5]
        # close the trailing segment [prev_row, row_hi]
        seg_a = jnp.maximum(prev_row, row_lo)
        seg_b = row_hi
        nonempty = seg_a <= seg_b
        better = nonempty & (shared > best)
        equal = nonempty & (shared == best) & (best > 0)
        out_ref[:, 0:1] = jnp.where(better, shared, best)
        out_ref[:, 1:2] = jnp.where(better, seg_a, first)
        out_ref[:, 2:3] = jnp.where(better | equal, seg_b, last)
        out_ref[:, 3:4] = jnp.zeros((N, 1), jnp.int32)


def _rb_sweep_kernel(meta_ref, qrank_ref, signinq_ref, rows_ref, out_ref,
                     c_plane, m_plane, fold):
    """Row-block × event-block lockstep sweep.

    Grid = (row blocks of RB candidates, event blocks of BLK) with the event
    axis minor: each RB-candidate group sweeps its own event stream with
    [RB, SP] vector ops, and an event block whose RB rows are ALL padding is
    skipped (its work would be sign-0 no-ops). Because the caller sorts slab
    members by event count (and padding candidates have zero events), each
    row group prunes to ITS OWN event tail — padding rows and short
    candidates cost ~nothing, unlike a slab-global sweep where every block
    runs at the full candidate width. Semantics identical to
    _batch_sweep_kernel (lazy segment close; trailing close in the final
    block).

    meta_ref [RB, 4] int32: (s, row_lo, row_hi, unused) columns.
    out_ref [RB, 4] int32: (best, first_row, last_row, 0).
    Scratch: c_plane/m_plane [RB, SP] int32; fold [RB, 8] int32.
    """
    N, SP = c_plane.shape
    j = pl.program_id(1)
    n_ev_blocks = pl.num_programs(1)
    s = meta_ref[:, 0:1]
    row_lo = meta_ref[:, 1:2]
    row_hi = meta_ref[:, 2:3]
    lin = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)

    @pl.when(j == 0)
    def _init():
        c_plane[:] = jnp.zeros_like(c_plane)
        m_plane[:] = jnp.zeros_like(m_plane)
        z = jnp.zeros((N, 1), jnp.int32)
        fold[:, 0:1] = z          # best
        fold[:, 1:2] = z - 1      # first
        fold[:, 2:3] = z - 1      # last
        fold[:, 3:4] = z + jnp.int32(-(2**31))  # prev_row
        fold[:, 4:5] = z          # shared

    row_all = rows_ref[:]

    @pl.when(jnp.min(row_all) != jnp.int32(2**31 - 1))
    def _process():
        qr_all = qrank_ref[:]
        si_all = signinq_ref[:]
        c = c_plane[:]
        m = m_plane[:]
        best = fold[:, 0:1]
        first = fold[:, 1:2]
        last = fold[:, 2:3]
        prev_row = fold[:, 3:4]
        shared = fold[:, 4:5]

        for e in range(BLK):
            qr = qr_all[:, e : e + 1]
            si = si_all[:, e : e + 1]
            row = row_all[:, e : e + 1]

            seg_a = jnp.maximum(prev_row, row_lo)
            seg_b = jnp.minimum(row - 1, row_hi)
            nonempty = seg_a <= seg_b
            better = nonempty & (shared > best)
            equal = nonempty & (shared == best) & (best > 0)
            first = jnp.where(better, seg_a, first)
            last = jnp.where(better | equal, seg_b, last)
            best = jnp.where(better, shared, best)
            prev_row = jnp.maximum(prev_row, row)

            is_inq = (si == 2) | (si == -2)
            sign = jnp.where(si > 0, 1, jnp.where(si < 0, -1, 0))
            c = c + jnp.where(((~is_inq) & (sign != 0)) & (lin >= qr), sign, 0)
            m = m + jnp.where(is_inq & (lin == qr), sign, 0)
            shared = jnp.sum(
                (m > 0) & ((lin + c) < s),
                axis=1, dtype=jnp.int32, keepdims=True,
            )

        c_plane[:] = c
        m_plane[:] = m
        fold[:, 0:1] = best
        fold[:, 1:2] = first
        fold[:, 2:3] = last
        fold[:, 3:4] = prev_row
        fold[:, 4:5] = shared

    @pl.when(j == n_ev_blocks - 1)
    def _finish():
        best = fold[:, 0:1]
        first = fold[:, 1:2]
        last = fold[:, 2:3]
        prev_row = fold[:, 3:4]
        shared = fold[:, 4:5]
        seg_a = jnp.maximum(prev_row, row_lo)
        seg_b = row_hi
        nonempty = seg_a <= seg_b
        better = nonempty & (shared > best)
        equal = nonempty & (shared == best) & (best > 0)
        out_ref[:, 0:1] = jnp.where(better, shared, best)
        out_ref[:, 1:2] = jnp.where(better, seg_a, first)
        out_ref[:, 2:3] = jnp.where(better | equal, seg_b, last)
        out_ref[:, 3:4] = jnp.zeros((N, 1), jnp.int32)


@partial(jax.jit, static_argnames=("sp", "interpret"))
def l2_event_sweep_rb(meta, qrank, signinq, rows, sp: int,
                      interpret: bool = False):
    """Row-block batched sweep (see _rb_sweep_kernel). Same contract as
    :func:`l2_event_sweep_batch`; best when the slab carries padding
    candidates or heterogeneous event counts (callers should order members
    by descending event count)."""
    N0, E2 = qrank.shape
    assert sp % 128 == 0
    N = (N0 + RB - 1) // RB * RB
    e2p = (E2 + BLK - 1) // BLK * BLK

    def padded(x, fill):
        out = jnp.full((N, e2p), fill, jnp.int32)
        return jax.lax.dynamic_update_slice(out, x, (0, 0))

    qrank_p = padded(qrank, 0)
    signinq_p = padded(signinq, 0)
    rows_p = padded(rows, np.int32(2**31 - 1))
    if N != N0:
        meta = jnp.concatenate(
            [meta, jnp.zeros((N - N0, meta.shape[1]), jnp.int32)], axis=0
        )
    out = pl.pallas_call(
        _rb_sweep_kernel,
        grid=(N // RB, e2p // BLK),
        out_shape=jax.ShapeDtypeStruct((N, 4), jnp.int32),
        in_specs=[
            pl.BlockSpec((RB, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RB, sp), jnp.int32),
            pltpu.VMEM((RB, sp), jnp.int32),
            pltpu.VMEM((RB, 8), jnp.int32),
        ],
        interpret=interpret,
    )(meta, qrank_p, signinq_p, rows_p)
    return out[:N0]


@partial(jax.jit, static_argnames=("sp", "interpret"))
def l2_event_sweep_batch(meta, qrank, signinq, rows, sp: int,
                         interpret: bool = False):
    """Lockstep batched sweep (the accelerator L2 path).

    meta [N, 4] int32: (sketch size, row_lo, row_hi, n_events) per candidate;
    qrank/signinq/rows [N, E2] int32 events sorted by row, padding
    (sign 0, row INT32_MAX) last. ``sp`` = rank-plane width (must cover the
    max clipped qrank + 1, multiple of 128).
    Returns [N, 4] int32: (best shared, first_row, last_row, 0).
    """
    N0, E2 = qrank.shape
    assert sp % 128 == 0
    # pad candidates to a full sublane tile (partial tiles force masked ops)
    N = (N0 + 7) // 8 * 8
    e2p = (E2 + BLK - 1) // BLK * BLK

    def padded(x, fill):
        out = jnp.full((N, e2p), fill, jnp.int32)
        return jax.lax.dynamic_update_slice(out, x, (0, 0))

    qrank_p = padded(qrank, 0)
    signinq_p = padded(signinq, 0)
    rows_p = padded(rows, np.int32(2**31 - 1))
    if N != N0:
        meta = jnp.concatenate(
            [meta, jnp.zeros((N - N0, meta.shape[1]), jnp.int32)], axis=0
        )
    out = pl.pallas_call(
        _batch_sweep_kernel,
        grid=(e2p // BLK,),
        out_shape=jax.ShapeDtypeStruct((N, 4), jnp.int32),
        in_specs=[
            pl.BlockSpec((N, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N, sp), jnp.int32),
            pltpu.VMEM((N, sp), jnp.int32),
            pltpu.VMEM((N, 8), jnp.int32),
        ],
        interpret=interpret,
    )(meta, qrank_p, signinq_p, rows_p)
    return out[:N0]


@partial(jax.jit, static_argnames=("s_pad", "interpret"))
def l2_event_sweep(meta, qrank, signinq, rows, s_pad: int,
                   interpret: bool = False):
    """Batched sweep.

    meta [N, 4] int32: (sketch size, row_lo, row_hi, n_events) per candidate;
    qrank/signinq/rows [N, E2] int32 events sorted by row, padding last.
    Returns [N, 4] int32: (best shared, first_row, last_row, 0).
    """
    N, E2 = qrank.shape
    assert s_pad % (SUBLANES * 128) == 0, s_pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            # SMEM: the sweep reads events at dynamic scalar indices, which
            # VMEM lane addressing cannot do
            pl.BlockSpec((1, 1, E2), lambda i, m_ref: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, E2), lambda i, m_ref: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, E2), lambda i, m_ref: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4), lambda i, m_ref: (i, 0, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, s_pad // SUBLANES), jnp.int32),
            pltpu.VMEM((SUBLANES, s_pad // SUBLANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
        interpret=interpret,
    )(meta, qrank.reshape(N, 1, E2), signinq.reshape(N, 1, E2),
      rows.reshape(N, 1, E2))
    return out.reshape(N, 4)
