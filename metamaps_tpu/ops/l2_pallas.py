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
