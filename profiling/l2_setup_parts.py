"""Decompose the pallas L2 path: candidate setup sub-parts vs sweep vs votes.

Times, at a production slab shape (R=1792, sc=1024, K from _l2_slab_k):
  - batch_l2_gather total (pallas path)
  - vmapped _make_candidate_setup_pos total
  - setup sub-parts in isolation: bisects, window slices, qrank merge
    (two lax.sorts), bitonic event merge
  - l2_event_sweep_batch alone (on real setup outputs)
  - strand votes alone
"""
import dataclasses
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops import batch_map as bm
    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, map_batch_stage1,
        _make_candidate_setup_pos, _bisect_range, _bitonic_merge_sorted,
        _make_strand_votes, _round_up, I32_MAX, I32_MIN, U32_MAX,
    )
    from metamaps_tpu.ops.l2_pallas import l2_event_sweep_batch
    from metamaps_tpu.engine.mapper_jax import _minhits_table, _l2_slab_k

    jax.device_get(jnp.zeros(4) + 1)  # force first D2H (see profiling/README)

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    rng = np.random.default_rng(7)
    genomes, shard = build_db(rng, n_genomes=8, genome_len=2_000_000)
    reads = make_reads(rng, genomes, 128)
    cfg0 = MapKernelConfig.for_read_len(8192, 16, 16, 4)
    dev = DeviceShard.from_host(shard)
    B = 128
    r = np.full((B, 8192), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads):
        r[i, : len(s)] = s
        lens[i] = len(s)
    reads_d = jnp.asarray(r)
    lens_d = jnp.asarray(lens)
    mh = jnp.asarray(_minhits_table(cfg0.sketch_max, 16, 80.0))
    out = map_batch_stage1(cfg0, dev, reads_d, lens_d, mh)
    (q_hash, q_strand, s_size, s_ovf, c_seq, c_start, c_end, n_c, l1_ovf,
     n_occ) = [np.asarray(x) for x in out]
    dq_hash, dq_strand, ds_size = out[0], out[1], out[2]
    _, _, _, dq_key = bm.batch_lookup(cfg0, dev, dq_hash)

    rr = 1792
    sc = 1024
    coords = [(ri, c) for ri in range(B) for c in range(int(n_c[ri]))
              if c_seq[ri, c] >= 0 and n_occ[ri, c] <= rr]
    K = _l2_slab_k(rr)
    grp = coords[:K]
    if len(grp) < K:
        grp = (grp * ((K // len(grp)) + 1))[:K]
    rows = np.array([rc[0] for rc in grp], np.int32)
    cs = np.array([c_seq[rc] for rc in grp], np.int32)
    cst = np.array([c_start[rc] for rc in grp], np.int32)
    cen = np.array([c_end[rc] for rc in grp], np.int32)
    cfg = dataclasses.replace(cfg0, range_max=rr, sketch_cols=sc,
                              l2_impl="pallas")
    rows_d = jnp.asarray(rows)
    cs_d, cst_d, cen_d = map(jnp.asarray, (cs, cst, cen))

    t, _ = timeit(lambda: bm.batch_l2_gather(
        cfg, dev, dq_hash, dq_strand, ds_size, lens_d, rows_d, cs_d, cst_d,
        cen_d, dq_key))
    print(f"K={K} R={rr} sc={sc}")
    print(f"batch_l2_gather (pallas) total : {t*1000:7.2f} ms"
          f"  ({t/K*1000:.3f} ms/cand)")

    # gathered slab inputs, device-resident
    qh_s = dq_hash[rows]
    qs_s = dq_strand[rows]
    ss_s = ds_size[rows]
    rl_s = lens_d[rows]
    qk_s = dq_key[rows]
    jax.block_until_ready((qh_s, qs_s, ss_s, rl_s, qk_s))

    setup_fn = _make_candidate_setup_pos(cfg, dev)
    setup_jit = jax.jit(lambda *a: jax.vmap(setup_fn)(*a))
    t, st = timeit(setup_jit, qk_s, ss_s, rl_s, cs_d, cst_d, cen_d)
    print(f"setup_pos vmapped              : {t*1000:7.2f} ms")

    # --- sub-parts -------------------------------------------------------
    R = cfg.range_max
    SC = sc
    k_, w_ = cfg.kmer_size, cfg.window_size

    @jax.jit
    def part_bisect(cs_, cst_, cen_, rl_):
        def one(c_seq_, c_start_, c_end_, rlen):
            c_seq_c = jnp.maximum(c_seq_, 0)
            lo = dev.contig_offsets[c_seq_c]
            hi = dev.contig_offsets[c_seq_c + 1]
            beg0 = _bisect_range(dev.wpos, lo, hi, c_start_)
            last_end = _bisect_range(dev.wpos, lo, hi, c_end_ + rlen)
            return beg0, last_end
        return jax.vmap(one)(cs_, cst_, cen_, rl_)

    t, (beg0_d, last_d) = timeit(part_bisect, cs_d, cst_d, cen_d, rl_s)
    print(f"  bisects (2x)                 : {t*1000:7.2f} ms")

    M = dev.wpos.shape[0]

    @jax.jit
    def part_slices(beg0s, n_occs):
        def one(beg0, n_occ_c):
            occ_v = jnp.arange(R) < n_occ_c

            def slice_one(arr, fill):
                start2 = jnp.minimum(beg0, M - R)
                shift = beg0 - start2
                return jnp.roll(
                    jax.lax.dynamic_slice(arr, (start2,), (R,)), -shift)

            occ_w = jnp.where(occ_v, slice_one(dev.wpos, I32_MAX), I32_MAX)
            occ_h = jnp.where(occ_v, slice_one(dev.hash_pos, U32_MAX),
                              U32_MAX)
            start2 = jnp.minimum(beg0, M - R)
            shift = beg0 - start2
            chl = jnp.roll(
                jax.lax.dynamic_slice(dev.chains16, (0, start2), (3, R)),
                -shift, axis=1).astype(jnp.int32)
            return occ_w, occ_h, chl[0], chl[1], chl[2]
        return jax.vmap(one)(beg0s, n_occs)

    n_occ_d = jnp.minimum(last_d - beg0_d, R)
    t, sl = timeit(part_slices, beg0_d, n_occ_d)
    print(f"  window slices (wpos+hash+ch16): {t*1000:7.2f} ms")
    occ_w_d, occ_h_d = sl[0], sl[1]

    @jax.jit
    def part_qrank(occ_h, qh, s):
        def one(oh, q, s_):
            orig = jnp.concatenate(
                [jnp.arange(R, dtype=jnp.int32),
                 jnp.full(SC, I32_MAX, jnp.int32)])
            mval = jnp.concatenate([oh, q[:SC]])
            mtyp = jnp.concatenate(
                [jnp.zeros(R, jnp.int32),
                 jnp.where(jnp.arange(SC) < s_, 1, 2)])
            v_s, t_s, o_s = jax.lax.sort((mval, mtyp, orig), num_keys=2)
            isq = (t_s == 1).astype(jnp.int32)
            qrank_m = jnp.cumsum(isq) - isq

            def seg_any(aa, bb):
                va, fa = aa
                vb, fb = bb
                return vb, jnp.where(va == vb, jnp.maximum(fa, fb), fb)

            _, anyq_rev = jax.lax.associative_scan(
                seg_any, (v_s[::-1], isq[::-1]))
            anyq = anyq_rev[::-1]
            _, qrank_b, inq_b = jax.lax.sort((o_s, qrank_m, anyq), num_keys=1)
            return qrank_b[:R], inq_b[:R] > 0
        return jax.vmap(one)(occ_h, qh, s)

    t, _ = timeit(part_qrank, occ_h_d, qh_s, ss_s)
    print(f"  qrank merge (2 sorts, OLD)   : {t*1000:7.2f} ms")

    @jax.jit
    def part_qrank_new(beg0s, qk):
        def one(beg0, q):
            start2 = jnp.minimum(beg0, M - R)
            shift = beg0 - start2
            from metamaps_tpu.ops.batch_map import HROW_MASK
            hr = jnp.roll(
                jax.lax.dynamic_slice(dev.hs32, (start2,), (R,)),
                -shift) & HROW_MASK
            v = 2 * hr[:, None] + 1
            qrank = jnp.sum((q[None, :SC] < v).astype(jnp.int32), axis=1)
            in_q = (q[None, :SC] == v).any(axis=1)
            return qrank, in_q
        return jax.vmap(one)(beg0s, qk)

    t, _ = timeit(part_qrank_new, beg0_d, qk_s)
    print(f"  qrank compare (NEW)          : {t*1000:7.2f} ms")

    @jax.jit
    def part_bitonic(occ_w, qr):
        def one(ow, q):
            a_t = ow - 100
            nxt = jnp.concatenate([ow[1:], jnp.array([I32_MAX])])
            sgn = jnp.ones(R, jnp.int32)
            k2, (s2, q2) = _bitonic_merge_sorted(a_t, nxt, (sgn, q), (-sgn, q))
            return k2, s2, q2
        return jax.vmap(one)(occ_w, qr)

    qr_dummy = jnp.zeros((K, R), jnp.int32)
    t, _ = timeit(part_bitonic, occ_w_d, qr_dummy)
    print(f"  bitonic event merge          : {t*1000:7.2f} ms")

    # --- sweep alone -----------------------------------------------------
    meta = jnp.stack(
        [ss_s.astype(jnp.int32), st["p0"], st["p_max"], st["n_ev"]], axis=1)
    qrank_s = jnp.minimum(st["ev_qrank"], SC)
    sp = _round_up(SC + 1, 128)
    t, _ = timeit(partial(l2_event_sweep_batch, sp=sp),
                  meta, qrank_s, st["ev_sign"], st["ev_key"])
    print(f"sweep kernel alone             : {t*1000:7.2f} ms")

    # --- strand votes alone ---------------------------------------------
    votes_jit = jax.jit(
        lambda *a: jax.vmap(_make_strand_votes(cfg, dev))(*a))
    ob = beg0_d
    oe = jnp.minimum(beg0_d + 600, last_d)
    t, _ = timeit(votes_jit, qh_s, qs_s, ss_s, ob, oe)
    print(f"strand votes alone             : {t*1000:7.2f} ms")


if __name__ == "__main__":
    main()
