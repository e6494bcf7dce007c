"""matmul vs lockstep-pallas L2 at production slab shapes, on the chip."""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_db, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from metamaps_tpu.ops.batch_map import (
        DeviceShard, MapKernelConfig, batch_l2_gather, map_batch_stage1,
    )
    from metamaps_tpu.engine.mapper_jax import _minhits_table, _l2_slab_k

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
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

    for rr in (1792, 2688):
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
        max_s = int(max(s_size[rc[0]] for rc in grp))
        sc = next(x for x in (256, 512, 1024, cfg0.sketch_max) if x >= max_s)
        ec = min(2 * rr, ((rr + rr // 4 + 127) // 128) * 128)
        rows_d = jnp.asarray(rows)
        cs_d, cst_d, cen_d = map(jnp.asarray, (cs, cst, cen))
        for impl in ("matmul", "pallas"):
            cfg = dataclasses.replace(
                cfg0, range_max=rr, sketch_cols=sc, event_cap=ec, l2_impl=impl)
            try:
                t, o = timeit(lambda cfg=cfg: batch_l2_gather(
                    cfg, dev, dq_hash, dq_strand, ds_size, lens_d,
                    rows_d, cs_d, cst_d, cen_d))
                novf = int(np.asarray(o)[4].sum())
                print(f"R={rr} K={K} sc={sc} {impl:7s}: {t*1000:7.2f} ms "
                      f"({t/K*1000:.3f} ms/cand) ovf={novf}")
            except Exception as e:
                print(f"R={rr} {impl}: FAILED {type(e).__name__}: {e}")
        # cross-check outputs
        cfg_m = dataclasses.replace(cfg0, range_max=rr, sketch_cols=sc,
                                    event_cap=ec, l2_impl="matmul")
        cfg_p = dataclasses.replace(cfg_m, l2_impl="pallas")
        om = np.asarray(batch_l2_gather(cfg_m, dev, dq_hash, dq_strand,
                                        ds_size, lens_d, rows_d, cs_d, cst_d, cen_d))
        op = np.asarray(batch_l2_gather(cfg_p, dev, dq_hash, dq_strand,
                                        ds_size, lens_d, rows_d, cs_d, cst_d, cen_d))
        same = np.array_equal(om, op)
        print(f"R={rr} outputs identical: {same}")
        if not same:
            bad = np.nonzero((om != op).any(axis=0))[0][:5]
            print("  first diffs at", bad, "\n  matmul:", om[:, bad].T,
                  "\n  pallas:", op[:, bad].T)


if __name__ == "__main__":
    main()
