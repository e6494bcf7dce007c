"""Re-pin the 26.76 Gbp flagship shards to one common remix exponent.

The multishard swap loop shares ONE compiled kernel set across shards, so
`bench._tables_common_spec` requires identical lookup-layout metadata
(bucket_shift / lookup_mode / remix_e) — the reference's analog is that its
shard loop reuses one mapper over every serialized sketch
(mapWrap.h:417-429). The 3.345 Gbp shard caches were built independently
and `build_uniq_tables`'s empirical remix pick split 8/12 across them.

Phase 1 evaluates, per shard, the max directory bucket under each candidate
exponent at the common directory width (the caches all chose the
LOOKUP_NB_CAP = 26-bit directory); phase 2 picks the exponent minimizing
the worst-shard max bucket subject to the block16 cap (<= 16), and rewrites
ONLY the remix-dependent planes (kv32, dir_packed, bisect_steps, remix_e)
of the shards that disagree. All other planes (wpos/hs32/chains16/gpos/...)
are remix-independent. Rewrites are atomic (tmp + replace) and the stats
sidecars are refreshed.

Usage: python profiling/repin_shard_remix.py [--bases 3345284535]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from metamaps_tpu.ops.batch_map import (
    LOOKUP_NB_CAP,
    build_block_tables,
    remix_keys_np,
)

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".bench_cache")


def uniq_of(tab_fn):
    z = np.load(tab_fn, allow_pickle=True)
    hs = np.sort(np.asarray(z["hash_pos"], np.uint32))
    new_run = np.empty(hs.size, np.bool_)
    new_run[0] = True
    np.not_equal(hs[1:], hs[:-1], out=new_run[1:])
    first_idx = np.flatnonzero(new_run)
    return hs[first_idx], np.concatenate(
        [first_idx, [hs.size]]).astype(np.int64)


def max_bucket(keys, nb):
    kk = keys >> np.uint32(32 - nb)
    edges = np.flatnonzero(np.diff(kk))
    bounds = np.concatenate([[-1], edges, [len(kk) - 1]])
    return int(np.max(np.diff(bounds))) if len(kk) else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=3345284535)
    ap.add_argument("--candidates", default="8,12,16")
    args = ap.parse_args()
    cands = [int(x) for x in args.candidates.split(",")]

    files = sorted(glob.glob(
        os.path.join(CACHE, f"db_{args.bases}_*_tables.npz")))
    assert files, "no shard caches found"
    nb = LOOKUP_NB_CAP

    # phase 1: per-shard (uniq cached in RAM one at a time), max bucket per
    # candidate exponent
    stats = {}
    per_shard_mb = {}
    for fn in files:
        z = np.load(fn, allow_pickle=True)
        cur_e = int(z["remix_e"])
        assert int(z["bucket_shift"]) == 32 - nb, fn
        uniq, _ = uniq_of(fn)
        mbs = {}
        for e in cands:
            mbs[e] = max_bucket(remix_keys_np(uniq, e), nb)
        per_shard_mb[fn] = (cur_e, mbs)
        print(f"{os.path.basename(fn)}: remix={cur_e} U={len(uniq)} "
              f"max_bucket per e: {mbs}", flush=True)
        del uniq

    # phase 2: common exponent = min worst-shard bucket, must fit block16
    worst = {e: max(mbs[e] for _, mbs in per_shard_mb.values())
             for e in cands}
    ok = {e: w for e, w in worst.items() if w <= 16}
    assert ok, f"no candidate exponent keeps every shard <= 16: {worst}"
    pick = min(ok, key=lambda e: (ok[e], e))
    print(f"common remix_e = {pick} (worst max bucket {ok[pick]})",
          flush=True)

    for fn, (cur_e, mbs) in per_shard_mb.items():
        side_fn = fn + ".stats.json"
        if cur_e == pick:
            continue
        print(f"rebuilding lookup tables of {os.path.basename(fn)} "
              f"({cur_e} -> {pick})", flush=True)
        z = np.load(fn, allow_pickle=True)
        tables = {k: z[k] for k in z.files if k != "allow_pickle"}
        uniq, uniq_start = uniq_of(fn)
        keys = remix_keys_np(uniq, pick)
        shift = 32 - nb
        counts = np.bincount(
            (keys >> np.uint32(shift)).astype(np.int64), minlength=1 << nb)
        bucket_start = np.empty((1 << nb) + 1, np.int32)
        bucket_start[0] = 0
        bucket_start[1:] = np.cumsum(counts)
        mb = int(np.max(np.diff(bucket_start)))
        assert 8 < mb <= 16, (fn, mb)  # stays block16
        kv32, dir_packed = build_block_tables(
            uniq, uniq_start.astype(np.int32), bucket_start)
        tables["kv32"] = kv32
        tables["dir_packed"] = dir_packed
        tables["bisect_steps"] = np.int64(int(np.ceil(np.log2(mb + 1))) + 1)
        tables["remix_e"] = np.int64(pick)
        assert str(tables["lookup_mode"]) == "block16"
        np.savez(fn + ".tmp.npz", **tables)
        os.replace(fn + ".tmp.npz", fn)
        if os.path.exists(side_fn):
            side = json.load(open(side_fn))
            side["stats"]["remix_e"] = pick
            side["stats"]["bisect_steps"] = int(tables["bisect_steps"])
            with open(side_fn + ".tmp", "w") as f:
                json.dump(side, f)
            os.replace(side_fn + ".tmp", side_fn)
        print(f"  done (max bucket {mb})", flush=True)


if __name__ == "__main__":
    main()
