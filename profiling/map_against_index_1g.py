"""mapAgainstIndex at 1 Gbp (VERDICT r3 item 8).

Exercises the serialize/restore contract (mapWrap.h:358-531) at bench
scale: `index` builds + persists the 1 Gbp shard from the bench DB's
DB.fa (written by profiling/u_at_scale.py), `mapAgainstIndex` restores it
and maps a 2048-read subset of the bench read set, and the output files
must be BYTE-EQUAL to `mapDirectly` on the same inputs. Timings +
verdict are written to MAI_1G.json at the repo root.

Run on the chip (after u_at_scale.py wrote the DB dir):
    python profiling/map_against_index_1g.py
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DB_FA = os.path.join(ROOT, ".bench_cache", "u_db", "DB.fa")
WORK = os.path.join(ROOT, ".bench_cache", "mai_1g")
N_READS = 2048


def sha(fn):
    h = hashlib.sha256()
    with open(fn, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from metamaps_tpu.cli import main as cli

    assert os.path.exists(DB_FA), "run profiling/u_at_scale.py first"
    os.makedirs(WORK, exist_ok=True)
    reads_fn = os.path.join(WORK, "reads.fq")
    if not os.path.exists(reads_fn):
        rz = np.load(os.path.join(
            ROOT, ".bench_cache", "reads_1000000000_20260820_16384.npz"),
            allow_pickle=True)
        with open(reads_fn, "w") as f:
            for i, r in enumerate(rz["reads"][:N_READS]):
                s = np.asarray(r).tobytes().decode()
                f.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")

    rec = {"artifact": "mapAgainstIndex at 1 Gbp (VERDICT r3 item 8 / r4 item 3)",
           "date": time.strftime("%Y-%m-%d"), "db_fa": "1 Gbp bench DB", "n_reads": N_READS}
    # sketch-time parameters live with the index (--pi/--minReadLen are
    # persisted in idx.parameters and restored by mapAgainstIndex — the
    # reference's contract, mapWrap.h:381-394); query-side flags only here
    q_common = ["--all", "--mapping-engine", "jax", "--threads", "2"]

    prefix = os.path.join(WORK, "idx")
    if not os.path.exists(prefix + ".index"):
        t0 = time.perf_counter()
        cli(["index", "-r", DB_FA, "-i", prefix,
             "--pi", "80", "--minReadLen", "2000"])
        rec["index_build_s"] = round(time.perf_counter() - t0, 1)
    rec["index_bytes"] = sum(
        os.path.getsize(os.path.join(WORK, f))
        for f in os.listdir(WORK) if f.startswith("idx"))

    t0 = time.perf_counter()
    out_ai = os.path.join(WORK, "out_ai")
    cli(["mapAgainstIndex", "-i", prefix, "-q", reads_fn, "-o", out_ai]
        + q_common)
    rec["mapAgainstIndex_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out_d = os.path.join(WORK, "out_d")
    cli(["mapDirectly", "-r", DB_FA, "-q", reads_fn, "-o", out_d,
         "--pi", "80", "--minReadLen", "2000"] + q_common)
    rec["mapDirectly_s"] = round(time.perf_counter() - t0, 1)

    rec["byte_equal"] = {}
    for suffix in ("", ".meta", ".meta.unmappedReadsLengths"):
        rec["byte_equal"][suffix or "mappings"] = (
            sha(out_ai + suffix) == sha(out_d + suffix))
    rec["mapping_lines"] = sum(1 for _ in open(out_ai))
    assert all(rec["byte_equal"].values()), rec["byte_equal"]

    with open(os.path.join(ROOT, "MAI_1G.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
