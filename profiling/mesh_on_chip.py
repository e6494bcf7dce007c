"""VERDICT r2 item 5: run the spatial product path on the REAL chip
(mesh shard=1,data=1) and verify outputs byte-identical to the non-mesh
run. Protects the multi-chip story from a Mosaic surprise — the mesh
kernels had only ever compiled on the virtual CPU mesh.

Run (chip): python profiling/mesh_on_chip.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    from metamaps_tpu.cli import main as cli_main

    rng = np.random.default_rng(424242)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    td = tempfile.mkdtemp()
    genomes = [rng.choice(bases, size=40000) for _ in range(3)]
    ref_fa = os.path.join(td, "DB.fa")
    with open(ref_fa, "w") as f:
        for i, g in enumerate(genomes):
            f.write(f">G{i}|kraken:taxid|{8000 + i}|Y.1\n")
            f.write(g.tobytes().decode() + "\n")
    reads_fq = os.path.join(td, "reads.fastq")
    with open(reads_fq, "w") as f:
        for i in range(16):
            g = genomes[i % 3]
            piece = g[700 + 311 * i : 700 + 311 * i + 3000].copy()
            # sprinkle substitutions so identities vary
            idx = rng.integers(0, len(piece), 90)
            piece[idx] = bases[rng.integers(0, 4, 90)]
            f.write(f"@m{i}\n{piece.tobytes().decode()}\n+\n")
            f.write("I" * len(piece) + "\n")

    out1 = os.path.join(td, "plain")
    t0 = time.time()
    rc = cli_main([
        "mapDirectly", "--reference", ref_fa, "--query", reads_fq,
        "--output", out1, "--all", "--minReadLen", "2000",
    ])
    assert rc == 0
    print(f"plain mapDirectly: {time.time() - t0:.1f}s", flush=True)

    out2 = os.path.join(td, "mesh")
    t0 = time.time()
    rc = cli_main([
        "mapDirectly", "--reference", ref_fa, "--query", reads_fq,
        "--output", out2, "--all", "--minReadLen", "2000",
        "--mesh", "shard=1,data=1", "--meshProgress",
    ])
    assert rc == 0
    print(f"mesh shard=1,data=1 mapDirectly: {time.time() - t0:.1f}s",
          flush=True)

    plain = open(out1).read()
    mesh = open(out2).read()
    assert plain == mesh, "mesh output differs from plain on the chip!"
    for suffix in (".meta", ".meta.unmappedReadsLengths"):
        assert open(out1 + suffix).read() == open(out2 + suffix).read(), suffix
    n = len(plain.splitlines())
    print(f"OK: mesh product path on {jax.default_backend()} byte-identical "
          f"to plain ({n} mapping lines)", flush=True)

    # ---- mesh-vs-plain steady-state cost ratio (VERDICT r3 item 6) -------
    # same shard, same reads, both engines warmed; the mesh engine runs
    # shard=1,data=1 so any overhead is pure mesh-path cost (shard_map
    # plumbing, worst-case L2 slabs instead of adaptive routing)
    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.io.fasta import read_sequences
    from metamaps_tpu.ops.winnow import winnow_fast
    from metamaps_tpu.parallel.sharded_engine import ShardedMapperEngine
    from metamaps_tpu.params import Parameters

    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    shard = SketchShard()
    parts = []
    for i, (name, seq) in enumerate(read_sequences(ref_fa)):
        h, p, s = winnow_fast(seq, 16, 16)
        parts.append((h, p, s, i))
        shard.contig_names.append(name)
        shard.contig_lengths.append(len(seq))
    shard.finalize(parts)
    reads = [seq for _, seq in read_sequences(reads_fq)] * 16  # 256 reads

    def steady(map_fn, n=3):
        map_fn(reads)
        map_fn(reads)
        map_fn(reads)
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            map_fn(reads)
            best = min(best, time.time() - t0)
        return best

    plain_eng = JaxMapperEngine(shard, params, read_len_buckets=(4096,))
    t_plain = steady(plain_eng.map_reads)
    mesh_eng = ShardedMapperEngine(shard, params, 1, 1,
                                   read_len_buckets=(4096,),
                                   rows_per_device=256)
    t_mesh = steady(mesh_eng.map_reads)
    ratio = t_mesh / t_plain
    print(f"steady-state cost, {len(reads)} reads: plain {t_plain:.3f}s, "
          f"mesh(1x1) {t_mesh:.3f}s -> ratio {ratio:.2f}x", flush=True)

    # record the measured ratio in a committed artifact (VERDICT r4 weak
    # #4: the printed number was never on record)
    import json

    rec = {
        "artifact": "mesh(1x1)-vs-plain steady-state mapping cost on the "
                    "real chip (spatial product path overhead)",
        "backend": str(jax.default_backend()),
        "n_reads": len(reads),
        "byte_identical": True,
        "mapping_lines": n,
        "plain_s": round(t_plain, 3),
        "mesh_s": round(t_mesh, 3),
        "ratio": round(ratio, 3),
    }
    out_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          "MESH_RATIO.json")
    with open(out_fn, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"-> {os.path.normpath(out_fn)}", flush=True)


if __name__ == "__main__":
    main()
