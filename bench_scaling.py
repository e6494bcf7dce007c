"""Sharded-mapping scaling check on a virtual device mesh.

With one physical chip, true multi-host scaling cannot be measured here;
this script validates the scaling STRUCTURE instead: it runs the sharded
mapping step on 1/2/4/8 virtual CPU devices, confirms the merged candidate
sets are invariant to the mesh shape, and reports per-configuration step
times (meaningful relatively, not absolutely, on host-simulated devices).
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.engine.mapper_jax import _minhits_table
from metamaps_tpu.ops.batch_map import MapKernelConfig
from metamaps_tpu.ops.winnow import winnow_np
from metamaps_tpu.parallel.mesh import make_mesh_2d
from metamaps_tpu.parallel.sharded_map import (
    partition_contigs,
    sharded_map_step,
    stack_shards,
)


def main():
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases, size=60000) for _ in range(8)]
    full = SketchShard()
    parts = []
    for i, g in enumerate(genomes):
        h, p, s = winnow_np(g, 16, 16)
        parts.append((h, p, s, i))
        full.contig_names.append(f"C{i}")
        full.contig_lengths.append(len(g))
    full.finalize(parts)

    cfg = MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")
    B = 16
    reads = np.full((B, 4096), ord("A"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        g = genomes[i % len(genomes)]
        piece = g[1000 : 1000 + 3000]
        reads[i, : len(piece)] = piece
        lens[i] = len(piece)
    minhits = jnp.asarray(_minhits_table(cfg.sketch_max, 16, 80.0))

    results = {}
    merged_sets = {}
    for n_shard, n_data in [(1, 1), (2, 1), (2, 2), (4, 2)]:
        mesh = make_mesh_2d(n_shard, n_data)
        stacked = stack_shards(partition_contigs(full, n_shard))
        args = (mesh, stacked, cfg, jnp.asarray(reads), jnp.asarray(lens), minhits)
        out = sharded_map_step(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = sharded_map_step(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        g_seq, g_shared, g_pos = (np.asarray(x) for x in out)
        merged = set()
        for d in range(g_seq.shape[0]):
            for b in range(B):
                for c in range(g_seq.shape[2]):
                    if g_seq[d, b, c] >= 0:
                        merged.add((b, int(g_shared[d, b, c]), int(g_pos[d, b, c])))
        merged_sets[(n_shard, n_data)] = merged
        results[f"{n_shard}x{n_data}"] = round(dt * 1000, 1)

    base = merged_sets[(1, 1)]
    invariant = all(m == base for m in merged_sets.values())
    print(json.dumps({
        "metric": "sharded_step_ms_by_mesh",
        "value": results,
        "candidates_invariant_across_meshes": invariant,
    }))
    assert invariant


if __name__ == "__main__":
    main()
