"""Time each phase of __graft_entry__.dryrun_multichip on the virtual
8-CPU mesh, to find where the driver's rc=124 budget goes.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python profiling/dryrun_phase_timing.py
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

t0 = time.time()


def mark(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


import jax

jax.config.update("jax_platforms", "cpu")
mark(f"jax imported, {len(jax.devices())} devices")

import tempfile

from metamaps_tpu.engine.index import build_shards
from metamaps_tpu.params import Parameters
from metamaps_tpu.parallel.sharded_engine import (
    ShardedMapperEngine,
    partition_contigs_blocks,
)

rng = np.random.default_rng(0)
n_devices = 8
n_shard, n_data = 4, 2
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
genomes = [rng.choice(bases, size=3000) for _ in range(2 * n_shard)]
td = tempfile.mkdtemp()
ref_fa = os.path.join(td, "DB.fa")
with open(ref_fa, "w") as f:
    for i, g in enumerate(genomes):
        f.write(f">C{i}|kraken:taxid|{i}|D.1\n" + g.tobytes().decode() + "\n")
reads = []
for i in range(2 * n_data + 1):
    g = genomes[i % len(genomes)]
    reads.append(g[200 + 13 * i : 200 + 13 * i + 900])

params = Parameters(
    ref_sequences=[ref_fa], query_sequences=["x"], out_file_name="x",
    min_read_length=500, report_all=True,
).derive_window_size()
mark("building index")
shards = []
build_shards(params, 0, lambda s, n: shards.append(s))
mark("index built")

engine = ShardedMapperEngine(shards[0], params, n_shard, n_data)
mark(f"engine init (stacked); buckets={engine.buckets} rows/dev={engine.rows_per_device}")

bucket = engine._bucket_of(900)
mark(f"bucket={bucket}; building step config")
cfg, step = engine._step_for(bucket)
mark(f"cfg: sketch_max={cfg.sketch_max} hits_max={cfg.hits_max} "
     f"cands_max={cfg.cands_max} range_max={cfg.range_max} "
     f"l2_slab={cfg.l2_slab} l2_impl={cfg.l2_path}")

import jax.numpy as jnp

from metamaps_tpu.engine.mapper_jax import _minhits_table

minhits = jnp.asarray(_minhits_table(cfg.sketch_max, params.kmer_size,
                                     float(params.percentage_identity)))
Bg = engine.global_chunk
rb = np.full((Bg, bucket), ord("A"), np.uint8)
lens = np.zeros(Bg, np.int32)
for r in range(Bg):
    s = reads[r % len(reads)]
    rb[r, : len(s)] = s
    lens[r] = len(s)
mark(f"first step call (compile): Bg={Bg}")
out = step(jnp.asarray(rb), jnp.asarray(lens), minhits)
g = np.asarray(out[0])
mark("first step done (compiled + ran)")
out = step(jnp.asarray(rb), jnp.asarray(lens), minhits)
np.asarray(out[0])
mark("second step done (warm)")

# EM phase
from metamaps_tpu.engine.em import MappingTable, run_em

n_lines = 64 * n_devices
n_reads = 16 * n_devices
n_tax = 8
read_of_line = np.repeat(np.arange(n_reads), n_lines // n_reads).astype(np.int64)
raw = rng.random(n_lines) + 1e-3
starts = np.arange(0, n_lines + 1, n_lines // n_reads)
mapq = raw / np.repeat(np.add.reduceat(raw, starts[:-1]), n_lines // n_reads)
table = MappingTable(
    lines=[""] * n_lines, read_of_line=read_of_line,
    taxon_of_line=rng.integers(0, n_tax, n_lines).astype(np.int32),
    mapq=mapq, inv_locations=np.full(n_lines, 1e-6),
    identity=rng.random(n_lines), contig_of_line=[""] * n_lines,
    start=np.zeros(n_lines, np.int64), stop=np.zeros(n_lines, np.int64),
    read_len=np.full(n_lines, 5000, np.int64),
    read_ids=[f"r{i}" for i in range(n_reads)],
    taxon_list=[str(100 + t) for t in range(n_tax)],
)
mark("EM sharded start")
f_sh, it_sh = run_em(table, verbose=False, backend="sharded")
mark(f"EM sharded done ({it_sh} iters)")
f_np, it_np = run_em(table, verbose=False, backend="numpy")
mark("EM numpy done")
mark("ALL DONE")
