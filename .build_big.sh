#!/bin/bash
# builds big-shard caches for the 26.76 Gbp multishard run: 8 x 3,345,284,535 bp
# usage: .build_big.sh <shard indices...>
cd /root/repo
export JAX_PLATFORMS=cpu
for i in "$@"; do
  echo "=== shard $i start $(date +%T) ==="
  python -c "
import bench
i = $i
n = 16384 if i == 0 else 2048
bench.build_db_large(total_bases=3345284535, seed=bench.LARGE_SEED + 7919*i, n_reads=n)
print('shard $i done', flush=True)
" || echo "shard $i FAILED rc=$?"
  echo "=== shard $i end $(date +%T) ==="
done
