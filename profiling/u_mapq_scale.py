"""U mapping-quality hot-loop benchmark at realistic scale.

Synthesizes 200k reads x 5 locations (1M mapping lines) and measures the
vectorized compute_u_mapping_qualities against the scalar per-line oracle
(timed on a subsample, extrapolated). Matches VERDICT round-2 item 5
(fU.h:155-362 is the reference's U hot path).

Run: python profiling/u_mapq_scale.py [n_reads]
"""
import copy
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from metamaps_tpu.engine.u import (  # noqa: E402
    ULocation,
    _compute_u_mapping_qualities_scalar,
    compute_u_mapping_qualities,
)

sys.path.insert(0, "tests")
from test_u_pipeline import _synthetic_identity_manager  # noqa: E402


def make_reads(n_reads, rng):
    def plausible(ident, sketch):
        p_surv = ident ** 16
        p = p_surv / (2 - p_surv)
        return int(np.clip(rng.binomial(sketch, p), 1, sketch))

    reads = []
    for ri in range(n_reads):
        rl = int(rng.integers(2500, 20000))
        locs = []
        for d in range(3):
            sketch = int(rng.integers(80, 400))
            ident = float(rng.uniform(0.80, 0.98))
            locs.append(ULocation(f"r{ri}", str(1000 + d), ident, sketch,
                                  plausible(ident, sketch), rl, 0.0, 0.0,
                                  True))
        for node in ("77", "78"):
            sketch = int(rng.integers(80, 400))
            ident = float(rng.uniform(0.80, 0.98))
            locs.append(ULocation(f"r{ri}", node, ident, sketch,
                                  plausible(0.92 * ident, sketch), rl, 0.0,
                                  0.0, False))
        reads.append(locs)
    return reads


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rng = np.random.default_rng(3)
    print(f"synthesizing {n_reads} reads x 5 locations = "
          f"{5 * n_reads} mapping lines ...")
    reads = make_reads(n_reads, rng)
    im = _synthetic_identity_manager()

    n_scalar = min(2000, n_reads)
    scalar = [copy.deepcopy(l) for l in reads[:n_scalar]]
    t0 = time.perf_counter()
    for locs in scalar:
        _compute_u_mapping_qualities_scalar(locs, im, 16)
    t_scalar = time.perf_counter() - t0
    per_read_scalar = t_scalar / n_scalar

    compute_u_mapping_qualities(copy.deepcopy(reads[0]), im, 16)  # warm
    t0 = time.perf_counter()
    for locs in reads:
        compute_u_mapping_qualities(locs, im, 16)
    t_vec = time.perf_counter() - t0
    per_read_vec = t_vec / n_reads

    for a, b in zip(scalar[0], reads[0]):
        assert abs(a.mapq - b.mapq) <= 1e-12 + 1e-9 * abs(a.mapq)

    print(f"scalar oracle : {per_read_scalar * 1e3:.3f} ms/read "
          f"({n_scalar} reads timed); {5 * n_reads} lines would take "
          f"{per_read_scalar * n_reads / 60:.1f} min")
    print(f"vectorized    : {per_read_vec * 1e3:.3f} ms/read; "
          f"{5 * n_reads} lines in {t_vec:.1f} s")
    print(f"speedup       : {per_read_scalar / per_read_vec:.1f}x")


if __name__ == "__main__":
    main()
