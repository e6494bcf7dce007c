import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from metamaps_tpu.engine.em import MappingTable, make_em_iterate_jax, em_iterate

jax.device_get(jnp.zeros(4) + 1)
rng = np.random.default_rng(3)
for n_lines in (1_000_000, 12_000_000):
    n_reads, n_tax = n_lines // 4, 5000
    table = MappingTable(
        lines=[], contig_of_line=[], read_ids=["r"] * n_reads,
        taxon_list=["t"] * n_tax,
        read_of_line=np.repeat(np.arange(n_reads), n_lines // n_reads),
        taxon_of_line=rng.integers(0, n_tax, n_lines).astype(np.int32),
        mapq=rng.random(n_lines),
        inv_locations=np.full(n_lines, 1e-6),
        identity=np.zeros(n_lines), start=np.zeros(n_lines, np.int64),
        stop=np.zeros(n_lines, np.int64), read_len=np.zeros(n_lines, np.int64),
    )
    step = make_em_iterate_jax(table)
    f = np.full(n_tax, 1.0 / n_tax, np.float32)
    fd, ll = step(f); jax.block_until_ready(fd)
    t0 = time.perf_counter()
    for _ in range(5):
        fd, ll = step(fd)
    jax.block_until_ready(fd)
    dev_ms = (time.perf_counter() - t0) / 5 * 1000
    f64 = np.full(n_tax, 1.0 / n_tax)
    t0 = time.perf_counter()
    fh, llh = em_iterate(table, f64)
    host_ms = (time.perf_counter() - t0) * 1000
    fd_h = np.asarray(fd, np.float64)
    print(f"{n_lines/1e6:.0f}M lines: device {dev_ms:.1f} ms/iter, "
          f"host f64 {host_ms:.1f} ms/iter, "
          f"top-taxon match={np.argmax(fd_h) == np.argmax(em_iterate(table, f64)[0])}")
