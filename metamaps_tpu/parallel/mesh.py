"""Device meshes and collective building blocks.

The reference's "distributed backend" is index shards processed sequentially
plus a per-read merge (SURVEY §2.2). The TPU-native design makes that
spatial:

- axis "data": read batches stream data-parallel; EM sufficient statistics
  and per-read normalizers are combined with psum over ICI;
- axis "shard": the minimizer index is hash-range partitioned; per-read
  candidate lists merge via all-gather (engine contract: mapping qualities
  are computed only over the union of candidates from all shards —
  mapWrap.h:145,215).
"""
from __future__ import annotations


import numpy as np


def make_mesh(n_devices: int, data_axis: str = "data"):
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:n_devices])
    assert devices.size == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    return Mesh(devices, (data_axis,))


def make_mesh_2d(n_shard: int, n_data: int, axes=("shard", "data")):
    """2D mesh: index partitions along axes[0], read data-parallel along
    axes[1]. Shard traffic (candidate all_gather) stays on the faster inner
    dimension when laid out over ICI."""
    import jax
    from jax.sharding import Mesh

    n = n_shard * n_data
    devices = np.array(jax.devices()[:n]).reshape(n_shard, n_data)
    return Mesh(devices, axes)


def partition_lines_read_atomic(read_of_line: np.ndarray, n_parts: int):
    """Device boundaries over the mapping lines such that every read's
    lines land on ONE device (reads are the atomic unit of the E-step's
    per-read normalization). read_of_line is nondecreasing; boundaries are
    the read starts nearest to equal line counts. Returns n_parts+1 line
    offsets (some chunks may be empty when reads are few/skewed)."""
    L = int(len(read_of_line))
    if L == 0:
        return [0] * (n_parts + 1)
    n_reads = int(read_of_line[-1]) + 1
    read_starts = np.searchsorted(read_of_line, np.arange(n_reads + 1))
    bounds = [0]
    for d in range(1, n_parts):
        t = L * d // n_parts
        i = int(np.searchsorted(read_starts, t, side="left"))
        b = int(read_starts[min(i, n_reads)])
        bounds.append(max(b, bounds[-1]))
    bounds.append(L)
    return bounds


def make_em_iterate_sharded(table, n_devices: int = None):
    """Data-parallel EM rounds over every available device: mapping lines
    partitioned read-atomically, per-read normalizers and per-taxon
    sufficient statistics psum'd over the 'data' axis (the TPU-native
    OpenMP-parallel-for + per-thread-accumulator merge, fEM.h:512-600).

    Float64 end to end — the caller must run under jax_enable_x64 (run_em
    handles this); matches the host numpy EM bit-for-bit up to f64
    summation-order noise. Returns step: f -> (f_next, ll)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    assert jax.config.jax_enable_x64, "sharded EM requires x64 (see run_em)"
    D = n_devices or len(jax.devices())
    mesh = make_mesh(D)
    n_reads = len(table.read_ids)
    n_tax = len(table.taxon_list)
    bounds = partition_lines_read_atomic(table.read_of_line, D)
    Pmax = max(1, max(bounds[d + 1] - bounds[d] for d in range(D)))
    rid = np.zeros((D, Pmax), np.int32)
    tax = np.zeros((D, Pmax), np.int32)
    coef = np.zeros((D, Pmax), np.float64)  # inv_locations * mapq; padding 0
    for d in range(D):
        lo, hi = bounds[d], bounds[d + 1]
        n = hi - lo
        rid[d, :n] = table.read_of_line[lo:hi]
        tax[d, :n] = table.taxon_of_line[lo:hi]
        coef[d, :n] = table.inv_locations[lo:hi] * table.mapq[lo:hi]

    def local(rid_l, tax_l, coef_l, f_in):
        l = f_in[tax_l[0]] * coef_l[0]
        per_read_part = jax.ops.segment_sum(l, rid_l[0], num_segments=n_reads)
        per_read = jax.lax.psum(per_read_part, "data")
        ll = jnp.sum(jnp.log(per_read))
        p = l / per_read[rid_l[0]]  # padding lines: l == 0 -> p == 0
        f_part = jax.ops.segment_sum(p, tax_l[0], num_segments=n_tax)
        f_tot = jax.lax.psum(f_part, "data")
        return f_tot / jnp.sum(f_tot), ll

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    import jax.numpy as jnp

    rid_d = jnp.asarray(rid)
    tax_d = jnp.asarray(tax)
    coef_d = jnp.asarray(coef)

    def step(f):
        f_next, ll = fn(rid_d, tax_d, coef_d, jnp.asarray(f, jnp.float64))
        return np.asarray(f_next, np.float64), float(ll)

    return step


def sharded_em_step(mesh, read_of_line, taxon_of_line, mapq, invloc, f, n_reads):
    """One EM round with lines data-parallel over the mesh.

    Contract: lines of one read live on one device (reads are atomic units —
    the host feeder guarantees this). Per-read normalizers and per-taxon
    sufficient statistics are psum'd over the data axis.

    read_of_line uses GLOBAL read ids; n_reads is the global read count.
    Line counts must divide the mesh size (pad with mapq=0 lines).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_tax = int(f.shape[0])
    axis = mesh.axis_names[0]

    def step(read_ids, tax, q, inv, f_in):
        l = f_in[tax] * inv * q
        per_read_partial = jax.ops.segment_sum(l, read_ids, num_segments=n_reads)
        per_read = jax.lax.psum(per_read_partial, axis)
        ll = jnp.sum(jnp.log(per_read))
        p = l / per_read[read_ids]
        f_partial = jax.ops.segment_sum(p, tax, num_segments=n_tax)
        f_tot = jax.lax.psum(f_partial, axis)
        return f_tot / jnp.sum(f_tot), ll

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    import jax.numpy as jnp

    out_f, ll = jax.jit(fn)(
        jnp.asarray(read_of_line),
        jnp.asarray(taxon_of_line),
        jnp.asarray(mapq),
        jnp.asarray(invloc),
        jnp.asarray(f),
    )
    return np.asarray(out_f), float(ll)
