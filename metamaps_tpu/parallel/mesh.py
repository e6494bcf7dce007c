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
