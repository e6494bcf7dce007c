"""Unit tests for the device-side L2 slab router (l2_route_device): slot
assignment, cover checks, overflow compaction, and read exclusions — checked
against a straightforward host reimplementation of its contract."""
import numpy as np
import pytest

from metamaps_tpu.ops.batch_map import MapKernelConfig, l2_route_device


def _mk_spec(cfg, c_seq, c_start, c_end, n_occ, l1_ovf):
    B, C = c_seq.shape
    spec = np.zeros((B, 2 + 4 * C), np.int32)
    spec[:, 0] = (c_seq >= 0).sum(axis=1)
    spec[:, 1] = l1_ovf.astype(np.int32)
    spec[:, 2 : 2 + C] = c_seq
    spec[:, 2 + C : 2 + 2 * C] = c_start
    spec[:, 2 + 2 * C : 2 + 3 * C] = c_end
    spec[:, 2 + 3 * C : 2 + 4 * C] = n_occ
    return spec


def _route_host(cfg, spec, s_size, s_ovf, total, tier0, n_rows, slabs):
    """Reference router: desc (n_occ, s) stream over the slab plan."""
    B = spec.shape[0]
    C = cfg.cands_max
    c_seq = spec[:, 2 : 2 + C]
    n_occ = spec[:, 2 + 3 * C : 2 + 4 * C]
    l1_ovf = spec[:, 1] > 0
    read_bad = (
        s_ovf | l1_ovf | (total > tier0)
        | ((c_seq >= 0) & (n_occ > cfg.range_max)).any(axis=1)
        | (np.arange(B) >= n_rows)
    )
    members = []
    for r in range(B):
        if read_bad[r]:
            continue
        for c in range(C):
            if c_seq[r, c] < 0:
                continue
            members.append((-(int(n_occ[r, c]) * 65536 + int(s_size[r])),
                            r * C + c))
    members.sort()
    rr_at = np.concatenate([np.full(k, rr) for rr, _, k in slabs])
    sc_at = np.concatenate([np.full(k, sc) for _, sc, k in slabs])
    T = len(rr_at)
    coords = np.full(T, -1, np.int64)
    ovf = []
    for t, (_, coord) in enumerate(members):
        r, c = coord // C, coord % C
        if (t < T and n_occ[r, c] <= rr_at[t]
                and s_size[r] <= sc_at[t]):
            coords[t] = coord
        else:
            ovf.append(coord)
    return coords, sorted(ovf)


def _run_both(cfg, spec, s_size, s_ovf, total, tier0, n_rows, slabs):
    import jax.numpy as jnp

    sf, sc_, ov = l2_route_device(
        cfg, jnp.asarray(spec), jnp.asarray(s_size), jnp.asarray(s_ovf),
        jnp.asarray(total), jnp.int32(tier0), jnp.int32(n_rows), slabs,
    )
    want_coords, want_ovf = _route_host(
        cfg, spec, s_size, s_ovf, total, tier0, n_rows, slabs
    )
    got_coords = np.asarray(sc_)
    got_ovf = sorted(int(x) for x in np.asarray(ov) if x >= 0)
    np.testing.assert_array_equal(got_coords, want_coords)
    assert got_ovf == want_ovf
    # slab fields match the coords they claim
    sf = np.asarray(sf)
    C = cfg.cands_max
    c_seq = spec[:, 2 : 2 + C]
    for t, coord in enumerate(got_coords):
        if coord < 0:
            assert sf[t, 1] == -1
        else:
            r, c = coord // C, coord % C
            assert sf[t, 0] == r and sf[t, 1] == c_seq[r, c]
    return got_coords, got_ovf


@pytest.fixture(scope="module")
def cfg():
    return MapKernelConfig.for_read_len(4096, 16, 16, l2_impl="scatter")


def test_router_basic_and_cover(cfg):
    rng = np.random.default_rng(5)
    B, C = 8, cfg.cands_max
    c_seq = np.full((B, C), -1, np.int32)
    c_start = np.zeros((B, C), np.int32)
    c_end = np.zeros((B, C), np.int32)
    n_occ = np.zeros((B, C), np.int32)
    for r in range(B):
        for c in range(int(rng.integers(0, 4))):
            c_seq[r, c] = rng.integers(0, 3)
            n_occ[r, c] = rng.integers(1, 900)
    spec = _mk_spec(cfg, c_seq, c_start, c_end, n_occ,
                    np.zeros(B, bool))
    s_size = rng.integers(100, 500, B).astype(np.int32)
    slabs = ((1024, 512, 8), (512, 512, 8))
    _run_both(cfg, spec, s_size, np.zeros(B, bool),
              np.full(B, 10, np.int32), 512, B, slabs)


def test_router_exclusions_and_overflow(cfg):
    B, C = 6, cfg.cands_max
    c_seq = np.full((B, C), -1, np.int32)
    n_occ = np.zeros((B, C), np.int32)
    c_seq[:, 0] = 0
    n_occ[:, 0] = [100, 200, 300, 400, 500, 600]
    # read 1: sketch overflow; read 2: l1 overflow; read 3: escalated;
    # read 4: candidate range beyond cfg.range_max -> whole read excluded
    l1_ovf = np.zeros(B, bool)
    l1_ovf[2] = True
    s_ovf = np.zeros(B, bool)
    s_ovf[1] = True
    total = np.full(B, 10, np.int32)
    total[3] = 2000
    n_occ[4, 1] = cfg.range_max + 1
    c_seq[4, 1] = 1
    spec = _mk_spec(cfg, c_seq, np.zeros_like(c_seq), np.zeros_like(c_seq),
                    n_occ, l1_ovf)
    s_size = np.full(B, 200, np.int32)
    # plan with ONE slot: everything routable past it overflows
    slabs = ((1024, 256, 1),)
    coords, ovf = _run_both(
        cfg, spec, s_size, s_ovf, total, 512, B, slabs
    )
    # only reads 0 and 5 were routable; slot holds the bigger-range one
    assert coords[0] == 5 * C
    assert ovf == [0]


def test_router_padding_rows_and_small_chunk(cfg):
    """Plan sized for a larger chunk than n_rows; padding rows excluded."""
    B, C = 4, cfg.cands_max
    c_seq = np.full((B, C), -1, np.int32)
    n_occ = np.zeros((B, C), np.int32)
    c_seq[:2, 0] = 0
    n_occ[:2, 0] = [50, 60]
    c_seq[3, 0] = 0  # padding row (>= n_rows) — must not be routed
    n_occ[3, 0] = 70
    spec = _mk_spec(cfg, c_seq, np.zeros_like(c_seq), np.zeros_like(c_seq),
                    n_occ, np.zeros(B, bool))
    slabs = ((512, 512, 64), (512, 512, 64))  # T = 128 > B*C: pad branch
    coords, ovf = _run_both(
        cfg, spec, np.full(B, 100, np.int32), np.zeros(B, bool),
        np.full(B, 1, np.int32), 512, 3, slabs
    )
    assert set(c for c in coords if c >= 0) == {0, C}
    assert ovf == []


def test_route_plan_shrinks_on_drift():
    """A drifting candidate mix must release slab capacity: after the
    big-range reads disappear, sustained slack (8 chunks) rebuilds the
    plan without the dead tiers (VERDICT r1 item 10 — grow-only plans
    leak in long-lived services)."""
    import numpy as np

    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.ops.winnow import winnow_np
    from metamaps_tpu.params import Parameters

    rng = np.random.default_rng(1)
    g = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=30000)
    sh = SketchShard()
    h, p, s = winnow_np(g, 16, 16)
    sh.contig_names, sh.contig_lengths = ["c"], [len(g)]
    sh.finalize([(h, p, s, 0)])
    params = Parameters(kmer_size=16, window_size=16,
                        percentage_identity=80.0)
    eng = JaxMapperEngine(sh, params, read_len_buckets=(2048,))
    cfg = eng._config_for(2048)
    bucket = 2048
    B = eng.CHUNK
    C = cfg.cands_max

    def host(n_occ_val, cands_per_read):
        s_size = np.full(B, 256, np.int32)
        s_ovf = np.zeros(B, bool)
        c_seq = np.full((B, C), -1, np.int32)
        n_c = np.full(B, cands_per_read, np.int32)
        c_seq[:, :cands_per_read] = 0
        n_occ = np.zeros((B, C), np.int32)
        n_occ[:, :cands_per_read] = n_occ_val
        zeros = np.zeros((B, C), np.int32)
        return (s_size, s_ovf, c_seq, zeros, zeros, n_c,
                np.zeros(B, bool), n_occ)

    big = min(cfg.range_max, 2000)
    eng._adapt_route_plan(cfg, bucket, host(big, 4), B)
    plan_big = eng._route_plan[bucket]
    cap_big = sum(k for _, _, k in plan_big)
    assert any(rr >= big for rr, _, _ in plan_big)

    # drift: only small candidates from now on
    for _ in range(100):
        eng._adapt_route_plan(cfg, bucket, host(400, 1), B)
    plan_small = eng._route_plan[bucket]
    cap_small = sum(k for _, _, k in plan_small)
    assert cap_small < cap_big, (plan_big, plan_small)
