"""Ray-march + composite numerics vs analytic results."""

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import MIN_CONE_STEPSIZE
from sienerf_tpu.ops.occupancy import (
    OccupancyConfig,
    init_occupancy_state,
    mip_from_dt,
    mip_from_pos,
    occupancy_lookup,
    pos_to_cell,
    update_density_grid,
)
from sienerf_tpu.ops.raymarch import MarchConfig, calc_dt, composite_chunk, march_rays


def test_calc_dt_uniform_and_cone():
    t = jnp.array([0.1, 1.0, 10.0])
    assert np.allclose(calc_dt(t, 0.0), MIN_CONE_STEPSIZE)
    dt = calc_dt(t, 1.0 / 256)
    assert dt[0] == MIN_CONE_STEPSIZE
    assert dt[2] > dt[1] > dt[0]


def test_mip_selection():
    pos = jnp.array([[0.5, 0.5, 0.5], [0.9, 0.5, 0.5], [1.4, 0.5, 0.5], [2.4, 0.5, 0.5]])
    mips = mip_from_pos(pos, 8)
    assert list(np.asarray(mips)) == [0, 0, 1, 2]
    dts = jnp.array([0.001, 0.02, 0.2])
    m = mip_from_dt(dts, 8)
    assert list(np.asarray(m)) == [0, 2, 5]


def test_pos_to_cell_and_lookup():
    cfg = OccupancyConfig(n_cascades=2)
    bf = jnp.zeros((2, 128, 128, 128), bool)
    cell = pos_to_cell(jnp.array([[0.25, 0.5, 0.75]]), jnp.array([0]))
    assert list(np.asarray(cell[0])) == [32, 64, 96]
    bf = bf.at[0, 32, 64, 96].set(True)
    occ = occupancy_lookup(bf, jnp.array([[0.25, 0.5, 0.75]]), jnp.array([0]))
    assert bool(occ[0])
    # outside the grid -> unoccupied
    occ = occupancy_lookup(bf, jnp.array([[3.0, 0.5, 0.5]]), jnp.array([0]))
    assert not bool(occ[0])


def test_march_through_fully_occupied_grid():
    cfg = MarchConfig(n_cascades=1, cone_angle=0.0)
    bf = jnp.ones((1, 128, 128, 128), bool)
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    ts, dts, counts, t_end = march_rays(cfg, bf, o, d, jnp.array([0.1]), jnp.array([0.9]), 16, 32)
    assert int(counts[0]) == 16
    # uniform steps of MIN_CONE_STEPSIZE starting at t=0.1
    assert np.allclose(np.asarray(ts[0]), 0.1 + np.arange(16) * MIN_CONE_STEPSIZE, atol=1e-6)
    assert np.allclose(np.asarray(dts[0, : int(counts[0])]), MIN_CONE_STEPSIZE)


def test_march_skips_empty_space():
    cfg = MarchConfig(n_cascades=1, cone_angle=0.0)
    bf = jnp.zeros((1, 128, 128, 128), bool)
    # occupy a slab z in [0.5, 0.625]
    bf = bf.at[0, :, :, 64:80].set(True)
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    ts, dts, counts, _ = march_rays(cfg, bf, o, d, jnp.array([0.0]), jnp.array([1.0]), 32, 256)
    c = int(counts[0])
    assert c > 0
    tvals = np.asarray(ts[0, :c])
    assert tvals.min() >= 0.5 - 0.02  # first sample at slab entry
    assert tvals.max() <= 0.625 + 0.02


def test_composite_matches_analytic_constant_medium():
    """Constant density sigma over [0,1]: opacity = 1-exp(-sigma), radiance =
    c * (1-exp(-sigma)) for constant color."""
    N, K = 1, 64
    sigma = 3.0
    dt = 1.0 / K
    ts = jnp.arange(K, dtype=jnp.float32)[None, :] * dt
    dts = jnp.full((N, K), dt)
    valid = jnp.ones((N, K), bool)
    rgb = jnp.full((N, K, 3), 0.7)
    dens = jnp.full((N, K), sigma)
    rgb_sum, opacity, T_out, bw, bt = composite_chunk(rgb, dens, ts, dts, valid, jnp.ones((N,)))
    expected_op = 1.0 - np.exp(-sigma)
    assert np.isclose(float(opacity[0]), expected_op, atol=1e-5)
    assert np.allclose(np.asarray(rgb_sum[0]), 0.7 * expected_op, atol=1e-5)
    assert np.isclose(float(T_out[0]), np.exp(-sigma), atol=1e-5)


def test_composite_early_out():
    N, K = 1, 8
    dens = jnp.full((N, K), 1e5)  # opaque immediately
    ts = jnp.arange(K, dtype=jnp.float32)[None, :] * 0.01 + 0.2
    dts = jnp.full((N, K), 0.01)
    rgb = jnp.broadcast_to(jnp.linspace(0, 1, K)[None, :, None], (N, K, 3))
    rgb_sum, opacity, T_out, bw, bt = composite_chunk(rgb, dens, ts, dts, jnp.ones((N, K), bool), jnp.ones((N,)))
    assert float(T_out[0]) == 0.0
    assert np.isclose(float(opacity[0]), 1.0, atol=1e-4)
    # depth = max-weight sample = the first one
    assert np.isclose(float(bt[0]), 0.2, atol=1e-6)
    assert np.allclose(np.asarray(rgb_sum[0]), 0.0, atol=1e-4)  # first sample color is 0


def test_composite_transmittance_chaining():
    """Compositing in two chunks == compositing in one."""
    key = jax.random.PRNGKey(0)
    N, K = 4, 16
    dens = jax.random.uniform(key, (N, K)) * 5
    dts = jnp.full((N, K), 0.02)
    ts = jnp.cumsum(dts, axis=1)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (N, K, 3))
    valid = jnp.ones((N, K), bool)
    full_rgb, full_op, full_T, _, _ = composite_chunk(rgb, dens, ts, dts, valid, jnp.ones((N,)), 1e-7)
    r1, o1, T1, _, _ = composite_chunk(rgb[:, :8], dens[:, :8], ts[:, :8], dts[:, :8], valid[:, :8], jnp.ones((N,)), 1e-7)
    r2, o2, T2, _, _ = composite_chunk(rgb[:, 8:], dens[:, 8:], ts[:, 8:], dts[:, 8:], valid[:, 8:], T1, 1e-7)
    assert np.allclose(np.asarray(r1 + r2), np.asarray(full_rgb), atol=1e-5)
    assert np.allclose(np.asarray(T2), np.asarray(full_T), atol=1e-6)


def test_density_grid_update_thresholds():
    cfg = OccupancyConfig(n_cascades=1)
    state = init_occupancy_state(cfg)

    def density_fn(unit_pos):
        # occupied ball of radius 0.2 at center with strong density
        r = jnp.linalg.norm(unit_pos - 0.5, axis=-1)
        return jnp.where(r < 0.2, 100.0, 0.0)

    state = update_density_grid(
        cfg, state, density_fn, jax.random.PRNGKey(0),
        jnp.zeros(3), jnp.ones(3), dense=True,
    )
    bf = np.asarray(state["bitfield"][0])
    assert bf[64, 64, 64]
    assert not bf[5, 5, 5]
    frac = bf.mean()
    expected = 4 / 3 * np.pi * 0.2**3
    assert abs(frac - expected) < 0.01


def test_compact_samples_matches_slab():
    """compact_samples + composite_flat reproduce the slab compositing
    (composite_chunk) exactly for rays that fit the budget."""
    from sienerf_tpu.ops.raymarch import compact_samples, composite_chunk, composite_flat

    rng = np.random.default_rng(3)
    N, K, M = 8, 12, 128
    counts = jnp.asarray(rng.integers(0, K + 1, N), jnp.int32)
    ts = jnp.asarray(np.sort(rng.uniform(0.1, 2.0, (N, K)), axis=1), jnp.float32)
    dts = jnp.asarray(rng.uniform(0.01, 0.1, (N, K)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (N, K, 3)), jnp.float32)
    dens = jnp.asarray(rng.uniform(0, 20.0, (N, K)), jnp.float32)

    valid = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1) < counts[:, None]
    dens_m = jnp.where(valid, dens, 0.0)
    rgb_ref, op_ref, T_ref, _, _ = composite_chunk(
        rgb, dens_m, ts, dts, valid, jnp.ones((N,)), 1e-4
    )

    t_f, dt_f, ray_id, ray_start, fits = compact_samples(ts, dts, counts, M)
    assert bool(jnp.all(fits))  # M is big enough
    # slot order is ray-major: gather the per-slot rgb/dens from the slab
    rid = jnp.minimum(ray_id, N - 1)
    j = jnp.arange(M) - jnp.take(ray_start, rid)
    flat = rid * K + jnp.clip(j, 0, K - 1)
    rgb_f = jnp.take(rgb.reshape(-1, 3), flat, axis=0)
    dens_f = jnp.take(dens.reshape(-1), flat)
    rgb_o, op_o, T_o, _ = composite_flat(
        rgb_f, dens_f, t_f, dt_f, ray_id, ray_start, N, 1e-4
    )
    np.testing.assert_allclose(np.asarray(rgb_o), np.asarray(rgb_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(op_o), np.asarray(op_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(T_o), np.asarray(T_ref), atol=2e-4)


def test_compact_samples_drops_overflow_rays():
    from sienerf_tpu.ops.raymarch import compact_samples

    N, K = 4, 8
    counts = jnp.asarray([8, 8, 8, 8], jnp.int32)
    ts = jnp.broadcast_to(jnp.arange(K, dtype=jnp.float32)[None], (N, K))
    dts = jnp.ones((N, K), jnp.float32)
    t_f, dt_f, ray_id, ray_start, fits = compact_samples(ts, dts, counts, 20)
    # rays 0 and 1 fit (16 samples), ray 2 would overflow (24 > 20) -> all
    # later rays dropped entirely, never truncated
    assert list(np.asarray(fits)) == [True, True, False, False]
    rid = np.asarray(ray_id)
    assert (rid[:16] < 2).all()
    assert (rid[16:] == N).all()  # sacrificial


def test_vectorized_march_matches_scalar():
    """Span-4 march places byte-identical samples to the scalar reference
    loop (emit-or-skip, generate_next_nerf_network_inputs semantics)."""
    from sienerf_tpu.ops.occupancy import OccupancyConfig, init_occupancy_state
    from sienerf_tpu.ops.raymarch import MarchConfig, _march_rays_scalar, march_rays

    rng = np.random.default_rng(0)
    cfg = MarchConfig(n_cascades=1, cone_angle=0.0, grid_size=32)
    # random blocky occupancy
    occ = rng.random((1, 32, 32, 32)) < 0.35
    bf = jnp.asarray(occ)
    N, K = 64, 24
    o = jnp.asarray(rng.uniform(0.1, 0.9, (N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t0 = jnp.zeros((N,), jnp.float32)
    t1 = jnp.full((N,), 1.5, jnp.float32)

    # generous budgets so neither variant exhausts iterations (t_end is
    # only comparable when no budget binds)
    ts_s, dts_s, k_s, te_s = _march_rays_scalar(cfg, bf, o, d, t0, t1, K, 1000)
    ts_v, dts_v, k_v, te_v = march_rays(cfg, bf, o, d, t0, t1, K, 400, span=4)
    np.testing.assert_array_equal(np.asarray(k_s), np.asarray(k_v))
    np.testing.assert_allclose(np.asarray(ts_s), np.asarray(ts_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dts_s), np.asarray(dts_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(te_s), np.asarray(te_v), atol=1e-5)


def test_fine_grid_march_equivalence_and_culling():
    """Two-level march (render-baked fine grid): with fine == coarse
    upsampled the samples are IDENTICAL to the coarse-only march; with a
    stricter fine grid, samples appear only in fine-occupied voxels."""
    from sienerf_tpu.ops.raymarch import MarchConfig, march_rays

    G, f = 16, 2
    Gf = G * f
    cfg = MarchConfig(n_cascades=1, cone_angle=0.0, grid_size=G)
    bf = np.zeros((1, G, G, G), bool)
    bf[0, :, :, 6:10] = True  # occupied slab in z
    bf_j = jnp.asarray(bf)
    up = np.repeat(np.repeat(np.repeat(bf[0], f, 0), f, 1), f, 2)[None]

    N = 8
    o = np.zeros((N, 3), np.float32)
    o[:, 0] = np.linspace(0.1, 0.9, N)
    o[:, 1] = 0.5
    o[:, 2] = 0.0
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (N, 1))
    t0 = np.zeros(N, np.float32)
    t1 = np.ones(N, np.float32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), 32, 200)

    ts_c, dts_c, k_c, te_c = march_rays(cfg, bf_j, *args)
    ts_f, dts_f, k_f, te_f = march_rays(cfg, bf_j, *args, fine=jnp.asarray(up))
    np.testing.assert_array_equal(np.asarray(k_c), np.asarray(k_f))
    np.testing.assert_allclose(np.asarray(ts_c), np.asarray(ts_f), atol=0)
    np.testing.assert_allclose(np.asarray(te_c), np.asarray(te_f), atol=0)

    # stricter fine grid: only the first half of the slab (z cells 12..15 of 32)
    fine = np.zeros((1, Gf, Gf, Gf), bool)
    fine[0, :, :, 12:16] = True
    ts_s, dts_s, k_s, te_s = march_rays(cfg, bf_j, *args, fine=jnp.asarray(fine))
    assert int(np.asarray(k_s).sum()) > 0
    assert (np.asarray(k_s) <= np.asarray(k_c)).all()
    ts_sn = np.asarray(ts_s)
    kk = np.asarray(k_s)
    for i in range(N):
        zs = ts_sn[i, : kk[i]]  # t == z for these rays
        assert ((zs >= 12 / Gf - 1e-5) & (zs < 16 / Gf + 1e-5)).all(), zs


def test_bake_fine_bitfield_analytic():
    """bake_fine_bitfield marks exactly the fine voxels whose centers exceed
    the threshold (plus the 3^3 conservative dilation), restricted to
    occupied coarse cells."""
    from sienerf_tpu.ops.occupancy import bake_fine_bitfield

    G, f = 8, 2
    coarse = np.zeros((1, G, G, G), bool)
    coarse[0, 2:6, 2:6, 2:6] = True

    def density_fn(pos):  # dense ball of radius 0.2 at center (the bake
        # thresholds RAW density at min(mean,0.01)/MIN_CONE_STEPSIZE ~ 5.9)
        r = jnp.linalg.norm(pos - 0.5, axis=-1)
        return jnp.where(r < 0.2, 50.0, 0.0)

    fine = bake_fine_bitfield(lambda _p, pos: density_fn(pos), None, coarse, mean_density=1.0, factor=f)
    assert fine.shape == (1, G * f, G * f, G * f)
    Gf = G * f
    ax = (np.arange(Gf) + 0.5) / Gf
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    inside = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2) < 0.2
    up = np.repeat(np.repeat(np.repeat(coarse[0], f, 0), f, 1), f, 2)
    # every analytically-occupied voxel inside baked space is marked…
    assert (fine[0] | ~(inside & up)).all()
    # …nothing outside the dilated analytic region is marked
    d = inside.copy()
    for axn in range(3):
        d = d | np.roll(d, 1, axis=axn) | np.roll(d, -1, axis=axn)
    assert not (fine[0] & ~(d & up)).any()


def test_retreat_to_occupied_clamps_exit():
    from sienerf_tpu.ops.raymarch import advance_to_occupied, retreat_to_occupied

    cfg = MarchConfig(n_cascades=1, cone_angle=0.0)
    bf = jnp.zeros((1, 128, 128, 128), bool)
    bf = bf.at[0, :, :, 64:80].set(True)  # slab z in [0.5, 0.625]
    o = jnp.tile(jnp.array([[0.5, 0.5, 0.0]]), (2, 1))
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])  # hit, miss (runs in x)
    t0 = jnp.zeros(2)
    t1 = jnp.ones(2)
    t0a = advance_to_occupied(cfg, bf, o, d, t0, t1, 200)
    t1a = retreat_to_occupied(cfg, bf, o, d, t0a, t1, 200)
    # hit ray: exit just past the slab's far face
    assert 0.625 - 0.02 <= float(t1a[0]) <= 0.65
    assert 0.5 - 0.02 <= float(t0a[0]) <= 0.52
    # miss ray (never enters the slab): span collapses
    assert float(t1a[1]) <= float(t0a[1]) + 1e-5


def test_packed_occupancy_lookup_matches_scalar():
    """occupancy_lookup_packed (row-packed uint32 probe, ops/bits.py) must be
    bit-identical to the scalar bool gather for every cell, cascade, and
    out-of-grid position."""
    from sienerf_tpu.ops.occupancy import occupancy_lookup_packed, pack_occupancy

    rng = np.random.default_rng(7)
    g, C = 16, 3
    bf = jnp.asarray(rng.random((C, g, g, g)) < 0.3)
    words = pack_occupancy(bf)
    pos = jnp.asarray(rng.uniform(-1.5, 2.5, size=(4096, 3)).astype(np.float32))
    mip = jnp.asarray(rng.integers(0, C, size=(4096,)), jnp.int32)
    ref = occupancy_lookup(bf, pos, mip)
    got = occupancy_lookup_packed(words, g, pos, mip)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # 2D index shape (rays x span), as the span marcher probes it
    ref2 = occupancy_lookup(bf, pos.reshape(64, 64, 3), mip.reshape(64, 64))
    got2 = occupancy_lookup_packed(words, g, pos.reshape(64, 64, 3), mip.reshape(64, 64))
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))
