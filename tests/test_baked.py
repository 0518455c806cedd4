"""Baked feature grid (ops/baked.py + engines/nerf_baked.py): quantization
roundtrip, lookup exactness, and end-to-end baked-vs-live render parity on
the synthetic ball scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.ops.baked import (
    _decode_rows,
    baked_features,
    compact_candidates,
    cull_candidates,
    lookup_bits,
    nearest_vertex_ids,
    pack_bits,
    pack_cells_from_vertices,
    quantize_rows,
)

from test_nerf_mode import RES, make_dataset, tiny_config


def test_quantize_roundtrip_and_sentinel():
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (64, 16)) * 3.0
    scale = jnp.max(jnp.abs(feats), axis=0) / 127.0
    keep = jnp.arange(64) % 2 == 0
    rows = quantize_rows(feats, scale, keep)
    assert rows.shape == (64, 4) and rows.dtype == jnp.int32
    dec, sent = _decode_rows(rows, scale)
    assert np.array_equal(np.asarray(sent), ~np.asarray(keep))
    kept = np.asarray(keep)
    err = np.abs(np.asarray(dec)[kept] - np.asarray(feats)[kept])
    assert err.max() <= np.asarray(scale).max() * 0.51 + 1e-6


def test_pack_lookup_bits_roundtrip():
    key = jax.random.PRNGKey(3)
    keep = jax.random.bernoulli(key, 0.3, (1000,))
    words = pack_bits(keep)
    assert words.shape == (-(-1000 // 128), 4) and words.dtype == jnp.uint32
    got = lookup_bits(words, jnp.arange(1000, dtype=jnp.int32))
    assert np.array_equal(np.asarray(got), np.asarray(keep))
    # 2-D candidate-shaped ids take the same path as the renderer
    ids2 = jnp.arange(1000, dtype=jnp.int32).reshape(50, 20)
    got2 = lookup_bits(words, ids2)
    assert np.array_equal(np.asarray(got2).reshape(-1), np.asarray(keep))
    # the word-gather variant (SIENERF_BITS=word) is bit-exact vs the row path
    from sienerf_tpu.ops.bits import lookup_bits_word

    got3 = lookup_bits_word(words, ids2)
    assert np.array_equal(np.asarray(got3), np.asarray(got2))
    got4 = lookup_bits_word(words, jnp.arange(1000, dtype=jnp.int32))
    assert np.array_equal(np.asarray(got4), np.asarray(keep))


def test_pack_bits_brick_roundtrip():
    """Brick packing is a pure re-layout: probing any lattice bit through
    (brick_probe_ids, lookup_bits_brick) returns the original bool."""
    from sienerf_tpu.ops.bits import brick_probe_ids, lookup_bits_brick, pack_bits_brick

    K, X, Y, Z = 2, 9, 9, 9  # deliberately non-multiples of the brick dims
    rng = np.random.default_rng(7)
    keep = rng.random(K * X * Y * Z) < 0.4
    words = pack_bits_brick(jnp.asarray(keep), (K, X, Y, Z))
    # probe every lattice site, chain-shaped (A, P)
    kk, xx, yy, zz = np.meshgrid(
        np.arange(K), np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    )
    k3 = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 81, 3))
    casc = jnp.asarray(kk.reshape(-1, 81))
    row, off = brick_probe_ids(k3, casc, (K, X, Y, Z))
    got = lookup_bits_brick(words, row, off, n_heads=81)
    want = keep.reshape(K, X, Y, Z)[kk, xx, yy, zz].reshape(-1, 81)
    assert np.array_equal(np.asarray(got), want)


def test_lookup_bits_brick_dedup_and_overflow():
    """Chain-run dedup is exact within the head budget; rows past it return
    True (conservative keep, never a wrong cull)."""
    from sienerf_tpu.ops.bits import lookup_bits_brick

    words = jnp.asarray(
        np.stack([np.array([0, 0, 0, 0], np.uint32),          # brick 0: empty
                  np.array([0xFFFFFFFF] * 4, np.uint32),       # brick 1: full
                  np.array([2, 0, 0, 0], np.uint32)]))         # brick 2: bit 1 only
    row = jnp.asarray([[0, 0, 1, 1, 2, 2, 0, 0]])  # 4 runs
    off = jnp.asarray([[0, 5, 0, 99, 1, 0, 3, 3]])
    want = np.asarray([[0, 0, 1, 1, 1, 0, 0, 0]], bool)
    got = lookup_bits_brick(words, row, off, n_heads=4)
    assert np.array_equal(np.asarray(got), want)
    # head budget 2: runs 3 and 4 overflow -> conservative True; first two
    # runs still exact
    got2 = np.asarray(lookup_bits_brick(words, row, off, n_heads=2))
    assert np.array_equal(got2[0, :4], want[0, :4])
    assert got2[0, 4:].all()


def test_coarse_brick_cull_matches_coarse():
    """The brick-packed sidecar carries the same pooled bits as the linear
    coarse one: with a head budget >= P the deduped probe is bit-exact vs
    the per-candidate coarse probe on chain-shaped positions."""
    from sienerf_tpu.ops.baked import (
        coarse_live_bits,
        coarse_live_bits_brick,
        nearest_vertex_coords,
    )
    from sienerf_tpu.ops.bits import brick_probe_ids, lookup_bits_brick

    R, K = 16, 2
    n_vert = K * (R + 1) ** 3
    live = jax.random.bernoulli(jax.random.PRNGKey(21), 0.3, (n_vert,))
    words_c = coarse_live_bits(live, R, K)
    words_b = coarse_live_bits_brick(live, R, K)
    # chain-shaped positions: rays with small coherent steps
    rng = np.random.default_rng(22)
    o = rng.uniform(-0.2, 1.2, (64, 1, 3))
    d = rng.normal(size=(64, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(o + d * np.arange(32)[None, :, None] * 0.02)
    flat_c, oob_c, _ = nearest_vertex_ids(R // 2, K, pos)
    keep_c = np.asarray(lookup_bits(words_c, flat_c) & ~oob_c)
    R2v = R // 2 + 1
    k3, oob_b, m2 = nearest_vertex_coords(R // 2, K, pos)
    row, off = brick_probe_ids(k3, m2, (K, R2v, R2v, R2v))
    keep_b = np.asarray(lookup_bits_brick(words_b, row, off, n_heads=32) & ~oob_b)
    assert np.array_equal(keep_b, keep_c)


def test_baked_features_brick_matches_row_path():
    """The chain-deduped 256-byte-brick gather returns byte-identical
    features to the per-vertex row gather (nearest mode) when the head
    budget suffices, and flags exactly the over-budget suffix otherwise."""
    from sienerf_tpu.ops.baked import (
        baked_features_brick,
        pack_bricks_from_vertices,
    )

    R, K, F = 8, 2, 16
    n_vert = K * (R + 1) ** 3
    rng = np.random.default_rng(31)
    feats = jnp.asarray(rng.normal(size=(n_vert, F)) * 2.0, jnp.float32)
    scale = jnp.stack([jnp.max(jnp.abs(feats), axis=0) / 127.0] * K)
    keep = jnp.asarray(rng.random(n_vert) < 0.8)
    vrows = quantize_rows(feats, scale[0], keep)
    brows = pack_bricks_from_vertices(vrows, R, K)
    # chain-shaped positions (A, E): short coherent walks
    o = rng.uniform(0.2, 0.8, (32, 1, 3))
    d = rng.normal(size=(32, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(o + d * np.arange(12)[None, :, None] * 0.05, jnp.float32)
    want = baked_features(vrows, scale, R, K, "nearest", pos.reshape(-1, 3))
    got, ovf = baked_features_brick(brows, scale, R, K, pos, n_heads=12)
    assert not np.asarray(ovf).any()
    assert np.array_equal(np.asarray(got).reshape(-1, F), np.asarray(want))
    # tiny head budget: prefix exact, suffix flagged (never silently wrong)
    got1, ovf1 = baked_features_brick(brows, scale, R, K, pos, n_heads=2)
    ovf1 = np.asarray(ovf1)
    g1 = np.asarray(got1).reshape(-1, F)[~ovf1.reshape(-1)]
    w1 = np.asarray(want)[~ovf1.reshape(-1)]
    assert np.array_equal(g1, w1)
    # the flagged set is a per-ray suffix (slot is nondecreasing)
    assert all(
        np.all(row[np.argmax(row):] ) if row.any() else True for row in ovf1
    )


def test_cull_matches_nearest_vertex():
    R, K = 8, 2
    n_vert = K * (R + 1) ** 3
    key = jax.random.PRNGKey(4)
    keep = jax.random.bernoulli(key, 0.5, (n_vert,))
    words = pack_bits(keep)
    pos = jax.random.uniform(jax.random.PRNGKey(5), (500, 3), minval=-0.4, maxval=1.4)
    flat, oob, _ = nearest_vertex_ids(R, K, pos)
    want = np.asarray(jnp.take(keep, flat)) & ~np.asarray(oob)
    got = np.asarray(cull_candidates(words, R, K, pos))
    assert np.array_equal(got, want)


def test_compact_candidates_stable_prefix():
    keep = jnp.asarray(
        [[0, 1, 0, 1, 1, 0, 1, 0], [1, 1, 1, 1, 1, 1, 1, 1], [0, 0, 0, 0, 0, 0, 0, 0]],
        bool,
    )
    ts = jnp.arange(24, dtype=jnp.float32).reshape(3, 8)
    dts = ts * 10.0
    kept, ts_c, dts_c = compact_candidates(keep, 3, ts, dts)
    # row 0: kept columns 1,3,4 (in t order) fill the prefix
    assert np.allclose(np.asarray(ts_c[0]), [1.0, 3.0, 4.0])
    assert np.allclose(np.asarray(dts_c[0]), [10.0, 30.0, 40.0])
    assert np.asarray(kept[0]).all()
    # row 1: more survivors than slots -> first 3, all kept
    assert np.allclose(np.asarray(ts_c[1]), [8.0, 9.0, 10.0])
    # row 2: nothing kept
    assert not np.asarray(kept[2]).any()


def _lattice_field(R):
    """Deterministic smooth feature field sampled on the (R+1)^3 lattice."""
    Rv = R + 1
    ax = jnp.linspace(0.0, 1.0, Rv)
    x, y, z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    feats = jnp.stack(
        [jnp.sin(3 * x + c) + jnp.cos(2 * y - c) + z * c * 0.1 for c in range(16)],
        axis=-1,
    ).reshape(-1, 16)
    return feats


def test_nearest_lookup_matches_lattice():
    R = 8
    feats = _lattice_field(R)
    scale = jnp.maximum(jnp.max(jnp.abs(feats), axis=0), 1e-6) / 127.0
    rows = quantize_rows(feats, scale, jnp.ones(feats.shape[0], bool))
    lo, hi = jnp.zeros(3), jnp.ones(3)
    # query exactly at interior lattice vertices
    ids = jnp.arange(feats.shape[0])
    Rv = R + 1
    ijk = jnp.stack([ids // (Rv * Rv), (ids // Rv) % Rv, ids % Rv], axis=-1)
    pos = ijk.astype(jnp.float32) / R * 0.999999  # keep hi-edge in-bbox
    out = baked_features(rows, scale[None], R, 1, "nearest", pos)
    err = np.abs(np.asarray(out) - np.asarray(feats))
    assert err.max() <= np.asarray(scale).max() * 0.51 + 1e-5


def test_trilinear_cell_center_is_corner_mean():
    R = 4
    feats = _lattice_field(R)
    scale = jnp.maximum(jnp.max(jnp.abs(feats), axis=0), 1e-6) / 127.0
    vrows = quantize_rows(feats, scale, jnp.ones(feats.shape[0], bool))
    crows = pack_cells_from_vertices(vrows, R, chunk=16)
    assert crows.shape == (R**3, 32)
    lo, hi = jnp.zeros(3), jnp.ones(3)
    # cell centers: trilinear = mean of the 8 corners
    ax = (jnp.arange(R) + 0.5) / R
    cx, cy, cz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pos = jnp.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
    out = baked_features(vrows, scale[None], R, 1, "nearest", pos)  # sanity: runs
    out = baked_features(crows, scale[None], R, 1, "trilinear", pos)
    dec, _ = _decode_rows(vrows, scale)
    dec = np.asarray(dec).reshape(R + 1, R + 1, R + 1, 16)
    mean8 = (
        dec[:-1, :-1, :-1] + dec[:-1, :-1, 1:] + dec[:-1, 1:, :-1] + dec[:-1, 1:, 1:]
        + dec[1:, :-1, :-1] + dec[1:, :-1, 1:] + dec[1:, 1:, :-1] + dec[1:, 1:, 1:]
    ).reshape(-1, 16) / 8.0
    assert np.abs(np.asarray(out) - mean8).max() < 1e-3


def test_trilinear_corner_order():
    """Querying epsilon-inside each corner of a cell returns that corner's
    vertex value — catches packing/lookup corner-order mismatches that the
    (order-invariant) cell-center test cannot."""
    R = 2
    feats = _lattice_field(R)
    scale = jnp.maximum(jnp.max(jnp.abs(feats), axis=0), 1e-6) / 127.0
    vrows = quantize_rows(feats, scale, jnp.ones(feats.shape[0], bool))
    crows = pack_cells_from_vertices(vrows, R, chunk=8)
    dec, _ = _decode_rows(vrows, scale)
    dec = np.asarray(dec).reshape(R + 1, R + 1, R + 1, 16)
    lo, hi = jnp.zeros(3), jnp.ones(3)
    eps = 1e-4
    for ci, cj, ck in [(0, 0, 0), (1, 0, 1), (0, 1, 1), (1, 1, 0)]:  # cell ids
        for dx, dy, dz in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]:
            vert = np.array([ci + dx, cj + dy, ck + dz]) / R
            inward = (np.array([ci, cj, ck]) + 0.5) / R - vert
            pos = jnp.asarray(vert + eps * np.sign(inward) * (np.abs(inward) > 0), jnp.float32)
            out = baked_features(crows, scale[None], R, 1, "trilinear", pos[None])
            want = dec[ci + dx, cj + dy, ck + dz]
            assert np.abs(np.asarray(out[0]) - want).max() < 1e-2, (ci, cj, ck, dx, dy, dz)


def test_out_of_bbox_is_transparent():
    R = 4
    feats = _lattice_field(R) + 5.0  # well away from the sentinel range
    scale = jnp.maximum(jnp.max(jnp.abs(feats), axis=0), 1e-6) / 127.0
    rows = quantize_rows(feats, scale, jnp.ones(feats.shape[0], bool))
    pos = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
    out = baked_features(rows, scale[None], R, 1, "nearest", pos)
    assert np.all(np.asarray(out[:, 0]) <= -99.0)  # sentinel raw density


@pytest.fixture(scope="module")
def trained_small():
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 14, grid_size=32, train_k=48)
    eng.train_march_iters = 128
    eng._phase = "fast"
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    return eng, state, ds


@pytest.mark.parametrize("mode,evals", [("trilinear", 32), ("nearest", 32), ("nearest", 8)])
@pytest.mark.slow
def test_baked_render_matches_live(trained_small, mode, evals):
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=64, mode=mode)

    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    live, _ = eng.render_frame(
        params, bitfield, RES, RES, cam, focal, tile=1 << 12, min_transmittance=1e-4
    )
    baked, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal,
        width=RES, height=RES, resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=1 << 12, candidates=32, evals=evals,
        min_transmittance=1e-4,
    )
    live, baked = np.asarray(live), np.asarray(baked)
    assert np.isfinite(baked).all()
    mse = float(np.mean((live[..., :3] - baked[..., :3]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    # the baked field is a quantized lattice approximation of the live one;
    # on the smooth ball scene they should agree closely
    assert psnr > 22.0, (mode, psnr)
    # opacity masks agree on most pixels
    agree = np.mean((live[..., 3] > 0.5) == (baked[..., 3] > 0.5))
    assert agree > 0.95, (mode, agree)


def test_coarse_live_bits_conservative():
    """Every position whose fine nearest vertex is live must also be live
    under the half-res pooled sidecar (the conservative-cover property that
    makes the coarse cull frame-exact)."""
    from sienerf_tpu.ops.baked import coarse_live_bits, lookup_bits

    R, K = 16, 2
    n_vert = K * (R + 1) ** 3
    live = jax.random.bernoulli(jax.random.PRNGKey(11), 0.3, (n_vert,))
    words_f = pack_bits(live)
    words_c = coarse_live_bits(live, R, K)
    pos = jax.random.uniform(jax.random.PRNGKey(12), (4000, 3), minval=-0.9, maxval=1.9)
    flat_f, oob, _ = nearest_vertex_ids(R, K, pos)
    flat_c, oob_c, _ = nearest_vertex_ids(R // 2, K, pos)
    keep_f = np.asarray(lookup_bits(words_f, flat_f) & ~oob)
    keep_c = np.asarray(lookup_bits(words_c, flat_c) & ~oob_c)
    assert np.array_equal(np.asarray(oob), np.asarray(oob_c))
    # conservative: fine-keep implies coarse-keep
    assert not np.any(keep_f & ~keep_c)
    # and not vacuous: the pooled grid still culls most of the empty space
    assert keep_c.mean() < 0.9


@pytest.mark.slow
def test_coarse_cull_frame_matches(trained_small, monkeypatch):
    """SIENERF_CULL=coarse must render the same frame as the full-res cull
    up to min-transmittance termination quantization: extra keeps read the
    fine sentinel and composite to zero, overflow rollback re-covers any
    pushed-out survivor; only WHERE chunk boundaries fall (and thus where
    the T<minT early-out truncates) can shift, bounding the deviation by
    ~minT."""
    import jax as _jax

    from sienerf_tpu.engines.nerf_baked import render_rays_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=64, mode="nearest")
    n = 128
    uv = jnp.stack([jnp.linspace(0.1, 0.9, n), jnp.full((n,), 0.5)], axis=-1)
    from sienerf_tpu.utils.camera import uv_to_ray

    o, d = uv_to_ray(uv, (RES, RES), tuple(np.asarray(ds.focal_lengths[0])),
                     ds.xforms[0], (0.5, 0.5), eng.lens)
    outs = {}
    for cull in ("fine", "coarse", "brick"):
        monkeypatch.setenv("SIENERF_CULL", cull)
        _jax.clear_caches()  # the env knob is read at trace time
        rgb, op, depth = render_rays_baked(
            eng, params, grid, meta, bitfield, o, d, P=32, evals=8,
            step_scale=2.0, max_rounds=48,
        )
        outs[cull] = np.asarray(rgb), np.asarray(op)
    # engine minT here is 1e-2; measured max deviations are ~1.8e-2 rgb /
    # ~3e-2 op (minT-scale), means ~2e-3 — i.e. >50 dB agreement
    assert np.allclose(outs["fine"][0], outs["coarse"][0], atol=5e-2)
    assert np.allclose(outs["fine"][1], outs["coarse"][1], atol=8e-2)
    assert np.mean(np.abs(outs["fine"][0] - outs["coarse"][0])) < 5e-3
    # the brick cull keeps a (conservative) superset of the coarse keeps —
    # same pooled bits, head-budget overflows only ADD keeps — so its frame
    # deviates from coarse by at most the same minT-quantization mechanism
    assert np.allclose(outs["brick"][0], outs["coarse"][0], atol=5e-2)
    assert np.mean(np.abs(outs["brick"][0] - outs["coarse"][0])) < 5e-3


def test_merge_same_vertex_runs_exact():
    from sienerf_tpu.ops.baked import merge_same_vertex_runs

    flat = jnp.asarray([[5, 5, 5, 7, 7, 9, 4, 4],
                        [1, 2, 3, 4, 5, 6, 7, 8]])
    keep = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 1],
                        [1, 1, 1, 1, 1, 1, 1, 1]], bool)
    dts = jnp.arange(16, dtype=jnp.float32).reshape(2, 8) + 1.0
    head, dt = merge_same_vertex_runs(flat, keep, dts, max_run=8)
    # row 0: runs [5,5,5] [7,7] [9]; col 6 not kept so col 7 starts fresh
    assert np.array_equal(np.asarray(head[0]), [1, 0, 0, 1, 0, 1, 0, 1])
    assert np.allclose(np.asarray(dt[0, 0]), 1 + 2 + 3)
    assert np.allclose(np.asarray(dt[0, 3]), 4 + 5)
    assert np.allclose(np.asarray(dt[0, 5]), 6.0)
    assert np.allclose(np.asarray(dt[0, 7]), 8.0)
    # row 1: all distinct -> all heads, dts unchanged
    assert np.asarray(head[1]).all()
    assert np.allclose(np.asarray(dt[1]), np.asarray(dts[1]))
    # optical depth conservation: sum of head dts == sum of kept dts
    tot_head = float(jnp.sum(jnp.where(head, dt, 0.0)))
    tot_kept = float(jnp.sum(jnp.where(keep, dts, 0.0)))
    assert abs(tot_head - tot_kept) < 1e-5


def test_merge_runs_window_bound():
    from sienerf_tpu.ops.baked import merge_same_vertex_runs

    # run longer than the window: absorbed dts never lost would require a
    # larger window — verify the window bound covers physical chains by
    # construction (engine computes bound >= max voxel pitch / min dt), and
    # that within-window runs conserve optical depth
    flat = jnp.full((1, 10), 3)
    keep = jnp.ones((1, 10), bool)
    dts = jnp.ones((1, 10), jnp.float32)
    head, dt = merge_same_vertex_runs(flat, keep, dts, max_run=10)
    assert np.array_equal(np.asarray(head[0]), [1] + [0] * 9)
    assert np.allclose(np.asarray(dt[0, 0]), 10.0)


@pytest.mark.slow
def test_flush_every_and_no_advance(trained_small):
    """flush_every groups march/eval passes between flushes without touching
    per-ray math (bit-identical frames); advance_iters=0 relies on the
    candidate bit-cull to skip gaps (near-identical frames)."""
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=64, mode="nearest")

    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    kw = dict(
        width=RES, height=RES, resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=1 << 12, candidates=32, evals=8,
        min_transmittance=1e-4,
    )
    base, _ = render_frame_baked(eng, params, bitfield, grid, cam, focal, **kw)
    grouped, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, flush_every=2, **kw
    )
    assert np.allclose(np.asarray(base), np.asarray(grouped), atol=1e-5), (
        "flush_every must not change per-ray results"
    )
    noadv, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, advance_iters=0, **kw
    )
    base_np, noadv = np.asarray(base), np.asarray(noadv)
    mse = float(np.mean((base_np[..., :3] - noadv[..., :3]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    assert psnr > 30.0, psnr
    # shallow frame-init advance: candidate bit-cull absorbs the coarser
    # span start, so the frame stays visually identical to the deep default
    shallow, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, init_advance_iters=8, **kw
    )
    shallow = np.asarray(shallow)
    mse = float(np.mean((base_np[..., :3] - shallow[..., :3]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    assert psnr > 30.0, psnr


def test_compact_candidates_onehot_equivalence():
    """One-hot-MXU compaction matches the sort-network compaction on every
    kept slot (padded slots differ by design and are masked by callers)."""
    from sienerf_tpu.ops.baked import compact_candidates, compact_candidates_onehot

    key = jax.random.PRNGKey(11)
    A, P, S = 64, 32, 9
    keep = jax.random.uniform(key, (A, P)) < 0.4
    ts = jnp.cumsum(jax.random.uniform(jax.random.PRNGKey(12), (A, P)), axis=1)
    dts = jax.random.uniform(jax.random.PRNGKey(13), (A, P))
    k1, t1, d1 = compact_candidates(keep, S, ts, dts)
    k2, t2, d2 = compact_candidates_onehot(keep, S, ts, dts)
    assert np.array_equal(np.asarray(k1), np.asarray(k2))
    m = np.asarray(k1)
    assert np.allclose(np.asarray(t1)[m], np.asarray(t2)[m])
    assert np.allclose(np.asarray(d1)[m], np.asarray(d2)[m])


def test_scout_advance_conservative():
    """The vectorized scout advance must NEVER jump past a position whose
    nearest fine vertex is live (else the candidate chain would skip real
    content and render holes).  Brute-force oracle: march t..t_new at fine
    spacing and assert every skipped position's nearest vertex is dead."""
    import jax

    from sienerf_tpu.engines.nerf_baked import _scout_advance
    from sienerf_tpu.ops.baked import nearest_vertex_ids, scout_live_bits
    from sienerf_tpu.ops.bits import pack_bits

    R, K = 32, 2
    Rv = R + 1
    rng = np.random.default_rng(7)
    live = jnp.asarray(rng.random(K * Rv**3) < 0.02)  # sparse field
    grid = {"bits3": scout_live_bits(live, R, K)}
    meta = {"resolution": R, "n_cascades": K}

    A, S = 64, 16
    o = jnp.asarray(rng.uniform(-0.4, 1.4, (A, 3)), jnp.float32)
    d = rng.normal(size=(A, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t = jnp.asarray(rng.uniform(0.0, 0.3, (A,)), jnp.float32)
    t1 = t + 2.0
    t_new = np.asarray(_scout_advance(grid, meta, o, d, t, t1, S))
    assert np.all(t_new >= np.asarray(t) - 1e-6)

    # oracle: sample the skipped span densely; nearest-vertex reads there
    # must all be dead
    M = 512
    fr = np.linspace(0.0, 1.0, M, endpoint=False)[None, :]
    ts = np.asarray(t)[:, None] + fr * np.maximum(t_new - np.asarray(t), 0.0)[:, None]
    pos = np.asarray(o)[:, None, :] + ts[..., None] * np.asarray(d)[:, None, :]
    flat, oob, _ = nearest_vertex_ids(R, K, jnp.asarray(pos, jnp.float32))
    hit = np.asarray(live)[np.asarray(flat)] & ~np.asarray(oob)
    # positions strictly inside [t, t_new) must be dead (t_new itself may be
    # one h before a live probe, i.e. still dead, but allow the boundary)
    skipped = ts < t_new[:, None] - 1e-6
    assert not np.any(hit & skipped), (
        f"scout advance skipped {int(np.sum(hit & skipped))} live samples"
    )


def test_quantize_rows_int16_roundtrip():
    """int16 bake rows: round-trip error ~scale/2, sentinel preserved, and
    baked_features dispatches by the (static) row width."""
    from sienerf_tpu.ops.baked import _decode_rows, quantize_rows, row_bits

    rng = np.random.default_rng(3)
    F = 16
    feats = jnp.asarray(rng.normal(size=(64, F)) * 5.0, jnp.float32)
    scale = jnp.abs(jnp.asarray(rng.normal(size=(F,)), jnp.float32)) * 1e-3 + 1e-4
    keep = jnp.asarray(rng.random(64) < 0.8)
    rows16 = quantize_rows(feats, scale, keep, bits=16)
    assert rows16.shape == (64, F // 2) and row_bits(rows16) == 16
    dec, sent = _decode_rows(rows16, scale, 16)
    assert np.array_equal(np.asarray(sent), ~np.asarray(keep))
    kept = np.asarray(keep)
    clip = np.asarray(jnp.clip(feats, -32767 * scale, 32767 * scale))
    err = np.abs(np.asarray(dec) - clip)[kept]
    assert err.max() <= float(scale.max()) * 0.51

    rows8 = quantize_rows(feats, scale, keep, bits=8)
    assert rows8.shape == (64, F // 4) and row_bits(rows8) == 8


def test_pack_lookup_bytes_roundtrip():
    from sienerf_tpu.ops.bits import lookup_bytes, pack_bytes

    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.integers(0, 256, 1000), jnp.int32)
    rows = pack_bytes(vals)
    ids = jnp.asarray(rng.integers(0, 1000, 333), jnp.int32)
    got = lookup_bytes(rows, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals)[np.asarray(ids)])


def test_dist_live_cells_chebyshev():
    """Single-cascade sanity: the sidecar's D equals 1 + Chebyshev distance
    to the nearest blocking quarter-cell (0 on blocking cells), clamped."""
    from sienerf_tpu.ops.baked import dist_live_cells
    from sienerf_tpu.ops.bits import lookup_bytes

    R, K = 32, 1
    Rv, R4 = R + 1, R // 4
    live = np.zeros(K * Rv**3, bool)
    # one live fine vertex at (16, 16, 16) -> blocking quarter-cells are
    # those whose vertex window [4c, 4c+4] contains 16: c in {3, 4} per axis
    live[(16 * Rv + 16) * Rv + 16] = True
    rows = dist_live_cells(jnp.asarray(live), R, K, max_dist=15)
    D = np.asarray(lookup_bytes(rows, jnp.arange(K * R4**3, dtype=jnp.int32)))
    D = D.reshape(R4, R4, R4)
    cc = np.stack(np.meshgrid(*[np.arange(R4)] * 3, indexing="ij"), -1)
    cheb = np.max(
        np.minimum(np.abs(cc - 3), np.abs(cc - 4)), axis=-1
    )  # distance to the {3,4}^3 blocking block
    expect = np.minimum(cheb, 15)
    np.testing.assert_array_equal(D, expect)


def test_dist_advance_conservative():
    """The distance-jump advance (and retreat) must NEVER skip a position
    whose nearest fine vertex is live — same oracle as the scout test, over
    a 2-cascade field (exercises the cascade-combine + cube clamping)."""
    from sienerf_tpu.engines.nerf_baked import _dist_advance, _dist_retreat
    from sienerf_tpu.ops.baked import dist_live_cells, nearest_vertex_ids

    R, K = 32, 2
    Rv = R + 1
    rng = np.random.default_rng(11)
    # sparse at QUARTER-cell granularity: each cell covers 5^3 vertices, so
    # vertex density must be ~1e-3 for non-blocking cells to exist at all
    live = jnp.asarray(rng.random(K * Rv**3) < 0.001)
    grid = {"dist3d": dist_live_cells(live, R, K)}
    meta = {"resolution": R, "n_cascades": K}

    A = 96
    o = jnp.asarray(rng.uniform(-0.6, 1.6, (A, 3)), jnp.float32)
    d = rng.normal(size=(A, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t = jnp.asarray(rng.uniform(0.0, 0.3, (A,)), jnp.float32)
    t1 = t + 2.0
    t_new = np.asarray(_dist_advance(grid, meta, o, d, t, t1, 4))
    assert np.all(t_new >= np.asarray(t) - 1e-6)
    assert np.any(t_new > np.asarray(t) + 1e-4)  # it does advance somewhere
    t1_new = np.asarray(_dist_retreat(grid, meta, o, d, jnp.asarray(t_new), t1, 4))
    assert np.all(t1_new <= np.asarray(t1) + 1e-6)

    def assert_dead(ts_lo, ts_hi):
        M = 1024
        fr = np.linspace(0.0, 1.0, M, endpoint=False)[None, :]
        ts = ts_lo[:, None] + fr * np.maximum(ts_hi - ts_lo, 0.0)[:, None]
        pos = np.asarray(o)[:, None, :] + ts[..., None] * np.asarray(d)[:, None, :]
        flat, oob, _ = nearest_vertex_ids(R, K, jnp.asarray(pos, jnp.float32))
        hit = np.asarray(live)[np.asarray(flat)] & ~np.asarray(oob)
        skipped = (ts < ts_hi[:, None] - 1e-6) & (ts > ts_lo[:, None] + 1e-6)
        assert not np.any(hit & skipped), (
            f"distance advance skipped {int(np.sum(hit & skipped))} live samples"
        )

    assert_dead(np.asarray(t), t_new)  # forward jumps
    assert_dead(t1_new, np.asarray(t1))  # backward jumps


def test_dist_advance_frame_matches_dda(trained_small):
    """adv='dist' (distance-field jumps) is a pure empty-space accelerator:
    the rendered frame must match the serial-DDA default to compositing
    tolerance (both advances are conservative; the candidate cull absorbs
    any difference in where the chain starts)."""
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=64, mode="nearest")
    assert "dist3d" in grid

    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    kw = dict(
        width=RES, height=RES, resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=1 << 12, candidates=32, evals=8,
        min_transmittance=1e-4,
    )
    base, _ = render_frame_baked(eng, params, bitfield, grid, cam, focal, **kw)
    dist, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, adv="dist", **kw
    )
    base, dist = np.asarray(base), np.asarray(dist)
    mse = float(np.mean((base[..., :3] - dist[..., :3]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    # not bit-identical: a different (still conservative) advance shifts the
    # candidate-chain PHASE, like the adv=0 / shallow-init variants above —
    # same tolerance as those (skipping real content would fail the
    # conservativeness property test, not just this)
    assert psnr > 30.0, psnr


def test_trilinear_cull_frame_matches_nocull(trained_small):
    """The trilinear 5^3-pooled cull (ops/baked.trilinear_live_bits) only
    skips samples whose 8 cell corners are ALL sub-threshold — the culled
    frame must match the no-cull trilinear frame to compositing tolerance."""
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(
        params, state["occ"], resolution=64, mode="trilinear"
    )
    assert "bits2t" in grid

    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    kw = dict(
        width=RES, height=RES, resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=1 << 12, min_transmittance=1e-4,
    )
    nocull, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, candidates=32, evals=32, **kw
    )
    culled, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, candidates=32, evals=12, **kw
    )
    nocull, culled = np.asarray(nocull), np.asarray(culled)
    assert np.isfinite(culled).all()
    mse = float(np.mean((nocull[..., :3] - culled[..., :3]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    assert psnr > 35.0, psnr


def test_dist_occupancy_advance_conservative():
    """The shipped jump field (dist3d = dist_occupancy_cells over the
    TRAINING bitfield) must never jump across an occupied training cell —
    the exact contract the serial DDA provides."""
    from sienerf_tpu.engines.nerf_baked import _dist_advance
    from sienerf_tpu.ops.baked import cascade_extent, dist_occupancy_cells
    from sienerf_tpu.ops.occupancy import mip_from_pos

    G, K = 32, 2
    rng = np.random.default_rng(13)
    occ = jnp.asarray(rng.random((K, G, G, G)) < 0.03)
    grid = {"dist3d": dist_occupancy_cells(occ, max_dist=15)}
    meta = {"resolution": 999, "n_cascades": K}  # resolution unused by dist

    A = 96
    o = jnp.asarray(rng.uniform(-0.6, 1.6, (A, 3)), jnp.float32)
    d = rng.normal(size=(A, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t = jnp.asarray(rng.uniform(0.0, 0.3, (A,)), jnp.float32)
    t1 = t + 2.0
    t_new = np.asarray(_dist_advance(grid, meta, o, d, t, t1, 4))
    assert np.all(t_new >= np.asarray(t) - 1e-6)
    assert np.any(t_new > np.asarray(t) + 1e-4)

    # oracle: positions strictly inside the skipped span must lie in
    # unoccupied training cells (at their own cascade)
    M = 1024
    fr = np.linspace(0.0, 1.0, M, endpoint=False)[None, :]
    ts = np.asarray(t)[:, None] + fr * np.maximum(t_new - np.asarray(t), 0.0)[:, None]
    pos = np.asarray(o)[:, None, :] + ts[..., None] * np.asarray(d)[:, None, :]
    m = np.asarray(mip_from_pos(jnp.asarray(pos, jnp.float32), K))
    ext = 2.0 ** m
    u = (pos - 0.5) / ext[..., None] + 0.5
    inb = np.all((u >= 0) & (u < 1), axis=-1)
    c3 = np.clip(np.floor(u * G).astype(int), 0, G - 1)
    occ_np = np.asarray(occ)
    hit = occ_np[m, c3[..., 0], c3[..., 1], c3[..., 2]] & inb
    skipped = (ts < t_new[:, None] - 1e-6) & (ts > np.asarray(t)[:, None] + 1e-6)
    assert not np.any(hit & skipped), (
        f"occupancy jump crossed {int(np.sum(hit & skipped))} occupied cells"
    )
