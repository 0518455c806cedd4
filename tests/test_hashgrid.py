"""Hash-grid encoding numerics: shapes, dense-vs-hash indexing, interpolation
exactness, and gradient correctness vs finite differences (SURVEY.md §7
"hard parts" #1: the scatter-add backward is the correctness gate)."""

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid_params,
)


import pytest


def _cfg(**kw):
    base = dict(n_dims=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=12, base_resolution=4, per_level_scale=1.5)
    base.update(kw)
    return HashGridConfig(**base)


def test_output_shape_and_dtype():
    cfg = _cfg()
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hashgrid_encode(cfg, table, pos)
    assert out.shape == (64, cfg.n_levels * cfg.n_features_per_level)
    assert out.dtype == jnp.float32


def test_dense_level_interpolation_exact():
    """On a dense level, encoding a lattice-aligned point returns exactly its
    table entry; midpoints return the average of neighbors."""
    cfg = HashGridConfig(n_dims=1, n_levels=1, n_features_per_level=1, log2_hashmap_size=8, base_resolution=5, per_level_scale=2.0, layout="corner")
    assert cfg.level_is_dense(0)
    res = cfg.level_resolution(0)
    scale = cfg.level_scale(0)  # = 4
    table = jnp.arange(cfg.table_size, dtype=jnp.float32).reshape(1, -1, 1)
    # grid vertex k sits at pos = (k - 0.5)/scale  (pos*scale + 0.5 = k)
    k = 2
    pos = jnp.array([[(k - 0.5) / scale]])
    out = hashgrid_encode(cfg, table, pos)
    assert np.isclose(float(out[0, 0]), k)
    # halfway between vertices 2 and 3
    pos = jnp.array([[(k - 0.5 + 0.5) / scale]])
    out = hashgrid_encode(cfg, table, pos)
    assert np.isclose(float(out[0, 0]), k + 0.5)


def test_auto_per_level_scale():
    cfg = HashGridConfig.from_network_config(
        {"otype": "HashGrid", "n_levels": 16, "base_resolution": 16}, n_dims=3, aabb_scale=1.0
    )
    # finest level should reach ~2048 cells
    assert abs(cfg.level_scale(15) + 1 - 2048) / 2048 < 0.01


@pytest.mark.parametrize("layout", ["corner", "cell"])
def test_table_gradient_matches_fd(layout):
    cfg = _cfg(n_levels=2, log2_hashmap_size=6, base_resolution=3, per_level_scale=2.0, layout=layout)
    key = jax.random.PRNGKey(3)
    shape = ((cfg.n_levels, cfg.table_size, 8, cfg.n_features_per_level) if layout == "cell"
             else (cfg.n_levels, cfg.table_size, cfg.n_features_per_level))
    table = jax.random.normal(key, shape) * 0.1
    pos = jax.random.uniform(jax.random.PRNGKey(4), (8, 3), minval=0.05, maxval=0.95)
    g_out = jax.random.normal(jax.random.PRNGKey(5), (8, cfg.n_output_dims))

    def f(t):
        return jnp.sum(hashgrid_encode(cfg, t, pos) * g_out)

    grad = jax.grad(f)(table)
    # finite differences on a random subset of entries
    rng = np.random.default_rng(0)
    eps = 1e-3
    f0 = float(f(table))
    for _ in range(12):
        ix = tuple(rng.integers(s) for s in table.shape)
        tp = table.at[ix].add(eps)
        fd = (float(f(tp)) - f0) / eps
        assert np.isclose(fd, float(grad[ix]), atol=2e-2), ix


@pytest.mark.parametrize("layout", ["corner", "cell"])
def test_position_gradient_matches_fd(layout):
    cfg = _cfg(n_levels=3, base_resolution=4, per_level_scale=1.6, layout=layout)
    shape = ((cfg.n_levels, cfg.table_size, 8, cfg.n_features_per_level) if layout == "cell"
             else (cfg.n_levels, cfg.table_size, cfg.n_features_per_level))
    table = jax.random.normal(jax.random.PRNGKey(7), shape) * 0.5
    pos = jnp.array([[0.33, 0.41, 0.77], [0.1, 0.9, 0.5]])
    g_out = jax.random.normal(jax.random.PRNGKey(8), (2, cfg.n_output_dims))

    def f(p):
        return jnp.sum(hashgrid_encode(cfg, table, p) * g_out)

    grad = jax.grad(f)(pos)
    eps = 1e-4

    def crosses_cell_boundary(p, d):
        # cell layout is discontinuous at cell boundaries; skip FD probes that
        # straddle one at any level
        for l in range(cfg.n_levels):
            s = cfg.level_scale(l)
            lo = np.floor((p[d] - eps) * s + 0.5)
            hi = np.floor((p[d] + eps) * s + 0.5)
            if lo != hi:
                return True
        return False

    checked = 0
    for i in range(2):
        for d in range(3):
            if layout == "cell" and crosses_cell_boundary(np.asarray(pos[i]), d):
                continue
            pp = pos.at[i, d].add(eps)
            pm = pos.at[i, d].add(-eps)
            fd = (float(f(pp)) - float(f(pm))) / (2 * eps)
            assert np.isclose(fd, float(grad[i, d]), rtol=2e-2, atol=1e-3), (i, d)
            checked += 1
    assert checked >= 3


def test_2d_mode():
    cfg = _cfg(n_dims=2, n_levels=3)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
    out = hashgrid_encode(cfg, table, pos)
    assert out.shape == (16, 6)
    # differentiable end-to-end
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(cfg, t, pos) ** 2))(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_hash_level_spreads_indices():
    cfg = _cfg(n_levels=6, log2_hashmap_size=10, base_resolution=16, per_level_scale=2.0, layout="corner")
    level = cfg.n_levels - 1
    assert not cfg.level_is_dense(level)
    table = jnp.zeros((cfg.n_levels, cfg.table_size, cfg.n_features_per_level))
    pos = jax.random.uniform(jax.random.PRNGKey(2), (512, 3))
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(cfg, t, pos)))(table)
    touched = int(jnp.sum(jnp.any(g[level] != 0, axis=-1)))
    # 512 points x 8 corners should touch a large fraction of a 1024-slot table
    assert touched > 600


def test_bf16_packed_encode_matches():
    """pack_table_bf16 + hashgrid_encode_bf16 match the fp32 encode to bf16
    precision (render fast path)."""
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.ops.hashgrid import (
        HashGridConfig,
        hashgrid_encode,
        hashgrid_encode_bf16,
        init_hashgrid_params,
        pack_table_bf16,
    )

    cfg = HashGridConfig(n_levels=6, log2_hashmap_size=10, base_resolution=4)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4  # O(1) feats
    pos = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    ref = hashgrid_encode(cfg, table, pos)
    packed = pack_table_bf16(cfg, table)
    out = hashgrid_encode_bf16(cfg, packed, pos)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err <= 0.01 * max(scale, 1e-6), (err, scale)


def test_bf16train_encode_matches_packed_render_path():
    """hashgrid_encode_bf16train forward == the packed render encode; its
    gradient == the exact fp32 custom vjp (straight-through)."""
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.ops.hashgrid import (
        HashGridConfig,
        hashgrid_encode,
        hashgrid_encode_bf16,
        hashgrid_encode_bf16train,
        init_hashgrid_params,
        pack_table_bf16,
    )

    cfg = HashGridConfig.from_network_config(
        {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
         "log2_hashmap_size": 10, "base_resolution": 4},
        n_dims=3,
    )
    assert cfg.layout == "cell"
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_params(key, cfg) * 10.0  # spread past bf16 ulp
    pos = jax.random.uniform(jax.random.fold_in(key, 1), (64, 3))

    out_train = hashgrid_encode_bf16train(cfg, table, pos)
    out_render = hashgrid_encode_bf16(cfg, pack_table_bf16(cfg, table), pos)
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_render))

    def loss_train(t):
        return jnp.sum(hashgrid_encode_bf16train(cfg, t, pos) ** 2) * 0.5

    def loss_fp32(t):
        return jnp.sum(hashgrid_encode(cfg, t, pos) ** 2) * 0.5

    g_train = np.asarray(jax.grad(loss_train)(table))
    g_fp32 = np.asarray(jax.grad(loss_fp32)(table))
    # backward is the same vjp; only the cotangent differs by the bf16
    # quantization of the forward output (grad = out for this loss)
    assert np.isfinite(g_train).all()
    denom = np.abs(g_fp32).max() + 1e-9
    assert np.abs(g_train - g_fp32).max() / denom < 2e-2


@pytest.mark.slow
def test_bf16train_engine_step(monkeypatch):
    """SIENERF_TRAIN_PACK=bf16 flows through engine create and trains."""
    import jax

    monkeypatch.setenv("SIENERF_TRAIN_PACK", "bf16")
    from tests.test_extra_dims import make_dataset, make_engine

    eng = make_engine(make_dataset())
    assert eng.net.grid_train_pack == "bf16"
    state = eng.init(0)
    state, loss, _ = eng.train_bundle(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_hash_bwd_batched_matches_perlevel(monkeypatch):
    """SIENERF_HASH_BWD=batched (one batched sort + one flat segment_sum)
    is bit-exact vs the per-level sorted-scatter backward (VERDICT r2 #5:
    the 16 serial sorts were the dominant train-backward cost)."""
    import jax

    cfg = HashGridConfig(n_levels=6, log2_hashmap_size=12, n_dims=3)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4
    pos = jax.random.uniform(jax.random.PRNGKey(1), (733, 3))

    def loss(t, p):
        out = hashgrid_encode(cfg, t, p)
        return jnp.sum(jnp.sin(out) * jnp.arange(cfg.n_output_dims))

    # the knob is a module attribute resolved at import (ADVICE r3: env
    # reads inside traced code freeze into the jit cache) — patch the
    # attribute, not the env
    from sienerf_tpu.ops import hashgrid as hg

    monkeypatch.setattr(hg, "HASH_BWD_MODE", "batched")
    g_b = jax.grad(loss, argnums=(0, 1))(table, pos)
    monkeypatch.setattr(hg, "HASH_BWD_MODE", "perlevel")
    g_p = jax.grad(loss, argnums=(0, 1))(table, pos)
    assert float(jnp.max(jnp.abs(g_b[0] - g_p[0]))) == 0.0
    assert float(jnp.max(jnp.abs(g_b[1] - g_p[1]))) == 0.0


def test_bwd_bf16_mode_close(monkeypatch):
    """SIENERF_HASH_BWD=bf16 (unsorted bf16 scatter-add — the measured
    3.6x-faster TPU path, NOTES_ROUND4) matches the f32 sorted backward to
    bf16 rounding tolerance.  Reference precedent: tcnn accumulates hash
    gradients in fp16 (network_precision_t, testbed.h:462-466)."""
    import jax

    from sienerf_tpu.ops import hashgrid as hg

    cfg = HashGridConfig(n_levels=5, log2_hashmap_size=11, n_dims=3)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4
    pos = jax.random.uniform(jax.random.PRNGKey(2), (1337, 3))

    def loss(t):
        out = hashgrid_encode(cfg, t, pos)
        return jnp.vdot(out, jnp.sin(jnp.arange(out.size, dtype=jnp.float32)
                                     ).reshape(out.shape))

    monkeypatch.setattr(hg, "HASH_BWD_MODE", "perlevel")
    d32 = jax.grad(loss)(table)
    monkeypatch.setattr(hg, "HASH_BWD_MODE", "bf16")
    d16 = jax.grad(loss)(table)
    scale = float(jnp.max(jnp.abs(d32)))
    err = float(jnp.max(jnp.abs(d32 - d16)))
    # per-contribution bf16 rounding is 2^-9 relative; collisions accumulate
    # a few of them — 2% of the max-magnitude row is far above any seen
    # value but far below a wrong-algorithm error
    assert err <= 0.02 * scale, (err, scale)


def test_bwd_bf16_collision_heavy_swamping():
    """ADVICE r4: bound bf16 scatter-accumulation swamping at PRODUCTION
    collision counts, not just N=1337.  2^20 positions concentrated in a
    0.05^3 corner put thousands of collisions per coarse-level bucket.

    Accumulation ORDER decides the error: a hierarchical (pairwise)
    reduction grows error ~log(n); a serial one plateaus (contributions
    < 2^-9 of the running sum vanish).  Measured on the real TPU at the
    production config (L=16, T=2^19, N=2^20, tools/probe_bf16_swamp.py):
    max rel err on dominant rows 2.2% mixed-sign / 0.35% same-sign,
    cosine 0.99996 — the TPU scatter reduces hierarchically.  This CPU
    test runs under the suite's 8-virtual-device backend whose segment_sum
    accumulates SERIALLY (worst-case ordering: max rel 2.6, mean 10%), so
    it asserts only the algorithm-level invariants that hold under any
    ordering; the TPU probe is the production-precision evidence."""
    import jax

    from sienerf_tpu.ops import hashgrid as hg

    cfg = HashGridConfig(n_levels=8, log2_hashmap_size=14, n_dims=3)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4
    N = 1 << 20
    pos = jax.random.uniform(jax.random.PRNGKey(2), (N, 3)) * 0.05
    F = cfg.n_levels * cfg.n_features_per_level
    w = jax.random.normal(jax.random.PRNGKey(3), (N, F))

    def loss(t):
        return jnp.vdot(hashgrid_encode(cfg, t, pos), w)

    old = hg.HASH_BWD_MODE
    try:
        hg.HASH_BWD_MODE = "perlevel"
        d32 = np.asarray(jax.grad(loss)(table))
        hg.HASH_BWD_MODE = "bf16"
        d16 = np.asarray(jax.grad(loss)(table))
    finally:
        hg.HASH_BWD_MODE = old
    # direction must survive any accumulation ordering (a wrong algorithm
    # or index bug is ~uncorrelated); magnitude-tight bounds live in the
    # TPU probe where the production ordering actually runs
    cos = np.vdot(d32.ravel(), d16.ravel()) / (
        np.linalg.norm(d32) * np.linalg.norm(d16))
    assert cos > 0.98, cos
    scale = np.abs(d32).max()
    big = np.abs(d32) > 0.05 * scale
    rel = np.abs(d32[big] - d16[big]) / np.abs(d32[big])
    assert float(np.mean(rel)) < 0.15, np.mean(rel)


def test_flat_boundary_table_layout_equivalence():
    """The 2-D (L, T*C*F) boundary layout (ImageEngine per-step jit
    boundary; NOTES_ROUND4 tile-pad wall) encodes and differentiates
    identically to the canonical 4-D table."""
    import jax

    cfg = _cfg()
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    flat = table.reshape(table.shape[0], -1)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (257, cfg.n_dims))

    out4 = hashgrid_encode(cfg, table, pos)
    out2 = hashgrid_encode(cfg, flat, pos)
    np.testing.assert_array_equal(np.asarray(out4), np.asarray(out2))

    w = jnp.sin(jnp.arange(out4.size, dtype=jnp.float32)).reshape(out4.shape)
    g4 = jax.grad(lambda t: jnp.vdot(hashgrid_encode(cfg, t, pos), w))(table)
    g2 = jax.grad(lambda t: jnp.vdot(hashgrid_encode(cfg, t, pos), w))(flat)
    assert g2.shape == flat.shape
    np.testing.assert_array_equal(
        np.asarray(g4).reshape(g2.shape), np.asarray(g2))


def test_fp8_encode_accepts_coarser_quant_level_relabeling():
    """Render-only fp8 snapshots quantize with Lq < L per-level-scale groups
    (tools/export_render_snapshot.quantize_grid_fp8 over the state's stored
    grid shape); hashgrid_encode_fp8 must reproduce the dequantized encode
    exactly from the relabeled packed rows + repeat-expanded scales
    (io/snapshot.load_render_snapshot's fast path)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np

    from sienerf_tpu.ops.hashgrid import (
        HashGridConfig,
        hashgrid_encode,
        hashgrid_encode_fp8,
        init_hashgrid_params,
    )

    cfg = HashGridConfig(n_levels=4, n_features_per_level=2,
                         log2_hashmap_size=10, base_resolution=4)
    table = np.asarray(init_hashgrid_params(jax.random.PRNGKey(0), cfg)) * 10.0
    L, T = cfg.n_levels, cfg.table_size
    C, F = 8, cfg.n_features_per_level
    # quantize in Lq=2 groups of 2 config levels (the snapshot relabeling)
    Lq = 2
    flat = table.reshape(Lq, -1)
    scale = np.maximum(np.abs(flat).max(axis=1), 1e-8) / 448.0
    q8 = (flat / scale[:, None]).astype(ml_dtypes.float8_e4m3fn)
    deq = (q8.astype(np.float32) * scale[:, None]).reshape(L, T, C, F)
    # loader's numpy pack: (Lq, Tq, rows) f32 view of e4m3 quads
    Tq = (L // Lq) * T
    packed = (q8.view(np.uint8).reshape(Lq, Tq, (C * F) // 4, 4)
              .view(np.uint32).squeeze(-1).view(np.float32))

    pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    ref = hashgrid_encode(cfg, jnp.asarray(deq), pos)
    out = hashgrid_encode_fp8(cfg, jnp.asarray(packed), jnp.asarray(scale), pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
