"""Takikawa (NGLOD) octree encoding: octree build correctness vs brute
force, dual-vertex sharing, trilerp/partition-of-unity properties, gradient
flow, and an end-to-end SDF training run with the takikawa config
(reference takikawa_encoding.cuh / triangle_octree.cuh as behavior spec)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.engines.sdf import SdfEngine
from sienerf_tpu.geom.octree import (
    _tri_box_overlap,
    build_triangle_octree,
    octree_device_tables,
)
from sienerf_tpu.ops.takikawa import (
    N_FEATURES_PER_LEVEL,
    TakikawaConfig,
    init_takikawa_params,
    takikawa_encode,
)


def cube_mesh(lo=0.3, hi=0.7):
    v = np.array(
        [[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)], np.float32
    )
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
    ]
    return v[np.asarray(faces)]


def brute_force_cells(tris, d):
    """All level-d cells whose AABB touches any triangle (O(cells * tris))."""
    s = 1 << d
    idx = np.arange(s**3)
    cells = np.stack([idx // (s * s), (idx // s) % s, idx % s], axis=-1)
    centers = (cells + 0.5) / s
    hit = np.zeros(len(cells), bool)
    for t in range(len(tris)):
        hit |= _tri_box_overlap(
            np.broadcast_to(tris[t], (len(cells), 3, 3)), centers, 0.5 / s
        )
    return set(map(tuple, cells[hit]))


def test_octree_matches_brute_force():
    tris = cube_mesh().astype(np.float64)
    tree = build_triangle_octree(tris, 4)
    assert tree.depth == 4
    for d in range(1, 4):
        got = set(map(tuple, tree.level_cells(d)))
        want = brute_force_cells(tris, d)
        assert got == want, f"level {d}: {len(got)} vs {len(want)}"


def test_octree_vertex_sharing():
    """Adjacent cells at the same level share dual corner vertices."""
    tris = cube_mesh()
    tree = build_triangle_octree(tris, 4)
    d = 3
    cells = tree.level_cells(d)
    verts = tree.verts[d]
    lut = {tuple(c): i for i, c in enumerate(cells)}
    # find an x-adjacent pair
    pairs = 0
    for i, c in enumerate(cells):
        nb = (c[0] + 1, c[1], c[2])
        if nb in lut:
            j = lut[nb]
            # +x face corners of cell i == -x face corners of cell j.
            # corner bit order: bit0=x, bit1=y, bit2=z
            for yz in range(4):
                y, z = yz & 1, (yz >> 1) & 1
                ci = 1 | (y << 1) | (z << 2)
                cj = 0 | (y << 1) | (z << 2)
                assert verts[i][ci] == verts[j][cj]
            pairs += 1
    assert pairs > 0


def test_encoding_partition_of_unity():
    """With all features equal to a constant c, the encoding of any point
    inside an existing cell is exactly c (trilerp weights sum to 1); points
    in non-existent cells give 0."""
    tris = cube_mesh()
    tree = build_triangle_octree(tris, 5)
    tables = octree_device_tables(tree)
    cfg = TakikawaConfig(depth=tree.depth, starting_level=2)
    feats = jnp.full((tree.n_vertices, N_FEATURES_PER_LEVEL), 0.5)
    # surface points: all levels exist down the chain
    pos = jnp.asarray([[0.3, 0.5, 0.5], [0.7, 0.42, 0.61]])
    out = takikawa_encode(cfg, tables, feats, pos)
    assert out.shape == (2, cfg.n_output_dims)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-5)
    # a far-away empty-space point: zero at every level >= first empty
    pos2 = jnp.asarray([[0.02, 0.02, 0.02]])
    out2 = np.asarray(takikawa_encode(cfg, tables, feats, pos2))
    assert np.all(out2[:, N_FEATURES_PER_LEVEL:] == 0.0)
    # sum mode: sums the same per-level values
    cfg_sum = TakikawaConfig(depth=tree.depth, starting_level=2, sum_instead_of_concat=True)
    out3 = takikawa_encode(cfg_sum, tables, feats, pos)
    np.testing.assert_allclose(np.asarray(out3), 0.5 * cfg.n_levels_out, rtol=1e-5)


def test_encoding_trilerp_linear_in_position():
    """Features set to the vertex x-coordinate make the per-level output
    equal to the query x (trilerp reproduces linear functions)."""
    tris = cube_mesh()
    tree = build_triangle_octree(tris, 5)
    tables = octree_device_tables(tree)
    cfg = TakikawaConfig(depth=tree.depth, starting_level=2, interpolation="linear")
    # assign every dual vertex its x coordinate: rebuild per-level vertex
    # positions from cells + corner offsets
    feats = np.zeros((tree.n_vertices, N_FEATURES_PER_LEVEL), np.float32)
    for d in range(tree.depth):
        cells = tree.level_cells(d)
        for i, c in enumerate(cells):
            for k in range(8):
                off = [(k >> b) & 1 for b in range(3)]
                x = (c[0] + off[0]) / (1 << d)
                feats[tree.verts[d][i][k]] = x
    # exactly-on-surface points: the containing cell exists at every level
    pos = jnp.asarray([[0.3, 0.5, 0.5], [0.7, 0.42, 0.61]])
    out = np.asarray(takikawa_encode(cfg, tables, jnp.asarray(feats), pos))
    for lvl in range(cfg.n_levels_out):
        np.testing.assert_allclose(
            out[:, lvl * N_FEATURES_PER_LEVEL], np.asarray(pos)[:, 0], atol=1e-5
        )


@pytest.mark.slow
def test_gradients_flow_to_features():
    tris = cube_mesh()
    tree = build_triangle_octree(tris, 4)
    tables = octree_device_tables(tree)
    cfg = TakikawaConfig(depth=tree.depth, starting_level=1)
    feats = init_takikawa_params(jax.random.PRNGKey(0), tree.n_vertices)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.3, maxval=0.7)

    g = jax.grad(lambda f: jnp.sum(takikawa_encode(cfg, tables, f, pos) ** 2))(feats)
    assert float(jnp.sum(jnp.abs(g))) > 0.0
    # position gradient (analytic-normals path) is finite
    gp = jax.grad(lambda p: jnp.sum(takikawa_encode(cfg, tables, feats, p)))(pos)
    assert np.all(np.isfinite(np.asarray(gp)))


@pytest.mark.slow
def test_sdf_engine_takikawa_end_to_end(configs_dir):
    from sienerf_tpu.utils.config import load_network_config

    cfg = load_network_config(configs_dir / "sdf" / "takikawa.json")
    cfg["encoding"]["n_levels"] = 6  # keep the test octree small
    cfg["encoding"]["starting_level"] = 2  # include coarse levels: in/out signal everywhere
    # fast-convergence override for the smoke test (protocol lr is 1e-4)
    cfg["optimizer"]["nested"]["nested"]["learning_rate"] = 5e-3
    eng = SdfEngine.create(cfg, cube_mesh(), batch_size=1 << 12)
    assert eng.net.takikawa is not None
    assert eng.net.takikawa.depth == 6
    assert eng.tak_tables is not None
    state = eng.init(0)
    state, loss0 = eng.train_bundle(state, jax.random.PRNGKey(2), n_steps=2)
    state, loss1 = eng.train_bundle(state, jax.random.PRNGKey(3), n_steps=62)
    assert float(loss1) < float(loss0)

    # The octree encoding is zero in cells the octree never created (NGLOD
    # queries the SDF only near the surface while tracing — the reference
    # kernel writes zeros for unreached levels the same way), so gate on
    # near-surface sign agreement for points that carry features rather than
    # full-volume IoU.
    from sienerf_tpu.geom.sdf_gt import signed_distance
    from sienerf_tpu.models.single_network import apply_single_network
    from sienerf_tpu.ops.optim import inference_params

    key = jax.random.PRNGKey(4)
    geom = {"triangles": eng.triangles, "cdf": eng.tri_cdf}
    surf = eng._sample_surface(key, 4096, geom)
    pos = jnp.clip(surf + jax.random.normal(jax.random.PRNGKey(5), surf.shape) * 0.03, 0.0, 1.0)
    gt = signed_distance(eng.bvh_dev, pos, eng.sdf_mode)
    params = inference_params(state["opt"], state["params"])
    pred = apply_single_network(eng.net, params, pos, eng.tak_tables)[:, 0]
    # restrict to points whose coarsest included cell exists (has features)
    d = eng.net.takikawa.starting_level
    s = 1 << d
    cell = jnp.floor(jnp.clip(pos * s, 0, s - 1e-4)).astype(jnp.int32)
    code = (cell[:, 0] * s + cell[:, 1]) * s + cell[:, 2]
    exists = jnp.isin(code, eng.tak_tables[f"codes_{d}"])
    agree = float(jnp.sum(((gt < 0) == (pred < 0)) & exists) / jnp.sum(exists))
    assert agree > 0.8, agree
