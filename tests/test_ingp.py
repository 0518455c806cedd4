"""Reference `.ingp` snapshot interchange: msgpack codec, Morton density
grid ordering, tcnn parameter layout round-trips, and a full
export -> import -> identical-forward check."""

import numpy as np
import pytest

from sienerf_tpu.io import msgpack_lite
from sienerf_tpu.io.ingp import (
    cell_to_corner_table,
    density_grid_from_morton,
    density_grid_to_morton,
    export_ingp,
    import_ingp,
    join_tcnn_params,
    load_ingp,
    morton3d,
    split_tcnn_params,
    tcnn_grid_level_sizes,
)
from sienerf_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid_params
from sienerf_tpu.ops.mlp import MLPConfig, init_mlp_params


def test_msgpack_roundtrip():
    obj = {
        "a": 1,
        "big": 1 << 40,
        "neg": -7,
        "negbig": -(1 << 20),
        "f": 3.25,
        "s": "hello" * 20,
        "none": None,
        "flag": True,
        "arr": [1, 2.5, "x", None, [1, 2], {"k": False}],
        "bin": bytes(range(256)) * 3,
        "nested": {"deep": {"list": list(range(40))}},
    }
    back = msgpack_lite.unpack(msgpack_lite.pack(obj))
    assert back["a"] == 1 and back["big"] == 1 << 40 and back["neg"] == -7
    assert back["negbig"] == -(1 << 20)
    assert back["f"] == 3.25 and back["s"] == obj["s"]
    assert back["none"] is None and back["flag"] is True
    assert back["arr"][:2] == [1, 2.5] and back["arr"][5] == {"k": False}
    assert back["bin"] == obj["bin"]
    assert back["nested"]["deep"]["list"] == list(range(40))


def test_morton_roundtrip():
    g = 16
    grid = np.random.RandomState(0).rand(2, g, g, g).astype(np.float32)
    flat = density_grid_to_morton(grid)
    back = density_grid_from_morton(flat, g)
    assert np.array_equal(back, grid)
    # morton of (1,0,0)=1, (0,1,0)=2, (0,0,1)=4
    assert morton3d(np.array([1]), np.array([0]), np.array([0]))[0] == 1
    assert morton3d(np.array([0]), np.array([1]), np.array([0]))[0] == 2
    assert morton3d(np.array([0]), np.array([0]), np.array([1]))[0] == 4


def _small_cfgs(layout="corner"):
    grid = HashGridConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=9, base_resolution=4,
        per_level_scale=2.0, layout=layout,
    )
    density = MLPConfig(n_input_dims=grid.n_output_dims, n_output_dims=16, n_neurons=16, n_hidden_layers=1)
    rgb = MLPConfig(n_input_dims=32, n_output_dims=3, n_neurons=16, n_hidden_layers=1)
    return grid, density, rgb


def test_tcnn_param_split_join_roundtrip():
    import jax

    grid_cfg, dcfg, rcfg = _small_cfgs()
    key = jax.random.PRNGKey(0)
    tree = {
        "grid": np.asarray(init_hashgrid_params(key, grid_cfg)),
        "density_mlp": [np.asarray(w) for w in init_mlp_params(key, dcfg)],
        "rgb_mlp": [np.asarray(w) for w in init_mlp_params(key, rcfg)],
    }
    flat = join_tcnn_params(tree, grid_cfg, dcfg, rcfg, dtype=np.float32)
    from sienerf_tpu.io.ingp import _mlp_tcnn_dims

    n_expected = sum(r * grid_cfg.n_features_per_level for r in tcnn_grid_level_sizes(grid_cfg))
    for cfg in (dcfg, rcfg):
        n_expected += sum(o * i for o, i in _mlp_tcnn_dims(cfg))
    assert flat.size == n_expected
    # final MLP outputs pad to 16 (tcnn padded_output_width)
    assert _mlp_tcnn_dims(rcfg)[-1][0] == 16
    back = split_tcnn_params(flat, grid_cfg, dcfg, rcfg)
    for ours, theirs in zip(tree["density_mlp"], back["density_mlp"]):
        assert np.allclose(ours, theirs)
    for ours, theirs in zip(tree["rgb_mlp"], back["rgb_mlp"]):
        assert np.allclose(ours, theirs)
    # grid rows beyond each level's tcnn size are zero-init in `back`
    for l, rows in enumerate(tcnn_grid_level_sizes(grid_cfg)):
        assert np.allclose(back["grid"][l, :rows], tree["grid"][l, :rows])


def test_cell_to_corner_dense_exact():
    import jax
    import jax.numpy as jnp

    # dense-only config: corner table reproduces the cell table's encode
    grid_cell = HashGridConfig(
        n_levels=2, n_features_per_level=2, log2_hashmap_size=10, base_resolution=4,
        per_level_scale=1.5, layout="cell",
    )
    import dataclasses

    grid_corner = dataclasses.replace(grid_cell, layout="corner")
    key = jax.random.PRNGKey(3)
    cell_table = init_hashgrid_params(key, grid_cell)
    corner = cell_to_corner_table(grid_cell, np.asarray(cell_table))
    pos = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))
    # the cell layout trains corners independently per cell, so interior
    # agreement is only exact when the cell table is corner-consistent;
    # build one from the converted corner table to verify the mapping
    from sienerf_tpu.io.ingp import corner_to_cell_table

    cell_back = corner_to_cell_table(grid_cell, corner)
    # interior positions: at the domain's upper edge the layouts differ by
    # construction (corner collapses the last vertex, cell extrapolates the
    # last cell) — also true during training, so nothing to convert there
    pos = 0.1 + 0.7 * pos
    enc_a = hashgrid_encode(grid_cell, jnp.asarray(cell_back), pos)
    enc_b = hashgrid_encode(grid_corner, jnp.asarray(corner), pos)
    assert np.allclose(np.asarray(enc_a), np.asarray(enc_b), atol=1e-6)


def test_export_import_forward_identical(tmp_path):
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.models.nerf_network import (
        NerfNetworkConfig,
        init_nerf_network,
        nerf_apply,
    )

    enc = {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 9, "base_resolution": 4, "per_level_scale": 2.0,
        "layout": "corner",
    }
    net_cfg_json = {
        "encoding": enc,
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
    }
    cfg = NerfNetworkConfig.from_network_config(net_cfg_json)
    params = init_nerf_network(jax.random.PRNGKey(0), cfg)
    params = {k: np.asarray(v) if not isinstance(v, list) else [np.asarray(w) for w in v] for k, v in params.items()}

    g = 16
    density_grid = np.random.RandomState(1).rand(1, g, g, g).astype(np.float32)

    p = tmp_path / "snap.ingp"
    export_ingp(
        p, net_cfg_json, params, cfg.grid, cfg.density_mlp, cfg.rgb_mlp,
        density_grid=density_grid, aabb_scale=1.0, training_step=123,
    )
    # raw structure matches the reference's expectations
    raw = load_ingp(p)
    assert raw["snapshot"]["version"] >= 1
    assert raw["snapshot"]["mode"] == "nerf"
    assert raw["snapshot"]["density_grid_size"] == g
    assert raw["snapshot"]["params_type"] == "__half"

    out = import_ingp(p)
    assert out["meta"]["training_step"] == 123
    assert np.allclose(out["density_grid"], density_grid, atol=2e-3)  # fp16
    assert out["config"]["encoding"]["layout"] == "corner"

    cfg2 = NerfNetworkConfig.from_network_config(out["config"], aabb_scale=out["meta"]["aabb_scale"])
    pos = jax.random.uniform(jax.random.PRNGKey(7), (128, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(8), (128, 3))
    rgb_a, dens_a = nerf_apply(cfg, params, pos, dirs)
    p2 = {k: (jnp.asarray(v) if not isinstance(v, list) else [jnp.asarray(w) for w in v]) for k, v in out["params"].items()}
    rgb_b, dens_b = nerf_apply(cfg2, p2, pos, dirs)
    # params passed through fp16: expect half-precision-level agreement
    assert np.allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=5e-3)
    assert np.allclose(np.asarray(dens_a), np.asarray(dens_b), atol=5e-3)


@pytest.mark.slow
def test_session_imports_reference_snapshot(tmp_path):
    """Session.load_snapshot routes reference files to the importer and the
    resulting engine renders; geometry scenes load nerf-object snapshots."""
    import jax
    import json

    from sienerf_tpu.models.nerf_network import NerfNetworkConfig, init_nerf_network
    from sienerf_tpu.session import Session, _is_reference_snapshot

    enc = {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 9, "base_resolution": 4, "per_level_scale": 2.0,
        "layout": "corner",
    }
    net_cfg_json = {
        "encoding": enc,
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
    }
    cfg = NerfNetworkConfig.from_network_config(net_cfg_json)
    params = init_nerf_network(jax.random.PRNGKey(0), cfg)
    params = {k: np.asarray(v) if not isinstance(v, list) else [np.asarray(w) for w in v] for k, v in params.items()}
    g = 128  # reference grid size so cascades line up
    rs = np.random.RandomState(0)
    density_grid = (rs.rand(1, g, g, g) < 0.01).astype(np.float32) * 0.5

    p = tmp_path / "ref.ingp"
    export_ingp(p, net_cfg_json, params, cfg.grid, cfg.density_mlp, cfg.rgb_mlp,
                density_grid=density_grid, training_step=77)
    assert _is_reference_snapshot(p)

    sess = Session()
    sess.load_snapshot(p)
    assert sess.training_step == 77
    assert sess.engine.net.grid.layout == "corner"
    out = sess.render(16, 16)
    assert out.shape == (16, 16, 4) and np.isfinite(out).all()

    # our native snapshots are NOT detected as reference files
    sess.save_snapshot(tmp_path / "native.snap")
    assert not _is_reference_snapshot(tmp_path / "native.snap")

    # geometry scene with a snapshot-backed nerf object
    scene = {"geometry": [{"type": "Nerf", "path": str(p), "center": [0, 0, 0]}]}
    sp = tmp_path / "mygeometry.json"
    sp.write_text(json.dumps(scene))
    sess2 = Session()
    sess2.load_file(sp)
    assert sess2.engine.objects[0].nerf is not None
