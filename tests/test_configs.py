"""Every shipped config variant must instantiate and run a forward pass.

Mirrors the reference's config library (reference configs/<mode>/*.json,
factory src/testbed.cu:3844-4212): nerf base/big/small/hashgrid/densegrid/
densegrid_1res/frequency/tensor/none/linear/0-3layer/base_14, sdf+image+
geometry base/hashgrid/frequency/oneblob(+takikawa).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.models.nerf_network import (
    NerfNetworkConfig,
    init_nerf_network,
    nerf_apply,
    nerf_l2_mask,
)
from sienerf_tpu.models.single_network import (
    SingleNetworkConfig,
    apply_single_network,
    init_single_network,
)
from sienerf_tpu.utils.config import load_network_config

CONFIGS = pathlib.Path(__file__).resolve().parent.parent / "configs"

NERF_VARIANTS = sorted(p.name for p in (CONFIGS / "nerf").glob("*.json"))


def _shrink(cfg: dict) -> dict:
    """Cap table sizes so instantiation stays test-fast; the exercised code
    paths (otype dispatch, init, forward) are capacity-independent."""
    enc = cfg.get("encoding", {})
    for e in [enc] + list(enc.get("nested", [])):
        if "log2_hashmap_size" in e or e.get("otype", "").lower().endswith("grid"):
            e["log2_hashmap_size"] = min(int(e.get("log2_hashmap_size", 19)), 14)
            e["base_resolution"] = min(int(e.get("base_resolution", 16)), 16)
    return cfg


@pytest.mark.parametrize("name", NERF_VARIANTS)
def test_nerf_config_forward(name):
    cfg = _shrink(load_network_config(CONFIGS / "nerf" / name))
    net = NerfNetworkConfig.from_network_config(cfg, aabb_scale=1.0)
    params = init_nerf_network(jax.random.PRNGKey(0), net)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    rgb, dens = nerf_apply(net, params, pos, dirs)
    assert rgb.shape == (64, 3) and dens.shape == (64,)
    assert np.isfinite(np.asarray(rgb)).all()
    # l2 mask must match the param tree structure (optimizer contract)
    jax.tree.map(lambda a, b: None, params, nerf_l2_mask(params))


@pytest.mark.slow
def test_nerf_variant_grads_flow():
    """Non-grid variants must be trainable: grads reach the MLPs."""
    for name in ("frequency.json", "none.json", "tensor.json"):
        cfg = _shrink(load_network_config(CONFIGS / "nerf" / name))
        net = NerfNetworkConfig.from_network_config(cfg)
        params = init_nerf_network(jax.random.PRNGKey(0), net)

        def loss(p):
            rgb, dens = nerf_apply(
                net, p, jnp.full((8, 3), 0.3), jnp.full((8, 3), 0.6)
            )
            return jnp.sum(rgb**2) + jnp.sum(dens**2)

        g = jax.grad(loss)(params)
        gn = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["density_mlp"])
        )
        assert gn > 0.0, name


@pytest.mark.parametrize("mode", ["sdf", "image", "geometry"])
@pytest.mark.parametrize("variant", ["base", "hashgrid", "frequency", "oneblob"])
def test_single_network_config_forward(mode, variant):
    path = CONFIGS / mode / f"{variant}.json"
    if not path.exists():
        pytest.skip(f"{mode}/{variant} not shipped")
    cfg = _shrink(load_network_config(path))
    n_in = 2 if mode == "image" else 3
    net = SingleNetworkConfig.from_network_config(cfg, n_in, 1)
    params = init_single_network(jax.random.PRNGKey(0), net)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, n_in))
    out = apply_single_network(net, params, x)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()
