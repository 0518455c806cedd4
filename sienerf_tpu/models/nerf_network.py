"""NerfNetwork: the two-branch density/color composite.

Behavioral spec: reference include/neural-graphics-primitives/nerf_network.h
(topology: pos -> HashGrid -> density MLP -> 16 wide; [SH(dir), extra] ++
density feats -> rgb MLP -> 3; density = channel 0 of the density branch)
and nerf_device.cuh:203-263 (output activations applied outside the MLPs:
rgb Logistic for LDR / Exponential for HDR, density Exponential).

TPU design: a pure-functional pytree of params; both branches are bf16
matmul chains; the hash encoding is the custom-VJP gather op.  The 16-wide
intermediate keeps the MXU-friendly (…,16)+(…,16)=32 rgb input layout of
the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sienerf_tpu.common import NerfActivation
from sienerf_tpu.ops.encodings import (
    encoding_output_dim,
    frequency_encode,
    oneblob_encode,
    sh_encode,
    trianglewave_encode,
)
from sienerf_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_encode_bf16,
    init_hashgrid_params,
)
from sienerf_tpu.ops.mlp import MLPConfig, init_mlp_params, mlp_apply

N_GEO_FEATURES = 16  # width of the density branch output (nerf_network.h:81-101)

_GRID_OTYPES = ("hashgrid", "densegrid", "tiledgrid", "grid")
# dim pairs for the triplane ("tensor") variant: the reference's
# configs/nerf/tensor.json composites three 2D hash grids over overlapping
# coordinate slices (TensoRF-style factorization)
_TRIPLANE_DIMS = ((0, 1), (1, 2), (2, 0))


@dataclass(frozen=True)
class NerfNetworkConfig:
    # "grid" (hash/dense/tiled 3D grid) | "triplane" (3x 2D grids, the
    # reference's configs/nerf/tensor.json) | analytic otype
    # (frequency/oneblob/trianglewave/identity, reference frequency/none
    # variants).  `grid` is the 3D grid config, a tuple of three 2D grid
    # configs for triplane, or None for analytic encodings.
    grid: HashGridConfig | tuple | None
    density_mlp: MLPConfig
    rgb_mlp: MLPConfig
    sh_degree: int = 4
    n_extra_dims: int = 0  # latent appearance dims appended to dir encoding
    rgb_activation: NerfActivation = NerfActivation.LOGISTIC
    density_activation: NerfActivation = NerfActivation.EXPONENTIAL
    pos_otype: str = "grid"
    pos_opts: tuple = ()  # analytic-encoding params as sorted (key, value) pairs
    # "bf16": training forward gathers bf16-packed rows from the fp32
    # master (half the HBM bytes; exact fp32 backward) — A/B knob, see
    # ops/hashgrid.py::hashgrid_encode_bf16train
    grid_train_pack: str = "none"

    @staticmethod
    def from_network_config(
        cfg: dict, aabb_scale: float = 1.0, n_extra_dims: int = 0, hdr: bool = False
    ) -> "NerfNetworkConfig":
        enc = cfg.get("encoding", {})
        ot = enc.get("otype", "HashGrid").lower()
        pos_opts = ()
        if ot in _GRID_OTYPES:
            pos_otype = "grid"
            grid = HashGridConfig.from_network_config(enc, n_dims=3, aabb_scale=aabb_scale)
            n_enc = grid.n_output_dims
        elif ot == "composite":
            # composite-of-2D-grids = triplane (configs/nerf/tensor.json);
            # other composites are not used by any reference NeRF config
            nested = enc.get("nested", [])
            if not nested or not all(
                e.get("otype", "").lower() in _GRID_OTYPES for e in nested
            ):
                raise ValueError("NeRF composite pos encoding supports only nested grids")
            pos_otype = "triplane"
            grid = tuple(
                HashGridConfig.from_network_config(e, n_dims=2, aabb_scale=aabb_scale)
                for e in nested[:3]
            )
            n_enc = sum(g.n_output_dims for g in grid)
        else:
            pos_otype = ot
            grid = None
            opts = {k: v for k, v in enc.items() if k != "otype"}
            n_enc = encoding_output_dim(ot, 3, opts)
            pos_opts = tuple(sorted(opts.items()))
        dir_enc = cfg.get("dir_encoding", {})
        sh_degree = 4
        for entry in dir_enc.get("nested", []):
            if entry.get("otype", "").lower() == "sphericalharmonics":
                sh_degree = int(entry.get("degree", 4))
        density_mlp = MLPConfig.from_network_config(
            cfg.get("network", {}), n_enc, N_GEO_FEATURES
        )
        rgb_in = sh_degree**2 + n_extra_dims + N_GEO_FEATURES
        rgb_mlp = MLPConfig.from_network_config(cfg.get("rgb_network", {}), rgb_in, 3)
        return NerfNetworkConfig(
            grid=grid,
            density_mlp=density_mlp,
            rgb_mlp=rgb_mlp,
            sh_degree=sh_degree,
            n_extra_dims=n_extra_dims,
            rgb_activation=NerfActivation.EXPONENTIAL if hdr else NerfActivation.LOGISTIC,
            pos_otype=pos_otype,
            pos_opts=pos_opts,
        )


def init_nerf_network(key, config: NerfNetworkConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "density_mlp": init_mlp_params(k2, config.density_mlp),
        "rgb_mlp": init_mlp_params(k3, config.rgb_mlp),
    }
    if config.pos_otype == "grid":
        params["grid"] = init_hashgrid_params(k1, config.grid)
    elif config.pos_otype == "triplane":
        params["grid"] = [
            init_hashgrid_params(k, g)
            for k, g in zip(jax.random.split(k1, len(config.grid)), config.grid)
        ]
    return params


def nerf_l2_mask(params: dict) -> dict:
    mask = {
        "density_mlp": [1.0 for _ in params["density_mlp"]],
        "rgb_mlp": [1.0 for _ in params["rgb_mlp"]],
    }
    if "grid" in params:
        mask["grid"] = (
            [0.0 for _ in params["grid"]]
            if isinstance(params["grid"], (list, tuple))
            else 0.0
        )
    for extra in ("cam", "focal", "exposure", "distortion", "envmap", "extra_dims"):
        if extra in params:
            mask[extra] = 0.0
    return mask


def density_raw(config: NerfNetworkConfig, params: dict, pos_unit: jnp.ndarray) -> jnp.ndarray:
    """Raw (pre-activation) density for positions warped to [0,1]^3.

    Reference NerfNetwork::density (nerf_network.h:270-354) — used by the
    occupancy-grid updater, which wants log-space density.
    """
    feats = _encode_pos(config, params, pos_unit)
    out = mlp_apply(config.density_mlp, params["density_mlp"], feats)
    return out[..., 0]


def _encode_pos(config: NerfNetworkConfig, params: dict, pos_unit: jnp.ndarray) -> jnp.ndarray:
    """Encode positions per pos_otype; the grid path prefers a packed render
    table when the params carry one (pack_table_bf16 / pack_table_fp8 —
    inference-only fast paths)."""
    if config.pos_otype == "grid":
        if "grid_fp8" in params:
            from sienerf_tpu.ops.hashgrid import hashgrid_encode_fp8

            return hashgrid_encode_fp8(
                config.grid, params["grid_fp8"], params["grid_fp8_scale"], pos_unit
            )
        if "grid_bf16" in params:
            return hashgrid_encode_bf16(config.grid, params["grid_bf16"], pos_unit)
        if config.grid_train_pack == "bf16":
            from sienerf_tpu.ops.hashgrid import hashgrid_encode_bf16train

            return hashgrid_encode_bf16train(config.grid, params["grid"], pos_unit)
        return hashgrid_encode(config.grid, params["grid"], pos_unit)
    if config.pos_otype == "triplane":
        return jnp.concatenate(
            [
                hashgrid_encode(g, t, pos_unit[..., list(dims)])
                for g, t, dims in zip(config.grid, params["grid"], _TRIPLANE_DIMS)
            ],
            axis=-1,
        )
    opts = dict(config.pos_opts)
    if config.pos_otype == "frequency":
        return frequency_encode(pos_unit, int(opts.get("n_frequencies", 12)))
    if config.pos_otype == "oneblob":
        return oneblob_encode(pos_unit, int(opts.get("n_bins", 16)))
    if config.pos_otype == "trianglewave":
        return trianglewave_encode(pos_unit, int(opts.get("n_frequencies", 12)))
    if config.pos_otype == "identity":
        return pos_unit
    raise ValueError(f"unsupported NeRF pos encoding {config.pos_otype}")


def nerf_apply(
    config: NerfNetworkConfig,
    params: dict,
    pos_unit: jnp.ndarray,
    dir_unit_cube: jnp.ndarray,
    extra: jnp.ndarray | None = None,
):
    """Full forward: (N,3) warped pos + (N,3) dirs warped to [0,1]^3.

    Returns (rgb_raw (N,3), density_raw (N,)) — pre-activation, matching the
    reference convention of applying network_to_rgb/density in the
    compositing kernels.
    """
    feats = _encode_pos(config, params, pos_unit)
    geo = mlp_apply(config.density_mlp, params["density_mlp"], feats)
    sh = sh_encode(dir_unit_cube, config.sh_degree)
    parts = [sh]
    if config.n_extra_dims:
        if extra is None:
            extra = jnp.zeros(pos_unit.shape[:-1] + (config.n_extra_dims,), jnp.float32)
        parts.append(extra)
    parts.append(geo)
    rgb_in = jnp.concatenate(parts, axis=-1)
    rgb = mlp_apply(config.rgb_mlp, params["rgb_mlp"], rgb_in)
    return rgb, geo[..., 0]


def apply_rgb_activation(raw: jnp.ndarray, act: NerfActivation) -> jnp.ndarray:
    if act == NerfActivation.LOGISTIC:
        return jax.nn.sigmoid(raw)
    if act == NerfActivation.EXPONENTIAL:
        return jnp.exp(jnp.clip(raw, -10.0, 10.0))
    if act == NerfActivation.RELU:
        return jax.nn.relu(raw)
    return raw


def apply_density_activation(raw: jnp.ndarray, act: NerfActivation) -> jnp.ndarray:
    if act == NerfActivation.EXPONENTIAL:
        # clamp for fp safety; reference uses expf(val) with fp16 inputs
        return jnp.exp(jnp.clip(raw, -15.0, 15.0))
    if act == NerfActivation.RELU:
        return jax.nn.relu(raw)
    if act == NerfActivation.LOGISTIC:
        return jax.nn.sigmoid(raw)
    return raw
