"""Single-branch network: input encoding -> MLP.

This is the tcnn `NetworkWithInputEncoding` equivalent, used by the
image / SDF / volume modes and the envmap model (reference network factory
src/testbed.cu:4145-4209).  Pure-functional: `params` is a pytree
{"grid": (L,T,F) | None, "mlp": [W...]}.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sienerf_tpu.ops.encodings import (
    composite_encode,
    composite_specs_from_config,
    encoding_output_dim,
    frequency_encode,
    oneblob_encode,
    trianglewave_encode,
)
from sienerf_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid_params
from sienerf_tpu.ops.mlp import MLPConfig, init_mlp_params, mlp_apply
from sienerf_tpu.ops.takikawa import TakikawaConfig, init_takikawa_params, takikawa_encode


@dataclass(frozen=True)
class SingleNetworkConfig:
    n_input_dims: int
    n_output_dims: int
    encoding_otype: str
    grid: HashGridConfig | None
    encoding_params: dict
    composite_specs: tuple
    mlp: MLPConfig
    # Takikawa (octree) encoding needs mesh-derived lookup tables, so the
    # final depth / vertex count are filled in by the SDF engine after the
    # octree build (reference testbed.cu:4147-4162 rebuilds the octree and
    # re-reads its depth the same way).
    takikawa: TakikawaConfig | None = None
    takikawa_n_vertices: int = 0

    @staticmethod
    def from_network_config(
        cfg: dict,
        n_input_dims: int,
        n_output_dims: int,
        aabb_scale: float = 1.0,
    ) -> "SingleNetworkConfig":
        enc = cfg.get("encoding", {"otype": "Identity"})
        otype = enc.get("otype", "Identity")
        grid = None
        composite_specs = ()
        takikawa = None
        if otype.lower() == "takikawa":
            takikawa = TakikawaConfig.from_network_config(enc)
            enc_out = takikawa.n_output_dims
        elif otype.lower() in ("hashgrid", "densegrid", "grid", "tiledgrid"):
            grid = HashGridConfig.from_network_config(enc, n_dims=n_input_dims, aabb_scale=aabb_scale)
            enc_out = grid.n_output_dims
        elif otype.lower() == "composite":
            composite_specs = tuple(composite_specs_from_config(enc))
            enc_out = 0
            off = 0
            for s in composite_specs:
                nd = s.n_dims_to_encode if s.n_dims_to_encode is not None else n_input_dims - off
                off += nd
                enc_out += encoding_output_dim(s.otype, nd, s.params)
        else:
            enc_out = encoding_output_dim(otype, n_input_dims, enc)
        mlp = MLPConfig.from_network_config(cfg.get("network", {}), enc_out, n_output_dims)
        return SingleNetworkConfig(
            n_input_dims=n_input_dims,
            n_output_dims=n_output_dims,
            encoding_otype=otype,
            grid=grid,
            encoding_params=dict(enc),
            composite_specs=composite_specs,
            mlp=mlp,
            takikawa=takikawa,
        )


def init_single_network(key, config: SingleNetworkConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = {"mlp": init_mlp_params(k2, config.mlp)}
    if config.grid is not None:
        params["grid"] = init_hashgrid_params(k1, config.grid)
    if config.takikawa is not None:
        params["takikawa"] = init_takikawa_params(k1, config.takikawa_n_vertices)
    return params


def encode_input(config: SingleNetworkConfig, params: dict, x: jnp.ndarray, tables: dict | None = None) -> jnp.ndarray:
    ot = config.encoding_otype.lower()
    if config.takikawa is not None:
        if tables is None:
            raise ValueError("Takikawa encoding requires octree tables (pass tables=...)")
        return takikawa_encode(config.takikawa, tables, params["takikawa"], x)
    if config.grid is not None:
        if "grid_bf16" in params:
            # forward-only packed fast path (pack_render_params); no
            # position/table gradients flow through the bitcast gather
            from sienerf_tpu.ops.hashgrid import hashgrid_encode_bf16

            return hashgrid_encode_bf16(config.grid, params["grid_bf16"], x)
        return hashgrid_encode(config.grid, params["grid"], x)
    if ot == "composite":
        return composite_encode(x, list(config.composite_specs))
    if ot == "frequency":
        return frequency_encode(x, int(config.encoding_params.get("n_frequencies", 12)))
    if ot == "oneblob":
        return oneblob_encode(x, int(config.encoding_params.get("n_bins", 16)))
    if ot == "trianglewave":
        return trianglewave_encode(x, int(config.encoding_params.get("n_frequencies", 12)))
    if ot == "identity":
        return x
    raise ValueError(f"unsupported encoding {config.encoding_otype}")


def apply_single_network(
    config: SingleNetworkConfig, params: dict, x: jnp.ndarray, tables: dict | None = None
) -> jnp.ndarray:
    """x: (N, n_input_dims) -> (N, n_output_dims) fp32."""
    feats = encode_input(config, params, x, tables)
    return mlp_apply(config.mlp, params["mlp"], feats)


def pack_render_params(config: SingleNetworkConfig, params: dict) -> dict:
    """Swap the fp32 hash table for the bf16-packed render layout (see
    ops.hashgrid.pack_table_bf16).  Forward-only: use for sphere tracing /
    shading evals, NOT for paths needing position gradients (analytic
    normals) or training."""
    if config.grid is None or config.grid.layout != "cell" or "grid" not in params:
        return params
    from sienerf_tpu.ops.hashgrid import pack_table_bf16

    p = dict(params)
    p["grid_bf16"] = pack_table_bf16(config.grid, params["grid"])
    del p["grid"]
    return p


def l2_mask(config: SingleNetworkConfig, params: dict) -> dict:
    """tcnn applies l2_reg to MLP matrices only, not grid tables."""
    mask = {"mlp": [1.0 for _ in params["mlp"]]}
    if "grid" in params:
        mask["grid"] = 0.0
    if "takikawa" in params:
        mask["takikawa"] = 0.0
    return mask
