"""Input encodings besides the hash grid: SH, Frequency, OneBlob, Identity,
TriangleWave, and Composite dispatch.

Behavioral spec: tcnn `Encoding` otypes selected by the reference's network
configs (configs/nerf/base.json:37-49 uses Composite[SphericalHarmonics deg 4,
Identity]); factory behavior in reference src/testbed.cu:3983-4046.

Note tcnn's SH encoding expects directions warped into [0,1]^3 (the caller
stores `(d+1)/2`); we follow that so configs and stored data interoperate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp


def sh_encode(dirs_unit_cube: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Spherical harmonics basis, tcnn polynomial convention.

    dirs_unit_cube: (N, 3) directions warped to [0,1]^3 (i.e. (d+1)/2).
    Returns (N, degree^2) features.
    """
    d = dirs_unit_cube * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z2 * z2 + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            0.62583573544917614 * (x2 * (x2 - 3.0 * y2) - y2 * (3.0 * x2 - y2)),
        ]
    return jnp.stack(out, axis=-1)


def frequency_encode(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """NeRF-style sin/cos frequency encoding (tcnn Frequency).

    x: (N, D) -> (N, D * n_frequencies * 2), layout [dim-major, freq, (sin,cos)].
    """
    feats = []
    for f in range(n_frequencies):
        arg = x * (math.pi * (2.0**f))
        feats.append(jnp.sin(arg))
        feats.append(jnp.cos(arg))
    return jnp.concatenate(feats, axis=-1)


def oneblob_encode(x: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """OneBlob encoding (tcnn, after Mueller et al. NIS): a quartic kernel
    splatted over n_bins per input dim.  x in [0,1]. Output (N, D*n_bins).
    """
    N, D = x.shape
    centers = (jnp.arange(n_bins, dtype=jnp.float32) + 0.5) / n_bins  # (B,)
    diff = x[..., None] - centers  # (N, D, B)
    # wrap-around distance (tcnn treats the domain as a torus)
    diff = diff - jnp.round(diff)
    sigma = 1.0 / n_bins
    val = jnp.exp(-0.5 * (diff / sigma) ** 2) / (sigma * math.sqrt(2.0 * math.pi))
    return (val / n_bins).reshape(N, D * n_bins)


def trianglewave_encode(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    feats = []
    for f in range(n_frequencies):
        arg = x * (2.0**f)
        tri = 2.0 * jnp.abs(arg - jnp.floor(arg + 0.5))  # triangle wave in [0,1]
        feats.append(tri)
    return jnp.concatenate(feats, axis=-1)


@dataclass(frozen=True)
class CompositeSpec:
    """One nested entry of a tcnn Composite encoding."""

    otype: str
    n_dims_to_encode: int | None = None
    params: dict = field(default_factory=dict)


def composite_encode(x: jnp.ndarray, specs: list[CompositeSpec]) -> jnp.ndarray:
    """Apply encodings to consecutive slices of the input dims.

    Entries without n_dims_to_encode consume the remaining dims (tcnn rule).
    """
    outs = []
    offset = 0
    total = x.shape[-1]
    for i, spec in enumerate(specs):
        nd = spec.n_dims_to_encode
        if nd is None:
            nd = total - offset
        xi = x[..., offset : offset + nd]
        offset += nd
        ot = spec.otype.lower()
        if nd == 0:
            continue
        if ot == "sphericalharmonics":
            outs.append(sh_encode(xi, int(spec.params.get("degree", 4))))
        elif ot == "frequency":
            outs.append(frequency_encode(xi, int(spec.params.get("n_frequencies", 12))))
        elif ot == "oneblob":
            outs.append(oneblob_encode(xi, int(spec.params.get("n_bins", 16))))
        elif ot == "trianglewave":
            outs.append(trianglewave_encode(xi, int(spec.params.get("n_frequencies", 12))))
        elif ot == "identity":
            outs.append(xi)
        else:
            raise ValueError(f"unsupported composite encoding otype: {spec.otype}")
    return jnp.concatenate(outs, axis=-1) if outs else x[..., :0]


def composite_specs_from_config(cfg: dict) -> list[CompositeSpec]:
    specs = []
    for entry in cfg.get("nested", []):
        e = dict(entry)
        otype = e.pop("otype")
        nd = e.pop("n_dims_to_encode", None)
        specs.append(CompositeSpec(otype=otype, n_dims_to_encode=nd, params=e))
    return specs


def encoding_output_dim(otype: str, n_dims: int, params: dict) -> int:
    ot = otype.lower()
    if ot == "sphericalharmonics":
        return int(params.get("degree", 4)) ** 2
    if ot == "frequency":
        return n_dims * int(params.get("n_frequencies", 12)) * 2
    if ot == "oneblob":
        return n_dims * int(params.get("n_bins", 16))
    if ot == "trianglewave":
        return n_dims * int(params.get("n_frequencies", 12))
    if ot == "identity":
        return n_dims
    raise ValueError(f"unknown encoding otype {otype}")
