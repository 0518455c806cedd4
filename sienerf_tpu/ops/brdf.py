"""Disney-style BRDF shading with the fork's ambient/irradiance term.

Behavioral spec: reference testbed_geometry_training.cu:75-144
(`evaluate_shading_geometry`) and the Shade branch of
`shade_kernel_mesh_geometry` (:280-356): sun color scaled by the shadow
factor, sky ambient from the up-facing hemisphere, checkerboard floor, and
the fork's signature ambient term `amb = ambient * mix(0.2, FV, metallic)
* base_color` which the irradiance pipeline replaces with NeRF-gathered
environment light (SURVEY.md §2.6).

All functions are jnp-vectorized over [..., 3] stacks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class BRDFParams:
    """Reference common.h BRDFParams defaults (GUI-editable)."""

    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    sheen: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 1.0
    basecolor: tuple = (0.8, 0.8, 0.8)
    ambientcolor: tuple = (0.0, 0.0, 0.0)


def _schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return m**5


def _g1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    val = (a2 - 1.0) / (math.pi * jnp.log(jnp.maximum(a2, 1e-8)) * t)
    return jnp.where(a >= 1.0, 1.0 / math.pi, val)


def _g2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (math.pi * t * t)


def _smith_g_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def evaluate_shading(
    base_color,  # [...,3]
    ambient_color,  # [...,3]  (irradiance term: constant, envmap, or probe grid)
    light_color,  # [...,3]  (sun color x shadow factor)
    L,  # [...,3] unit light dir
    V,  # [...,3] unit view dir (toward camera)
    N,  # [...,3] unit normal
    metallic=0.0,
    subsurface=0.0,
    specular=1.0,
    roughness=0.5,
    specular_tint=0.0,
    sheen=0.0,
    sheen_tint=0.0,
    clearcoat=0.0,
    clearcoat_gloss=1.0,
):
    ndotl = jnp.sum(N * L, axis=-1)
    ndotv = jnp.sum(N * V, axis=-1)
    H = L + V
    H = H / jnp.maximum(jnp.linalg.norm(H, axis=-1, keepdims=True), 1e-12)
    ndoth = jnp.sum(N * H, axis=-1)
    ldoth = jnp.sum(L * H, axis=-1)

    fl = _schlick_fresnel(ndotl)
    fv = _schlick_fresnel(ndotv)
    metallic = jnp.asarray(metallic, jnp.float32)
    # the fork's irradiance hook: amb = ambient * mix(0.2, FV, metallic) * base
    amb = ambient_color * (0.2 + metallic * (fv - 0.2))[..., None] * base_color

    lum = jnp.sum(base_color * jnp.asarray([0.3, 0.6, 0.1]), axis=-1, keepdims=True)
    ctint = base_color / (lum + 1e-5)
    one = jnp.ones_like(base_color)
    cspec0 = (one + (ctint - one) * specular_tint) * (jnp.asarray(specular) * 0.08)
    cspec0 = cspec0 + (base_color - cspec0) * metallic
    csheen = one + (ctint - one) * sheen_tint

    fd90 = 0.5 + 2.0 * ldoth * ldoth * roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)

    fss90 = ldoth * ldoth * roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    denom = jnp.maximum(ndotl + ndotv, 1e-6)
    ss = 1.25 * (fss * (1.0 / denom - 0.5) + 0.5)

    a = jnp.maximum(0.001, jnp.square(jnp.asarray(roughness)))
    ds = _g2(ndoth, a)
    fh = _schlick_fresnel(ldoth)
    fs = cspec0 + (one - cspec0) * fh[..., None]
    gs = _smith_g_ggx(jnp.maximum(ndotl, 1e-6), a) * _smith_g_ggx(jnp.maximum(ndotv, 1e-6), a)

    fsheen = fh[..., None] * sheen * csheen

    dr = _g1(ndoth, 0.1 + (0.001 - 0.1) * clearcoat_gloss)
    fr = 0.04 + 0.96 * fh
    gr = _smith_g_ggx(jnp.maximum(ndotl, 1e-6), 0.25) * _smith_g_ggx(jnp.maximum(ndotv, 1e-6), 0.25)
    ccs = 0.25 * clearcoat * gr * fr * dr

    diffuse_mix = fd + (ss - fd) * subsurface
    brdf = ((1.0 / math.pi) * diffuse_mix[..., None] * base_color + fsheen) * (1.0 - metallic) + (
        gs * ds
    )[..., None] * fs + ccs[..., None]
    lit = brdf * light_color * jnp.maximum(ndotl, 0.0)[..., None] + amb
    # grazing/backfacing: ambient only (reference early-out NdotL<0 || NdotV<0)
    backfacing = (ndotl < 0.0) | (ndotv < 0.0)
    return jnp.where(backfacing[..., None], amb, lit)


SUN_COLOR = jnp.asarray([255.0 / 255.0, 225.0 / 255.0, 195.0 / 255.0]) * 4.0
SKY_COLOR = jnp.asarray([195.0 / 255.0, 215.0 / 255.0, 255.0 / 255.0]) * 4.0


def sky_ambient(normal, up_dir):
    """skyam = -dot(N, up)*0.5 + 0.5 (shade_kernel_mesh_geometry)."""
    skyam = -jnp.sum(normal * up_dir, axis=-1) * 0.5 + 0.5
    return SKY_COLOR * skyam[..., None]


def checkerboard_floor_color(pos, aabb_min, aabb_diag_x):
    check_size = 8.0 / aabb_diag_x
    cx = jnp.floor(check_size * (pos[..., 0] - aabb_min[0])).astype(jnp.int32)
    cz = jnp.floor(check_size * (pos[..., 2] - aabb_min[2])).astype(jnp.int32)
    check = jnp.where((cx ^ cz) & 1 == 1, 0.8, 0.2)
    return jnp.stack([check**3, check**2, check], axis=-1)


def soft_shadow_update(min_visibility, prev_distance, total_distance, distance, k: float = 8.0):
    """iq soft-shadow accumulator (advance_pos kernels, reference :190-199)."""
    y = distance * distance / (2.0 * jnp.maximum(prev_distance, 1e-20))
    d = jnp.sqrt(jnp.maximum(distance * distance - y * y, 0.0))
    vis = k * d / jnp.maximum(total_distance - y, 1e-20)
    return jnp.minimum(min_visibility, vis), distance, total_distance + distance
