"""Per-element loss functions (tcnn `Loss<T>` equivalents).

Selected by the `loss.otype` field of network configs (e.g. Huber for NeRF,
L2 for image, MAPE for SDF/geometry — configs/*/base.json).  All return
per-element losses; callers reduce.  JAX autodiff supplies gradients, so
unlike tcnn no hand-written dL/doutput is needed.  Relative losses
stop-gradient their denominators, matching tcnn's treatment of the
normalizer as a constant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2(pred, target):
    d = pred - target
    return d * d


def l1(pred, target):
    return jnp.abs(pred - target)


def huber(pred, target, delta: float = 0.1):
    """tcnn Huber; NGP NeRF uses delta 0.1 relative to color scale."""
    d = jnp.abs(pred - target)
    quad = 0.5 * d * d / delta
    lin = d - 0.5 * delta
    return jnp.where(d <= delta, quad, lin)


def relative_l2(pred, target, eps: float = 1e-2):
    d = pred - target
    denom = jax.lax.stop_gradient(pred * pred) + eps
    return d * d / denom


def relative_l2_luminance(pred, target, eps: float = 1e-2):
    lum = 0.299 * pred[..., 0:1] + 0.587 * pred[..., 1:2] + 0.114 * pred[..., 2:3]
    denom = jax.lax.stop_gradient(lum * lum) + eps
    d = pred - target
    return d * d / denom


def mape(pred, target, eps: float = 1e-2):
    return jnp.abs(pred - target) / (jax.lax.stop_gradient(jnp.abs(target)) + eps)


def smape(pred, target, eps: float = 1e-2):
    denom = jax.lax.stop_gradient(jnp.abs(pred) + jnp.abs(target)) + eps
    return 2.0 * jnp.abs(pred - target) / denom


def log_l1(pred, target):
    return jnp.log(1.0 + jnp.abs(pred - target))


_LOSSES = {
    "l2": l2,
    "l1": l1,
    "huber": huber,
    "relativel2": relative_l2,
    "relativel2luminance": relative_l2_luminance,
    "mape": mape,
    "smape": smape,
    "logl1": log_l1,
}


def get_loss(otype: str):
    fn = _LOSSES.get(otype.lower())
    if fn is None:
        raise ValueError(f"unknown loss otype {otype}")
    return fn
