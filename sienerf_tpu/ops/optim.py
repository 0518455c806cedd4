"""Optimizer stack matching the tcnn nesting used by the reference configs:
Ema( ExponentialDecay( Adam ) )  — see configs/nerf/base.json:5-22.

Pure-functional: state is a pytree, `step` is jittable.  Params stay fp32
master copies; the EMA shadow is what inference uses (tcnn Ema optimizer
semantics: training continues on raw params, `inference_params` returns the
smoothed copy).

Reference consumes tcnn `Optimizer<T>` via `Trainer` (SURVEY.md §2.1
network factory); hyperparams are re-pushed every step
(testbed.cu:4436-4442), which here is just passing the spec each call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class OptimizerSpec:
    learning_rate: float = 1e-2
    beta1: float = 0.9
    beta2: float = 0.99
    epsilon: float = 1e-15
    l2_reg: float = 1e-6
    # ExponentialDecay wrapper (no-op if decay_interval <= 0)
    decay_start: int = 0
    decay_interval: int = 0
    decay_end: int = 2**31 - 1
    decay_base: float = 1.0
    # Ema wrapper (no-op if ema_decay <= 0)
    ema_decay: float = 0.0

    @staticmethod
    def from_network_config(cfg: dict) -> "OptimizerSpec":
        """Parse a (possibly nested) tcnn optimizer config dict."""
        ema_decay = 0.0
        decay = {}
        node = cfg
        while True:
            otype = node.get("otype", "Adam").lower()
            if otype == "ema":
                ema_decay = float(node.get("decay", 0.99))
                node = node["nested"]
            elif otype == "exponentialdecay":
                decay = dict(
                    decay_start=int(node.get("decay_start", 0)),
                    decay_interval=int(node.get("decay_interval", 0)),
                    decay_end=int(node.get("decay_end", 2**31 - 1)),
                    decay_base=float(node.get("decay_base", 1.0)),
                )
                node = node["nested"]
            else:
                break
        return OptimizerSpec(
            learning_rate=float(node.get("learning_rate", 1e-2)),
            beta1=float(node.get("beta1", 0.9)),
            beta2=float(node.get("beta2", 0.99)),
            epsilon=float(node.get("epsilon", 1e-15)),
            l2_reg=float(node.get("l2_reg", 0.0)),
            ema_decay=ema_decay,
            **decay,
        )


def optim_init(params: Any, spec: OptimizerSpec) -> dict:
    zeros = jax.tree.map(jnp.zeros_like, params)
    state = {
        "m": zeros,
        "v": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    if spec.ema_decay > 0.0:
        state["ema"] = jax.tree.map(jnp.array, params)
    return state


def lr_factor(spec: OptimizerSpec, step: jnp.ndarray) -> jnp.ndarray:
    """Stepped exponential decay: multiply by decay_base every decay_interval
    steps once past decay_start, frozen after decay_end (tcnn ExponentialDecay)."""
    if spec.decay_interval <= 0 or spec.decay_base == 1.0:
        return jnp.ones((), jnp.float32)
    eff = jnp.clip(step, spec.decay_start, spec.decay_end) - spec.decay_start
    n = jnp.floor_divide(eff, spec.decay_interval).astype(jnp.float32)
    return jnp.power(jnp.float32(spec.decay_base), n)


def optim_step(
    spec: OptimizerSpec,
    state: dict,
    params: Any,
    grads: Any,
    l2_mask: Any = None,
    lr_mask: Any = None,
) -> tuple[Any, dict]:
    """One Adam step (+lr schedule, +EMA shadow update).

    l2_mask: optional pytree of {0,1} floats selecting which leaves get
    l2_reg coupled into the gradient (tcnn applies it to MLP matrices, not
    encoding tables).  None -> no leaf gets it unless l2_reg==0 anyway.
    """
    step = state["step"] + 1
    lr = spec.learning_rate * lr_factor(spec, step)
    b1, b2 = spec.beta1, spec.beta2
    bias1 = 1.0 - jnp.power(jnp.float32(b1), step.astype(jnp.float32))
    bias2 = 1.0 - jnp.power(jnp.float32(b2), step.astype(jnp.float32))

    if l2_mask is None:
        l2_mask = jax.tree.map(lambda p: 0.0, params)
    if lr_mask is None:
        lr_mask = jax.tree.map(lambda p: 1.0, params)

    def upd(p, g, m, v, mask, lscale):
        g = g.astype(jnp.float32) + spec.l2_reg * mask * p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        m_hat = m / bias1
        v_hat = v / bias2
        new_p = p - lr * lscale * m_hat / (jnp.sqrt(v_hat) + spec.epsilon)
        return new_p.astype(p.dtype), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    flat_mask = treedef.flatten_up_to(l2_mask)
    flat_lr = treedef.flatten_up_to(lr_mask)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, mask, lscale in zip(flat_p, flat_g, flat_m, flat_v, flat_mask, flat_lr):
        np_, nm, nv = upd(p, g, m, v, mask, lscale)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    params = treedef.unflatten(new_p)
    new_state = {
        "m": treedef.unflatten(new_m),
        "v": treedef.unflatten(new_v),
        "step": step,
    }
    if "ema" in state:
        d = spec.ema_decay
        new_state["ema"] = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state["ema"], params)
    return params, new_state


def inference_params(state: dict, params: Any) -> Any:
    """Params to use for rendering/eval: the EMA shadow when present."""
    return state.get("ema", params)
