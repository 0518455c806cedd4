"""Plain functional MLPs (the tcnn FullyFusedMLP / CutlassMLP equivalent).

On TPU there is nothing to hand-fuse: a 64-wide bf16 MLP over a large batch
is a chain of MXU matmuls that XLA fuses with the surrounding elementwise
work.  The "fully fused" GPU trick (keeping activations in SRAM) is the
default behavior of the XLA pipeline, so these are deliberately simple.

Conventions matched to tcnn so reference configs translate directly
(reference network factory src/testbed.cu:3983-4183):
- `n_neurons` hidden width, `n_hidden_layers` hidden layers,
- activation ReLU (or as configured), output activation applied by callers,
- no biases (tcnn FullyFusedMLP is bias-free),
- params kept fp32 (master), compute in bf16 on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MLPConfig:
    n_input_dims: int
    n_output_dims: int
    n_neurons: int = 64
    n_hidden_layers: int = 2  # number of hidden (n_neurons-wide) layers
    activation: str = "ReLU"
    output_activation: str = "None"

    @staticmethod
    def from_network_config(cfg: dict, n_input_dims: int, n_output_dims: int) -> "MLPConfig":
        return MLPConfig(
            n_input_dims=n_input_dims,
            n_output_dims=n_output_dims,
            n_neurons=int(cfg.get("n_neurons", 64)),
            n_hidden_layers=int(cfg.get("n_hidden_layers", 2)),
            activation=cfg.get("activation", "ReLU"),
            output_activation=cfg.get("output_activation", "None"),
        )


def _activation_fn(name: str):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "none":
        return lambda x: x
    if name in ("sigmoid", "logistic"):
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "exponential":
        return jnp.exp
    if name == "squareplus":
        return lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0))
    if name == "softplus":
        return jax.nn.softplus
    if name in ("leakyrelu", "leaky_relu"):
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "sine":
        return jnp.sin
    raise ValueError(f"unknown activation {name}")


def mlp_layer_dims(config: MLPConfig) -> list[tuple[int, int]]:
    dims = []
    d_in = config.n_input_dims
    for _ in range(config.n_hidden_layers):
        dims.append((d_in, config.n_neurons))
        d_in = config.n_neurons
    dims.append((d_in, config.n_output_dims))
    return dims


def init_mlp_params(key, config: MLPConfig, dtype=jnp.float32) -> list[jnp.ndarray]:
    """He-uniform init (tcnn uses a similar fan-in scaled uniform)."""
    params = []
    for d_in, d_out in mlp_layer_dims(config):
        key, sub = jax.random.split(key)
        bound = float(np.sqrt(6.0 / d_in))
        params.append(jax.random.uniform(sub, (d_in, d_out), dtype, -bound, bound))
    return params


def mlp_apply(
    config: MLPConfig,
    params: list[jnp.ndarray],
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Forward pass. x: (N, n_input_dims). Returns (N, n_output_dims) fp32."""
    act = _activation_fn(config.activation)
    out_act = _activation_fn(config.output_activation)
    h = x.astype(compute_dtype)
    n = len(params)
    for i, w in enumerate(params):
        # bf16-ok: deliberate bf16 MXU matmul with f32 accumulation — the
        # network's training precision (reference trains in __half)
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        if i < n - 1:
            h = act(h).astype(compute_dtype)
    return out_act(h).astype(jnp.float32)
