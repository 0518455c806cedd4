"""Encoding/MLP/optimizer/loss layer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.ops.encodings import (
    CompositeSpec,
    composite_encode,
    frequency_encode,
    oneblob_encode,
    sh_encode,
)
from sienerf_tpu.ops.losses import get_loss
from sienerf_tpu.ops.mlp import MLPConfig, init_mlp_params, mlp_apply
from sienerf_tpu.ops.optim import OptimizerSpec, inference_params, lr_factor, optim_init, optim_step


def test_sh_dc_and_orthogonality():
    # random unit dirs warped to [0,1]^3
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (8192, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    y = sh_encode((d + 1.0) * 0.5, degree=4)
    assert y.shape == (8192, 16)
    # DC coefficient is constant 1/(2 sqrt(pi))
    assert np.allclose(y[:, 0], 0.2820948, atol=1e-5)
    # Monte-Carlo orthonormality: integral over sphere of Yi*Yj = delta_ij
    gram = (y.T @ y) / y.shape[0] * 4 * np.pi
    assert np.allclose(np.asarray(gram), np.eye(16), atol=0.15)


def test_frequency_encode_shape_values():
    x = jnp.array([[0.25, 0.5]])
    out = frequency_encode(x, 2)
    assert out.shape == (1, 8)
    # f=0: sin(pi*x), cos(pi*x)
    assert np.isclose(out[0, 0], np.sin(np.pi * 0.25), atol=1e-6)


def test_oneblob_peak_at_center():
    x = jnp.array([[0.5]])
    out = oneblob_encode(x, 8)
    assert out.shape == (1, 8)
    assert int(jnp.argmax(out[0])) in (3, 4)


def test_composite_matches_parts():
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 5))
    specs = [CompositeSpec("SphericalHarmonics", 3, {"degree": 4}), CompositeSpec("Identity", None)]
    out = composite_encode(x, specs)
    assert out.shape == (4, 16 + 2)
    assert np.allclose(out[:, 16:], x[:, 3:])


def test_mlp_shapes_and_grad():
    cfg = MLPConfig(n_input_dims=32, n_output_dims=16, n_neurons=64, n_hidden_layers=2)
    params = init_mlp_params(jax.random.PRNGKey(0), cfg)
    assert [p.shape for p in params] == [(32, 64), (64, 64), (64, 16)]
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 32))
    y = mlp_apply(cfg, params, x)
    assert y.shape == (128, 16) and y.dtype == jnp.float32
    g = jax.grad(lambda ps: jnp.sum(mlp_apply(cfg, ps, x) ** 2))(params)
    assert all(gi.shape == pi.shape for gi, pi in zip(g, params))


def test_optimizer_spec_parsing_matches_reference_nesting():
    cfg = {
        "otype": "Ema",
        "decay": 0.95,
        "nested": {
            "otype": "ExponentialDecay",
            "decay_start": 20000,
            "decay_interval": 10000,
            "decay_base": 0.33,
            "nested": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        },
    }
    spec = OptimizerSpec.from_network_config(cfg)
    assert spec.ema_decay == 0.95
    assert spec.decay_start == 20000 and spec.decay_base == 0.33
    assert spec.learning_rate == 1e-2 and spec.epsilon == 1e-15


def test_lr_factor_steps():
    spec = OptimizerSpec(decay_start=100, decay_interval=10, decay_base=0.5)
    assert float(lr_factor(spec, jnp.asarray(50))) == 1.0
    assert float(lr_factor(spec, jnp.asarray(105))) == 1.0
    assert np.isclose(float(lr_factor(spec, jnp.asarray(110))), 0.5)
    assert np.isclose(float(lr_factor(spec, jnp.asarray(130))), 0.125)


def test_adam_converges_quadratic():
    spec = OptimizerSpec(learning_rate=0.1, epsilon=1e-8, ema_decay=0.9)
    params = {"w": jnp.array([5.0, -3.0])}
    state = optim_init(params, spec)
    target = jnp.array([1.0, 2.0])
    for _ in range(300):
        g = {"w": 2 * (params["w"] - target)}
        params, state = optim_step(spec, state, params, g)
    assert np.allclose(params["w"], target, atol=1e-2)
    ema = inference_params(state, params)
    assert np.allclose(ema["w"], target, atol=5e-2)


def test_losses_basic():
    pred = jnp.array([1.0, 2.0])
    tgt = jnp.array([1.5, 2.0])
    assert np.isclose(float(get_loss("L2")(pred, tgt)[0]), 0.25)
    assert np.isclose(float(get_loss("L1")(pred, tgt)[0]), 0.5)
    h = get_loss("Huber")(pred, tgt)
    assert float(h[0]) > 0 and float(h[1]) == 0
    m = get_loss("MAPE")(pred, tgt)
    assert np.isclose(float(m[0]), 0.5 / 1.51, atol=1e-3)
