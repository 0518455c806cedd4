"""Image mode end-to-end: train a small hash-MLP on a downsampled target and
verify PSNR climbs well above the initial level (reference harness:
testbed_image.cu compute_image_mse + run.py PSNR protocol)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.engines.image import ImageEngine
from sienerf_tpu.io.image_io import load_image
from sienerf_tpu.utils.config import load_network_config


def small_config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {
            "otype": "ExponentialDecay",
            "decay_start": 2000,
            "decay_interval": 1000,
            "decay_base": 0.5,
            "nested": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        },
        "encoding": {"otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2, "log2_hashmap_size": 14, "base_resolution": 4, "per_level_scale": 1.7},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU", "output_activation": "None", "n_neurons": 32, "n_hidden_layers": 2},
    }


def make_target(n=64):
    """Smooth synthetic RGB target."""
    y, x = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(6 * x) * np.cos(4 * y),
            x * y,
            0.5 + 0.5 * np.cos(8 * (x - 0.5) * (y - 0.5)),
        ],
        axis=-1,
    ).astype(np.float32)
    return img


def test_image_fit_synthetic():
    img = make_target(64)
    eng = ImageEngine.create(small_config(), img, batch_size=2048)
    params, opt_state = eng.init()
    psnr0 = eng.psnr(params, opt_state)
    import jax

    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, sub = jax.random.split(key)
        params, opt_state, loss = eng.train_step(params, opt_state, sub)
    psnr1 = eng.psnr(params, opt_state)
    assert np.isfinite(float(loss))
    assert psnr1 > psnr0 + 8, (psnr0, psnr1)
    assert psnr1 > 20, psnr1


def test_image_render_shape():
    img = make_target(32)
    eng = ImageEngine.create(small_config(), img, batch_size=1024)
    params, opt_state = eng.init()
    out = eng.render(params, opt_state, 32, 32)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_albert_exr_fit(reference_data):
    """Short fit of the reference's own image-mode dataset."""
    path = reference_data / "image" / "albert.exr"
    if not path.exists():
        pytest.skip("albert.exr missing")
    img = load_image(path)[::8, ::8]  # 128x128 crop for speed
    cfg = load_network_config("/root/reference/configs/image/base.json")
    cfg["encoding"]["log2_hashmap_size"] = 16
    eng = ImageEngine.create(cfg, img, batch_size=8192)
    params, opt_state = eng.init()
    import jax

    key = jax.random.PRNGKey(0)
    for _ in range(300):
        key, sub = jax.random.split(key)
        params, opt_state, _ = eng.train_step(params, opt_state, sub)
    assert eng.psnr(params, opt_state) > 22
