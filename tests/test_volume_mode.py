"""Volume mode: synthetic fog training + delta-tracking render."""

import jax
import numpy as np
import pytest

from sienerf_tpu.engines.volume import VolumeEngine
from sienerf_tpu.io.nanovdb import synthetic_fog_volume
from sienerf_tpu.utils.camera import look_at_matrix


def small_config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15},
        "encoding": {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2, "log2_hashmap_size": 14, "base_resolution": 8, "per_level_scale": 1.8},
        "network": {"n_neurons": 32, "n_hidden_layers": 2},
    }


@pytest.fixture(scope="module")
def trained():
    vol = synthetic_fog_volume(48)
    eng = VolumeEngine.create(small_config(), vol, batch_size=4096)
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub)
        losses.append(float(loss))
    return eng, state, losses


def test_volume_training_converges(trained):
    eng, state, losses = trained
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


def test_volume_density_fit(trained):
    """Network sigma should approximate GT sigma."""
    eng, state, losses = trained
    import jax.numpy as jnp

    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])
    pos = jax.random.uniform(jax.random.PRNGKey(5), (2048, 3))
    gt = np.asarray(eng._gt_sigma(eng.gt_density, pos))
    _, pred = eng._field(params, pos)
    pred = np.asarray(pred)
    # inside-vs-outside classification accuracy
    acc = ((pred > 1.0) == (gt > 1.0)).mean()
    assert acc > 0.85, acc


def test_volume_render_gt_and_network(trained):
    eng, state, losses = trained
    from sienerf_tpu.ops.optim import inference_params

    cam = look_at_matrix([0.5, 0.5, -1.5], [0.5, 0.5, 0.5])
    params = inference_params(state["opt"], state["params"])
    img_gt, a_gt = eng.render_frame(params, 32, 32, cam, (40.0, 40.0), use_gt=True, spp=2)
    img_nn, a_nn = eng.render_frame(params, 32, 32, cam, (40.0, 40.0), use_gt=False, spp=2)
    assert np.isfinite(img_gt).all() and np.isfinite(img_nn).all()
    # the fog ball covers the frame center in both renders
    assert a_gt[14:18, 14:18].mean() > 0.5
    assert a_nn[14:18, 14:18].mean() > 0.3
    # corners see through
    assert a_gt[0, 0] < 0.2


def test_nanovdb_magic_rejects_garbage(tmp_path):
    from sienerf_tpu.io.nanovdb import read_nanovdb

    p = tmp_path / "bad.nvdb"
    p.write_bytes(b"not a vdb file at all" + b"\x00" * 100)
    with pytest.raises(IOError):
        read_nanovdb(p)
