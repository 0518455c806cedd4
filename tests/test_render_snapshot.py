"""Render-only snapshot export/load round-trip (tools/export_render_snapshot.py
+ the bench.py fresh-box branch): EMA-resolved fp16 params with no optimizer
moments must drive both the live and baked renderers."""

import pickle
import subprocess
import sys
from pathlib import Path

import jax
import pytest
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.mark.slow
def test_render_snapshot_roundtrip(tmp_path):
    from __graft_entry__ import _tiny_engine
    from sienerf_tpu.io.snapshot import load_snapshot

    eng = _tiny_engine()
    state = eng.init(0)
    cache = tmp_path / "tiny.pkl"
    with open(cache, "wb") as fh:
        pickle.dump(
            {"state": jax.tree.map(np.asarray, state), "phase": "fast",
             "mean_samples": 12.0},
            fh,
        )
    snap = tmp_path / "tiny.snap"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/export_render_snapshot.py"),
         str(cache), str(snap)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    # fp16 shrink: the exported file must be well under the raw fp32 state
    assert snap.stat().st_size < cache.stat().st_size * 0.6

    payload = load_snapshot(snap)
    assert payload["meta"]["kind"] == "render_only"
    assert payload["meta"]["phase"] == "fast"
    rs = payload["state"]
    # exactly the bench.py restore expression
    params = jax.tree.map(
        lambda x: jnp.asarray(
            x, jnp.float32 if np.asarray(x).dtype == np.float16 else None
        ),
        rs["params"],
    )
    assert all(
        np.asarray(leaf).dtype != np.float16 for leaf in jax.tree.leaves(params)
    )
    bf = jnp.asarray(rs["occ"]["bitfield"])

    n = 32
    origins = jnp.broadcast_to(jnp.asarray([0.5, 0.5, -0.5]), (n, 3))
    z = jnp.linspace(-0.3, 0.3, n)
    dirs = jnp.stack([z, jnp.zeros_like(z), jnp.ones_like(z)], axis=-1)
    rgb, op, _ = eng.render_rays(params, jnp.ones_like(bf), origins, dirs)
    assert np.isfinite(np.asarray(rgb)).all()

    # fp16 rounding must match the fp32 field closely in render space
    p32 = jax.tree.map(jnp.asarray, state["params"])
    from sienerf_tpu.ops.optim import inference_params

    p32 = inference_params(state["opt"], p32)
    rgb32, _, _ = eng.render_rays(p32, jnp.ones_like(bf), origins, dirs)
    assert float(jnp.max(jnp.abs(rgb - rgb32))) < 5e-2

    grid, meta = eng.bake_features(params, {"bitfield": bf}, resolution=16)
    from sienerf_tpu.engines.nerf_baked import render_rays_baked

    rgbb, _, _ = render_rays_baked(
        eng, params, grid, meta, bf, origins, dirs, P=16, evals=8
    )
    assert np.isfinite(np.asarray(rgbb)).all()
