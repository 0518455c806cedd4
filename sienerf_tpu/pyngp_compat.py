"""pyngp-shaped compatibility layer.

Mirrors the reference python module surface (src/python_api.cu:263-735) so
scripts written against `import pyngp as ngp` can switch with an import
change: `from sienerf_tpu import pyngp_compat as ngp`.
"""

from __future__ import annotations

import numpy as np

from sienerf_tpu.common import (  # noqa: F401  (re-exported enums)
    ColorSpace,
    LensMode,
    MeshSdfMode,
    NerfActivation,
    RenderMode,
    TestbedMode,
    TonemapCurve,
)
from sienerf_tpu.session import Session
from sienerf_tpu.session import mode_from_scene  # noqa: F401 (module-level parity)


def free_temporary_memory():
    """Parity no-op: the reference frees its CUDA workspace arena here
    (python_api.cu free_temporary_memory); XLA owns TPU memory and frees
    workspaces when the arrays die."""


class Testbed:
    """Reference-shaped wrapper: ngp.Testbed(mode) / load_training_data /
    frame / render / save_snapshot / load_snapshot / compute_and_save_marching_cubes_mesh."""

    def __init__(self, mode: TestbedMode | str = TestbedMode.NONE):
        self.session = Session()
        self.mode = TestbedMode(mode) if isinstance(mode, str) else mode
        self.shall_train = True
        self.batch_size = 1 << 18
        self.background_color = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        # current-camera state (reference m_camera / m_relative_focal_length):
        # render()/screenshot() use it when no explicit camera is passed
        self.camera_matrix = None
        self._view_idx = 0

    # -- data / network ------------------------------------------------------
    def load_training_data(self, path: str, **kw):
        self.session.load_file(path, **kw)
        self.mode = self.session.mode

    load_file = load_training_data

    def reload_network_from_file(self, path: str = ""):
        """Reset the network (and training state) from a config file, keeping
        the loaded scene (python_api.cu reload_network_from_file binding)."""
        self.session.reload_network_from_file(path or None)
        self.mode = self.session.mode

    def reload_network_from_json(self, config, config_base_path: str = ""):
        """Reset the network from an in-memory tcnn-style config (dict or
        JSON string) — python_api.cu reload_network_from_json binding."""
        import json as _json
        import tempfile

        cfg = _json.loads(config) if isinstance(config, str) else config
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", dir=config_base_path or None, delete=False
        ) as fh:
            _json.dump(cfg, fh)
            tmp = fh.name
        self.session.reload_network_from_file(tmp)
        self.mode = self.session.mode

    def n_params(self) -> int:
        import jax

        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(self.session.state["params"]))

    def n_encoding_params(self) -> int:
        import jax

        p = self.session.state["params"]
        enc = {k: v for k, v in p.items() if "grid" in k or "encoding" in k}
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(enc))

    # -- train loop ------------------------------------------------------------
    def frame(self) -> bool:
        """One reference-style frame: a training bundle when shall_train."""
        if self.shall_train and self.session.engine is not None:
            self.session.train(getattr(self.session.engine, "grid_interval", 16), log_every=1 << 30)
        return True

    @property
    def loss(self) -> float:
        return self.session.loss

    @property
    def training_step(self) -> int:
        return self.session.training_step

    @property
    def rendering_extra_dims_from_training_view(self) -> int:
        """Which training view's latent-appearance code renders use
        (pyngp binding python_api.cu; get_rendering_extra_dims
        testbed_nerf.cu:3706-3716)."""
        return int(getattr(self.session, "rendering_extra_dims_from_training_view", 0))

    @rendering_extra_dims_from_training_view.setter
    def rendering_extra_dims_from_training_view(self, i: int):
        self.session.rendering_extra_dims_from_training_view = int(i)

    # -- camera state (reference m_camera; view navigation bindings) ---------
    def _nerf_engine(self):
        eng = self.session.engine
        if eng is None or self.mode != TestbedMode.NERF:
            raise RuntimeError("NeRF-mode camera ops need a loaded NeRF scene")
        return eng

    def set_camera_to_training_view(self, i: int):
        eng = self._nerf_engine()
        i = int(i) % len(eng.xforms)
        self._view_idx = i
        self.camera_matrix = np.asarray(eng.xforms[i], np.float32)
        return i

    def first_training_view(self):
        return self.set_camera_to_training_view(0)

    def last_training_view(self):
        return self.set_camera_to_training_view(len(self._nerf_engine().xforms) - 1)

    def next_training_view(self):
        return self.set_camera_to_training_view(self._view_idx + 1)

    def previous_training_view(self):
        return self.set_camera_to_training_view(self._view_idx - 1)

    def find_closest_training_view(self) -> int:
        """Index of the training view whose origin is nearest the current
        camera (reference binding of the same name)."""
        eng = self._nerf_engine()
        if self.camera_matrix is None:
            return 0
        pos = np.asarray(self.camera_matrix, np.float32)[:, 3]
        d = np.linalg.norm(np.asarray(eng.xforms)[:, :, 3] - pos[None], axis=1)
        return int(np.argmin(d))

    def set_nerf_camera_matrix(self, m):
        """Set the current camera from a NeRF-convention 3x4 matrix
        (python_api.cu set_nerf_camera_matrix: converts through the dataset's
        scale/offset + axis cycling, nerf_loader.h:101-120)."""
        from sienerf_tpu.io.nerf_dataset import nerf_matrix_to_ngp

        ds = getattr(self.session, "dataset", None)
        scale = getattr(ds, "scale", None)
        offset = getattr(ds, "offset", None)
        if scale is None:
            from sienerf_tpu.common import NERF_SCALE

            scale, offset = NERF_SCALE, np.full(3, 0.5, np.float32)
        self.camera_matrix = nerf_matrix_to_ngp(np.asarray(m, np.float32), scale, offset)

    def get_camera_extrinsics(self, i: int, convert_to_nerf: bool = True):
        """Training-view i's camera matrix, in NeRF convention by default
        (reference get_camera_extrinsics)."""
        from sienerf_tpu.io.nerf_dataset import ngp_matrix_to_nerf

        eng = self._nerf_engine()
        m = np.asarray(eng.xforms[int(i)], np.float32)
        if not convert_to_nerf:
            return m
        ds = getattr(self.session, "dataset", None)
        from sienerf_tpu.common import NERF_SCALE

        scale = getattr(ds, "scale", NERF_SCALE)
        offset = getattr(ds, "offset", np.full(3, 0.5, np.float32))
        return ngp_matrix_to_nerf(m, scale, offset)

    def set_camera_extrinsics(self, i: int, m, convert_from_nerf: bool = True):
        """Overwrite training-view i's camera (reference set_camera_extrinsics);
        updates both the host copy and the device-resident training buffer."""
        import jax.numpy as jnp

        from sienerf_tpu.io.nerf_dataset import nerf_matrix_to_ngp

        eng = self._nerf_engine()
        m = np.asarray(m, np.float32)
        if convert_from_nerf:
            ds = getattr(self.session, "dataset", None)
            from sienerf_tpu.common import NERF_SCALE

            scale = getattr(ds, "scale", NERF_SCALE)
            offset = getattr(ds, "offset", np.full(3, 0.5, np.float32))
            m = nerf_matrix_to_ngp(m, scale, offset)
        xf = np.asarray(eng.xforms)
        xf[int(i)] = m
        eng.xforms = xf
        eng.data["xforms"] = jnp.asarray(xf)

    # -- rendering ---------------------------------------------------------------
    def render(self, width: int, height: int, spp: int = 1, linear: bool = True, **kw):
        if self.camera_matrix is not None and "camera_matrix" not in kw \
                and self.mode == TestbedMode.NERF:
            eng = self.session.engine
            kw["camera_matrix"] = self.camera_matrix
            kw.setdefault(
                "focal",
                tuple(np.asarray(eng.focals[self._view_idx]) * width / eng.resolution[0]),
            )
        return self.session.render(width, height, spp=spp, **kw)

    def screenshot(self, path: str, width: int = 1920, height: int = 1080, **kw):
        from sienerf_tpu.io.image_io import save_image

        rgba = self.render(width, height, **kw)
        save_image(path, np.asarray(rgba), input_is_linear=False)

    # -- snapshots -----------------------------------------------------------------
    def save_snapshot(self, path: str, *_args):
        self.session.save_snapshot(path)

    def load_snapshot(self, path: str):
        self.session.load_snapshot(path)

    # -- mesh ---------------------------------------------------------------------
    def compute_and_save_marching_cubes_mesh(self, path: str, resolution=(256, 256, 256), thresh: float = 2.5, **kw):
        res = resolution[0] if hasattr(resolution, "__len__") else int(resolution)
        self.session.save_mesh(path, resolution=res, thresh=thresh)

    def compute_marching_cubes_mesh(self, resolution=(256, 256, 256), thresh: float = 2.5):
        """In-memory mesh extraction -> dict(V, F[, C]) (reference
        compute_marching_cubes_mesh binding returns the same arrays it would
        save)."""
        import jax.numpy as jnp  # noqa: F401 (engine fns trace lazily)

        from sienerf_tpu.ops.meshing import extract_mesh
        from sienerf_tpu.ops.optim import inference_params

        res = resolution[0] if hasattr(resolution, "__len__") else int(resolution)
        sess = self.session
        params = inference_params(sess.state["opt"], sess.state["params"])
        if self.mode == TestbedMode.NERF:
            dfn = sess.engine._density_fn(params)
            iso, amin, adiag = thresh, sess.engine.aabb.min, sess.engine.aabb.diag
        elif self.mode == TestbedMode.SDF:
            from sienerf_tpu.models.single_network import apply_single_network

            dfn = lambda unit: apply_single_network(sess.engine.net, params, unit)[:, 0]
            iso, amin, adiag = 0.0, np.zeros(3, np.float32), np.ones(3, np.float32)
        else:
            raise RuntimeError(f"mesh extraction unsupported for mode {self.mode}")
        verts, faces, colors = extract_mesh(dfn, res, amin, adiag, iso=iso)
        out = {"V": verts, "F": faces}
        if colors is not None:
            out["C"] = colors
        # keep the in-memory mesh for optimise_mesh_step (reference m_mesh)
        sess.mesh = {"verts": verts, "faces": faces, "thresh": iso,
                     "amin": amin, "adiag": adiag}
        return out

    def optimise_mesh_step(self, n_steps: int = 1):
        """Refine the in-memory NeRF mesh toward the density iso-surface
        (Testbed::optimise_mesh_step, testbed_nerf.cu:3448-3500; the GUI's
        "Optimize mesh" checkbox runs one step per frame, testbed.cu:2979).
        Call compute_marching_cubes_mesh first."""
        return self.session.optimise_mesh_step(n_steps)

    # -- metrics --------------------------------------------------------------------
    def compute_image_mse(self, quantize: bool = False) -> float:
        if self.mode != TestbedMode.IMAGE:
            raise RuntimeError("compute_image_mse is image-mode only")
        return self.session.engine.compute_mse(
            self.session.state["params"], self.session.state["opt"], quantize_to_byte=quantize
        )

    def calculate_iou(self, n_samples: int = 128**3, scale_existing_results_factor: float = 0.0,
                      blocking: bool = True, force_use_octree: bool = True) -> float:
        """SDF-mode IoU vs the BVH ground truth (reference calculate_iou,
        testbed_sdf.cu:1370+).  The resolution is derived from n_samples."""
        if self.mode != TestbedMode.SDF:
            raise RuntimeError("calculate_iou is SDF-mode only")
        res = max(16, int(round(float(n_samples) ** (1.0 / 3.0))))
        return float(self.session.engine.calculate_iou(self.session.state, resolution=res))
