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


class Testbed:
    """Reference-shaped wrapper: ngp.Testbed(mode) / load_training_data /
    frame / render / save_snapshot / load_snapshot / compute_and_save_marching_cubes_mesh."""

    def __init__(self, mode: TestbedMode | str = TestbedMode.NONE):
        self.session = Session()
        self.mode = TestbedMode(mode) if isinstance(mode, str) else mode
        self.shall_train = True
        self.batch_size = 1 << 18
        self.background_color = np.array([0.0, 0.0, 0.0, 1.0], np.float32)

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

    # -- rendering ---------------------------------------------------------------
    def render(self, width: int, height: int, spp: int = 1, linear: bool = True, **kw):
        return self.session.render(width, height, spp=spp, **kw)

    def screenshot(self, path: str, width: int = 1920, height: int = 1080, **kw):
        from sienerf_tpu.io.image_io import save_image

        rgba = self.session.render(width, height, **kw)
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

    # -- metrics --------------------------------------------------------------------
    def compute_image_mse(self, quantize: bool = False) -> float:
        if self.mode != TestbedMode.IMAGE:
            raise RuntimeError("compute_image_mse is image-mode only")
        return self.session.engine.compute_mse(
            self.session.state["params"], self.session.state["opt"], quantize_to_byte=quantize
        )
