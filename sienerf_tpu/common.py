"""Shared enums and constants.

Behavioral spec: /root/reference include/neural-graphics-primitives/common.h
(enums, ray-march constants) and nerf_device.cuh:24-46 (grid constants).
Values are kept identical so datasets / configs / snapshots mean the same
thing; the implementation is unrelated.
"""

from __future__ import annotations

import enum
import math


class TestbedMode(enum.Enum):
    """Workload modes (reference common.h:140-147)."""

    NONE = "none"
    NERF = "nerf"
    SDF = "sdf"
    IMAGE = "image"
    VOLUME = "volume"
    GEOMETRY = "geometry"


class GroundTruthRenderMode(enum.Enum):
    RENDER = "render"
    IMAGES = "images"
    DEPTH = "depth"


class RenderMode(enum.Enum):
    """Render visualisation modes (reference common.h:58-72)."""

    AO = "ao"
    SHADE = "shade"
    NORMALS = "normals"
    POSITIONS = "positions"
    DEPTH = "depth"
    DISTANCE = "distance"
    STEPGRID = "stepgrid"
    DISTORTION = "distortion"
    COST = "cost"
    SLICE = "slice"
    SHADE_NERF = "shade_nerf"
    SHADE_ENVMAP = "shade_envmap"
    SHADE_GRID_ENVMAP = "shade_grid_envmap"


class NerfActivation(enum.Enum):
    """Output activations applied outside the network (nerf_device.cuh:203-263)."""

    NONE = "none"
    RELU = "relu"
    LOGISTIC = "logistic"
    EXPONENTIAL = "exponential"


class LensMode(enum.Enum):
    """Camera lens models (reference common.h / common_device.cuh:360-447)."""

    PERSPECTIVE = "perspective"
    OPENCV = "opencv"
    FTHETA = "ftheta"
    LATLONG = "latlong"
    OPENCV_FISHEYE = "opencv_fisheye"
    EQUIRECTANGULAR = "equirectangular"


class MeshSdfMode(enum.Enum):
    """Ground-truth signed-distance modes (reference common.h:104-109)."""

    WATERTIGHT = "watertight"
    RAYSTAB = "raystab"
    PATH_ESCAPE = "path_escape"


class TonemapCurve(enum.Enum):
    IDENTITY = "identity"
    ACES = "aces"
    HABLE = "hable"
    REINHARD = "reinhard"


class ColorSpace(enum.Enum):
    LINEAR = "linear"
    SRGB = "srgb"


# --- NeRF ray-march constants (reference nerf_device.cuh:24-46) ---------------

NERF_GRIDSIZE = 128
NERF_GRID_N_CELLS = NERF_GRIDSIZE**3
NERF_CASCADES = 8
NERF_STEPS = 1024  # finest number of steps per unit length
SQRT3 = math.sqrt(3.0)
STEPSIZE = SQRT3 / NERF_STEPS
MIN_CONE_STEPSIZE = STEPSIZE
# Maximum step size is the width of the coarsest occupancy-grid cell.
MAX_CONE_STEPSIZE = STEPSIZE * (1 << (NERF_CASCADES - 1)) * NERF_STEPS / NERF_GRIDSIZE
NERF_RENDERING_NEAR_DISTANCE = 0.05
NERF_MIN_OPTICAL_THICKNESS = 0.01
N_MAX_RANDOM_SAMPLES_PER_RAY = 16

# NeRF dataset scale convention (reference nerf_loader.h:29-33): scenes are
# mapped so cameras sit around the [0,1]^3 unit cube at average distance ~0.5.
NERF_SCALE = 0.33

# Loss scale used by the reference for fp16 training (testbed.h:462-466).
# Kept for snapshot parity; fp32-master-param training does not need it.
DEFAULT_LOSS_SCALE = 128.0
