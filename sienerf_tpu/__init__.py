"""sienerf_tpu — TPU-native neural graphics primitives framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
fnysalehi/Surface-Irradiance-Estimation-from-Neural-Radiance-Fields
(an instant-ngp fork adding hybrid mesh+NeRF rendering and surface
irradiance estimation).  Nothing here is a translation of the CUDA
reference; the compute path is pure-functional JAX with Pallas kernels
for the gather/scatter-heavy hot ops, and scaling is expressed through
`jax.sharding.Mesh` + `shard_map` rather than multi-GPU replication.

Layer map (mirrors SURVEY.md §7):
  utils/     config system, logging, timers, camera math, bbox
  ops/       hash-grid encoding, SH/frequency encodings, MLPs,
             optimizers, losses, samplers, tonemap, image IO
  models/    network composites (NerfNetwork, single-branch networks)
  engines/   per-mode train/render pipelines (image, nerf, sdf,
             volume, geometry)
  geom/      triangle/mesh machinery: BVH build + traversal, mesh IO
  parallel/  device-mesh sharding of rays and gradients
"""

__version__ = "0.1.0"

from sienerf_tpu.common import TestbedMode  # noqa: F401
