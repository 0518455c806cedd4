"""Device-mesh helpers for ray-sharded data parallelism.

The reference's only multi-device mechanism is primary/aux GPU render
replication (testbed.h:1117-1268 `CudaDevice`, testbed.cu:5523-5573
`sync_device`).  The TPU-native design (SURVEY.md §2.9/§5.8): one `rays`
mesh axis; hash table + MLP params + occupancy bitfield are replicated
(they are ~tens of MB); ray batches are sharded with `shard_map`; training
gradients `psum` over ICI; rendered tiles gather back to host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_ray_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("rays",))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
