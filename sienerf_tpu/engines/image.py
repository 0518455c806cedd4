"""Image mode: 2D hash-MLP regression of an image.

Behavioral spec: reference src/testbed_image.cu —
  train_image (:212-276): batch of sampled 2D coords, bilinear texture
    fetch as target, L2 loss trainer step;
  render_image (:277-361): per-pixel coords -> inference;
  compute_image_mse (:442-518): full-image MSE/PSNR, optional quantization.

TPU design: one jitted `train_step(params, opt_state, key) -> ...` over a
fixed batch; the full-frame render is a single batched inference reshaped
to the frame — no per-pixel kernels needed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.models.single_network import (
    SingleNetworkConfig,
    apply_single_network,
    init_single_network,
    l2_mask,
)
from sienerf_tpu.ops.grids import bilinear_sample_2d, nearest_sample_2d
from sienerf_tpu.ops.losses import get_loss
from sienerf_tpu.ops.optim import OptimizerSpec, inference_params, optim_init, optim_step
from sienerf_tpu.ops.samplers import halton_2d, sobol_2d


@dataclass(eq=False)  # identity hash: instances are static args to jit
class ImageEngine:
    """Holds static config + jitted functions for image-mode training."""

    net: SingleNetworkConfig
    opt: OptimizerSpec
    loss_otype: str
    image: jnp.ndarray  # (H, W, 4) float32 training texture
    batch_size: int = 1 << 18
    sampler: str = "random"  # random | halton | sobol
    snap_to_pixel_centers: bool = False

    @staticmethod
    def create(network_config: dict, image: np.ndarray, batch_size: int = 1 << 18) -> "ImageEngine":
        h, w = image.shape[:2]
        net = SingleNetworkConfig.from_network_config(network_config, n_input_dims=2, n_output_dims=image.shape[-1])
        opt = OptimizerSpec.from_network_config(network_config.get("optimizer", {}))
        return ImageEngine(
            net=net,
            opt=opt,
            loss_otype=network_config.get("loss", {}).get("otype", "L2"),
            image=jnp.asarray(image, jnp.float32),
            batch_size=batch_size,
        )

    def init(self, seed: int = 1337):
        key = jax.random.PRNGKey(seed)

        # FLAT 2-D boundary layout: the (L, T, 4, 2) cell table tile-pads
        # its minor dims up to 16x every time it crosses a jit boundary
        # (68 GB/step at the reference 2^21+ table sizes — NOTES_ROUND4
        # wall; the NeRF path's boundary tables are flat for the same
        # reason).  hashgrid_encode accepts the flat view and reshapes
        # in-graph.  The flatten must happen INSIDE one jit: an EAGER
        # 4-D device table is already stored tile-padded at creation
        # (measured r5: 2 GB unpadded -> 16 GB at T=2^22, OOM at init).
        def _init(k):
            p = init_single_network(k, self.net)
            if "grid" in p:
                p["grid"] = p["grid"].reshape(p["grid"].shape[0], -1)
            return p

        params = jax.jit(_init)(key)
        opt_state = optim_init(params, self.opt)
        return params, opt_state

    def _sample_coords(self, key, step):
        b = self.batch_size
        if self.sampler == "halton":
            idx = step * b + jnp.arange(b, dtype=jnp.int32)
            return halton_2d(idx)
        if self.sampler == "sobol":
            idx = step * b + jnp.arange(b, dtype=jnp.int32)
            return sobol_2d(idx)
        return jax.random.uniform(key, (b, 2))

    def train_step(self, params, opt_state, key):
        return self._train_step_jit(params, opt_state, key, self.image)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _train_step_jit(self, params, opt_state, key, image):
        step = opt_state["step"]
        coords = self._sample_coords(key, step)
        if self.snap_to_pixel_centers:
            target = nearest_sample_2d(image, coords)
        else:
            target = bilinear_sample_2d(image, coords)
        loss_fn = get_loss(self.loss_otype)

        def loss_of(p):
            pred = apply_single_network(self.net, p, coords)
            return jnp.mean(loss_fn(pred, target))

        loss, grads = jax.value_and_grad(loss_of)(params)
        params, opt_state = optim_step(self.opt, opt_state, params, grads, l2_mask(self.net, params))
        return params, opt_state, loss

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def render(self, params, opt_state, width: int, height: int):
        """Full-frame inference at pixel centers -> (H, W, C)."""
        p = inference_params(opt_state, params)
        x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
        u, v = jnp.meshgrid(x, y, indexing="xy")
        coords = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
        out = apply_single_network(self.net, p, coords)
        return out.reshape(height, width, -1)

    def compute_mse(self, params, opt_state, quantize_to_byte: bool = False) -> float:
        """Full-image MSE vs the training texture (reference compute_image_mse)."""
        h, w = self.image.shape[:2]
        pred = self.render(params, opt_state, w, h)
        pred = pred[..., : self.image.shape[-1]]
        if quantize_to_byte:
            pred = jnp.round(jnp.clip(pred, 0, 1) * 255.0) / 255.0
        return float(jnp.mean((pred - self.image) ** 2))

    def psnr(self, params, opt_state) -> float:
        mse = self.compute_mse(params, opt_state)
        return -10.0 * math.log10(max(mse, 1e-12))
