"""NeRF mode: hash-grid NeRF training + occupancy-accelerated rendering.

Behavioral spec (SURVEY.md §2.2/§3.2/§3.3):
- train:  testbed_nerf.cu `train_nerf`/`train_nerf_step` (:2949-3430) —
  ray batch -> march vs bitfield -> fused fwd -> per-ray composite loss
  (random background color, sRGB targets) -> optimizer step; occupancy grid
  refresh every 16 steps (dense for the first 256 steps).
- render: `render_nerf` (:2328-2642) — per-pixel rays, compaction marching
  loop (8 steps between compactions), emission-absorption composite,
  early-out at min transmittance.

TPU design: everything is fixed-shape.  A "bundle" = `grid_interval` train
steps in one `lax.scan` plus one occupancy update — a single dispatch, which
matters because the TPU sits behind a high-latency tunnel.  Rendering tiles
the frame into fixed ray blocks; the marching loop is a `lax.while_loop`
whose termination is an on-device all-dead reduction (no host syncs, unlike
the reference's per-round counter readback, testbed_nerf.cu:2075-2077).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import NERF_RENDERING_NEAR_DISTANCE
from sienerf_tpu.io.nerf_dataset import NerfDataset
from sienerf_tpu.models.nerf_network import (
    NerfNetworkConfig,
    apply_density_activation,
    apply_rgb_activation,
    density_raw,
    init_nerf_network,
    nerf_apply,
    nerf_l2_mask,
)
from sienerf_tpu.ops.losses import get_loss
from sienerf_tpu.ops.occupancy import (
    OccupancyConfig,
    init_occupancy_state,
    mark_untrained_cells,
    n_cascades_for_aabb_scale,
    update_density_grid,
)
from sienerf_tpu.ops.optim import OptimizerSpec, inference_params, optim_init, optim_step
from sienerf_tpu.ops.raymarch import (
    MarchConfig,
    advance_to_occupied,
    compact_samples,
    composite_chunk,
    composite_flat,
    cone_angle_for_aabb,
    march_rays,
)
from sienerf_tpu.utils.bbox import BoundingBox
from sienerf_tpu.utils.camera import Lens, uv_to_ray


@dataclass(eq=False)  # identity hash: instances are static args to jit
class NerfEngine:
    net: NerfNetworkConfig
    opt: OptimizerSpec
    occ: OccupancyConfig
    march: MarchConfig
    aabb: BoundingBox
    loss_otype: str = "Huber"
    # training batch geometry: n_rays * samples_per_ray ~ reference batch 2^18
    train_n_rays: int = 4096
    train_k: int = 64
    train_march_iters: int = 192
    # Compacted training (default): march every ray to completion (up to
    # max_samples_per_ray = reference NERF_STEPS), compact the valid samples
    # into a dense M = train_n_rays*train_k buffer, and adapt the RAY COUNT
    # to the measured samples/ray (NerfCounters, nerf.h:29-41).  Rays that
    # would overflow the budget are dropped, never truncated — a truncated
    # ray trains a view-dependent fog "billboard" at its march horizon,
    # which keeps density high, which keeps the occupancy grid uncarved
    # (observed on fox: grid stuck at 62% occupancy, 20 PSNR novel views).
    compact_training: bool = True
    max_samples_per_ray: int = 1024  # NERF_STEPS (nerf_device.cuh:24-35)
    # Legacy two-phase path (compact_training=False): deep full-ray phase
    # until the grid carves, then fixed-k truncated marching.
    deep_k: int = 512
    deep_march_iters: int = 1280
    phase_switch_count: float = 0.75  # switch when mean samples < 0.75*deep_k
    near_distance: float = 0.1  # reference m_nerf.training.near_distance (nerf.h:119)
    grid_interval: int = 16  # occupancy update cadence (testbed.cu:4412-4434)
    dense_until: int = 256
    dense_every_updates: int = 16
    min_transmittance: float = 1e-4
    render_chunk: int = 16  # samples between "compactions" (reference uses 8;
    # larger chunks amortize per-round costs on TPU, lanes stay dense anyway)
    render_max_chunks: int = 96
    # Packed hash table for the (forward-only) render path: "bf16" halves
    # row bytes vs fp32 (measured 10.7s -> 7.2s on the 720p fox frame);
    # "fp8" (e4m3 + per-level scale) halves them again, which matters for
    # wide-row configs (8 levels x 4 features: 64B bf16 rows = 33.5MB/level,
    # past the ~16MB HBM gather knee) — PSNR cost measured in
    # tools/sweep_render.py.  "none" renders from the fp32 training table.
    render_table_pack: str = "bf16"
    # march-loop iteration budget per render round, as a multiple of
    # render_chunk (the loop is latency-bound: ~0.3ms/iteration on v5e
    # regardless of tile width, so fewer iterations = faster rounds at the
    # cost of occasional underfilled chunks)
    render_march_iters_mult: float = 3.0
    # interactive render early-out (reference render_min_transmittance,
    # nerf.h:172 default 0.01); the eval protocol overrides to 1e-4
    # (scripts/run.py:230) via the render calls' min_transmittance arg
    render_min_transmittance: float = 0.01
    # frame-level ray-init advance to the first occupied voxel (reference
    # advance_pos_nerf_kernel); 0 disables
    init_advance_iters: int = 160
    # NerfCounters-style measured-batch feedback: grow/shrink the ray count
    # so marched samples stay near n_rays*k (nerf.h:29-41); off by default
    # to keep dispatch shapes stable
    adapt_ray_count: bool = False
    # error-map importance sampling (testbed_nerf.cu:1778-1840, :3022-3075)
    use_error_map: bool = True
    error_map_res: int = 32
    error_map_warmup: int = 256
    # per-camera extrinsics optimisation (reference adam_optimizer.h + 
    # testbed_nerf.cu:3077-3180); se3 deltas trained by autodiff
    optimize_extrinsics: bool = False
    extrinsics_lr_scale: float = 1e-3
    # focal-length + per-image exposure optimization (reference
    # adam_optimizer.h focal/exposure paths, testbed_nerf.cu:3101-3180)
    optimize_focal: bool = False
    optimize_exposure: bool = False
    # trainable 32x32 2-channel distortion map (reference TrainableBuffer
    # wiring, testbed.cu:4034-4045; configs' distortion_map block)
    optimize_distortion: bool = False
    distortion_resolution: int = 32
    # near-region density regularizer (anti-floater, opt-in): L1 penalty on
    # optical thickness deposited in the first `near_reg_fraction` of each
    # ray's span.  Real captures (fox) at short budgets minimize the photo
    # loss with a view-dependent fog "billboard" near the cameras; pushing
    # near-density toward zero forces the explanation onto the consistent
    # far geometry (same goal as the reference's density-grid warmup decay;
    # see NOTES_ROUND1 open item 1)
    near_density_reg: float = 0.0
    near_reg_fraction: float = 0.25
    # depth supervision (reference m_nerf.training.depth_supervision_lambda,
    # nerf.h:124; loss term testbed_nerf.cu:1065-1067) — active when the
    # dataset ships depth images
    depth_supervision_lambda: float = 0.0
    # trainable lat-long envmap background (envmap.cuh; testbed.cu:4194-4209
    # builds it when the dataset ships an envmap; training composites the
    # random bg BEHIND it, testbed_nerf.cu:1007-1015); auto-enabled by
    # create() when the dataset carries one, or set train_envmap=True with
    # envmap_resolution for a black-initialized map
    train_envmap: bool = False
    envmap_resolution: tuple = (128, 256)  # (H, W)
    envmap_init: np.ndarray | None = None  # (H, W, 4) initial values
    # rolling shutter / motion blur: per-pixel camera slerp between start and
    # end xforms (common_device.cuh:656-659); vec4 (t0, du, dv, motionblur)
    rolling_shutter: np.ndarray | None = None
    # per-image extra-dim conditioning (nerf_loader.h:85-87): fixed light
    # directions (first 3 dims, not optimized) and/or learnable latent
    # appearance codes (reset_extra_dims testbed_nerf.cu:3680-3700; gradient
    # via autodiff instead of compute_extra_dims_gradient_train_nerf's
    # atomic splat, testbed_nerf.cu:1323-1359)
    light_dirs: np.ndarray | None = None  # (N, 3) NGP-axis unit vectors
    optimize_extra_dims: bool = False
    # host-side dataset copies (set by create()); device copies live in .data
    images: np.ndarray | None = None
    xforms: np.ndarray | None = None
    focals: np.ndarray | None = None
    principal_points: np.ndarray | None = None
    resolution: tuple = (0, 0)
    lens: Lens = field(default_factory=Lens)
    visible_mask: np.ndarray | None = None
    data: dict | None = None  # device buffers, threaded through jits as args

    # --- construction -----------------------------------------------------

    @staticmethod
    def create(
        network_config: dict,
        dataset: NerfDataset,
        train_batch_size: int = 1 << 18,
        grid_size: int = 128,
        train_k: int = 64,
        near_density_reg: float = 0.0,
        near_reg_fraction: float = 0.25,
    ) -> "NerfEngine":
        aabb_scale = dataset.aabb_scale
        light_dirs = getattr(dataset, "light_dirs", None)
        n_extra = dataset.n_extra_learnable_dims + (3 if light_dirs is not None else 0)
        net = NerfNetworkConfig.from_network_config(
            network_config,
            aabb_scale=aabb_scale,
            n_extra_dims=n_extra,
            hdr=dataset.is_hdr,
        )
        import os

        tp = os.environ.get("SIENERF_TRAIN_PACK", "none")
        if (
            tp == "bf16"
            and net.pos_otype == "grid"
            and net.grid.layout == "cell"
            and ((1 << net.grid.n_dims) * net.grid.n_features_per_level) % 2 == 0
        ):
            import dataclasses

            net = dataclasses.replace(net, grid_train_pack="bf16")
        opt = OptimizerSpec.from_network_config(network_config.get("optimizer", {}))
        n_casc = n_cascades_for_aabb_scale(aabb_scale)
        occ = OccupancyConfig(n_cascades=n_casc, grid_size=grid_size)
        march = MarchConfig(
            n_cascades=n_casc, cone_angle=cone_angle_for_aabb(aabb_scale), grid_size=grid_size
        )
        aabb = BoundingBox.from_scale(aabb_scale)
        n_rays = max(256, train_batch_size // train_k)
        w, h = dataset.resolution
        eng = NerfEngine(
            net=net,
            opt=opt,
            occ=occ,
            march=march,
            aabb=aabb,
            loss_otype=network_config.get("loss", {}).get("otype", "Huber"),
            train_n_rays=n_rays,
            train_k=train_k,
            images=np.asarray(dataset.images),
            xforms=np.asarray(dataset.xforms),
            focals=np.asarray(dataset.focal_lengths),
            principal_points=np.asarray(dataset.principal_points),
            resolution=dataset.resolution,
            lens=dataset.lens,
            near_density_reg=near_density_reg,
            near_reg_fraction=near_reg_fraction,
            light_dirs=None if light_dirs is None else np.asarray(light_dirs, np.float32),
            optimize_extra_dims=dataset.n_extra_learnable_dims > 0,
        )
        if dataset.xforms_end is not None:
            eng.rolling_shutter = np.asarray(dataset.rolling_shutter, np.float32)
        if dataset.envmap is not None:
            eng.train_envmap = True
            eng.envmap_init = np.asarray(dataset.envmap, np.float32)
            eng.envmap_resolution = dataset.envmap.shape[:2]
        eng.visible_mask = np.asarray(
            mark_untrained_cells(
                occ,
                dataset.xforms,
                dataset.focal_lengths,
                np.asarray([dataset.resolution] * dataset.n_images, np.float32),
            )
        )
        # Device-resident buffers passed as ARGUMENTS into every jit: big
        # arrays captured by closure become HLO constants, which pushes
        # XLA:TPU gathers onto a ~100x slower path (measured; see
        # ops/hashgrid.py docstring).
        eng.data = {
            "images": jnp.asarray(eng.images),
            "xforms": jnp.asarray(eng.xforms),
            "focals": jnp.asarray(eng.focals),
            "pp": jnp.asarray(eng.principal_points),
            "visible_mask": jnp.asarray(eng.visible_mask),
        }
        if dataset.xforms_end is not None:
            eng.data["xforms_end"] = jnp.asarray(np.asarray(dataset.xforms_end, np.float32))
        if dataset.depths is not None:
            eng.data["depths"] = jnp.asarray(np.asarray(dataset.depths, np.float32))
        return eng

    @staticmethod
    def from_ingp(path, dataset: NerfDataset | None = None, train_batch_size: int = 1 << 18):
        """Build an engine + state from a reference `.ingp`/`.msgpack`
        snapshot (testbed.cu:5285-5495 load path; geometry scenes load NeRF
        objects this way, testbed_geometry_training.cu:3170-3172).

        Without a dataset the engine renders with user-supplied cameras;
        training needs real data attached.  Returns (engine, state).
        """
        from sienerf_tpu.io.ingp import import_ingp
        from sienerf_tpu.ops.occupancy import density_to_bitfield

        out = import_ingp(path)
        aabb_scale = out["meta"]["aabb_scale"]
        if dataset is None:
            from sienerf_tpu.utils.camera import look_at_matrix

            c = 0.5
            r = 0.5 + aabb_scale
            dataset = NerfDataset(
                images=np.zeros((1, 8, 8, 4), np.float32),
                xforms=look_at_matrix([c, c, c - r], [c, c, c])[None].astype(np.float32),
                focal_lengths=np.full((1, 2), 8.0, np.float32),
                principal_points=np.full((1, 2), 0.5, np.float32),
                resolution=(8, 8),
                aabb_scale=aabb_scale,
                n_extra_learnable_dims=int(
                    out["meta"].get("n_extra_learnable_dims", 0)
                ),
            )
        eng = NerfEngine.create(out["config"], dataset, train_batch_size=train_batch_size)
        state = eng.init(0)
        params = dict(state["params"])
        for k, v in out["params"].items():
            params[k] = (
                [jnp.asarray(w) for w in v] if isinstance(v, list) else jnp.asarray(v)
            )
        state["params"] = params
        from sienerf_tpu.ops.optim import optim_init

        state["opt"] = optim_init(params, eng.opt)
        if out["density_grid"] is not None:
            dens = jnp.asarray(out["density_grid"])
            n_casc = state["occ"]["density"].shape[0]
            if dens.shape[0] < n_casc:  # snapshot stored fewer cascades
                pad = jnp.zeros((n_casc - dens.shape[0],) + dens.shape[1:], dens.dtype)
                dens = jnp.concatenate([dens, pad])
            dens = dens[:n_casc]
            dens, bitfield, mean = density_to_bitfield(dens)
            state["occ"] = {
                "density": dens,
                "bitfield": bitfield,
                "mean_density": mean,
                "n_updates": jnp.asarray(1, jnp.int32),
            }
        state["step"] = jnp.asarray(out["meta"]["training_step"], jnp.int32)
        eng._phase = "fast"
        return eng, state

    def init(self, seed: int = 1337) -> dict:
        key = jax.random.PRNGKey(seed)
        params = init_nerf_network(key, self.net)
        if self.optimize_extrinsics:
            n_img = self.images.shape[0]
            params["cam"] = jnp.zeros((n_img, 6), jnp.float32)  # (rot, trans) se3 deltas
        if self.optimize_focal:
            params["focal"] = jnp.zeros((2,), jnp.float32)  # log-scale on (fx, fy)
        if self.optimize_exposure:
            params["exposure"] = jnp.zeros((self.images.shape[0], 1), jnp.float32)
        if self.optimize_distortion:
            r = self.distortion_resolution
            params["distortion"] = jnp.zeros((r, r, 2), jnp.float32)
        if self.net.n_extra_dims:
            # per-image extra-dim rows (reset_extra_dims,
            # testbed_nerf.cu:3680-3700): random U[-1,1] latent codes;
            # fixed light dirs (warp_direction'd to [0,1]) fill the first
            # 3 dims when the dataset ships them
            n_img = self.images.shape[0]
            ex = jax.random.uniform(
                jax.random.fold_in(key, 99),
                (n_img, self.net.n_extra_dims), jnp.float32, -1.0, 1.0,
            )
            if self.light_dirs is not None:
                ex = ex.at[:, :3].set(jnp.asarray((self.light_dirs + 1.0) * 0.5))
            params["extra_dims"] = ex
        if self.train_envmap:
            if self.envmap_init is not None:
                params["envmap"] = jnp.asarray(self.envmap_init, jnp.float32)
            else:
                # black init with OPAQUE alpha: alpha is not trainable
                # (reference dL_denvmap[3]=0), and a=0 would leak the
                # per-step random training background permanently
                params["envmap"] = jnp.zeros(
                    tuple(self.envmap_resolution) + (4,), jnp.float32
                ).at[..., 3].set(1.0)
        state = {
            "params": params,
            "opt": optim_init(params, self.opt),
            "occ": init_occupancy_state(self.occ),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.use_error_map:
            from sienerf_tpu.ops.importance import init_error_map

            state["emap"] = init_error_map(self.images.shape[0], self.error_map_res)
        return state

    # --- shared pieces ----------------------------------------------------

    def _density_fn(self, params):
        def fn(unit_pos):
            raw = density_raw(self.net, params, unit_pos)
            return apply_density_activation(raw, self.net.density_activation)

        return fn

    def _aabb_times(self, origins, dirs, near):
        tmin, tmax = self.aabb.ray_intersect(origins, dirs)
        t0 = jnp.maximum(tmin, near)
        t1 = jnp.maximum(tmax, t0)
        return t0, t1

    def _render_extra(self, params):
        """Default extra-dim row used for rendering: training view 0's code
        (get_rendering_extra_dims, testbed_nerf.cu:3700-3716; the rendering
        buffer is reset from view 0).  Render entry points accept an
        explicit `extra_row` to select another view's code."""
        if self.net.n_extra_dims and "extra_dims" in params:
            return params["extra_dims"][0]
        return None

    def _eval_samples(self, params, origins, dirs, ts, dts, counts, extra=None):
        """Evaluate the field at (N,K) marched samples; returns activated
        rgb (N,K,3), density (N,K), valid (N,K).  `extra`: optional
        extra-dim conditioning — (E,) one row for all rays, or (N,E)
        per-ray; None falls back to the rendering default row."""
        N, K = ts.shape
        valid = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1) < counts[:, None]
        pos = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
        unit = (pos - self.aabb.min) / self.aabb.diag
        unit = jnp.clip(unit, 0.0, 1.0)
        dirw = (dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1.0) * 0.5
        dirw = jnp.broadcast_to(dirw[:, None, :], pos.shape)
        ex = None
        if self.net.n_extra_dims:
            if extra is None:
                extra = self._render_extra(params)
            if extra is not None:
                E = self.net.n_extra_dims
                if extra.ndim == 1:
                    ex = jnp.broadcast_to(extra, (N * K, E))
                else:
                    ex = jnp.broadcast_to(extra[:, None, :], (N, K, E)).reshape(-1, E)
        rgb_raw, dens_raw = nerf_apply(
            self.net, params, unit.reshape(-1, 3), dirw.reshape(-1, 3), extra=ex
        )
        rgb = apply_rgb_activation(rgb_raw, self.net.rgb_activation).reshape(N, K, 3)
        dens = apply_density_activation(dens_raw, self.net.density_activation).reshape(N, K)
        dens = jnp.where(valid, dens, 0.0)
        return rgb, dens, valid

    # --- training ---------------------------------------------------------

    def _sample_training_rays(self, data, key, n_rays=None, emap=None, step=None, cam_deltas=None):
        """Ray batch sampling: uniform over images/pixels during warmup,
        error-map CDF importance sampling after (reference
        generate_training_samples_nerf image/focal-plane CDFs)."""
        kimg, kpix, kbg = jax.random.split(key, 3)
        n = n_rays or self.train_n_rays
        w, h = self.resolution

        def uniform_sample(k):
            k1, k2 = jax.random.split(k)
            img_idx = jax.random.randint(k1, (n,), 0, data["images"].shape[0])
            pix = jax.random.uniform(k2, (n, 2))
            return img_idx, pix[:, 0], pix[:, 1]

        if emap is not None and step is not None:
            from sienerf_tpu.ops.importance import sample_error_map

            img_idx, u, v = jax.lax.cond(
                step >= self.error_map_warmup,
                lambda k: sample_error_map(emap, k, n),
                uniform_sample,
                kpix,
            )
        else:
            img_idx, u, v = uniform_sample(kpix)

        px = jnp.minimum((u * w).astype(jnp.int32), w - 1)
        py = jnp.minimum((v * h).astype(jnp.int32), h - 1)
        uv = jnp.stack([(px.astype(jnp.float32) + 0.5) / w, (py.astype(jnp.float32) + 0.5) / h], axis=-1)
        xf = data["xforms"][img_idx]
        if self.rolling_shutter is not None and "xforms_end" in data:
            # per-pixel shutter time + motion blur: slerp between the
            # frame-start and frame-end camera (common_device.cuh:656-659)
            from sienerf_tpu.utils.camera import camera_slerp

            rs = self.rolling_shutter
            tmb = jax.random.uniform(jax.random.fold_in(key, 11), (n,))
            pixel_t = rs[0] + rs[1] * uv[:, 0] + rs[2] * uv[:, 1] + rs[3] * tmb
            xf = camera_slerp(xf, data["xforms_end"][img_idx], pixel_t)
        fl = data["focals"][img_idx]
        pp = data["pp"][img_idx]
        if cam_deltas is not None:
            if "cam" in cam_deltas:
                xf = _apply_se3_delta(xf, cam_deltas["cam"][img_idx])
            if "focal" in cam_deltas:
                fl = fl * jnp.exp(cam_deltas["focal"])[None, :]
        dist = cam_deltas.get("distortion") if cam_deltas else None
        origins, dirs = _batched_uv_to_ray(uv, (w, h), fl, pp, xf, self.lens, dist)
        pix_flat = (img_idx * h + py) * w + px
        target = jnp.take(data["images"].reshape(-1, 4), pix_flat, axis=0)
        depth_target = (
            jnp.take(data["depths"].reshape(-1), pix_flat, axis=0)
            if "depths" in data
            else None
        )
        bg = jax.random.uniform(kbg, (n, 3))
        return origins, dirs, target, bg, (img_idx, uv[:, 0], uv[:, 1]), depth_target

    def _loss_for_batch(self, params, occ_bitfield, data, key, n_rays=None, emap=None, step=None, k=None, iters=None):
        cam_params = {k: params[k] for k in ("cam", "focal", "distortion") if k in params} or None
        origins, dirs, target, bg, ray_meta, depth_target = self._sample_training_rays(
            data, key, n_rays, emap, step, cam_params
        )
        dn = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs_n = dirs / dn
        t0, t1 = self._aabb_times(origins, dirs_n, self.near_distance)
        # first-sample jitter (reference generate_training_samples_nerf:
        # startt += calc_dt(startt) * random): decorrelates the sample
        # lattice across steps
        from sienerf_tpu.ops.raymarch import calc_dt as _calc_dt

        kj = jax.random.fold_in(key, 7)
        t0 = t0 + _calc_dt(t0, self.march.cone_angle) * jax.random.uniform(kj, t0.shape)
        k_eff = k or self.train_k
        ts, dts, counts, t_end = march_rays(
            self.march, occ_bitfield, origins, dirs_n, t0, t1,
            k_eff, iters or self.train_march_iters,
        )
        n_rays_eff = origins.shape[0]
        if self.compact_training:
            M = self.train_n_rays * self.train_k
            t_f, dt_f, ray_id, ray_start, fits = compact_samples(ts, dts, counts, M)
            rid = jnp.minimum(ray_id, n_rays_eff - 1)
            o_s = jnp.take(origins, rid, axis=0)
            d_s = jnp.take(dirs_n, rid, axis=0)
            pos = o_s + t_f[:, None] * d_s
            unit = jnp.clip((pos - self.aabb.min) / self.aabb.diag, 0.0, 1.0)
            dirw = (d_s + 1.0) * 0.5
            ex_s = None
            if self.net.n_extra_dims and "extra_dims" in params:
                # per-sample extra dims gathered by the sample's source
                # image (testbed_nerf.cu:788 extra_dims_gpu + img*n_extra);
                # autodiff's segment-sum back through this gather IS the
                # reference's atomic per-image gradient reduction
                # (compute_extra_dims_gradient_train_nerf)
                ex_s = jnp.take(
                    params["extra_dims"], jnp.take(ray_meta[0], rid), axis=0
                )
            rgb_raw, dens_raw = nerf_apply(self.net, params, unit, dirw, extra=ex_s)
            rgb_s = apply_rgb_activation(rgb_raw, self.net.rgb_activation)
            dens_s = apply_density_activation(dens_raw, self.net.density_activation)
            rgb_sum, opacity, T_out, depth_pred = composite_flat(
                rgb_s, dens_s, t_f, dt_f, ray_id, ray_start, n_rays_eff,
                self.min_transmittance,
            )
            # A ray is trainable only if its march COMPLETED: it exited the
            # scene (t_end >= t1) or fully absorbed (T below threshold).
            # Rays cut mid-scene by the per-ray k cap or the iteration
            # budget would otherwise be trained truncated — painting a
            # view-dependent fog "billboard" at the march horizon (the
            # reference marches every training ray to completion, so this
            # condition is implicit there).
            fits = fits & ((t_end >= t1) | (T_out < self.min_transmittance))
        else:
            ex_r = None
            if self.net.n_extra_dims and "extra_dims" in params:
                ex_r = jnp.take(params["extra_dims"], ray_meta[0], axis=0)
            rgb, dens, valid = self._eval_samples(
                params, origins, dirs_n, ts, dts, counts, extra=ex_r
            )
            T_in = jnp.ones(origins.shape[0], jnp.float32)
            rgb_sum, opacity, T_out, _, _ = composite_chunk(
                rgb, dens, ts, dts, valid, T_in, self.min_transmittance
            )
            fits = jnp.ones((n_rays_eff,), bool)
            alpha = 1.0 - jnp.exp(-dens * dts)
            cum = jnp.cumprod(1.0 - alpha, axis=1)
            T_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
            depth_pred = jnp.sum(alpha * T_excl * ts, axis=1)
        if "envmap" in params:
            # composite the (random) background BEHIND the trainable envmap
            # (testbed_nerf.cu:1007-1015); gradients reach the envmap texels
            # through the T_out * bg term and the GT composite below —
            # autodiff of the bilinear read IS the reference's 4-texel
            # gradient splat (envmap.cuh deposit_envmap_gradient)
            from sienerf_tpu.ops.envmap import background_behind_envmap

            bg = background_behind_envmap(params["envmap"], dirs_n, bg)
        pred = rgb_sum + T_out[:, None] * bg
        if "exposure" in params:
            # per-image exposure compensation applied to the prediction
            img_idx = ray_meta[0]
            pred = pred * jnp.exp(params["exposure"][img_idx])
        # GT composited over the same background; the reference's envmap
        # gradient is prediction-side only (dloss_by_dbackground = T *
        # loss_gradient, testbed_nerf.cu:1194), so the GT-side dependence is
        # cut here
        gt = target[:, :3] * target[:, 3:4] + jax.lax.stop_gradient(bg) * (
            1.0 - target[:, 3:4]
        )
        loss_fn = get_loss(self.loss_otype)
        per_elem = loss_fn(pred, gt)
        per_ray = jnp.mean(per_elem, axis=-1)
        # dynamic-mask pixels carry negative rgb and contribute nothing
        # (testbed_nerf.cu:776-780 "Negative values indicate masked-away
        # regions"); keep the mean's denominator fixed-shape by rescaling
        ray_ok = (target[:, 0] >= 0.0) & fits
        per_ray = jnp.where(ray_ok, per_ray, 0.0)
        denom = jnp.maximum(jnp.sum(ray_ok.astype(jnp.float32)), 1.0)
        loss = jnp.sum(per_ray) / denom
        if self.near_density_reg > 0.0 and self.compact_training:
            near_cut = jnp.take(
                t0 + self.near_reg_fraction * (t1 - t0),
                jnp.minimum(ray_id, n_rays_eff - 1),
            )
            near = (t_f < near_cut) & (ray_id < n_rays_eff)
            reg = jnp.sum(jnp.where(near, dens_s * dt_f, 0.0)) / jnp.maximum(
                jnp.sum(ray_ok.astype(jnp.float32)), 1.0
            )
            loss = loss + self.near_density_reg * reg
        if depth_target is not None and self.depth_supervision_lambda > 0.0:
            # depth term (testbed_nerf.cu:1065-1067): only rays with valid
            # depth (>0); prediction = expected ray termination distance
            d_ok = ray_ok & (depth_target > 0.0)
            d_err = jnp.where(d_ok, jnp.abs(depth_pred - depth_target), 0.0)
            loss = loss + self.depth_supervision_lambda * jnp.sum(d_err) / denom
        return loss, (counts, per_ray, ray_meta)

    def _train_one_step(self, state, data, key, n_rays=None, axis_name=None, k=None, iters=None):
        """One SGD step.  With `axis_name`, rays are sharded over that mesh
        axis (key folded with the device index) and gradients are pmean'd —
        pure data parallelism: the model (hash table + MLPs + bitfield) is
        tiny and replicated, the ray batch is what scales (SURVEY.md §5.8)."""
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def loss_of(p):
            loss, aux = self._loss_for_batch(
                p, state["occ"]["bitfield"], data, key, n_rays,
                state.get("emap"), state["step"], k, iters,
            )
            return loss, aux

        (loss, (counts, per_ray, ray_meta)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        lr_mask = None
        freeze_extra = "extra_dims" in state["params"] and not self.optimize_extra_dims
        if (
            self.optimize_extrinsics or self.optimize_focal or self.optimize_exposure
            or freeze_extra
        ):
            lr_mask = jax.tree.map(lambda _: 1.0, state["params"])
            for leaf in ("cam", "focal", "exposure"):
                if leaf in state["params"]:
                    lr_mask[leaf] = self.extrinsics_lr_scale
            if freeze_extra:
                # fixed conditioning (light dirs): rows never move
                lr_mask["extra_dims"] = 0.0
        params, opt = optim_step(
            self.opt, state["opt"], state["params"], grads,
            nerf_l2_mask(state["params"]), lr_mask,
        )
        new_state = {**state, "params": params, "opt": opt, "step": state["step"] + 1}
        if "emap" in state:
            from sienerf_tpu.ops.importance import splat_errors

            img_idx, u, v = ray_meta
            new_state["emap"] = splat_errors(
                state["emap"], img_idx, u, v, per_ray, axis_name
            )
        cnt = jnp.mean(counts.astype(jnp.float32))
        if axis_name is not None:
            # counts are per-chip measurements; the replicated out-spec
            # requires a cross-chip reduction (same for loss/grads above)
            cnt = jax.lax.pmean(cnt, axis_name)
        return new_state, loss, cnt

    def _bundle_body(self, state, data, key, n_rays=None, axis_name=None, k=None, iters=None):
        kg, ks = jax.random.split(key)
        state = self._occupancy_update(state, kg, data, axis_name)

        def body(st, kk):
            st, loss, cnt = self._train_one_step(st, data, kk, n_rays, axis_name, k, iters)
            return st, (loss, cnt)

        keys = jax.random.split(ks, self.grid_interval)
        state, (losses, counts) = jax.lax.scan(body, state, keys)
        return state, jnp.mean(losses), jnp.mean(counts)

    def _phase_geometry(self):
        """(n_rays, k, march_iters) for the next bundle.

        Compact mode (default): NerfCounters-style measured-batch feedback
        (nerf.h:29-41; testbed_nerf.cu:3230-3247) — every ray marches to
        completion (k = per-ray cap), and the RAY COUNT tracks the measured
        samples/ray so compacted samples ~= the M-sample batch.  Quantized
        to power-of-two buckets so jit shapes stay few; slight overfill bias
        (dropped rays only waste march, underfilled slots waste the
        dominant eval).
        """
        if self.compact_training:
            # Power-of-FOUR buckets: each distinct (n_rays, k) pair is a
            # fresh XLA compile (~40s through the tunnel), so coarse buckets
            # beat tight fitting — overfull ray batches only waste march
            # (dropped rays never reach the fixed-M eval).
            M = self.train_n_rays * self.train_k
            mean = getattr(self, "_mean_samples", None)
            if not mean or mean <= 0:
                k = self.max_samples_per_ray
                n_rays = max(64, M // k)
            else:
                k = int(np.clip(4 ** int(np.ceil(np.log(max(2.0 * mean, 16.0)) / np.log(4))),
                                16, self.max_samples_per_ray))
                want = 1.15 * M / mean
                n_rays = 4 ** int(np.clip(np.round(np.log(max(want, 64.0)) / np.log(4)), 3, 8))
            iters = int(k + k // 2 + 128)
            return n_rays, k, iters
        if getattr(self, "_phase", "deep") == "deep":
            batch = self.train_n_rays * self.train_k
            n_rays = max(64, batch // self.deep_k)
            return n_rays, self.deep_k, self.deep_march_iters
        n_rays = getattr(self, "_adaptive_n_rays", None) or self.train_n_rays
        return n_rays, self.train_k, self.train_march_iters

    def _update_phase(self, mean_count: float, k: int):
        if self.compact_training:
            if mean_count > 0:
                prev = getattr(self, "_mean_samples", None)
                self._mean_samples = (
                    mean_count if not prev else 0.7 * prev + 0.3 * mean_count
                )
            return
        if getattr(self, "_phase", "deep") == "deep" and mean_count < self.phase_switch_count * k:
            self._phase = "fast"
        elif self.adapt_ray_count and mean_count > 0:
            # NerfCounters feedback (nerf.h:29-41; testbed_nerf.cu:3230-3247):
            # rays/batch adjusted so compacted samples ~= target batch.
            # Quantized to power-of-two buckets so jit shapes stay few.
            target = self.train_n_rays * self.train_k
            want = target / mean_count
            bucket = 1 << int(np.clip(np.round(np.log2(max(want, 256))), 8, 20))
            self._adaptive_n_rays = int(
                np.clip(bucket, self.train_n_rays // 4, self.train_n_rays * 16)
            )

    def train_bundle(self, state, key):
        """grid_interval train steps (scanned) + one occupancy update.
        Returns (state, mean_loss, mean_samples_per_ray)."""
        n_rays, k, iters = self._phase_geometry()
        state, loss, cnt = self._train_bundle_jit(state, key, self.data, n_rays, k, iters)
        self._update_phase(float(cnt), k)
        return state, loss, cnt

    # NO donation: donating `state` makes XLA schedule the bf16 hash
    # backward pathologically (832 vs 160 ms/step measured,
    # tools/probe_bundle_bf16b.py — NOTES_ROUND4).  Peak memory without it
    # is 2x the ~2 GB state, well inside HBM.
    @partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _train_bundle_jit(self, state, key, data, n_rays, k, iters):
        return self._bundle_body(state, data, key, n_rays=n_rays, k=k, iters=iters)

    def train_bundle_multichip(self, state, key, mesh):
        """Data-parallel bundle over a `rays` mesh axis: params/occupancy
        replicated, ray batch sharded, gradients psum'd over ICI — the
        TPU-native replacement for the reference's CudaDevice replication
        (testbed.cu:5523-5573)."""
        n_rays, k, iters = self._phase_geometry()
        state, loss, cnt = self._train_bundle_multichip_jit(
            state, key, self.data, mesh, n_rays, k, iters
        )
        self._update_phase(float(cnt), k)
        return state, loss, cnt

    @partial(jax.jit, static_argnums=(0, 4, 5, 6, 7), donate_argnums=1)
    def _train_bundle_multichip_jit(self, state, key, data, mesh, n_rays, k, iters):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        ndev = mesh.devices.size
        n_local = max(64, n_rays // ndev)

        def inner(state, key, data):
            st, loss, cnt = self._bundle_body(
                state, data, key, n_rays=n_local, axis_name="rays", k=k, iters=iters
            )
            return st, loss, cnt

        f = shard_map(
            inner, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P(), P()), check_vma=False
        )
        return f(state, key, data)

    def _occupancy_update(self, state, key, data, axis_name=None):
        step = state["step"]
        dense_pred = (step < self.dense_until) | (
            (state["occ"]["n_updates"] % self.dense_every_updates) == 0
        )
        if axis_name is not None:
            # each chip samples different cells; union via max below
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        dfn = self._density_fn(state["params"])
        amin = jnp.asarray(self.aabb.min)
        adiag = jnp.asarray(self.aabb.diag)

        vis = data["visible_mask"] if data is not None else None

        def upd(dense):
            def f(occ):
                return update_density_grid(
                    self.occ, occ, dfn, key, amin, adiag, vis, dense=dense
                )

            return f

        occ = jax.lax.cond(dense_pred, upd(True), upd(False), state["occ"])
        if axis_name is not None:
            occ = {
                "density": jax.lax.pmax(occ["density"], axis_name),
                "bitfield": jax.lax.pmax(
                    occ["bitfield"].astype(jnp.int8), axis_name
                ).astype(jnp.bool_),
                "mean_density": jax.lax.pmean(occ["mean_density"], axis_name),
                "n_updates": occ["n_updates"],
            }
        return {**state, "occ": occ}

    # --- rendering --------------------------------------------------------

    def _mode_sample_colors(self, params, origins, dirs, ts, dts, counts, render_mode,
                            extra=None):
        """Per-sample colors for a render visualisation mode — the TPU
        equivalent of composite_kernel_nerf's per-mode branches
        (testbed_nerf.cu:688-702): positions / depth / AO replace the
        sample color; normals composite the (negated, chain-ruled) density
        position-gradient and normalize in the epilogue."""
        rgb, dens, valid = self._eval_samples(
            params, origins, dirs, ts, dts, counts, extra=extra
        )
        mode = render_mode or "shade"
        if mode in ("shade", "cost"):
            return rgb, dens, valid
        N, K = ts.shape
        pos = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
        if mode.startswith("glow"):
            return self._glow_samples(mode, pos, origins, rgb, dens, dts, valid)
        if mode == "positions":
            rgb = (pos - 0.5) / 2.0 + 0.5
        elif mode == "depth":
            rgb = jnp.broadcast_to(ts[..., None], pos.shape)
        elif mode == "ao":
            alpha = 1.0 - jnp.exp(-dens * dts)
            rgb = jnp.broadcast_to(alpha[..., None], pos.shape)
        elif mode == "normals":
            # normal = direction of decreasing density; the hash encoding's
            # custom VJP supplies the analytic position gradient
            unit = jnp.clip(
                (pos.reshape(-1, 3) - self.aabb.min) / self.aabb.diag, 0.0, 1.0
            )

            def dens_of(pu):
                raw = density_raw(self.net, params, pu)
                return apply_density_activation(raw, self.net.density_activation)

            _, vjp = jax.vjp(dens_of, unit)
            (g,) = vjp(jnp.ones((unit.shape[0],), jnp.float32))
            rgb = -g.reshape(N, K, 3)
        elif mode == "encoding_vis":
            # composite_kernel_nerf EncodingVis branch: rgb = warped_pos
            # (testbed_nerf.cu:697-698) — the network-domain position
            rgb = jnp.clip((pos - self.aabb.min) / self.aabb.diag, 0.0, 1.0)
        else:
            raise ValueError(f"render mode {mode} not supported for NeRF")
        return rgb, dens, valid

    def _glow_samples(self, mode, pos, origins, rgb, dens, dts, valid):
        """Shade-mode glow overlay (composite_kernel_nerf glow branch,
        testbed_nerf.cu:587-687): height/radial-band glow with cosine
        gridlines added to the sample color.  Mode string
        "glow[:glow_mode[:y_cutoff]]" — glow_mode is the reference bitmask
        (1 green grid, 2 cutline, 4 mask-to-alpha, 8 radial, 16 grid), GUI
        defaults glow_mode=1, y_cutoff=0.  mask-to-alpha scales the sample's
        ALPHA by the band mask; folded exactly into the density the
        compositor sees via sigma' = -log(1 - mask*alpha)/dt."""
        parts = mode.split(":")
        glow_mode = int(parts[1]) if len(parts) > 1 else 1
        y_cutoff = float(parts[2]) if len(parts) > 2 else 0.0
        green_grid, green_cutline = glow_mode & 1, glow_mode & 2
        mask_to_alpha, radial, grid_mode = glow_mode & 4, glow_mode & 8, glow_mode & 16

        if radial:
            dist = jnp.linalg.norm(pos - origins[:, None, :], axis=-1)
            dist = jnp.minimum(dist, (4.5 - pos[..., 1]) * 0.333)
        else:
            dist = pos[..., 1]
        if grid_mode:
            glow = 1.0 / jnp.maximum(1.0, dist)
            mask = jnp.ones_like(dist)
        else:
            y = (y_cutoff - dist) * 80.0
            in_band = y > 0.0
            mask = jnp.where(in_band, jnp.minimum(1.0, y), 0.0)
            glow = jnp.zeros_like(dist)
            if green_cutline:
                glow += jnp.where(
                    in_band, jnp.maximum(0.0, 1.0 - jnp.abs(1.0 - y)) * 4.0, 0.0
                )
            y2 = jnp.where(y > 1.0, 1.0 - (y - 1.0) * 0.05, y)
            if green_grid:
                glow += jnp.where(
                    in_band, jnp.maximum(0.0, y2 / jnp.maximum(1.0, dist)), 0.0
                )
        # cosine gridlines at 4 octaves per axis (testbed_nerf.cu:661-674)
        line = jnp.zeros_like(dist)
        for s in (2.0, 4.0, 8.0, 16.0):
            line += jnp.sum(
                jnp.maximum(0.0, jnp.cos(pos * s * jnp.pi * 16.0) - 0.975), axis=-1
            )
        tint = jnp.asarray([0.25, 1.0, 0.5], jnp.float32)
        if grid_mode:
            g = glow * line * 15.0
            rgb = g[..., None] * tint
        else:
            g = jnp.where(glow > 0.0, glow * glow * 0.25 + glow * line * 15.0, 0.0)
            rgb = rgb + g[..., None] * tint
        if mask_to_alpha:
            alpha = 1.0 - jnp.exp(-dens * dts)
            scaled = jnp.clip(mask * alpha, 0.0, 1.0 - 1e-7)
            dens = jnp.where(dts > 0.0, -jnp.log1p(-scaled) / jnp.maximum(dts, 1e-12), dens)
        return rgb, dens, valid

    @staticmethod
    def _mode_epilogue(rgb, opacity, render_mode):
        """Frame epilogue per mode (shade_kernel_nerf, testbed_nerf.cu:1379-1390)."""
        if render_mode == "normals":
            n = rgb / jnp.maximum(jnp.linalg.norm(rgb, axis=-1, keepdims=True), 1e-9)
            return (0.5 * n + 0.5) * opacity[..., None]
        return rgb

    def render_rays(
        self, params, bitfield, origins, dirs, near=None, t_cap=None,
        min_transmittance=None, fine_bitfield=None, render_mode=None,
        extra_row=None,
    ):
        """Fixed-size ray batch -> (rgb (N,3), opacity (N,), depth (N,)).

        Marching loop: chunks of `render_chunk` samples between network
        evals; on-device termination when every ray is dead.  `t_cap`
        (optional, per-ray, in units of the unnormalized `dirs`) bounds the
        march — used by the hybrid geometry pass to stop at mesh surfaces.
        `min_transmittance` defaults to the interactive early-out threshold
        (render_min_transmittance); the eval protocol passes 1e-4.
        """
        if near is None:
            near = max(NERF_RENDERING_NEAR_DISTANCE, self.near_distance)
        minT = jnp.asarray(
            self.render_min_transmittance if min_transmittance is None else min_transmittance,
            jnp.float32,
        )
        dn = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs_n = dirs / dn
        t0, t1 = self._aabb_times(origins, dirs_n, near)
        # clamp entry/exit to the tight occupied-cell bbox (the reference
        # advances rays to the first occupied voxel at init instead,
        # advance_pos_nerf_kernel testbed_nerf.cu:364)
        from sienerf_tpu.ops.occupancy import occupied_bbox, ray_box_times

        blo, bhi = occupied_bbox(bitfield)
        btmin, btmax = ray_box_times(origins, dirs_n, blo, bhi)
        t0 = jnp.maximum(t0, btmin)
        t1 = jnp.minimum(t1, btmax)
        t1 = jnp.maximum(t1, t0)
        if t_cap is not None:
            t1 = jnp.minimum(t1, t_cap * dn[:, 0])
        N = origins.shape[0]

        # Per-ray sample budget = the TRAINING march budget: the model is
        # only trained to explain pixels with that march; marching deeper
        # integrates density the loss never constrained (measured: 28.4 vs
        # 20.2 PSNR on fox with truncated-k training).  Compact training
        # marches rays to completion, so the render budget is the full
        # per-ray cap there.
        budget = self._render_budget()

        def cond(st):
            i, t, T, _rgb, _op, _bw, _bt, used = st
            alive = (T >= minT) & (t < t1) & (used < budget)
            return (i < self.render_max_chunks) & jnp.any(alive)

        def body(st):
            i, t, T, rgb_acc, op_acc, best_w, best_t, used = st
            ts, dts, counts, t_end = march_rays(
                self.march, bitfield, origins, dirs_n, t, t1,
                self.render_chunk, self._march_iters(), fine=fine_bitfield,
            )
            active = (T >= minT) & (t < t1) & (used < budget)
            counts = jnp.where(active, counts, 0)
            rgb, dens, valid = self._mode_sample_colors(
                params, origins, dirs_n, ts, dts, counts, render_mode,
                extra=extra_row,
            )
            rgb_sum, opacity, T_out, bw, bt = composite_chunk(
                rgb, dens, ts, dts, valid, T, minT
            )
            better = bw > best_w
            return (
                i + 1,
                jnp.where(active, t_end, t),
                jnp.where(active, T_out, T),
                rgb_acc + jnp.where(active[:, None], rgb_sum, 0.0),
                op_acc + jnp.where(active, opacity, 0.0),
                jnp.where(better, bw, best_w),
                jnp.where(better, bt, best_t),
                used + counts,
            )

        init = (
            jnp.zeros((), jnp.int32),
            t0,
            jnp.ones((N,), jnp.float32),
            jnp.zeros((N, 3), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.int32),
        )
        _, _, T, rgb, opacity, _, depth, used_out = jax.lax.while_loop(cond, body, init)
        if render_mode == "cost":
            # steps-per-ray heatmap (shade_kernel_nerf Cost branch,
            # testbed_nerf.cu:1382-1384) — the perf-debugging oracle
            col = used_out.astype(jnp.float32) / 128.0
            rgb = jnp.broadcast_to(col[:, None], rgb.shape)
            opacity = jnp.ones_like(opacity)
        rgb = self._mode_epilogue(rgb, opacity, render_mode)
        # internal t is euclidean distance along the normalized dir; the
        # reference's depth convention is z-depth along the camera axis
        # (dot(cam_fwd, pos-cam)), i.e. t / |dirs| for (x,y,1) camera rays.
        return rgb, opacity, depth / dn[:, 0]

    @partial(jax.jit, static_argnums=(0, 3, 4, 7), static_argnames=("tile", "render_mode"))
    def render_frame(
        self,
        params,
        bitfield,
        width: int,
        height: int,
        camera_matrix,
        focal_length,
        tile: int = 1 << 14,
        screen_center=(0.5, 0.5),
        background=(0.0, 0.0, 0.0),
        min_transmittance=None,
        fine_bitfield=None,
        pixel_offset=None,
        render_mode=None,
        extra_row=None,
    ):
        """Render a full frame with a streaming persistent ray buffer.

        The reference keeps warps dense by compacting alive rays between
        marching rounds (compact_kernel_nerf, testbed_nerf.cu:1403-1427).
        The TPU equivalent: a fixed-size active buffer of `tile` rays; each
        round marches `render_chunk` samples for every slot, flushes
        finished rays to the frame via unique-index scatters, and refills
        dead slots with the next pixels from the stream — lanes stay dense
        regardless of per-ray path-length divergence, with zero host syncs.
        Returns rgba (H,W,4) and depth (H,W).
        """
        n = width * height
        A = min(tile, max(256, n))
        bg = jnp.asarray(background, jnp.float32)
        if pixel_offset is None:
            pixel_offset = jnp.asarray([0.5, 0.5], jnp.float32)
        cam_spec = (width, height, focal_length, camera_matrix, screen_center, pixel_offset)
        if render_mode == "distortion":
            # 2D mode, no marching (init_rays_with_payload_kernel_nerf
            # Distortion branch, testbed_geometry_training.cu:1980-1989)
            return self._render_distortion_frame(
                params, width, height, camera_matrix, focal_length, screen_center
            )
        params = self._render_params(params)
        from sienerf_tpu.ops.occupancy import occupied_bbox

        bounds = occupied_bbox(bitfield)
        # hoist the occupancy bit-pack out of the per-round march (the march
        # primitives accept packed rows — ops/raymarch._as_packed)
        from sienerf_tpu.ops.occupancy import pack_occupancy

        bitfield = pack_occupancy(bitfield)
        # fine_bitfield stays UNPACKED: the march reads its grid size from
        # its shape (ops/raymarch._march_rays_scalar g_fine)

        # Build EVERY pixel's ray once (camera math + lens undistortion +
        # slab tests), pre-advance to the first occupied voxel in one big
        # masked DDA (advance_pos_nerf_kernel, testbed_nerf.cu:364), and
        # cache the lot — slot refills inside the loop are then pure gathers.
        ids_all = jnp.arange(n, dtype=jnp.int32)
        o_a, d_a, dn_a, t0_a, t1_a = self._frame_make_rays(ids_all, n, cam_spec, bounds)
        if self.init_advance_iters > 0:
            t0_a = advance_to_occupied(
                self.march, bitfield, o_a, d_a, t0_a, t1_a, self.init_advance_iters
            )

        rays_pre = self._frame_pack_rays(o_a, d_a, dn_a, t0_a, t1_a)

        ids0 = jnp.arange(A, dtype=jnp.int32)
        o0, d0, dn0, t00, t10 = self._frame_take_rays(ids0, n, rays_pre)
        zero = jnp.zeros((A,), jnp.float32)
        state = dict(
            ids=ids0,
            o=o0,
            d=d0,
            dnorm=dn0,
            t=t00,
            t1=t10,
            T=jnp.ones((A,), jnp.float32),
            rgb=jnp.zeros((A, 3), jnp.float32),
            op=zero,
            bw=zero,
            bt=zero,
            valid=ids0 < n,
            chunks=jnp.zeros((A,), jnp.int32),
            used=jnp.zeros((A,), jnp.int32),
            cursor=jnp.asarray(A, jnp.int32),
            # interactive early-out threshold (reference nerf.h:172); the
            # eval protocol passes 1e-4 (scripts/run.py:230)
            minT=jnp.asarray(
                self.render_min_transmittance
                if min_transmittance is None
                else min_transmittance,
                jnp.float32,
            ),
            # packed per-pixel output rows [r, g, b, opacity, depth]
            out=jnp.zeros((n + 1, 5), jnp.float32),
        )

        def cond(s):
            return jnp.any(self._frame_alive(s))

        def body(s):
            return self._frame_round(
                s, params, bitfield, n, rays_pre, fine_bitfield, render_mode,
                extra_row=extra_row,
            )

        s = jax.lax.while_loop(cond, body, state)
        out = s["out"][:n]
        rgb = out[:, :3]
        opacity = out[:, 3]
        depth = out[:, 4]
        rgb = self._mode_epilogue(rgb, opacity, render_mode)
        if render_mode == "cost":
            opacity = jnp.ones_like(opacity)
        if "envmap" in params:
            # envmap background fill (reference initializes the frame buffer
            # to read_envmap(ray.d), testbed_nerf.cu:1526-1527); the solid
            # background color shows through the envmap's transparency
            from sienerf_tpu.ops.envmap import read_envmap

            ev = read_envmap(params["envmap"], d_a)
            bg = ev[:, :3] + bg[None, :] * (1.0 - ev[:, 3:4])
            rgb = rgb + (1.0 - opacity)[:, None] * bg
        else:
            rgb = rgb + (1.0 - opacity)[:, None] * bg
        rgba = jnp.concatenate([rgb, opacity[:, None]], axis=-1)
        return rgba.reshape(height, width, 4), depth.reshape(height, width)

    def _render_distortion_frame(self, params, width, height, camera_matrix,
                                 focal_length, screen_center):
        """Distortion render mode: HSV color wheel of each pixel's uv
        displacement (x64) from lens undistortion + the trainable distortion
        map — the distorted ray's t=1 point projected back through the
        pinhole model vs the pixel's own uv
        (testbed_geometry_training.cu:1980-1989; to_rgb common_device.cuh:737).
        Returns (rgba (H,W,4), depth (H,W)) like render_frame."""
        from sienerf_tpu.ops.tonemap import flow_to_rgb
        from sienerf_tpu.utils.camera import pixel_grid_uv

        uv = pixel_grid_uv(width, height).reshape(-1, 2)
        dist = params.get("distortion") if hasattr(params, "get") else None
        o, d = uv_to_ray(
            uv, (width, height), focal_length, camera_matrix, screen_center,
            self.lens, distortion_grid=dist,
        )
        cam = jnp.asarray(camera_matrix, jnp.float32)
        dc = d @ cam[:, :3]  # world dir -> camera coords (R^T d)
        fl = jnp.asarray(focal_length, jnp.float32)
        sc = jnp.asarray(screen_center, jnp.float32)
        z = jnp.where(jnp.abs(dc[:, 2]) < 1e-9, 1e-9, dc[:, 2])
        uv2 = jnp.stack(
            [dc[:, 0] / z * fl[0] / width + sc[0],
             dc[:, 1] / z * fl[1] / height + sc[1]], axis=-1,
        )
        rgb = flow_to_rgb((uv2 - uv) * 64.0)
        rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[:, :1])], axis=-1)
        depth = jnp.ones((width * height,), jnp.float32)
        return rgba.reshape(height, width, 4), depth.reshape(height, width)

    def _frame_make_rays(self, ids, n, cam_spec, bounds=None):
        # subpixel offset: 0.5 = pixel centers; spp accumulation feeds
        # low-discrepancy offsets (reference ld_random_pixel_offset)
        if len(cam_spec) == 6:
            width, height, focal_length, camera_matrix, screen_center, off = cam_spec
        else:
            width, height, focal_length, camera_matrix, screen_center = cam_spec
            off = jnp.asarray([0.5, 0.5], jnp.float32)
        ids_c = jnp.minimum(ids, n - 1)
        px = (ids_c % width).astype(jnp.float32)
        py = (ids_c // width).astype(jnp.float32)
        uv = jnp.stack([(px + off[0]) / width, (py + off[1]) / height], axis=-1)
        o, d = uv_to_ray(
            uv, (width, height), focal_length, camera_matrix, screen_center, self.lens
        )
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d_n = d / dn
        # render from the TRAINING near plane: the region closer than
        # near_distance receives no gradient (generate_training_samples
        # starts there too), so marching through it reads untrained
        # density — a fog wall that destroys PSNR (measured 29.5 -> 11.7)
        t0, t1 = self._aabb_times(o, d_n, max(NERF_RENDERING_NEAR_DISTANCE, self.near_distance))
        if bounds is not None:
            # tight occupied-region entry/exit (see render_rays)
            from sienerf_tpu.ops.occupancy import ray_box_times

            btmin, btmax = ray_box_times(o, d_n, bounds[0], bounds[1])
            t0 = jnp.maximum(t0, btmin)
            t1 = jnp.maximum(jnp.minimum(t1, btmax), t0)
        return o, d_n, dn[:, 0], t0, t1

    def _render_params(self, params):
        """Swap in a packed hash table for forward-only rendering."""
        if "grid_fp8" in params or "grid_bf16" in params:
            return params  # already packed (render-only snapshot load)
        pack = self.render_table_pack
        if (
            pack in ("bf16", "fp8")
            and self.net.pos_otype == "grid"
            and self.net.grid.layout == "cell"
        ):
            p = dict(params)
            if pack == "fp8":
                from sienerf_tpu.ops.hashgrid import pack_table_fp8

                p["grid_fp8"], p["grid_fp8_scale"] = pack_table_fp8(
                    self.net.grid, params["grid"]
                )
            else:
                from sienerf_tpu.ops.hashgrid import pack_table_bf16

                p["grid_bf16"] = pack_table_bf16(self.net.grid, params["grid"])
            del p["grid"]
            return p
        return params

    def _march_iters(self) -> int:
        return max(int(self.render_chunk * self.render_march_iters_mult), self.render_chunk)

    def bake_render_grid(self, params, occ_state, factor: int = 4):
        """Bake a factor-x fine occupancy bitfield from the current network
        (ops/occupancy.bake_fine_bitfield) for use as render_frame's
        `fine_bitfield`.  One-time cost per trained state (seconds); frames
        then skip the near-zero-density samples the 128^3 training grid
        cannot distinguish.  Returns a device array."""
        from sienerf_tpu.ops.occupancy import bake_fine_bitfield

        def density_apply(p, pos):
            raw = density_raw(self.net, p, pos)
            return apply_density_activation(raw, self.net.density_activation)

        fine = bake_fine_bitfield(
            density_apply,
            params,
            occ_state["bitfield"],
            float(occ_state["mean_density"]),
            factor=factor,
        )
        return jnp.asarray(fine)

    def bake_features(self, params, occ_state, resolution: int = 256, mode: str = "nearest",
                      row_bits: int = 16):
        """Bake the density branch into a render-side feature grid
        (engines/nerf_baked.py).  Returns (grid pytree, static meta) for
        render_frame_baked — the fast path for interactive orbits.
        row_bits=16 halves the quantization error for 2x table bytes at the
        same descriptor-limited gather rate (32-byte rows)."""
        from sienerf_tpu.engines.nerf_baked import bake_feature_grid

        return bake_feature_grid(self, params, occ_state["bitfield"], resolution, mode,
                                 row_bits=row_bits)

    def _render_budget(self) -> int:
        """Per-ray render sample budget = the training march budget (see
        render_rays): full cap under compact training, train_k legacy."""
        return self.max_samples_per_ray if self.compact_training else self.train_k

    def _frame_alive(self, s):
        return (
            s["valid"]
            & (s["T"] >= s["minT"])
            & (s["t"] < s["t1"])
            & (s["chunks"] < self.render_max_chunks)
            # per-ray budget = the training march budget (see render_rays)
            & (s["used"] < self._render_budget())
        )

    @staticmethod
    def _frame_pack_rays(o, d, dn, t0, t1):
        """Pack per-pixel ray data into ONE (n+1, 16) f32 table so each slot
        refill is a single row gather (TPU gathers are descriptor-limited:
        five separate takes cost 5x one fused take — NOTES_ROUND2 gather
        facts).  Row n is a benign dead pad ray (unit dir, t0 == t1 == 0:
        zero dirs would produce inf skips -> NaN positions in masked lanes);
        cols 9:16 pad the row to 64 B (cols=32/128 B is the one measured
        pathological gather shape — avoid non-power-of-2 too)."""
        n = o.shape[0]
        packed = jnp.zeros((n + 1, 16), jnp.float32)
        packed = packed.at[:n, 0:3].set(o)
        packed = packed.at[:n, 3:6].set(d)
        packed = packed.at[:n, 6].set(dn)
        packed = packed.at[:n, 7].set(t0)
        packed = packed.at[:n, 8].set(t1)
        packed = packed.at[n, 5].set(1.0)  # pad ray dir = (0, 0, 1)
        packed = packed.at[n, 6].set(1.0)  # pad |d| = 1
        return packed

    def _frame_take_rays(self, ids, n, rays_pre):
        """Gather precomputed per-pixel rays (invalid ids hit the benign pad
        row at n) — ONE row gather from the packed table."""
        ids_c = jnp.minimum(ids, n)
        r = jnp.take(rays_pre, ids_c, axis=0)
        return r[:, 0:3], r[:, 3:6], r[:, 6], r[:, 7], r[:, 8]

    def _frame_round(self, s, params, bitfield, n, rays_pre, fine_bitfield=None,
                     render_mode=None, extra_row=None):
        """One streaming-renderer round: march a chunk, evaluate + composite,
        flush finished rays to the packed output, refill slots."""
        ts, dts, counts, t_end = march_rays(
            self.march, bitfield, s["o"], s["d"], s["t"], s["t1"],
            self.render_chunk, self._march_iters(), fine=fine_bitfield,
        )
        rgb, dens, valid_s = self._mode_sample_colors(
            params, s["o"], s["d"], ts, dts, counts, render_mode, extra=extra_row
        )
        rgb_sum, opacity, T_out, bw, bt = composite_chunk(
            rgb, dens, ts, dts, valid_s, s["T"], s["minT"]
        )
        was_alive = self._frame_alive(s)
        counts = jnp.where(was_alive, counts, 0)
        rgb_acc = s["rgb"] + jnp.where(was_alive[:, None], rgb_sum, 0.0)
        op_acc = s["op"] + jnp.where(was_alive, opacity, 0.0)
        better = was_alive & (bw > s["bw"])
        bw_n = jnp.where(better, bw, s["bw"])
        bt_n = jnp.where(better, bt, s["bt"])
        t_n = jnp.where(was_alive, t_end, s["t"])
        T_n = jnp.where(was_alive, T_out, s["T"])
        chunks_n = s["chunks"] + was_alive.astype(jnp.int32)
        used_n = s["used"] + counts

        s2 = {**s, "rgb": rgb_acc, "op": op_acc, "bw": bw_n, "bt": bt_n,
              "t": t_n, "T": T_n, "chunks": chunks_n, "used": used_n}
        return self._frame_flush_refill(s, s2, n, rays_pre, self._frame_alive, render_mode)

    def _frame_flush_refill(self, s, s2, n, rays_pre, alive_fn, render_mode=None):
        """Shared streaming-renderer tail: flush finished rays to the packed
        frame output with one sorted scatter, then refill their slots from
        the pixel stream.  Used by both the live-march renderer
        (_frame_round) and the baked-grid renderer (engines/nerf_baked.py)."""
        used_n = s2["used"]
        rgb_acc, op_acc, bw_n, bt_n = s2["rgb"], s2["op"], s2["bw"], s2["bt"]
        now_alive = alive_fn(s2)
        done = s["valid"] & ~now_alive
        # Flush finished rays with ONE packed, SORTED scatter (unsorted
        # multi-scatters serialize on TPU); non-done slots target the
        # sacrificial row n, which sorts to the end and is sliced off.
        tgt = jnp.where(done, s["ids"], n)
        if render_mode == "cost":
            col = used_n.astype(jnp.float32) / 128.0
            payload = jnp.concatenate(
                [jnp.broadcast_to(col[:, None], rgb_acc.shape), op_acc[:, None],
                 (bt_n / s["dnorm"])[:, None]], axis=1
            )
        else:
            payload = jnp.concatenate(
                [rgb_acc, op_acc[:, None], (bt_n / s["dnorm"])[:, None]], axis=1
            )
        import os

        if os.environ.get("SIENERF_FLUSH", "sorted") == "unique":
            # sort-free flush: ray ids are unique by construction and every
            # non-done slot targets the SAME sacrificial row n (sliced off),
            # so declaring uniqueness only leaves row n implementation-
            # defined — which is unobservable.  A/B knob vs the argsort path
            # (the sort is pure overhead if XLA's unique scatter stays
            # parallel on TPU).
            s2["out"] = s2["out"].at[tgt].set(payload, unique_indices=True)
        else:
            order = jnp.argsort(tgt)
            s2["out"] = s2["out"].at[jnp.take(tgt, order)].set(
                jnp.take(payload, order, axis=0), indices_are_sorted=True
            )
        # refill dead slots from the pixel stream
        rank = jnp.cumsum(done.astype(jnp.int32))
        new_id = s["cursor"] + rank - 1
        take = done & (new_id < n)
        ids_n = jnp.where(take, new_id, s["ids"])
        o_n, d_n2, dn_n, t0_n, t1_n = self._frame_take_rays(ids_n, n, rays_pre)
        sel = take[:, None]
        s2["ids"] = ids_n
        s2["o"] = jnp.where(sel, o_n, s["o"])
        s2["d"] = jnp.where(sel, d_n2, s["d"])
        s2["dnorm"] = jnp.where(take, dn_n, s["dnorm"])
        s2["t"] = jnp.where(take, t0_n, s2["t"])
        s2["t1"] = jnp.where(take, t1_n, s2["t1"])
        s2["T"] = jnp.where(take, 1.0, s2["T"])
        s2["rgb"] = jnp.where(sel, 0.0, s2["rgb"])
        s2["op"] = jnp.where(take, 0.0, s2["op"])
        s2["bw"] = jnp.where(take, 0.0, s2["bw"])
        s2["bt"] = jnp.where(take, 0.0, s2["bt"])
        s2["chunks"] = jnp.where(take, 0, s2["chunks"])
        s2["used"] = jnp.where(take, 0, s2["used"])
        s2["valid"] = now_alive | take
        s2["cursor"] = s["cursor"] + jnp.sum(done.astype(jnp.int32))
        return s2

    @staticmethod
    def _sharded_ray_fanout(mesh, tile: int, o, d, ray_fn, consts):
        """Shared multichip scaffold: pad a flat ray stream to an
        ndev*tile multiple, shard it over the `rays` axis, lax.scan
        `ray_fn(consts, o_tile, d_tile)` over each device's tiles, and
        return flat (rgb, opacity, depth) truncated to the input length.
        `consts` is a pytree replicated to every device (params, bitfield,
        baked grid, ...)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        ndev = mesh.devices.size
        n = o.shape[0]
        chunk = ndev * tile
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], d.dtype), (pad, 3))]
        )
        o = o.reshape(ndev, -1, tile, 3)
        d = d.reshape(ndev, -1, tile, 3)

        def inner(consts, oo, dd):
            def body(_, od):
                return _, ray_fn(consts, od[0], od[1])

            _, out = jax.lax.scan(body, None, (oo[0], dd[0]))
            return jax.tree.map(lambda x: x[None], out)

        f = shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P("rays"), P("rays")),
            out_specs=P("rays"), check_vma=False,
        )
        rgb, opacity, depth = f(consts, o, d)
        return (
            rgb.reshape(-1, 3)[:n],
            opacity.reshape(-1)[:n],
            depth.reshape(-1)[:n],
        )

    @staticmethod
    def _background_fill(rgb, opacity, dirs, params, background):
        """Composite the unfilled transmittance over the trained envmap (if
        any) or the constant background — the same epilogue as the
        single-chip frame paths (testbed_nerf.cu:1428-1558 bg fill)."""
        bg = jnp.asarray(background, jnp.float32)
        if "envmap" in params:
            from sienerf_tpu.ops.envmap import read_envmap

            ev = read_envmap(params["envmap"], dirs)
            bg_full = ev[:, :3] + bg[None, :] * (1.0 - ev[:, 3:4])
            return rgb + (1.0 - opacity)[:, None] * bg_full
        return rgb + (1.0 - opacity)[:, None] * bg

    @partial(jax.jit, static_argnums=(0, 3, 4, 7, 8))
    def render_views_multichip(
        self,
        params,
        bitfield,
        width: int,
        height: int,
        camera_matrices,  # (V, 3, 4)
        focal_lengths,  # (V, 2)
        mesh,
        tile: int = 1 << 13,
        background=(0.0, 0.0, 0.0),
        screen_center=(0.5, 0.5),
    ):
        """Multi-view fan-out: render V views in ONE sharded dispatch.

        The reference assigns whole views to aux GPUs (train_and_render
        multi-view futures, testbed.cu:2964-3227 + CudaDevice).  On a TPU
        mesh the better decomposition is to CONCATENATE all views' rays and
        shard the combined stream over the `rays` axis: devices stay load-
        balanced even when views differ in cost, and V doesn't need to
        divide the device count.  Returns (V, H, W, 4) rgba + (V, H, W)
        depth.
        """
        params = self._render_params(params)
        cams = jnp.asarray(camera_matrices, jnp.float32)
        fls = jnp.asarray(focal_lengths, jnp.float32)
        V = cams.shape[0]
        n = width * height
        idx = jnp.arange(n, dtype=jnp.int32)
        px = (idx % width).astype(jnp.float32)
        py = (idx // width).astype(jnp.float32)
        uv = jnp.stack([(px + 0.5) / width, (py + 0.5) / height], axis=-1)

        def rays_of(cam, fl):
            return uv_to_ray(uv, (width, height), fl, cam, screen_center, self.lens)

        o, d = jax.vmap(rays_of)(cams, fls)  # (V, n, 3)
        o = o.reshape(V * n, 3)
        d = d.reshape(V * n, 3)

        def ray_fn(consts, oo, dd):
            p, bf = consts
            return self.render_rays(p, bf, oo, dd)

        rgb, opacity, depth = self._sharded_ray_fanout(
            mesh, tile, o, d, ray_fn, (params, bitfield)
        )
        rgb = self._background_fill(rgb, opacity, d, params, background)
        rgba = jnp.concatenate([rgb, opacity[:, None]], axis=-1)
        return (
            rgba.reshape(V, height, width, 4),
            depth.reshape(V, height, width),
        )

    @partial(jax.jit, static_argnums=(0, 3, 4, 7, 8))
    def render_frame_multichip(
        self,
        params,
        bitfield,
        width: int,
        height: int,
        camera_matrix,
        focal_length,
        mesh,
        tile: int = 1 << 13,
        background=(0.0, 0.0, 0.0),
        screen_center=(0.5, 0.5),
    ):
        """Frame render with rays sharded over the `rays` mesh axis; params
        and bitfield replicated (the TPU equivalent of the reference's
        multi-GPU render split, SURVEY.md §2.9)."""
        params = self._render_params(params)
        n = width * height
        idx = jnp.arange(n, dtype=jnp.int32)
        px = (idx % width).astype(jnp.float32)
        py = (idx // width).astype(jnp.float32)
        uv = jnp.stack([(px + 0.5) / width, (py + 0.5) / height], axis=-1)
        o, d = uv_to_ray(uv, (width, height), focal_length, camera_matrix, screen_center, self.lens)

        def ray_fn(consts, oo, dd):
            p, bf = consts
            return self.render_rays(p, bf, oo, dd)

        rgb, opacity, depth = self._sharded_ray_fanout(
            mesh, tile, o, d, ray_fn, (params, bitfield)
        )
        rgb = self._background_fill(rgb, opacity, d, params, background)
        rgba = jnp.concatenate([rgb, opacity[:, None]], axis=-1)
        return rgba.reshape(height, width, 4), depth.reshape(height, width)

    # --- evaluation -------------------------------------------------------

    def eval_psnr(self, state, view_indices, spp_background=(0.0, 0.0, 0.0), downscale: int = 1):
        """run.py-protocol PSNR: render at training cameras, compare vs GT
        composited over the background (scripts/run.py:210-268)."""
        params = inference_params(state["opt"], state["params"])
        bf = state["occ"]["bitfield"]
        w, h = self.resolution
        rw, rh = w // downscale, h // downscale
        psnrs = []
        for vi in view_indices:
            rgba, _ = self.render_frame(
                params, bf, rw, rh, self.xforms[vi],
                tuple(np.asarray(self.focals[vi]) / downscale),
                screen_center=tuple(np.asarray(self.principal_points[vi])),
                min_transmittance=1e-4,  # eval protocol (scripts/run.py:230)
            )
            gt = np.asarray(self.images[vi])[::downscale, ::downscale]
            bg = np.asarray(spp_background, np.float32)
            gt_rgb = gt[..., :3] * gt[..., 3:4] + bg * (1.0 - gt[..., 3:4])
            mse = float(np.mean((np.asarray(rgba[..., :3]) - gt_rgb) ** 2))
            psnrs.append(-10.0 * math.log10(max(mse, 1e-12)))
        return float(np.mean(psnrs)), psnrs


def _batched_uv_to_ray(uv, resolution, focal, principal, xform, lens: Lens, distortion_grid=None):
    """Per-ray camera parameters (focal (N,2), principal (N,2), xform (N,3,4))."""
    w, h = resolution
    x = (uv[:, 0] - principal[:, 0]) * w / focal[:, 0]
    y = (uv[:, 1] - principal[:, 1]) * h / focal[:, 1]
    from sienerf_tpu.common import LensMode
    from sienerf_tpu.utils.camera import (
        iterative_opencv_fisheye_undistortion,
        iterative_opencv_lens_undistortion,
    )

    if lens.mode == LensMode.OPENCV and lens.is_distorted:
        x, y = iterative_opencv_lens_undistortion(lens.params, x, y)
    elif lens.mode == LensMode.OPENCV_FISHEYE and lens.is_distorted:
        x, y = iterative_opencv_fisheye_undistortion(lens.params, x, y)
    if distortion_grid is not None:
        from sienerf_tpu.ops.grids import bilinear_sample_2d

        delta = bilinear_sample_2d(distortion_grid, uv)
        x = x + delta[:, 0]
        y = y + delta[:, 1]
    dir_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    rot = xform[:, :3, :3]
    # HIGHEST: ray dirs must be full f32 (ops/exact.py policy)
    dirs = jnp.einsum("nij,nj->ni", rot, dir_cam, precision=jax.lax.Precision.HIGHEST)
    origins = xform[:, :3, 3]
    return origins, dirs


def _apply_se3_delta(xform: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Apply small se(3) deltas to (N,3,4) camera matrices.

    Reference optimizes per-camera rotation/translation with a host-side
    Adam (adam_optimizer.h:25-311); here the deltas are ordinary autodiff
    parameters.  First-order exponential map (deltas stay small):
    R' = (I + [w]_x) R, t' = t + v.
    """
    w = delta[:, :3]
    v = delta[:, 3:]
    zeros = jnp.zeros_like(w[:, 0])
    skew = jnp.stack(
        [
            jnp.stack([zeros, -w[:, 2], w[:, 1]], axis=-1),
            jnp.stack([w[:, 2], zeros, -w[:, 0]], axis=-1),
            jnp.stack([-w[:, 1], w[:, 0], zeros], axis=-1),
        ],
        axis=1,
    )  # (N,3,3)
    R = xform[:, :3, :3]
    R_new = R + jnp.einsum(
        "nij,njk->nik", skew, R, precision=jax.lax.Precision.HIGHEST
    )  # HIGHEST: camera rotations feed ray dirs (ops/exact.py policy)
    t_new = xform[:, :3, 3] + v
    return jnp.concatenate([R_new, t_new[:, :, None]], axis=-1)
