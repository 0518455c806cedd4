"""SDF mode: neural signed-distance fit + sphere-traced rendering.

Behavioral spec: reference src/testbed_sdf.cu —
  generate_training_samples_sdf (:1193-1282): 8-way batch split (4/8 exact
    surface via area-CDF triangle sampling, 3/8 perturbed near-surface, 1/8
    uniform in aabb), targets = BVH ground-truth signed distance;
  SphereTracer (:703-797, advance_pos_kernel_sdf :146-218): iterative
    distance-stepping with self-intersection zero-offset, soft-shadow
    min-visibility for shadow rays;
  shade_kernel_sdf (:295-371): Disney BRDF + sun/sky + checker floor;
  calculate_iou (:1370+): sign agreement on grid samples vs BVH GT.

TPU design: the tracer is a fixed-shape `lax.while_loop` over the ray batch
with per-lane alive masks; the distance callback is either the network (one
dense MLP eval per iteration) or the BVH closest-point query (GT mode).
Normals are the autodiff gradient of the network (the reference's "analytic
normals" path).
"""

from __future__ import annotations

import math
import subprocess
from dataclasses import dataclass, field, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import MeshSdfMode
from sienerf_tpu.geom.bvh import TriangleBVH, build_bvh, bvh_raytrace
from sienerf_tpu.geom.mesh_io import triangle_areas, triangle_normals
from sienerf_tpu.geom.sdf_gt import signed_distance
from sienerf_tpu.models.single_network import (
    SingleNetworkConfig,
    apply_single_network,
    init_single_network,
    l2_mask,
)
from sienerf_tpu.ops.brdf import (
    BRDFParams,
    SUN_COLOR,
    checkerboard_floor_color,
    evaluate_shading,
    sky_ambient,
)
from sienerf_tpu.ops.losses import get_loss
from sienerf_tpu.ops.optim import OptimizerSpec, inference_params, optim_init, optim_step
from sienerf_tpu.utils.bbox import BoundingBox
from sienerf_tpu.utils.camera import uv_to_ray


@dataclass(eq=False)
class SdfEngine:
    net: SingleNetworkConfig
    opt: OptimizerSpec
    loss_otype: str
    aabb: BoundingBox
    triangles: jnp.ndarray  # (T,3,3) normalized mesh
    tri_normals: jnp.ndarray
    tri_cdf: jnp.ndarray  # (T,) area CDF
    bvh_dev: dict
    sdf_mode: MeshSdfMode = MeshSdfMode.WATERTIGHT
    tak_tables: dict | None = None  # Takikawa octree lookup tables (or None)
    # Host-side GT (native C++ sdf_query over the BVH, multithreaded):
    # sampling + signed-distance targets are computed on host threads and
    # fed to a pure network-training jit.  The on-device BVH DFS needs
    # thousands of latency-bound while_loop rounds per batch; a scanned
    # training bundle exceeds the TPU worker watchdog (csrc/sdf_query.cpp).
    # Falls back to the in-graph GT path when the native lib is missing.
    host_gt: bool = True
    bvh_host: object = None  # TriangleBVH (host arrays) for native queries
    cdf_host: np.ndarray | None = None
    batch_size: int = 1 << 16
    surface_offset_std: float = 0.02  # near-surface perturbation scale
    trace_steps: int = 128
    distance_scale: float = 1.0
    zero_offset: float = 0.0
    stop_threshold: float = 1e-4
    shadow_k: float = 8.0
    floor_y: float = -1e9  # disabled unless set
    normals_mode: str = "analytic"  # "analytic" (autodiff) | "fd" (6-tap)

    @staticmethod
    def create(network_config: dict, triangles: np.ndarray, batch_size: int = 1 << 16) -> "SdfEngine":
        net = SingleNetworkConfig.from_network_config(network_config, n_input_dims=3, n_output_dims=1)
        opt = OptimizerSpec.from_network_config(network_config.get("optimizer", {}))
        bvh = build_bvh(triangles)
        tak_tables = None
        if net.takikawa is not None:
            # Build the triangle octree at the configured depth, then rebuild
            # the network config from the *actual* depth (the build can stop
            # early on sparse meshes) so the MLP input width matches —
            # mirroring the reference's octree (re)build + depth re-read in
            # reset_network (testbed.cu:4148-4156).
            from sienerf_tpu.geom.octree import build_triangle_octree, octree_device_tables

            tree = build_triangle_octree(bvh.triangles, net.takikawa.depth)
            if tree.depth <= net.takikawa.starting_level:
                raise ValueError(
                    f"octree depth {tree.depth} <= starting_level {net.takikawa.starting_level}"
                )
            cfg2 = dict(network_config)
            cfg2["encoding"] = {**cfg2.get("encoding", {}), "n_levels": tree.depth}
            net = SingleNetworkConfig.from_network_config(cfg2, n_input_dims=3, n_output_dims=1)
            net = replace(net, takikawa_n_vertices=tree.n_vertices)
            tak_tables = octree_device_tables(tree)
        # area CDF over the BVH-reordered triangle array (what we sample from)
        areas = triangle_areas(bvh.triangles)
        cdf = np.cumsum(areas)
        cdf = cdf / cdf[-1]
        return SdfEngine(
            net=net,
            opt=opt,
            loss_otype=network_config.get("loss", {}).get("otype", "MAPE"),
            aabb=BoundingBox.unit(),
            triangles=jnp.asarray(bvh.triangles),
            tri_normals=jnp.asarray(triangle_normals(bvh.triangles)),
            tri_cdf=jnp.asarray(cdf.astype(np.float32)),
            bvh_dev=bvh.as_device_arrays(),
            tak_tables=tak_tables,
            bvh_host=bvh,
            cdf_host=cdf.astype(np.float32),
            batch_size=batch_size,
        )

    def init(self, seed: int = 1337):
        params = init_single_network(jax.random.PRNGKey(seed), self.net)
        return {"params": params, "opt": optim_init(params, self.opt)}

    # --- sampling ---------------------------------------------------------

    def _sample_surface(self, key, n, geom):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (n,))
        tri_idx = jnp.searchsorted(geom["cdf"], u)
        tri_idx = jnp.clip(tri_idx, 0, geom["triangles"].shape[0] - 1)
        bc = jax.random.uniform(k2, (n, 2))
        r1 = jnp.sqrt(bc[:, 0:1])
        a = 1.0 - r1
        b = bc[:, 1:2] * r1
        tri = jnp.take(geom["triangles"], tri_idx, axis=0)
        return tri[:, 0] + a * (tri[:, 1] - tri[:, 0]) + b * (tri[:, 2] - tri[:, 0])

    def _sample_batch(self, key, geom):
        """Reference 8-way split: 4/8 surface, 3/8 perturbed, 1/8 uniform."""
        n = self.batch_size
        n_surf = n // 2
        n_pert = (3 * n) // 8
        n_unif = n - n_surf - n_pert
        k1, k2, k3, k4 = jax.random.split(key, 4)
        surf = self._sample_surface(k1, n_surf + n_pert, geom)
        pert = surf[n_surf:] + jax.random.normal(k3, (n_pert, 3)) * self.surface_offset_std
        unif = jax.random.uniform(k4, (n_unif, 3))
        pos = jnp.concatenate([surf[:n_surf], pert, unif], axis=0)
        return jnp.clip(pos, 0.0, 1.0)

    # --- host-side batch generation (native GT) ---------------------------

    def _sample_batch_host(self, rng: np.random.Generator) -> np.ndarray:
        """numpy mirror of _sample_batch: 4/8 surface, 3/8 perturbed, 1/8
        uniform (generate_training_samples_sdf, testbed_sdf.cu:1193-1282)."""
        n = self.batch_size
        n_surf = n // 2
        n_pert = (3 * n) // 8
        n_unif = n - n_surf - n_pert
        tris = self.bvh_host.triangles
        u = rng.random(n_surf + n_pert).astype(np.float32)
        tri_idx = np.clip(np.searchsorted(self.cdf_host, u), 0, len(tris) - 1)
        bc = rng.random((n_surf + n_pert, 2)).astype(np.float32)
        r1 = np.sqrt(bc[:, 0:1])
        a = 1.0 - r1
        b = bc[:, 1:2] * r1
        t = tris[tri_idx]
        surf = t[:, 0] + a * (t[:, 1] - t[:, 0]) + b * (t[:, 2] - t[:, 0])
        pert = surf[n_surf:] + rng.normal(size=(n_pert, 3)).astype(np.float32) * self.surface_offset_std
        unif = rng.random((n_unif, 3)).astype(np.float32)
        pos = np.concatenate([surf[:n_surf], pert, unif], axis=0)
        return np.clip(pos, 0.0, 1.0)

    def _host_batches(self, key, n_steps: int):
        from sienerf_tpu.geom.bvh_native import sdf_query

        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        rng = np.random.default_rng(seed)
        mode = 1 if self.sdf_mode != MeshSdfMode.WATERTIGHT else 0
        pos = np.stack([self._sample_batch_host(rng) for _ in range(n_steps)])
        tgt = np.stack([sdf_query(self.bvh_host, p, mode=mode) for p in pos])
        return jnp.asarray(pos), jnp.asarray(tgt)

    # --- training ---------------------------------------------------------

    def train_bundle(self, state, key, n_steps: int = 16):
        if self.host_gt:
            try:
                pos, tgt = self._host_batches(key, n_steps)
                return self._train_bundle_host_jit(state, pos, tgt, self.tak_tables)
            except (ImportError, OSError, FileNotFoundError, RuntimeError, subprocess.CalledProcessError):
                pass  # native lib unavailable: in-graph GT fallback
        geom = {"bvh": self.bvh_dev, "triangles": self.triangles, "cdf": self.tri_cdf, "tak": self.tak_tables}
        return self._train_bundle_jit(state, key, geom, n_steps)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=1)
    def _train_bundle_host_jit(self, state, pos_all, target_all, tak):
        loss_fn = get_loss(self.loss_otype)

        def one(st, batch):
            pos, target = batch

            def loss_of(p):
                pred = apply_single_network(self.net, p, pos, tak)[:, 0]
                return jnp.mean(loss_fn(pred, target))

            loss, grads = jax.value_and_grad(loss_of)(st["params"])
            params, opt = optim_step(self.opt, st["opt"], st["params"], grads, l2_mask(self.net, st["params"]))
            return {"params": params, "opt": opt}, loss

        state, losses = jax.lax.scan(one, state, (pos_all, target_all))
        return state, jnp.mean(losses)

    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=1)
    def _train_bundle_jit(self, state, key, geom, n_steps: int = 16):
        def one(st, k):
            ks, kt = jax.random.split(k)
            pos = self._sample_batch(ks, geom)
            target = signed_distance(geom["bvh"], pos, self.sdf_mode)
            loss_fn = get_loss(self.loss_otype)

            def loss_of(p):
                pred = apply_single_network(self.net, p, pos, geom["tak"])[:, 0]
                return jnp.mean(loss_fn(pred, target))

            loss, grads = jax.value_and_grad(loss_of)(st["params"])
            params, opt = optim_step(self.opt, st["opt"], st["params"], grads, l2_mask(self.net, st["params"]))
            return {"params": params, "opt": opt}, loss

        keys = jax.random.split(key, n_steps)
        state, losses = jax.lax.scan(one, state, keys)
        return state, jnp.mean(losses)

    # --- sphere tracing ---------------------------------------------------

    def _sdf_fn(self, params, tables=None):
        def fn(pos):
            return apply_single_network(self.net, params, pos, tables)[:, 0]

        return fn

    def sphere_trace(self, sdf_fn, origins, dirs, t_init, t_far, track_shadow: bool = False):
        """Masked sphere tracing.  Returns (pos, t, alive->hit mask, n_steps,
        min_visibility)."""
        N = origins.shape[0]

        def cond(st):
            t, alive, steps, prev_d, total_d, min_vis, n_steps = st
            return jnp.any(alive) & (steps < self.trace_steps)

        def body(st):
            t, alive, steps, prev_d, total_d, min_vis, n_steps = st
            pos = origins + t[:, None] * dirs
            d = (sdf_fn(pos) - self.zero_offset) * self.distance_scale
            if track_shadow:
                y = d * d / (2.0 * jnp.maximum(prev_d, 1e-20))
                dd = jnp.sqrt(jnp.maximum(d * d - y * y, 0.0))
                vis = self.shadow_k * dd / jnp.maximum(total_d - y, 1e-20)
                min_vis = jnp.where(alive & (total_d > 0), jnp.minimum(min_vis, vis), min_vis)
                prev_d = jnp.where(alive, d, prev_d)
                total_d = jnp.where(alive, total_d + d, total_d)
            t_new = t + d
            converged = jnp.abs(d) < self.stop_threshold * jnp.maximum(t, 1.0)
            out_of_range = t_new > t_far
            t = jnp.where(alive, jnp.minimum(t_new, t_far), t)
            n_steps = n_steps + alive.astype(jnp.int32)
            alive = alive & ~converged & ~out_of_range
            return t, alive, steps + 1, prev_d, total_d, min_vis, n_steps

        init = (
            t_init,
            jnp.ones((N,), bool),
            jnp.zeros((), jnp.int32),
            jnp.full((N,), 1e20, jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.ones((N,), jnp.float32),
            jnp.zeros((N,), jnp.int32),
        )
        t, alive, _, _, _, min_vis, n_steps = jax.lax.while_loop(cond, body, init)
        pos = origins + t[:, None] * dirs
        hit = t < t_far - 1e-6
        return pos, t, hit, n_steps, jnp.clip(min_vis, 0.0, 1.0)

    def _normals(self, params, pos, tables=None):
        """Analytic normals: autodiff input gradient of the SDF network
        (reference FiniteDifferenceNormalsApproximator is the fallback)."""
        if self.normals_mode == "fd":
            return self._normals_fd(params, pos, tables)
        g = jax.vmap(jax.grad(lambda p: apply_single_network(self.net, params, p[None], tables)[0, 0]))(pos)
        n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        return n

    def _normals_fd(self, params, pos, tables=None, eps: float = 1e-3):
        """6-tap central-difference normals (reference
        FiniteDifferenceNormalsApproximator, testbed.h:425-444 /
        testbed_sdf.cu:823-878): one batched eval of all +-eps taps.  Works
        on packed (bf16) tables where autodiff can't, and matches the
        reference's default normal estimator for hash encodings whose
        analytic gradient is noisy at cell boundaries.

        The taps run the MLP in fp32: the default bf16 input cast quantizes
        positions to ~2e-3 ULPs, which would fold any eps below that into
        pure rounding noise."""
        from sienerf_tpu.models.single_network import encode_input
        from sienerf_tpu.ops.mlp import mlp_apply

        offs = jnp.concatenate([jnp.eye(3) * eps, -jnp.eye(3) * eps])  # (6,3)
        taps = (pos[:, None, :] + offs[None]).reshape(-1, 3)
        feats = encode_input(self.net, params, taps, tables)
        d = mlp_apply(self.net.mlp, params["mlp"], feats, compute_dtype=jnp.float32)
        d = d[:, 0].reshape(-1, 6)
        g = (d[:, :3] - d[:, 3:]) / (2.0 * eps)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    def render_frame(self, params, unused_opt, width, height, camera_matrix, ground_truth=False, render_mode="shade", **kw):
        geom = {"bvh": self.bvh_dev, "tri_normals": self.tri_normals, "tak": self.tak_tables}
        return self._render_frame_jit(params, geom, width, height, camera_matrix, ground_truth, render_mode, **kw)

    @partial(jax.jit, static_argnums=(0, 3, 4, 6, 7))
    def _render_frame_jit(
        self,
        params,
        geom,
        width: int,
        height: int,
        camera_matrix,
        ground_truth: bool = False,
        render_mode: str = "shade",
        focal_scale: float = 1.1,
        sun_dir=(0.577, 0.577, 0.577),
        brdf: BRDFParams = BRDFParams(),
        background=(1.0, 1.0, 1.0),
    ):
        """Sphere-trace (or GT raytrace) a full frame and shade it."""
        fl = (width * focal_scale, width * focal_scale)
        x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
        u, v = jnp.meshgrid(x, y, indexing="xy")
        uv = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
        o, d = uv_to_ray(uv, (width, height), fl, camera_matrix)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tmin, tmax = self.aabb.ray_intersect(o, d)
        t0 = jnp.maximum(tmin, 0.0)
        t1 = jnp.maximum(tmax, t0)

        if render_mode.startswith("slice"):
            # SDF slice plane (testbed_sdf.cu:891-975): skip tracing, eval
            # the SDF where each ray crosses the camera-facing plane at
            # z-depth "slice[:z]" (default: the aabb center's depth), color
            # = tcnn extract_dimension_pos_neg — negative (inside) in red,
            # positive (outside) in green
            parts = render_mode.split(":")
            cam = jnp.asarray(camera_matrix, jnp.float32)
            fwd, cam_pos = cam[:, 2], cam[:, 3]
            if len(parts) > 1:
                zdepth = jnp.asarray(float(parts[1]), jnp.float32)
            else:
                # bf16-ok: default slice-plane depth; any value is a valid default
                zdepth = jnp.dot(fwd, jnp.asarray(self.aabb.center) - cam_pos)
            tp = zdepth / jnp.maximum(jnp.sum(d * fwd, axis=-1), 1e-6)
            pos = o + tp[:, None] * d
            from sienerf_tpu.models.single_network import pack_render_params

            sdf_fn = self._sdf_fn(pack_render_params(self.net, params), geom["tak"])
            val = sdf_fn(pos)
            color = jnp.stack(
                [jnp.maximum(-val, 0.0), jnp.maximum(val, 0.0), jnp.zeros_like(val)],
                axis=-1,
            )
            inb = self.aabb.contains(pos)
            color = jnp.where(inb[:, None], color, jnp.asarray(background))
            depth = jnp.where(inb, tp, jnp.inf)
            return color.reshape(height, width, 3), depth.reshape(height, width)

        sun = jnp.asarray(sun_dir)
        sun = sun / jnp.linalg.norm(sun)

        if ground_truth:
            t, tid, bu, bv = bvh_raytrace(geom["bvh"], o + t0[:, None] * d, d, t1 - t0)
            hit = tid >= 0
            t = jnp.where(hit, t, t1 - t0) + t0
            pos = o + t[:, None] * d
            normals = jnp.take(geom["tri_normals"], jnp.maximum(tid, 0), axis=0)
            normals = normals * jnp.where(jnp.sum(normals * d, axis=-1, keepdims=True) > 0, -1.0, 1.0)
            n_steps = jnp.zeros_like(tid)
            # shadow: any-hit toward sun
            spos = pos + normals * 1e-3
            st, stid, _, _ = bvh_raytrace(geom["bvh"], spos, jnp.broadcast_to(sun, spos.shape))
            shadow = jnp.where(stid >= 0, 0.0, 1.0)
        else:
            # sphere tracing is forward-only: use the bf16-packed table
            # (analytic normals below keep the fp32 path — position
            # gradients can't flow through the packed bitcast gather)
            from sienerf_tpu.models.single_network import pack_render_params

            sdf_fn = self._sdf_fn(pack_render_params(self.net, params), geom["tak"])
            pos, t, hit, n_steps, _ = self.sphere_trace(sdf_fn, o, d, t0, t1)
            normals = self._normals(params, pos, geom["tak"])
            spos = pos + normals * 1e-3
            _, _, shadow_hit, _, min_vis = self.sphere_trace(
                sdf_fn,
                spos,
                jnp.broadcast_to(sun, spos.shape),
                jnp.full(spos.shape[:1], 1e-3, jnp.float32),
                jnp.full(spos.shape[:1], 2.0, jnp.float32),
                track_shadow=True,
            )
            shadow = jnp.where(shadow_hit, 0.0, min_vis)

        view = -d
        up = jnp.asarray([0.0, 1.0, 0.0])
        base = jnp.asarray(brdf.basecolor) ** 2
        amb = jnp.asarray(brdf.ambientcolor) * sky_ambient(normals, up)
        suncol = SUN_COLOR * shadow[:, None]
        if render_mode == "shade":
            color = evaluate_shading(
                jnp.broadcast_to(base, pos.shape),
                amb,
                suncol,
                jnp.broadcast_to(sun, pos.shape),
                view,
                normals,
                metallic=brdf.metallic,
                subsurface=brdf.subsurface,
                specular=brdf.specular,
                roughness=brdf.roughness,
                sheen=brdf.sheen,
                clearcoat=brdf.clearcoat,
                clearcoat_gloss=brdf.clearcoat_gloss,
            )
        elif render_mode == "normals":
            color = 0.5 * normals + 0.5
        elif render_mode == "ao":
            color = jnp.broadcast_to((0.92 ** n_steps.astype(jnp.float32))[:, None], pos.shape)
        elif render_mode == "positions":
            color = (pos - 0.5) / 2.0 + 0.5
        elif render_mode == "depth":
            color = jnp.broadcast_to(t[:, None], pos.shape)
        else:
            raise ValueError(render_mode)

        bg = jnp.asarray(background)
        color = jnp.where(hit[:, None], color, bg)
        depth = jnp.where(hit, t, jnp.inf)
        return color.reshape(height, width, 3), depth.reshape(height, width)

    # --- metrics ----------------------------------------------------------

    def calculate_iou(self, state, resolution: int = 64, n_chunks: int = 8, seed: int = 0):
        """Sign-agreement IoU on stratified grid samples vs BVH ground truth
        (reference calculate_iou, testbed_sdf.cu:1370+)."""
        params = inference_params(state["opt"], state["params"])
        key = jax.random.PRNGKey(seed)
        n = resolution**3
        idx = np.arange(n)
        cells = np.stack([idx % resolution, (idx // resolution) % resolution, idx // resolution**2], axis=-1)
        inter = 0
        union = 0
        chunk = n // n_chunks
        mode = 1 if self.sdf_mode != MeshSdfMode.WATERTIGHT else 0
        use_host = self.host_gt
        for ci in range(n_chunks):
            key, sub = jax.random.split(key)
            c = jnp.asarray(cells[ci * chunk : (ci + 1) * chunk], jnp.float32)
            u = jax.random.uniform(sub, c.shape)
            pos = (c + u) / resolution
            if use_host:
                try:
                    from sienerf_tpu.geom.bvh_native import sdf_query

                    gt = jnp.asarray(sdf_query(self.bvh_host, np.asarray(pos), mode=mode)) < 0
                except (ImportError, OSError, FileNotFoundError, RuntimeError, subprocess.CalledProcessError):
                    use_host = False
                    gt = signed_distance(self.bvh_dev, pos, self.sdf_mode) < 0
            else:
                gt = signed_distance(self.bvh_dev, pos, self.sdf_mode) < 0
            pred = apply_single_network(self.net, params, pos, self.tak_tables)[:, 0] < 0
            inter += int(jnp.sum(gt & pred))
            union += int(jnp.sum(gt | pred))
        return inter / max(union, 1)
