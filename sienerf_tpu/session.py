"""Session: the user-facing orchestrator (the reference's `Testbed` god-class
and pyngp python surface, re-cut as a thin host object over pure-functional
engines).

Behavioral spec: testbed.h:67-1345 / python_api.cu:263-735 — load_file
(mode sniffing), load_training_data, reload_network_from_file, train(),
render()/render_to_cpu, screenshot, snapshot save/load, mesh export.
"""

from __future__ import annotations

import math
import time
from pathlib import Path

import numpy as np

from sienerf_tpu.common import TestbedMode
from sienerf_tpu.utils import log
from sienerf_tpu.utils.config import default_configs_dir, find_network_config, load_network_config
from sienerf_tpu.utils.timers import PhaseTimers


def mode_from_scene(path: str | Path) -> TestbedMode:
    """Scene-type sniffing (reference common_host.cu:146-166)."""
    p = Path(path)
    name = str(p).lower()
    if p.is_dir():
        if any(p.glob("transforms*.json")):
            return TestbedMode.NERF
        raise ValueError(
            f"scene directory {path} has no transforms*.json (NeRF scenes are "
            "directories containing a transforms.json; other modes are files)"
        )
    if name.endswith("transforms.json"):
        return TestbedMode.NERF
    if "geometry" in Path(name).name and name.endswith(".json"):
        return TestbedMode.GEOMETRY
    ext = p.suffix.lower()
    if ext in (".exr", ".png", ".jpg", ".jpeg", ".bin"):
        return TestbedMode.IMAGE
    if ext in (".obj", ".stl"):
        return TestbedMode.SDF
    if ext == ".nvdb":
        return TestbedMode.VOLUME
    if ext == ".json":
        return TestbedMode.NERF  # transforms json
    if ext in (".ingp", ".snap", ".msgpack"):
        return TestbedMode.NONE  # snapshot: mode from file content
    raise ValueError(f"cannot infer mode from scene {path}")


def _is_reference_snapshot(path: str | Path) -> bool:
    """Sniff a reference `.ingp`/msgpack snapshot vs our native container.
    Both are zlib'd msgpack maps; the reference nests state under a
    "snapshot" key (testbed.cu:5220), ours under "state"."""
    import zlib

    try:
        raw = Path(path).read_bytes()
        if raw[:1] == b"\x78":
            raw = zlib.decompress(raw)
        from sienerf_tpu.io import msgpack_lite

        top = msgpack_lite.unpack(raw)
        return isinstance(top, dict) and "snapshot" in top and "state" not in top
    except Exception:
        return False


class Session:
    """Holds one engine + training state + host-side loop bookkeeping."""

    def __init__(self, configs_dir: str | Path | None = None, seed: int = 1337):
        self.configs_dir = Path(configs_dir) if configs_dir else default_configs_dir()
        self.mode = TestbedMode.NONE
        self.engine = None
        self.state = None
        self.seed = seed
        self.network_config: dict = {}
        self.timers = PhaseTimers()
        self.loss = float("nan")
        self.loss_graph: list[float] = []
        self.training_step = 0
        self._rng_key = None

    # --- loading ------------------------------------------------------------

    def load_file(self, scene: str | Path, network: str | None = None, **engine_kwargs):
        self._baked = None  # any cached bake belongs to the previous scene
        self._scene = scene
        self._engine_kwargs = dict(engine_kwargs)
        self.mode = mode_from_scene(scene)
        self.training_step = 0
        self.loss = float("nan")
        self.loss_graph = []
        cfg_path = Path(network) if network else find_network_config(self.configs_dir, self.mode.value)
        self.network_config = load_network_config(cfg_path)
        log.info(f"mode={self.mode.value}, network config={cfg_path}")

        import jax

        self._rng_key = jax.random.PRNGKey(self.seed)

        if self.mode == TestbedMode.IMAGE:
            from sienerf_tpu.engines.image import ImageEngine
            from sienerf_tpu.io.image_io import load_image

            img = load_image(scene, as_float_linear=str(scene).endswith(".exr"))
            self.engine = ImageEngine.create(self.network_config, img, **engine_kwargs)
            params, opt = self.engine.init(self.seed)
            self.state = {"params": params, "opt": opt}
        elif self.mode == TestbedMode.NERF:
            from sienerf_tpu.engines.nerf import NerfEngine
            from sienerf_tpu.io.nerf_dataset import load_nerf_dataset

            ds = load_nerf_dataset(scene, **{k: v for k, v in engine_kwargs.items() if k in ("downscale", "max_images", "split")})
            ekw = {k: v for k, v in engine_kwargs.items()
                   if k in ("train_batch_size", "grid_size", "train_k",
                            "near_density_reg", "near_reg_fraction")}
            self.engine = NerfEngine.create(self.network_config, ds, **ekw)
            self.state = self.engine.init(self.seed)
            self.dataset = ds
        elif self.mode == TestbedMode.SDF:
            from sienerf_tpu.engines.sdf import SdfEngine
            from sienerf_tpu.geom.mesh_io import load_mesh, normalize_to_unit_cube

            tri = normalize_to_unit_cube(load_mesh(scene), scale_margin=0.9)
            self.engine = SdfEngine.create(self.network_config, tri, **engine_kwargs)
            self.state = self.engine.init(self.seed)
        elif self.mode == TestbedMode.VOLUME:
            from sienerf_tpu.engines.volume import VolumeEngine
            from sienerf_tpu.io.nanovdb import read_nanovdb

            vol = read_nanovdb(scene)
            self.engine = VolumeEngine.create(self.network_config, vol, **engine_kwargs)
            self.state = self.engine.init(self.seed)
        elif self.mode == TestbedMode.GEOMETRY:
            from sienerf_tpu.engines.geometry import GeometryEngine

            self.engine = GeometryEngine.load_scene(scene, **engine_kwargs)
            n = self.engine.load_nerf_objects()  # snapshot-backed NeRF objects
            if n:
                log.info(f"loaded {n} NeRF object snapshot(s)")
            self.state = {}
        else:
            raise ValueError(self.mode)
        return self

    def reload_network_from_file(self, network: str | Path | None = None):
        """Re-read the network config and reset engine + training state,
        keeping the loaded scene (reference Testbed::reload_network_from_file,
        testbed.cu:3860-3928 / python_api.cu binding) — pass a path to switch
        configs, or nothing to re-resolve the default for the current mode."""
        scene = getattr(self, "_scene", None)
        if scene is None:
            raise RuntimeError("load_file first")
        return self.load_file(
            scene,
            network=str(network) if network else None,
            **getattr(self, "_engine_kwargs", {}),
        )

    # --- training -----------------------------------------------------------

    def train(self, n_steps: int, log_every: int = 256):
        """Train in bundles; mirrors the reference CLI loop
        (main.cu:190-196: `iteration=... loss=...` prints)."""
        import jax

        if self.mode == TestbedMode.GEOMETRY:
            raise RuntimeError("geometry scenes train their NeRF objects separately")
        if isinstance(self.state, dict) and self.state.get("opt") == {}:
            raise RuntimeError(
                "cannot train from a render-only snapshot (no optimizer state)"
            )
        bundle = getattr(self.engine, "grid_interval", 16)
        done = 0
        while done < n_steps:
            self._rng_key, sub = jax.random.split(self._rng_key)
            with self.timers.phase("train"):
                if self.mode == TestbedMode.IMAGE:
                    p, o, loss = self.engine.train_step(self.state["params"], self.state["opt"], sub)
                    self.state = {"params": p, "opt": o}
                    done += 1
                elif self.mode == TestbedMode.NERF:
                    self.state, loss, _ = self.engine.train_bundle(self.state, sub)
                    done += bundle
                else:
                    self.state, loss = self.engine.train_bundle(self.state, sub)
                    done += 16
                # sync inside the timed region: dispatch is async and
                # block_until_ready can return early through device tunnels
                self.loss = float(loss)
            self.loss_graph.append(self.loss)
            self.training_step += bundle if self.mode == TestbedMode.NERF else 16
            if done % log_every < bundle:
                log.info(f"iteration={self.training_step} loss={self.loss:.6f} {self.timers.summary()}")
        return self.loss

    # --- rendering ----------------------------------------------------------

    def bake(self, resolution: int = 256, mode: str = "nearest", row_bits: int = 16):
        """Bake the trained NeRF into a render-side feature grid (NeRF mode
        only; engines/nerf_baked.py).  Cached until the next bake() call —
        re-bake after further training.  render(renderer="baked") uses it."""
        from sienerf_tpu.ops.optim import inference_params

        if self.mode != TestbedMode.NERF:
            raise RuntimeError("bake() is a NeRF-mode operation")
        params = inference_params(self.state["opt"], self.state["params"])
        self._baked = self.engine.bake_features(
            params, self.state["occ"], resolution=resolution, mode=mode,
            row_bits=row_bits,
        )
        return self._baked

    def render(self, width: int, height: int, camera_matrix=None, focal=None, spp: int = 1, **kw):
        """Offscreen render -> numpy (H, W, 4) (pyngp Testbed.render)."""
        from sienerf_tpu.ops.optim import inference_params

        if self.mode != TestbedMode.NERF and kw.get("renderer", "live") != "live":
            raise ValueError(
                f"renderer={kw['renderer']!r} is NeRF-only (mode is {self.mode.value})"
            )
        if self.mode == TestbedMode.IMAGE:
            out = self.engine.render(self.state["params"], self.state["opt"], width, height)
            out = np.asarray(out)
            if out.shape[-1] == 3:
                out = np.concatenate([out, np.ones_like(out[..., :1])], axis=-1)
            return out
        if self.mode == TestbedMode.NERF:
            import jax.numpy as jnp

            from sienerf_tpu.ops.samplers import ld_pixel_offset
            from sienerf_tpu.utils.camera import camera_slerp

            params = inference_params(self.state["opt"], self.state["params"])
            if camera_matrix is None:
                camera_matrix = self.engine.xforms[0]
                focal = tuple(np.asarray(self.engine.focals[0]) * width / self.engine.resolution[0])
                kw.setdefault("screen_center", tuple(np.asarray(self.engine.principal_points[0])))
            # spp accumulation with optional motion-blur camera interpolation
            # (reference render_to_cpu, python_api.cu:124-233: each sample
            # renders at a camera slerped toward `camera_matrix_end` and a
            # low-discrepancy subpixel offset, then frames average linearly
            # via the accumulate buffer, render_buffer.cu)
            start = np.asarray(camera_matrix, np.float32)
            end = np.asarray(kw.pop("camera_matrix_end", start), np.float32)
            renderer = kw.pop("renderer", "live")
            bake_res = kw.pop("bake_resolution", 256)
            bake_mode = kw.pop("bake_mode", "nearest")
            # latent-appearance render view (pyngp
            # rendering_extra_dims_from_training_view; reference
            # get_rendering_extra_dims testbed_nerf.cu:3706-3716) — the
            # engine defaults to view 0's code; a non-zero selection is
            # threaded as an explicit row (live renderer only)
            ev = int(getattr(self, "rendering_extra_dims_from_training_view", 0))
            if (
                ev > 0 and renderer == "live"
                and "extra_dims" in params and "extra_row" not in kw
            ):
                kw["extra_row"] = params["extra_dims"][ev]
            if renderer in ("baked", "sweep"):
                baked = getattr(self, "_baked", None)
                if baked is None:
                    baked = self.bake(resolution=bake_res, mode=bake_mode)
            spp = max(int(spp), 1)
            acc = None
            for i in range(spp):
                frac = (i + 0.5) / spp
                cam_i = (
                    np.asarray(camera_slerp(start[None], end[None], np.asarray([frac]))[0])
                    if not np.allclose(start, end)
                    else start
                )
                off = (
                    jnp.asarray(ld_pixel_offset(i), jnp.float32)
                    if spp > 1
                    else None
                )
                if renderer == "sweep":
                    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep

                    grid, meta = baked
                    # spp>1: stratified slab-phase jitter — the sweep's
                    # along-axis quadrature samples plane x + phi*pitch per
                    # pass (the deterministic sweep gains nothing from
                    # subpixel jitter alone; live averages jittered
                    # t-chains, this is the slab-space equivalent)
                    # packed (H, W*5) boundary layout: the (H, W, 4)
                    # output costs ~67 ms/frame in tile-pad conversion
                    out5 = render_frame_sweep(
                        self.engine, params, grid, meta, cam_i,
                        tuple(np.asarray(focal, np.float32)),
                        width=width, height=height, pixel_offset=off,
                        axis_phase=(
                            jnp.float32((i + 0.5) / spp) if spp > 1 else None),
                        packed=True, **kw
                    )
                    rgba = np.moveaxis(np.asarray(out5), 0, -1)[..., :4]
                elif renderer == "baked":
                    from sienerf_tpu.engines.nerf_baked import render_frame_baked

                    grid, meta = baked
                    rgba, depth = render_frame_baked(
                        self.engine, params, self.state["occ"]["bitfield"], grid,
                        cam_i, tuple(np.asarray(focal, np.float32)),
                        width=width, height=height,
                        resolution=meta["resolution"], mode=meta["mode"],
                        n_cascades=meta["n_cascades"],
                        pixel_offset=off,
                        # spp>1: stratified chain-phase jitter (dithers the
                        # deterministic closed-form candidate lattice)
                        t_phase=(
                            jnp.float32((i + 0.5) / spp) if spp > 1 else None),
                        **kw
                    )
                else:
                    rgba, depth = self.engine.render_frame(
                        params, self.state["occ"]["bitfield"], width, height,
                        cam_i, tuple(np.asarray(focal, np.float32)),
                        pixel_offset=off, **kw
                    )
                a = np.asarray(rgba, np.float64)
                acc = a if acc is None else acc + a
            return (acc / spp).astype(np.float32)
        if self.mode == TestbedMode.SDF:
            from sienerf_tpu.ops.optim import inference_params as ip

            params = ip(self.state["opt"], self.state["params"])
            img, depth = self.engine.render_frame(params, None, width, height, camera_matrix, **kw)
            return np.concatenate([np.asarray(img), np.ones((height, width, 1), np.float32)], axis=-1)
        if self.mode == TestbedMode.VOLUME:
            params = inference_params(self.state["opt"], self.state["params"])
            rgb, a = self.engine.render_frame(params, width, height, camera_matrix, focal or (width, width), **kw)
            return np.concatenate([rgb, a[..., None]], axis=-1)
        if self.mode == TestbedMode.GEOMETRY:
            rgba, depth = self.engine.render_frame(width, height, camera_matrix, focal or (width, width), **kw)
            return rgba
        raise ValueError(self.mode)

    # --- snapshots ----------------------------------------------------------

    def save_snapshot(self, path: str | Path):
        from sienerf_tpu.io.snapshot import save_snapshot

        meta = {"mode": self.mode.value, "training_step": self.training_step}
        phase = getattr(self.engine, "_phase", None)
        if phase is not None:
            meta["train_phase"] = phase
        mean = getattr(self.engine, "_mean_samples", None)
        if mean:
            meta["mean_samples"] = float(mean)
        save_snapshot(path, self.state, self.network_config, meta)
        log.success(f"saved snapshot {path}")

    def load_snapshot(self, path: str | Path):
        import jax

        self._baked = None  # cached bake belongs to the previous state

        if _is_reference_snapshot(path):
            from sienerf_tpu.engines.nerf import NerfEngine

            ds = getattr(self, "dataset", None)
            self.engine, self.state = NerfEngine.from_ingp(path, dataset=ds)
            self.mode = TestbedMode.NERF
            self.training_step = int(self.state["step"])
            if self._rng_key is None:
                self._rng_key = jax.random.PRNGKey(self.seed)
            log.success(f"imported reference snapshot {path} (step {self.training_step})")
            return {"state": self.state}

        from sienerf_tpu.io.snapshot import load_snapshot

        payload = load_snapshot(path)
        import jax.numpy as jnp

        if str(payload.get("meta", {}).get("kind", "")).startswith("render_only"):
            # render-only snapshot (tools/export_render_snapshot.py): EMA
            # inference params + occupancy bitfield, no optimizer moments.
            # Enough for every renderer (live/baked/sweep) and the protocol
            # evals; training from one is not supported.
            from sienerf_tpu.io.snapshot import load_render_snapshot

            params, bitfield, smeta = load_render_snapshot(path)
            step = int(smeta["step"])
            self.state = {
                "opt": {},
                "params": params,
                "occ": {"bitfield": bitfield},
                "step": jnp.asarray(step, jnp.int32),
            }
            self.training_step = step
            if self.engine is not None:
                self.engine._phase = smeta.get("phase", "fast")
                if smeta.get("mean_samples"):
                    self.engine._mean_samples = float(smeta["mean_samples"])
            if self._rng_key is None:
                self._rng_key = jax.random.PRNGKey(self.seed)
            log.success(
                f"loaded render-only snapshot {path} (step {step}; eval/render only)"
            )
            return payload

        self.state = jax.tree.map(jnp.asarray, payload["state"])
        self.training_step = int(payload["meta"].get("training_step", 0))
        if self.engine is not None and "train_phase" in payload["meta"]:
            self.engine._phase = payload["meta"]["train_phase"]
        if self.engine is not None and "mean_samples" in payload["meta"]:
            self.engine._mean_samples = float(payload["meta"]["mean_samples"])
        if self._rng_key is None:
            # resume-from-snapshot without a prior load_file: seed the train
            # key off the restored step so a resumed run doesn't replay the
            # exact pre-checkpoint sample sequence
            self._rng_key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), self.training_step
            )
        log.success(f"loaded snapshot {path} (step {self.training_step})")
        return payload

    # --- evaluation overlays ---------------------------------------------------

    def compare_view(self, view_index: int = 0, downscale: int = 1):
        """Render a training view and return (pred, gt, error_overlay, psnr)
        — the reference's GT-overlay / false-color error oracle
        (render_frame_epilogue, testbed.cu:4977-5087)."""
        import jax.numpy as jnp

        from sienerf_tpu.metrics import psnr as psnr_of
        from sienerf_tpu.ops.tonemap import error_overlay

        if self.mode != TestbedMode.NERF:
            raise RuntimeError("compare_view is NeRF-mode only")
        eng = self.engine
        w, h = eng.resolution[0] // downscale, eng.resolution[1] // downscale
        from sienerf_tpu.ops.optim import inference_params

        params = inference_params(self.state["opt"], self.state["params"])
        rgba, _ = eng.render_frame(
            params, self.state["occ"]["bitfield"], w, h,
            eng.xforms[view_index],
            tuple(np.asarray(eng.focals[view_index]) / downscale),
            screen_center=tuple(np.asarray(eng.principal_points[view_index])),
        )
        pred = np.asarray(rgba[..., :3])
        gt = eng.images[view_index][::downscale, ::downscale, :3]
        err = np.asarray(error_overlay(jnp.asarray(pred), jnp.asarray(gt)))
        return pred, gt, err, psnr_of(pred, gt)

    # --- mesh export ----------------------------------------------------------

    def optimise_mesh_step(
        self,
        n_steps: int = 1,
        smooth_amount: float = 2048.0,
        density_amount: float = 128.0,
        inflate_amount: float = 1.0,
    ):
        """Refine the stored in-memory mesh (set by pyngp
        compute_marching_cubes_mesh) toward the model's density
        iso-surface: Testbed::optimise_mesh_step, testbed_nerf.cu:3448-3500
        — Adam on vertex positions with density-sign, laplacian-smoothing
        and inflation terms (amount defaults testbed.h:805-807).  Returns
        the updated vertices."""
        from sienerf_tpu.ops.meshing import optimise_mesh
        from sienerf_tpu.ops.optim import inference_params

        mesh = getattr(self, "mesh", None)
        if not mesh or not len(mesh.get("verts", ())):
            raise RuntimeError("no in-memory mesh: compute_marching_cubes_mesh first")
        params = inference_params(self.state["opt"], self.state["params"])
        if self.mode == TestbedMode.NERF:
            dfn = self.engine._density_fn(params)
        elif self.mode == TestbedMode.SDF:
            from sienerf_tpu.models.single_network import apply_single_network

            dfn = lambda unit: apply_single_network(self.engine.net, params, unit)[:, 0]
        else:
            raise RuntimeError(f"mesh optimization unsupported for mode {self.mode}")
        mesh["verts"] = optimise_mesh(
            dfn, mesh["verts"], mesh["faces"], mesh["amin"], mesh["adiag"],
            n_steps=n_steps, thresh=mesh.get("thresh", 2.5),
            smooth_amount=smooth_amount, density_amount=density_amount,
            inflate_amount=inflate_amount,
        )
        return mesh["verts"]

    def save_mesh(self, path: str | Path, resolution: int = 256, thresh: float = 2.5,
                  with_colors: bool = True):
        """Marching-cubes-equivalent export (reference --save_mesh,
        marching_cubes.cu).  NeRF meshes carry per-vertex colors: the color
        branch evaluated looking along the inward surface normal (the
        reference's compute_mesh_vertex_colors convention) — normals from a
        6-tap central difference of the density field."""
        import jax.numpy as jnp

        from sienerf_tpu.geom.mesh_io import save_obj, save_ply
        from sienerf_tpu.ops.meshing import extract_mesh
        from sienerf_tpu.ops.optim import inference_params

        params = inference_params(self.state["opt"], self.state["params"])
        if self.mode == TestbedMode.NERF:
            dfn = self.engine._density_fn(params)
            iso = thresh
            amin, adiag = self.engine.aabb.min, self.engine.aabb.diag
        elif self.mode == TestbedMode.SDF:
            from sienerf_tpu.models.single_network import apply_single_network

            dfn = lambda unit: apply_single_network(self.engine.net, params, unit)[:, 0]
            iso = 0.0
            amin, adiag = np.zeros(3, np.float32), np.ones(3, np.float32)
        else:
            raise RuntimeError(f"mesh export unsupported for mode {self.mode}")

        color_fn = None
        if with_colors and self.mode == TestbedMode.NERF:
            from sienerf_tpu.models.nerf_network import apply_rgb_activation, nerf_apply

            amin_j = jnp.asarray(amin, jnp.float32)
            adiag_j = jnp.asarray(adiag, jnp.float32)
            eng = self.engine

            def color_fn(world):
                unit = jnp.clip((world - amin_j) / adiag_j, 0.0, 1.0)
                eps = 1.0 / resolution
                offs = jnp.concatenate([jnp.eye(3) * eps, -jnp.eye(3) * eps])
                taps = jnp.clip(unit[:, None, :] + offs[None], 0.0, 1.0)
                d6 = dfn(taps.reshape(-1, 3)).reshape(-1, 6)
                g = d6[:, :3] - d6[:, 3:]
                nrm = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
                view = nrm  # look along the inward normal (density increases inward)
                ex = eng._render_extra(params)
                if ex is not None:
                    ex = jnp.broadcast_to(ex, unit.shape[:-1] + ex.shape)
                rgb_raw, _ = nerf_apply(
                    eng.net, params, unit, (view + 1.0) * 0.5, extra=ex
                )
                rgb = apply_rgb_activation(rgb_raw, eng.net.rgb_activation)
                return jnp.concatenate([rgb, -nrm], axis=-1)  # colors + outward normals

        verts, faces, cn = extract_mesh(dfn, resolution, amin, adiag, iso=iso, color_fn=color_fn)
        colors = normals = None
        if cn is not None:
            colors, normals = cn[:, :3], cn[:, 3:]
        if str(path).endswith(".ply"):
            save_ply(path, verts, faces, colors, normals)
        else:
            save_obj(path, verts, faces, colors, normals)
        log.success(
            f"saved mesh {path}: {len(verts)} verts, {len(faces)} faces"
            + (", with colors+normals" if colors is not None else "")
        )
        return verts, faces
