"""Interactive / offline viewer: the TPU-native replacement for the
reference's ImGui+GLFW front-end (SURVEY.md §7.9).

The reference renders into a GL window with dynamic resolution and optional
foveation (testbed.cu:3103-3167, train_and_render); a TPU behind a network
link cannot own a swapchain, so the viewer is split the TPU way:

- `FrameController` — dynamic-resolution logic re-used from
  utils/dynamic_res.py, but quantized to a small set of precompiled
  resolution RUNGS: under jit every (W, H) is its own executable, so the
  controller picks among ~4 compiled shapes instead of continuously
  rescaling like the CUDA renderer does.
- `render_view` — one camera frame through a Session, optionally foveated:
  the display pixel grid is warped toward the screen center
  (piecewise-quadratic Foveation, common_device.cuh:117-339 semantics), the
  smaller warped grid is rendered as a ray batch, and the result is
  unwarped back to display resolution on host.
- `serve` — a zero-dependency stdlib HTTP server exposing an orbit camera:
  `/` returns an HTML canvas client (drag = orbit, wheel = dolly),
  `/frame?...` renders and returns a PNG plus timing headers.  This is the
  "websocket/offline viewer" tier the blueprint calls for: the canvas
  client polls frames, so no GL and no GUI toolkit on the host.

Offline use (camera-path fly-throughs at a held frame rate) is
tools/orbit_render.py.
"""

from __future__ import annotations

import io
import json
import time
from dataclasses import dataclass, field

import numpy as np

from sienerf_tpu.utils.dynamic_res import DynamicResController, Foveation


@dataclass
class FrameController:
    """Dynamic resolution over precompiled rungs.

    rungs: descending resolution factors; each (base_w*f, base_h*f) shape is
    compiled at most once.  `update` feeds measured frame ms to the
    underlying controller and snaps its factor to the nearest rung.
    """

    base_w: int
    base_h: int
    target_ms: float = 100.0
    rungs: tuple = (1.0, 0.5, 0.25, 0.125)
    ctrl: DynamicResController = field(init=False)
    rung: float = field(init=False)

    def __post_init__(self):
        self.ctrl = DynamicResController(
            target_ms=self.target_ms, min_factor=min(self.rungs)
        )
        self.rung = max(self.rungs)

    def update(self, measured_ms: float) -> float:
        f = self.ctrl.update(measured_ms)
        self.rung = min(self.rungs, key=lambda r: abs(r - f))
        return self.rung

    def resolution(self) -> tuple[int, int]:
        w = max(32, int(self.base_w * self.rung) // 16 * 16)
        h = max(32, int(self.base_h * self.rung) // 16 * 16)
        return w, h


def orbit_camera(center, radius: float, theta: float, phi: float):
    """Spherical orbit camera -> (3,4) camera-to-world matrix.

    theta: azimuth (rad), phi: elevation (rad, 0 = equator).
    """
    from sienerf_tpu.utils.camera import look_at_matrix

    c = np.asarray(center, np.float32)
    eye = c + radius * np.array(
        [np.cos(phi) * np.cos(theta), np.sin(phi), np.cos(phi) * np.sin(theta)],
        np.float32,
    )
    return look_at_matrix(eye, c)


def render_view(
    session,
    camera,
    width: int,
    height: int,
    foveation_density: float = 1.0,
    **kw,
):
    """Render one view -> (H, W, 4) float32, optionally foveated.

    foveation_density > 1 renders a warped grid of
    (W/d_eff, H/d_eff)-equivalent sample cost concentrated at the screen
    center, then resamples to (H, W) — the area-preserving quadratic warp of
    the reference's Foveation applied as a ray-generation remap."""
    import jax.numpy as jnp

    focal = kw.pop("focal", None)
    if focal is None:
        eng = session.engine
        focal = tuple(np.asarray(eng.focals[0]) * width / eng.resolution[0])
    if foveation_density <= 1.0:
        return session.render(width, height, camera, focal, **kw)

    # foveated: render a reduced warped grid as a flat ray batch
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.camera import uv_to_ray

    renderer = kw.pop("renderer", "live")
    eng = session.engine
    fov = Foveation(density=foveation_density, center=0.5)
    rw = max(32, int(width / np.sqrt(foveation_density)) // 16 * 16)
    rh = max(32, int(height / np.sqrt(foveation_density)) // 16 * 16)
    # render-space sample centers -> display-space uv (nonuniform, dense at
    # center); rays are cast at the warped positions
    ur = fov.unwarp((np.arange(rw) + 0.5) / rw)
    vr = fov.unwarp((np.arange(rh) + 0.5) / rh)
    uu, vv = np.meshgrid(ur, vr, indexing="xy")
    uv = jnp.asarray(np.stack([uu, vv], axis=-1).reshape(-1, 2), jnp.float32)
    o, d = uv_to_ray(uv, (width, height), focal, np.asarray(camera, np.float32))
    params = inference_params(session.state["opt"], session.state["params"])
    if renderer == "baked":
        from sienerf_tpu.engines.nerf_baked import render_rays_baked

        grid, meta = getattr(session, "_baked", None) or session.bake()
        session._baked = (grid, meta)
        rgb, op, depth = render_rays_baked(
            eng, params, grid, meta, session.state["occ"]["bitfield"], o, d,
            min_transmittance=kw.get("min_transmittance"),
        )
    else:
        rgb, op, depth = eng.render_rays(
            params, session.state["occ"]["bitfield"], o, d,
            min_transmittance=kw.get("min_transmittance"),
        )
    img = np.asarray(
        jnp.concatenate([rgb, op[:, None]], axis=-1).reshape(rh, rw, 4)
    )
    # unwarp to display res: display uv -> render-space coords, bilinear
    ud = fov.warp((np.arange(width) + 0.5) / width) * rw - 0.5
    vd = fov.warp((np.arange(height) + 0.5) / height) * rh - 0.5
    x0 = np.clip(np.floor(ud).astype(np.int32), 0, rw - 2)
    y0 = np.clip(np.floor(vd).astype(np.int32), 0, rh - 2)
    fx = np.clip(ud - x0, 0, 1)[None, :, None]
    fy = np.clip(vd - y0, 0, 1)[:, None, None]
    a = img[y0][:, x0]
    b = img[y0][:, x0 + 1]
    c2 = img[y0 + 1][:, x0]
    dd = img[y0 + 1][:, x0 + 1]
    return (
        a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) + c2 * (1 - fx) * fy + dd * fx * fy
    ).astype(np.float32)


_PAGE = """<!doctype html>
<html><head><title>sienerf viewer</title><style>
body{margin:0;background:#111;color:#ccc;font:12px monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px}
canvas{display:block;margin:auto}
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: dolly &middot; loading&hellip;</div>
<canvas id="c"></canvas><script>
let th=0.6, ph=0.3, r=2.2, busy=false, t0=0;
const cv=document.getElementById('c'), cx=cv.getContext('2d'),
      hud=document.getElementById('hud');
async function frame(){
  if(busy) return; busy=true; t0=performance.now();
  const res=await fetch(`/frame?theta=${th}&phi=${ph}&r=${r}`);
  const ms=res.headers.get('x-render-ms'), wh=res.headers.get('x-render-res');
  const blob=await res.blob(), img=await createImageBitmap(blob);
  cv.width=img.width; cv.height=img.height; cx.drawImageSmoothingEnabled=true;
  cx.drawImage(img,0,0);
  hud.textContent=`render ${wh} in ${ms} ms (net ${(performance.now()-t0)|0} ms)`;
  busy=false;
}
let drag=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; th+=(e.clientX-lx)*0.01;
  ph=Math.max(-1.4,Math.min(1.4,ph+(e.clientY-ly)*0.01)); lx=e.clientX;ly=e.clientY; frame();};
window.onwheel=e=>{r=Math.max(0.3,r*(e.deltaY>0?1.1:0.9)); frame();};
frame(); setInterval(frame, 250);
</script></body></html>"""


def serve(
    session,
    host: str = "127.0.0.1",
    port: int = 8060,
    width: int = 640,
    height: int = 360,
    target_ms: float = 250.0,
    center=(0.5, 0.5, 0.5),
    **render_kw,
):
    """Serve the interactive orbit viewer (blocking).

    Frame latency through the TPU tunnel sets the floor; the FrameController
    drops resolution rungs until frames meet `target_ms`."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import cv2

    fc = FrameController(width, height, target_ms=target_ms)
    state = {"center": np.asarray(center, np.float32)}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("content-type", "text/html")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path != "/frame":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(u.query)
            theta = float(q.get("theta", [0.6])[0])
            phi = float(q.get("phi", [0.3])[0])
            radius = float(q.get("r", [2.2])[0])
            cam = orbit_camera(state["center"], radius, theta, phi)
            w, h = fc.resolution()
            t0 = time.time()
            rgba = render_view(session, cam, w, h, **render_kw)
            ms = (time.time() - t0) * 1e3
            fc.update(ms)
            img = (np.clip(rgba[..., :3], 0, 1) * 255).astype(np.uint8)
            ok, png = cv2.imencode(".png", img[..., ::-1])
            body = png.tobytes()
            self.send_response(200)
            self.send_header("content-type", "image/png")
            self.send_header("content-length", str(len(body)))
            self.send_header("x-render-ms", f"{ms:.0f}")
            self.send_header("x-render-res", f"{w}x{h}")
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, port), Handler)
    print(f"viewer at http://{host}:{port}/  (ctrl-c to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


def orbit_benchmark(
    session,
    n_frames: int = 24,
    width: int = 640,
    height: int = 360,
    target_ms: float = 250.0,
    center=(0.5, 0.5, 0.5),
    radius: float = 2.2,
    out_dir=None,
    **render_kw,
):
    """Offline orbit holding `target_ms` by resolution scaling.

    Returns the per-frame log [{theta, w, h, ms, rung}, ...] — the demo that
    the dynamic-res controller actually controls something (reference
    behavior: testbed.cu:3103-3143)."""
    fc = FrameController(width, height, target_ms=target_ms)
    logrows = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        cam = orbit_camera(center, radius, theta, 0.3)
        w, h = fc.resolution()
        t0 = time.time()
        rgba = render_view(session, cam, w, h, **render_kw)
        ms = (time.time() - t0) * 1e3
        rung = fc.update(ms)
        logrows.append(
            {"theta": round(theta, 3), "w": w, "h": h, "ms": round(ms, 1), "rung": rung}
        )
        if out_dir is not None:
            import cv2

            img = (np.clip(rgba[..., :3], 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(f"{out_dir}/orbit_{i:03d}.png", img[..., ::-1])
    return logrows
