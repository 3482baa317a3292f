"""Interactive progressive viewer — the headless-era equivalent of the
reference's GLFW/ImGui app (main.cpp:1527-1860): a local web page shows
the film refining live; slider changes restart accumulation
(main.cpp:1666-1780), and dynamic-parameter changes re-render WITHOUT
recompiling (they are traced jit inputs, not constants).

Usage:  `vpt view scene.vdb` then open http://localhost:8787
"""

from __future__ import annotations

import dataclasses
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from vpt_tpu.utils.logger import log

# (name, label, min, max, step) — the ImGui slider set (main.cpp:1565-1641)
_DYNAMIC_SLIDERS = [
    ("exposure_scale", "exposure", 0.05, 20.0, 0.05),
    ("azimuth", "sun azimuth", 0.0, 360.0, 1.0),
    ("elevation", "sun elevation", 0.0, 90.0, 0.5),
    ("sun_mult", "sun multiplier", 0.0, 10.0, 0.1),
    ("sky_mult", "sky multiplier", 0.0, 10.0, 0.1),
    ("phase_g1", "phase g1", -0.95, 0.95, 0.01),
    ("density_mult", "density", 0.05, 10.0, 0.05),
    ("emission_scale", "emission", 0.0, 10.0, 0.1),
    ("energy_inject", "energy", 0.0, 5.0, 0.05),
    ("tr_depth", "tr depth", 0.1, 5.0, 0.1),
]

# (name, label, choices) — static-field selects (the reference's
# integrator/denoise combos, main.cpp:1565-1641).  Changing one
# re-specializes the jit on the next step (one-off compile stall, like
# the reference's PTX switch).
_STATIC_SELECTS = [
    ("engine", "engine", ["fused", "reference", "march"]),
    ("integrator", "integrator", ["direct", "volumetric"]),
    ("shadow_mode", "shadow mode", ["tracked", "cached"]),
    # display-only: filters the preview like the reference's one-click
    # OIDN button (main.cpp:1571-1595) — accumulation continues
    # untouched, so switching back to "none" loses nothing
    ("denoise", "denoise", ["none", "atrous", "nn"]),
    # display-only DOF focus-band visualization (render_kernel.cu:
    # 2270-2274 / main.cpp:1601-1604): film.dof_overlay at frame time
    ("view", "view", ["render", "dof"]),
]

# (name, label, min, max) — integer count inputs (the reference's
# ray/volume interaction depth fields, main.cpp:1573-1585).  STATIC
# trace-shaping params: a change recompiles on the next step.
_INT_INPUTS = [
    ("ray_depth", "ray depth", 1, 200),
    ("volume_depth", "volume depth", 1, 8),
]

# procedural-volume regen controls (main.cpp:1671-1682): live noise
# type/scale/resolution rebuild via volume/procedural.py — only
# rendered when the viewer was launched on a procedural scene
_NOISE_NAMES = ["perlin", "simplex", "worley", "fbm_perlin",
                "fbm_perlin_abs", "fractal_simplex", "turbulence",
                "cubic_value", "spots"]

# Bruneton recompute selects (main.cpp:1709-1732): each change re-runs
# make_atmosphere and re-attaches the LUTs — only rendered when the
# scene carries an atmosphere
_ATMO_SELECTS = [
    ("atmo_luminance", "luminance", ["none", "approximate",
                                     "precomputed"]),
    ("atmo_white_balance", "white balance", ["off", "on"]),
    ("atmo_ozone", "ozone", ["on", "off"]),
    ("atmo_solar", "solar spectrum", ["real", "constant"]),
]

_PAGE = """<!doctype html><html><head><title>vpt viewer</title><style>
body{background:#111;color:#ddd;font:13px sans-serif;display:flex;margin:0}
#img{image-rendering:pixelated;margin:12px;border:1px solid #333;
     cursor:grab;user-select:none}
#panel{padding:12px;min-width:280px}
label{display:block;margin-top:8px}
input[type=range]{width:240px}
#stat{color:#8c8;margin-bottom:8px}
#hint{color:#777;font-size:11px;margin-top:10px}
</style></head><body>
<img id="img" width="__W__" height="__H__" draggable="false"/>
<div id="panel"><div id="stat">starting…</div>__SLIDERS__
<button onclick="fetch('/reset')">restart accumulation</button>
<button onclick="window.open('/frame.png')">save frame</button>
<div id="hint">drag: orbit · shift-drag / middle-drag: pan ·
wheel: zoom (the reference's LMB/MMB/scroll camera,
main.cpp:1105-1129)</div>
</div>
<script>
function setp(n,v){document.getElementById('v_'+n).textContent=v;
  fetch('/set?name='+n+'&value='+v);}
async function tick(){
  const s=await (await fetch('/status')).json();
  document.getElementById('stat').textContent=
    s.spp+' spp — '+s.ms_per_spp.toFixed(1)+' ms/spp';
  document.getElementById('img').src='/frame.png?t='+Date.now();
}
setInterval(tick, 700); tick();

// ---- camera controls (orbit / pan / zoom) ----
const img=document.getElementById('img');
let drag=null, cam_dirty=null;
img.addEventListener('mousedown', e=>{
  drag={x:e.clientX, y:e.clientY, pan:(e.button===1||e.shiftKey)};
  e.preventDefault();});
window.addEventListener('mouseup', ()=>{drag=null;});
window.addEventListener('mousemove', e=>{
  if(!drag) return;
  const dx=e.clientX-drag.x, dy=e.clientY-drag.y;
  drag.x=e.clientX; drag.y=e.clientY;
  if(drag.pan) send('pan', dx, dy); else send('orbit', dx, dy);});
img.addEventListener('wheel', e=>{
  send('zoom', e.deltaY>0?1:-1, 0); e.preventDefault();});
let inflight=false;
async function send(kind, a, b){
  if(inflight){cam_dirty=[kind,a,b]; return;}
  inflight=true;
  await fetch('/camera?kind='+kind+'&a='+a+'&b='+b);
  inflight=false;
  if(cam_dirty){const d=cam_dirty; cam_dirty=null; send(...d);}
}
</script></body></html>"""


def _slider_html(params, state=None):
    rows = []
    sliders = list(_DYNAMIC_SLIDERS)
    # aperture is CAMERA state (main.cpp:1601-1604), not a RenderParams
    # field — ViewerState rebuilds the camera on change
    ap = float(state.aperture) if state is not None else 0.0
    rows.append(
        f'<label>aperture <span id="v_aperture">{ap:g}</span><br>'
        f'<input type="range" min="0" max="2" step="0.01" value="{ap}" '
        f"oninput=\"setp('aperture', this.value)\"></label>")
    for name, label, lo, hi, st in sliders:
        val = float(getattr(params, name))
        rows.append(
            f'<label>{label} <span id="v_{name}">{val:g}</span><br>'
            f'<input type="range" min="{lo}" max="{hi}" step="{st}" '
            f'value="{val}" '
            f"oninput=\"setp('{name}', this.value)\"></label>")
    for name, label, lo, hi in _INT_INPUTS:
        val = int(getattr(params, name))
        rows.append(
            f'<label>{label} <span id="v_{name}">{val}</span><br>'
            f'<input type="number" min="{lo}" max="{hi}" value="{val}" '
            f"onchange=\"setp('{name}', this.value)\"></label>")
    from vpt_tpu.render.params import Integrator
    cur_int = ("volumetric" if int(params.integrator)
               == int(Integrator.VOLUMETRIC) else "direct")
    for name, label, choices in _STATIC_SELECTS:
        cur = (cur_int if name == "integrator"
               else getattr(params, name, choices[0]))
        if state is not None and name in ("denoise", "view"):
            cur = getattr(state, name, choices[0])
        opts = "".join(
            f'<option value="{c}"{" selected" if c == cur else ""}>{c}'
            f"</option>" for c in choices)
        rows.append(
            f'<label>{label} <span id="v_{name}"></span><br>'
            f'<select onchange="setp(\'{name}\', this.value)">{opts}'
            f"</select></label>")
    if state is not None and state.procedural_rebuild is not None:
        opts = "".join(f'<option value="{i}"'
                       f'{" selected" if i == state.noise_type else ""}>'
                       f"{n}</option>" for i, n in enumerate(_NOISE_NAMES))
        rows.append(
            f'<label>noise type <span id="v_noise_type"></span><br>'
            f'<select onchange="setp(\'noise_type\', this.value)">{opts}'
            f"</select></label>")
        rows.append(
            f'<label>noise scale <span id="v_noise_scale">'
            f'{state.noise_scale:g}</span><br>'
            f'<input type="range" min="0.005" max="0.5" step="0.005" '
            f'value="{state.noise_scale}" '
            f"oninput=\"setp('noise_scale', this.value)\"></label>")
        rows.append(
            f'<label>noise res <span id="v_noise_res">'
            f'{state.noise_res}</span><br>'
            f'<input type="number" min="16" max="256" '
            f'value="{state.noise_res}" '
            f"onchange=\"setp('noise_res', this.value)\"></label>")
    if state is not None and getattr(state.renderer.scene, "atmosphere",
                                     None) is not None:
        for name, label, choices in _ATMO_SELECTS:
            cur = state.atmo_opts[name]
            opts = "".join(
                f'<option value="{c}"{" selected" if c == cur else ""}>'
                f"{c}</option>" for c in choices)
            rows.append(
                f'<label>{label} <span id="v_{name}"></span><br>'
                f'<select onchange="setp(\'{name}\', this.value)">{opts}'
                f"</select></label>")
    return "\n".join(rows)


class ViewerState:
    """Owns the ProgressiveRenderer + a render thread; param updates
    swap the params pytree and reset the film (the reference's
    change-detection restart, main.cpp:1666-1780).  Camera edits
    (orbit/pan/zoom, main.cpp:1105-1129) rebuild the Camera pytree —
    a traced input, so no recompile."""

    def __init__(self, scene, params, vfov=40.0, aperture=0.0,
                 procedural_rebuild=None, atmo_dims=None):
        import numpy as np

        from vpt_tpu.render.renderer import ProgressiveRenderer
        self.lock = threading.Lock()
        self.renderer = ProgressiveRenderer(scene, params)
        self.ms_per_spp = 0.0
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)
        # spherical orbit state around the scene pivot
        self.vfov = vfov
        self.aperture = aperture
        self.denoise = "none"  # display-only (see _STATIC_SELECTS)
        self.view = "render"   # display-only ("dof" = focus-band viz)
        # procedural live-regen state (main.cpp:1671-1682):
        # procedural_rebuild(noise_type, scale, res) -> new scene
        self.procedural_rebuild = procedural_rebuild
        # defaults mirror default_procedural_grid (fbm perlin at scale
        # 0.01 over a 200^3 box)
        self.noise_type = 3  # NOISE_FBM_PERLIN
        self.noise_scale = 0.01
        self.noise_res = 200
        # Bruneton recompute state (main.cpp:1709-1732)
        self.atmo_dims = atmo_dims
        self.atmo_opts = dict(atmo_luminance="none",
                              atmo_white_balance="off",
                              atmo_ozone="on", atmo_solar="real")
        cam = scene.camera
        eye = np.asarray(cam.origin, np.float64)
        self.pivot = eye - np.asarray(cam.w, np.float64) \
            * float(cam.focus_dist)
        rel = eye - self.pivot
        self.dist = max(float(np.linalg.norm(rel)), 1e-3)
        self.az = float(np.arctan2(rel[0], rel[2]))
        self.el = float(np.arcsin(np.clip(rel[1] / self.dist, -1.0, 1.0)))

    def _rebuild_camera(self):
        import numpy as np

        from vpt_tpu.core.camera import Camera
        ce, se = np.cos(self.el), np.sin(self.el)
        eye = self.pivot + self.dist * np.array(
            [ce * np.sin(self.az), se, ce * np.cos(self.az)])
        cam = Camera.make(eye, self.pivot, vfov=self.vfov,
                          aspect=self.renderer.params.width
                          / self.renderer.params.height,
                          aperture=self.aperture)
        with self.lock:
            self.renderer.scene = dataclasses.replace(
                self.renderer.scene, camera=cam)
            self.renderer.reset()

    def camera_event(self, kind, a, b):
        import numpy as np
        if kind == "orbit":
            self.az -= a * 0.01
            self.el = float(np.clip(self.el + b * 0.01, -1.55, 1.55))
        elif kind == "pan":
            cam = self.renderer.scene.camera
            scale = self.dist * 0.002
            self.pivot = (self.pivot
                          - np.asarray(cam.u, np.float64) * (a * scale)
                          + np.asarray(cam.v, np.float64) * (b * scale))
        elif kind == "zoom":
            self.dist = float(np.clip(self.dist * (1.1 if a > 0 else 1 / 1.1),
                                      1e-3, 1e6))
        else:
            raise KeyError(kind)
        self._rebuild_camera()

    def start(self):
        self.thread.start()

    def _loop(self):
        import jax
        while self.running:
            with self.lock:
                t0 = time.time()
                self.renderer.step(1)
                jax.block_until_ready(self.renderer.film.accum)
                dt = time.time() - t0
            self.ms_per_spp = 0.8 * self.ms_per_spp + 0.2 * dt * 1000 \
                if self.ms_per_spp else dt * 1000
            time.sleep(0.001)

    def _rebuild_procedural(self):
        """Live noise regen (main.cpp:1671-1682): rebuild the grid +
        scene via the launcher-provided callback, keep the camera."""
        new_scene = self.procedural_rebuild(self.noise_type,
                                            self.noise_scale,
                                            self.noise_res)
        with self.lock:
            cam = self.renderer.scene.camera
            self.renderer.scene = dataclasses.replace(new_scene,
                                                      camera=cam)
            self.renderer.reset()

    def _recompute_atmosphere(self):
        """Re-run the Bruneton precompute with the current option set
        and swap the LUTs in (main.cpp:1709-1732 recompute triggers)."""
        from vpt_tpu.scene.scene import attach_atmosphere
        from vpt_tpu.sky.runtime import make_atmosphere
        o = self.atmo_opts
        kw = dict(luminance_mode=o["atmo_luminance"],
                  do_white_balance=o["atmo_white_balance"] == "on",
                  use_ozone=o["atmo_ozone"] == "on",
                  use_constant_solar=o["atmo_solar"] == "constant")
        if self.atmo_dims is not None:
            kw["dims"] = self.atmo_dims
        t0 = time.time()
        atm = make_atmosphere(cache_path=None, **kw)
        log(f"atmosphere recomputed in {time.time()-t0:.1f}s ({kw})")
        with self.lock:
            self.renderer.scene = attach_atmosphere(self.renderer.scene,
                                                    atmosphere=atm)
            if getattr(self.renderer.scene, "sky_cache", None) is not None:
                from vpt_tpu.scene.scene import attach_sky_cache
                self.renderer.scene = attach_sky_cache(
                    self.renderer.scene,
                    azimuth=float(self.renderer.params.azimuth),
                    elevation=float(self.renderer.params.elevation))
            self.renderer.reset()

    def set_param(self, name, value):
        if name in ("denoise", "view"):
            choices = next(s[2] for s in _STATIC_SELECTS if s[0] == name)
            if value not in choices:
                raise KeyError(f"{name}={value}")
            # no lock/reset: these filter/annotate at display time on
            # the accum buffer (the reference's OIDN button also leaves
            # the progressive state alone, main.cpp:1508-1520)
            setattr(self, name, value)
            return
        if name == "aperture":
            self.aperture = max(float(value), 0.0)
            self._rebuild_camera()
            return
        if name == "integrator":
            from vpt_tpu.render.params import Integrator
            code = {"direct": int(Integrator.DIRECT),
                    "volumetric": int(Integrator.VOLUMETRIC)}[value]
            with self.lock:
                self.renderer.params = self.renderer.params.replace(
                    integrator=code)
                self.renderer.reset()
            return
        if name in {s[0] for s in _INT_INPUTS}:
            lo, hi = next((s[2], s[3]) for s in _INT_INPUTS
                          if s[0] == name)
            iv = min(max(int(float(value)), lo), hi)
            with self.lock:
                self.renderer.params = self.renderer.params.replace(
                    **{name: iv})
                self.renderer.reset()
            return
        if name in ("noise_type", "noise_scale", "noise_res"):
            if self.procedural_rebuild is None:
                raise KeyError(f"{name}: not a procedural scene")
            if name == "noise_type":
                self.noise_type = min(max(int(float(value)), 0),
                                      len(_NOISE_NAMES) - 1)
            elif name == "noise_scale":
                self.noise_scale = max(float(value), 1e-4)
            else:
                self.noise_res = min(max(int(float(value)), 8), 512)
            self._rebuild_procedural()
            return
        if name in self.atmo_opts:
            choices = next(s[2] for s in _ATMO_SELECTS if s[0] == name)
            if value not in choices:
                raise KeyError(f"{name}={value}")
            if getattr(self.renderer.scene, "atmosphere", None) is None:
                raise KeyError(f"{name}: scene has no atmosphere")
            self.atmo_opts[name] = value
            self._recompute_atmosphere()
            return
        if name in {s[0] for s in _STATIC_SELECTS}:
            choices = next(s[2] for s in _STATIC_SELECTS if s[0] == name)
            if value not in choices:
                raise KeyError(f"{name}={value}")
            with self.lock:
                if name == "shadow_mode" and value == "cached":
                    # the cached-NEE path needs baked tau channels
                    from vpt_tpu.accel.shadow import attach_shadow_cache
                    try:
                        self.renderer.scene = attach_shadow_cache(
                            self.renderer.scene,
                            azimuth=float(self.renderer.params.azimuth),
                            elevation=float(self.renderer.params.elevation))
                    except Exception as e:  # e.g. multi-instance scene
                        log(f"shadow cache unavailable: {e}", "warning")
                        return
                self.renderer.params = self.renderer.params.replace(
                    **{name: value})
                self.renderer.reset()
            return
        if name not in {s[0] for s in _DYNAMIC_SLIDERS}:
            raise KeyError(name)
        with self.lock:
            self.renderer.params = self.renderer.params.replace(
                **{name: float(value)})
            if name in ("azimuth", "elevation"):
                # directional bakes re-run on sun moves (the reference
                # rebuilds its CPU sky CDF the same way,
                # main.cpp:1702-1705)
                az = float(self.renderer.params.azimuth)
                el = float(self.renderer.params.elevation)
                if self.renderer.params.shadow_mode == "cached":
                    from vpt_tpu.accel.shadow import attach_shadow_cache
                    self.renderer.scene = attach_shadow_cache(
                        self.renderer.scene, azimuth=az, elevation=el)
                if getattr(self.renderer.scene, "sky_cache", None) \
                        is not None:
                    from vpt_tpu.scene.scene import attach_sky_cache
                    self.renderer.scene = attach_sky_cache(
                        self.renderer.scene, azimuth=az, elevation=el)
                from vpt_tpu.render.params import Environment
                if (self.renderer.scene.env_cdf is not None
                        and self.renderer.params.environment_type
                        == int(Environment.ATMOSPHERE)):
                    # keep env importance sampling matched to the sun
                    # (main.cpp:1702-1705 create_cdf rebuild trigger)
                    from vpt_tpu.scene.scene import attach_sky_cdf
                    self.renderer.scene = attach_sky_cdf(
                        self.renderer.scene, azimuth=az, elevation=el)
            self.renderer.reset()

    def reset(self):
        with self.lock:
            self.renderer.reset()

    def frame_png(self) -> bytes:
        import numpy as np
        from PIL import Image
        with self.lock:
            if self.view == "dof":
                from vpt_tpu.render.film import dof_overlay
                img = np.asarray(dof_overlay(
                    self.renderer.film, self.renderer.scene.camera,
                    self.renderer.params.exposure_scale))[::-1]
            elif self.denoise == "none":
                img = self.renderer.display_image()[::-1]
            else:
                from vpt_tpu.render.film import to_display
                film = self.renderer.film
                if self.denoise == "nn":
                    from vpt_tpu.render.denoise_nn import denoise_film
                    den = denoise_film(film)
                else:
                    from vpt_tpu.render.denoise import denoise_image
                    den = denoise_image(film.accum, film.alpha)
                film = dataclasses.replace(film, accum=den)
                img = np.asarray(to_display(
                    film, self.renderer.params.exposure_scale))[::-1]
        buf = io.BytesIO()
        Image.fromarray(np.asarray(img)).save(buf, "PNG")
        return buf.getvalue()

    def status(self) -> dict:
        return dict(spp=self.renderer.iteration,
                    ms_per_spp=self.ms_per_spp)


_LAST_STATE = None  # test hook: clean shutdown of the render thread


def serve(scene, params, host="127.0.0.1", port=8787, open_browser=False,
          procedural_rebuild=None, atmo_dims=None):
    global _LAST_STATE
    state = ViewerState(scene, params,
                        procedural_rebuild=procedural_rebuild,
                        atmo_dims=atmo_dims)
    _LAST_STATE = state
    state.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body, ctype="text/html"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                page = (_PAGE.replace("__W__", str(params.width))
                        .replace("__H__", str(params.height))
                        .replace("__SLIDERS__",
                                 _slider_html(state.renderer.params,
                                              state)))
                self._send(page.encode())
            elif u.path == "/frame.png":
                self._send(state.frame_png(), "image/png")
            elif u.path == "/status":
                self._send(json.dumps(state.status()).encode(),
                           "application/json")
            elif u.path == "/set":
                q = parse_qs(u.query)
                state.set_param(q["name"][0], q["value"][0])
                self._send(b"ok", "text/plain")
            elif u.path == "/camera":
                q = parse_qs(u.query)
                state.camera_event(q["kind"][0], float(q["a"][0]),
                                   float(q["b"][0]))
                self._send(b"ok", "text/plain")
            elif u.path == "/reset":
                state.reset()
                self._send(b"ok", "text/plain")
            else:
                self.send_error(404)

    srv = ThreadingHTTPServer((host, port), Handler)
    log(f"viewer at http://{host}:{port} (ctrl-c to quit)")
    if open_browser:
        import webbrowser
        webbrowser.open(f"http://{host}:{port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state.running = False
    return state
