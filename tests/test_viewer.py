"""Interactive viewer: server endpoints + param-change restart
(the reference's progressive restart logic, main.cpp:1666-1780)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from vpt_tpu.render.params import Environment, RenderParams


@pytest.fixture(scope="module")
def viewer_url():
    import dataclasses

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.app import viewer as viewer_mod
    from vpt_tpu.scene.scene import build_scene

    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    params = RenderParams(width=24, height=24, ray_depth=3,
                          max_track_steps=48, max_fused_steps=128,
                          environment_type=int(Environment.CONSTANT))
    port = 18787
    state_holder = {}

    def run():
        state_holder["state"] = viewer_mod.serve(scene, params, port=port)

    # serve() blocks; run it in a thread and shut down cleanly after
    th = threading.Thread(target=run, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{port}"
    for _ in range(120):
        try:
            urllib.request.urlopen(url + "/status", timeout=2)
            break
        except Exception:
            time.sleep(0.5)
    yield url
    # teardown: stop the render loop BEFORE interpreter shutdown (a
    # live jax call on a dying daemon thread aborts the process)
    import vpt_tpu.app.viewer as vm
    st = vm._LAST_STATE
    if st is not None:
        st.running = False
        st.thread.join(timeout=30)


def _get(url):
    return urllib.request.urlopen(url, timeout=30).read()


def test_viewer_serves_page_and_frames(viewer_url):
    page = _get(viewer_url + "/").decode()
    assert "vpt viewer" in page and "sun azimuth" in page
    png = _get(viewer_url + "/frame.png")
    assert png[:4] == b"\x89PNG"
    st = json.loads(_get(viewer_url + "/status"))
    assert st["spp"] >= 0


def test_viewer_param_change_restarts(viewer_url):
    # let it accumulate a few spp
    for _ in range(100):
        if json.loads(_get(viewer_url + "/status"))["spp"] >= 3:
            break
        time.sleep(0.3)
    before = json.loads(_get(viewer_url + "/status"))["spp"]
    assert before >= 3
    _get(viewer_url + "/set?name=density_mult&value=2.0")
    after = json.loads(_get(viewer_url + "/status"))["spp"]
    assert after < before  # accumulation restarted


def test_viewer_camera_orbit(viewer_url):
    """Orbit/pan/zoom rebuild the camera and restart accumulation
    (main.cpp:1105-1129)."""
    import vpt_tpu.app.viewer as vm
    st = vm._LAST_STATE
    eye0 = np.asarray(st.renderer.scene.camera.origin).copy()
    d0 = st.dist
    _get(viewer_url + "/camera?kind=orbit&a=40&b=10")
    eye1 = np.asarray(st.renderer.scene.camera.origin)
    assert not np.allclose(eye0, eye1)
    _get(viewer_url + "/camera?kind=zoom&a=1&b=0")
    assert st.dist > d0
    piv0 = st.pivot.copy()
    _get(viewer_url + "/camera?kind=pan&a=30&b=0")
    assert not np.allclose(piv0, st.pivot)
    # the frame still renders after the camera moves
    assert _get(viewer_url + "/frame.png")[:4] == b"\x89PNG"


def test_viewer_sun_move_rebuilds_env_cdf():
    """Sun azimuth/elevation edits refresh the procedural-sky
    importance CDF (main.cpp:1702-1705 create_cdf rebuild trigger)."""
    import dataclasses

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.app.viewer import ViewerState
    from vpt_tpu.scene.scene import attach_sky_cdf, build_scene

    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    scene = attach_sky_cdf(scene, azimuth=150.0, elevation=30.0)
    params = RenderParams(width=8, height=8, ray_depth=2,
                          max_track_steps=16, max_fused_steps=32,
                          environment_type=int(Environment.ATMOSPHERE))
    vs = ViewerState(scene, params)  # render thread NOT started
    before = np.asarray(vs.renderer.scene.env_cdf.func).copy()
    vs.set_param("azimuth", 250.0)
    after = np.asarray(vs.renderer.scene.env_cdf.func)
    assert not np.allclose(before, after)


def test_viewer_static_selects():
    """Engine / shadow-mode dropdowns re-specialize the params."""
    import dataclasses

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.app.viewer import ViewerState, _slider_html
    from vpt_tpu.scene.scene import build_scene

    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    params = RenderParams(width=8, height=8, ray_depth=2,
                          max_track_steps=16, max_fused_steps=32,
                          environment_type=int(Environment.CONSTANT))
    assert "engine" in _slider_html(params)
    vs = ViewerState(scene, params)
    vs.set_param("engine", "reference")
    assert vs.renderer.params.engine == "reference"
    vs.set_param("shadow_mode", "cached")  # blob scene: cache attaches
    assert vs.renderer.params.shadow_mode == "cached"
    from vpt_tpu.accel.shadow import n_cached_lights
    assert n_cached_lights(vs.renderer.scene.atlas) >= 0


def test_viewer_denoise_display(viewer_url):
    """The denoise select filters the PREVIEW only (the reference's
    one-click OIDN button, main.cpp:1508-1520, 1571-1595): the frame
    stays a valid PNG in every mode and accumulation does NOT restart."""
    import vpt_tpu.app.viewer as vm
    st = vm._LAST_STATE
    page = _get(viewer_url + "/").decode()
    assert ">denoise<" in page or "denoise " in page
    for _ in range(100):
        if json.loads(_get(viewer_url + "/status"))["spp"] >= 2:
            break
        time.sleep(0.3)
    spp_before = json.loads(_get(viewer_url + "/status"))["spp"]
    for mode in ("atrous", "nn", "none"):
        _get(viewer_url + f"/set?name=denoise&value={mode}")
        assert st.denoise == mode
        assert _get(viewer_url + "/frame.png")[:4] == b"\x89PNG"
    assert json.loads(_get(viewer_url + "/status"))["spp"] >= spp_before


# ---- round-5 control parity (VERDICT r4 #6 / main.cpp:1565-1641) ----

def _mini_state(**kw):
    import dataclasses

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.app.viewer import ViewerState
    from vpt_tpu.scene.scene import build_scene
    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    params = RenderParams(width=16, height=16, ray_depth=3,
                          max_track_steps=32, max_fused_steps=64,
                          environment_type=int(Environment.CONSTANT))
    return ViewerState(scene, params, **kw)  # thread NOT started


def test_viewer_aperture_and_dof_view():
    """Aperture slider rebuilds the camera + restarts; view=dof renders
    the focus-band overlay (main.cpp:1601-1604)."""
    st = _mini_state()
    st.renderer.step(1)
    assert st.renderer.iteration == 1
    st.set_param("aperture", "0.5")
    assert st.renderer.iteration == 0  # restarted
    assert float(st.renderer.scene.camera.lens_radius) > 0.0
    st.set_param("view", "dof")
    png = st.frame_png()
    assert png[:4] == b"\x89PNG"


def test_viewer_integrator_and_depth_counts():
    """Integrator select + ray/volume-depth inputs re-specialize the
    params (main.cpp:1573-1585)."""
    from vpt_tpu.render.params import Integrator
    st = _mini_state()
    st.set_param("integrator", "volumetric")
    assert st.renderer.params.integrator == int(Integrator.VOLUMETRIC)
    st.set_param("integrator", "direct")
    st.set_param("ray_depth", "7")
    assert st.renderer.params.ray_depth == 7
    st.set_param("volume_depth", "2")
    assert st.renderer.params.volume_depth == 2
    st.renderer.step(1)  # still renders after the static changes
    assert st.renderer.iteration == 1


def test_viewer_procedural_regen():
    """Noise type/scale/res selects rebuild the grid through the
    launcher callback, keeping the camera (main.cpp:1671-1682)."""
    calls = []

    def rebuild(noise_type, scale, res):
        from vpt_tpu.scene.scene import build_scene
        from vpt_tpu.volume.procedural import create_procedural_grid
        calls.append((noise_type, scale, res))
        grid = create_procedural_grid(vmin=(-4.0,) * 3, vmax=(4.0,) * 3,
                                      res=8.0 / max(res, 4),
                                      noise_type=noise_type, scale=scale)
        return build_scene([grid])

    st = _mini_state(procedural_rebuild=rebuild)
    cam_before = st.renderer.scene.camera
    st.set_param("noise_type", "6")  # turbulence
    assert calls[-1][0] == 6
    st.set_param("noise_scale", "0.2")
    assert calls[-1][1] == pytest.approx(0.2)
    st.set_param("noise_res", "16")
    assert calls[-1][2] == 16
    # camera preserved across the scene swap
    np.testing.assert_array_equal(np.asarray(st.renderer.scene.camera.origin),
                                  np.asarray(cam_before.origin))
    st.renderer.step(1)


def test_viewer_atmosphere_recompute():
    """Luminance/ozone/solar/white-balance selects re-run
    make_atmosphere and swap the LUTs (main.cpp:1709-1732)."""
    import dataclasses

    from vpt_tpu.scene.scene import attach_atmosphere
    from vpt_tpu.sky.bruneton import LutDims
    from vpt_tpu.sky.runtime import make_atmosphere
    tiny = LutDims(transmittance_w=16, transmittance_h=8, r=4, mu=8,
                   mu_s=4, nu=2, irradiance_w=8, irradiance_h=4)
    st = _mini_state(atmo_dims=tiny)
    st.renderer.params = st.renderer.params.replace(
        environment_type=int(Environment.ATMOSPHERE))
    st.renderer.scene = attach_atmosphere(
        st.renderer.scene, atmosphere=make_atmosphere(dims=tiny))
    before = st.renderer.scene.atmosphere
    st.set_param("atmo_solar", "constant")
    after = st.renderer.scene.atmosphere
    assert after is not before
    # constant-solar LUTs genuinely differ from the real-spectrum ones
    a = np.asarray(before.luts.transmittance)
    b = np.asarray(after.luts.transmittance)
    assert not np.allclose(a, b)
