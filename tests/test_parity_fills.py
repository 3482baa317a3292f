"""Small reference-parity fills: geometry_list/sphere_light, the
double-HG config switch, the leveled logger, and the Houdini-side
.ins emitter."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.render.params import Environment, RenderParams


def test_geometry_list_nearest_hit_and_light():
    """geometry_list::intersect nearest-hit scan (geometry.h:243-264)
    and sphere_light emission (geometry.h:174-235)."""
    from vpt_tpu.scene.geometry import (SphereList, geometry_list_intersect,
                                        geometry_list_shade)
    lst = SphereList.make(
        centers=[[0, 0, 5], [0, 0, 9], [3, 0, 5]],
        radii=[1.0, 1.0, 0.5],
        colors=[[1, 0, 0], [0, 1, 0], [5, 5, 5]],
        is_light=[False, False, True])
    pos = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    idx, t = geometry_list_intersect(lst, pos, d)
    np.testing.assert_array_equal(np.asarray(idx), [0, 2, -1])
    np.testing.assert_allclose(np.asarray(t)[:2], [4.0, 4.5], rtol=1e-5)
    npos, ndir, atten, emit = geometry_list_shade(
        lst, idx, pos, d, t, jax.random.PRNGKey(0))
    assert bool(emit[1]) and not bool(emit[0])  # sphere_light emits
    np.testing.assert_allclose(np.asarray(atten)[1], [5, 5, 5])
    # diffuse bounce leaves the surface along the normal hemisphere
    n0 = np.asarray(npos)[0] - np.array([0, 0, 5])
    assert np.dot(np.asarray(ndir)[0], n0) > 0


def test_double_hg_switch_changes_phase():
    """use_double_hg routes integrand evaluation through the two-lobe
    blend (render_kernel.cu:278-287)."""
    from vpt_tpu.core.phase import (double_henyey_greenstein,
                                    henyey_greenstein, phase_eval)
    p1 = RenderParams().replace(phase_g1=0.6, phase_g2=-0.3, phase_f=0.25)
    p2 = RenderParams(use_double_hg=True).replace(
        phase_g1=0.6, phase_g2=-0.3, phase_f=0.25)
    cos = jnp.linspace(-1, 1, 16)
    np.testing.assert_allclose(
        np.asarray(phase_eval(p1, cos)),
        np.asarray(henyey_greenstein(cos, p1.phase_g1)))
    np.testing.assert_allclose(
        np.asarray(phase_eval(p2, cos)),
        np.asarray(double_henyey_greenstein(cos, 0.25, 0.6, -0.3)))
    assert not np.allclose(np.asarray(phase_eval(p1, cos)),
                           np.asarray(phase_eval(p2, cos)))


def test_double_hg_render_finite():
    """End-to-end fused render with the double lobe enabled."""
    from tests.test_scenarios import _blob_grid, _cam_for
    import dataclasses
    from vpt_tpu.render.renderer import ProgressiveRenderer
    from vpt_tpu.scene.scene import build_scene
    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    p = RenderParams(width=24, height=24, ray_depth=4, max_track_steps=64,
                     max_fused_steps=256, use_double_hg=True,
                     environment_type=int(Environment.CONSTANT)).replace(
        phase_g1=0.5, phase_g2=-0.4, phase_f=0.6)
    film = ProgressiveRenderer(scene, p).render(4)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all() and a.mean() > 0


def test_logger_levels(capsys):
    from vpt_tpu.utils import logger
    old = logger.get_level()
    try:
        logger.set_level(logger.VPT_WARNING)
        logger.log("should-not-appear", logger.VPT_LOG)
        logger.log("warn-appears", logger.VPT_WARNING)
        logger.log("err-appears", logger.VPT_ERROR)
    finally:
        logger.set_level(old)
    err = capsys.readouterr().err
    assert "should-not-appear" not in err
    assert "warn-appears" in err and "err-appears" in err


def test_houdini_emitter_roundtrip():
    """points_to_ins (file_IO.cpp semantics) -> write_ins -> read_ins
    round trip, including the N/up frame fallback."""
    from vpt_tpu.dcc.houdini_rop import _quat_from_zup, points_to_ins
    from vpt_tpu.scene.ins import read_ins, write_ins
    files = ["b.vdb", "a.vdb", "b.vdb"]
    P = np.array([[0, 0, 0], [1, 2, 3], [4, 5, 6]], np.float64)
    ins = points_to_ins(files, P, pscale=[1.0, 2.0, 0.5],
                        N=[[0, 0, 1]] * 3, up=[[0, 1, 0]] * 3)
    assert [v.vdb_file for v in ins.volumes] == ["a.vdb", "b.vdb"]  # sorted
    assert ins.volumes[0].instances.shape == (1, 8)
    assert ins.volumes[1].instances.shape == (2, 8)
    # identity frame (N=+z, up=+y) -> identity quaternion
    np.testing.assert_allclose(ins.volumes[0].instances[0, 3:7],
                               [0, 0, 0, 1], atol=1e-12)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.ins")
        write_ins(path, ins)
        back = read_ins(path)
    np.testing.assert_allclose(back.volumes[1].instances,
                               ins.volumes[1].instances, rtol=1e-5)
    # quaternion from a rotated frame is unit and rotates z onto N
    q = _quat_from_zup([1, 0, 0], [0, 1, 0])
    assert abs(np.linalg.norm(q) - 1) < 1e-9
    x, y, z, w = q
    # rotate +z by q
    v = np.array([0, 0, 1.0])
    t = 2 * np.cross([x, y, z], v)
    rot = v + w * t + np.cross([x, y, z], t)
    np.testing.assert_allclose(rot, [1, 0, 0], atol=1e-9)


def test_blue_noise_jitter():
    """Blue-noise pixel jitter (BN0.bmp replacement): the asset has a
    blue spectrum (low-frequency energy suppressed vs white noise), the
    golden-ratio animation advances it per iteration
    (render_kernel.cu:2320-2325), and low-spp renders are measurably
    less blotchy (error has less low-frequency energy) than white."""
    from vpt_tpu.render.renderer import _pixel_jitter
    from vpt_tpu.scene.assets import load_blue_noise

    bn = load_blue_noise()
    assert bn.shape == (128, 128, 2)
    n = bn.shape[0]
    yy, xx = np.mgrid[:n, :n]
    r = np.hypot(yy - n // 2, xx - n // 2)
    rng = np.random.default_rng(0)
    for c in range(2):
        f = np.fft.fftshift(np.abs(np.fft.fft2(bn[:, :, c]
                                               - bn[:, :, c].mean())))
        w = rng.random((n, n))
        fw = np.fft.fftshift(np.abs(np.fft.fft2(w - w.mean())))
        low = f[(r < 8) & (r > 0)].mean()
        low_w = fw[(r < 8) & (r > 0)].mean()
        assert low < 0.2 * low_w, (low, low_w)  # strongly blue

    p = RenderParams(jitter="bluenoise", width=64, height=64)
    key = jax.random.PRNGKey(0)
    j0 = np.asarray(_pixel_jitter(p, key, 64, 64, jnp.uint32(0)))
    j1 = np.asarray(_pixel_jitter(p, key, 64, 64, jnp.uint32(1)))
    phi = (1 + 5 ** 0.5) / 2
    np.testing.assert_allclose(j1, np.mod(j0 + phi % 1.0, 1.0), atol=1e-5)

    # low-spp error comparison on a soft blob edge
    import dataclasses
    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.render.renderer import ProgressiveRenderer
    from vpt_tpu.scene.scene import build_scene
    from scipy import ndimage
    scene = build_scene([_blob_grid()])
    scene = dataclasses.replace(scene, camera=_cam_for(scene, 48, 48))
    base = RenderParams(width=48, height=48, ray_depth=3,
                        max_track_steps=48, max_fused_steps=128,
                        environment_type=int(Environment.CONSTANT))
    ref = np.asarray(ProgressiveRenderer(
        scene, base.replace(seed=7)).render(64).alpha)
    # 1 spp: jitter position dominates edge error; blue noise pushes
    # that error to high frequencies (less blotchy after blurring).
    # (At higher spp the reference's scalar golden-ratio advance walks
    # both channels along a diagonal, diluting the 2-D advantage —
    # a reference quirk we keep.)  Averaged over seeds: a single
    # realization's margin flips with any estimator-realization change.
    lf_w = lf_b = 0.0
    for seed in (0, 1, 2):
        a_w = np.asarray(ProgressiveRenderer(
            scene, base.replace(seed=seed)).render(1).alpha)
        a_b = np.asarray(ProgressiveRenderer(
            scene, base.replace(seed=seed,
                                jitter="bluenoise")).render(1).alpha)
        lf_w += np.linalg.norm(ndimage.gaussian_filter(a_w - ref, 2.0))
        lf_b += np.linalg.norm(ndimage.gaussian_filter(a_b - ref, 2.0))
    assert lf_b < lf_w, (lf_b, lf_w)


def test_triangle_and_plane_intersect():
    """Möller-Trumbore triangle + two-triangle plane (plane.h:46-133)."""
    from vpt_tpu.scene.geometry import plane_intersect, triangle_intersect
    v0, v1, v2 = [0, 0, 5], [2, 0, 5], [0, 2, 5]
    pos = jnp.array([[0.5, 0.5, 0.0],   # inside -> hit at t=5
                     [1.9, 1.9, 0.0],   # outside (u+v>1) -> miss
                     [0.5, 0.5, 10.0]])  # behind -> miss
    d = jnp.array([[0.0, 0.0, 1.0]] * 3)
    hit, t = triangle_intersect(v0, v1, v2, pos, d)
    np.testing.assert_array_equal(np.asarray(hit), [True, False, False])
    np.testing.assert_allclose(float(t[0]), 5.0, rtol=1e-6)
    # parallel ray -> no hit (det ~ 0)
    hit_p, _ = triangle_intersect(v0, v1, v2,
                                  jnp.array([[0.0, 0.0, 0.0]]),
                                  jnp.array([[1.0, 0.0, 0.0]]))
    assert not bool(hit_p[0])
    # quad covers both triangle halves
    q = ([0, 0, 5], [2, 0, 5], [2, 2, 5], [0, 2, 5])
    hit_q, t_q = plane_intersect(*q, jnp.array([[1.9, 1.9, 0.0]]),
                                 jnp.array([[0.0, 0.0, 1.0]]))
    assert bool(hit_q[0]) and abs(float(t_q[0]) - 5.0) < 1e-5
