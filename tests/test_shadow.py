"""Cached light-transmittance fields (accel/shadow.py): field
correctness against closed forms and estimator agreement between
shadow_mode="cached" and the tracked walks."""

import dataclasses

import numpy as np
import pytest

from vpt_tpu.accel.shadow import (attach_shadow_cache,
                                  directional_tau_nodes, point_tau_nodes)
from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid


def _uniform_grid(n=24, value=0.8, voxel=0.25):
    dens = np.full((n, n, n), value, np.float32)
    return HostGrid(
        density_zyx=dens, emission_zyx=None, color_zyx=None,
        bbox_min=np.zeros(3, np.int32),
        dim=np.array([n, n, n], np.int32),
        transform=np.diag([voxel, voxel, voxel, 1.0]),
        voxel_size=voxel, max_density=value, min_density=value)


def _blob_grid(n=32, voxel=0.2):
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    dens = np.clip(1.0 - r / (n / 2.5), 0.0, 1.0).astype(np.float32)
    return HostGrid(
        density_zyx=dens, emission_zyx=None, color_zyx=None,
        bbox_min=np.zeros(3, np.int32),
        dim=np.array([n, n, n], np.int32),
        transform=np.diag([voxel, voxel, voxel, 1.0]),
        voxel_size=voxel, max_density=float(dens.max()), min_density=1e-6)


def test_directional_tau_uniform_box():
    """Uniform box, axis-aligned sun: tau(node) = value * world
    distance from the node to the +x face."""
    n, value, voxel = 16, 0.5, 0.3
    dens = np.full((n, n, n), value, np.float32)
    # index-space direction +x; world step per index unit = voxel
    tau = directional_tau_nodes(dens, np.array([1.0, 0.0, 0.0]),
                                world_per_idx=voxel)
    # node i sits at index coordinate i; the field's support ends at
    # node n-1, with a half-voxel linear falloff ramp on each side —
    # the exact integral of the trilinearly interpolated field from
    # node i straight out is value * voxel * (n-1-i + 0.5)
    xs = np.arange(n)
    expect = value * voxel * (n - 1 - xs + 0.5)
    got = tau[n // 2, n // 2, :]
    np.testing.assert_allclose(got, expect, rtol=0.03, atol=0.02)


def test_point_tau_matches_brute_force():
    """tau(node) (node -> through the light -> grid exit) vs a dense
    midpoint quadrature of the same trilinear field."""
    from vpt_tpu.accel.shadow import _trilinear_index
    n, value, voxel = 20, 0.6, 0.25
    g = _uniform_grid(n, value, voxel)
    xform = np.asarray(g.transform, np.float64)
    light_w = np.array([(n - 1) / 2 + 0.5] * 3) @ xform[:3, :3]
    tau = point_tau_nodes(g.density_zyx, xform, g.bbox_min, light_w)

    def brute(iz, iy, ix):
        node_w = (np.array([ix, iy, iz]) + 0.5) * voxel
        w = light_w - node_w
        w = w / np.linalg.norm(w)
        ts = np.arange(0, 10.0, 0.002) + 0.001
        ipos = (node_w + w * ts[:, None]) / voxel - 0.5
        return _trilinear_index(g.density_zyx, ipos).sum() * 0.002

    for node in [(10, 10, 10), (10, 10, 4), (10, 10, 0), (3, 7, 15)]:
        got, expect = tau[node], brute(*node)
        assert abs(got - expect) / max(expect, 1e-6) < 0.02, \
            (node, got, expect)


@pytest.fixture(scope="module")
def lit_scene():
    g = _blob_grid()
    lights = PointLights.make([[2.0, 5.0, 6.0]], [[1.0, 0.9, 0.8]], [80.0])
    s = build_scene([g], lights=lights)
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 0.5, 8.0]), c, vfov=40.0,
                      aspect=1.0)
    return dataclasses.replace(s, camera=cam)


BASE = dict(width=32, height=32, ray_depth=6, max_track_steps=96,
            max_fused_steps=768, environment_type=int(Environment.BLACK),
            sun_mult=1.0, azimuth=120.0, elevation=40.0)


def test_cached_matches_tracked_mean(lit_scene):
    tracked = ProgressiveRenderer(
        lit_scene, RenderParams(engine="fused", **BASE)).render(24)
    cached_scene = attach_shadow_cache(lit_scene, azimuth=BASE["azimuth"],
                                       elevation=BASE["elevation"])
    cached = ProgressiveRenderer(
        cached_scene,
        RenderParams(engine="fused", shadow_mode="cached", **BASE)).render(24)
    a = np.asarray(tracked.accum)
    b = np.asarray(cached.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert a.mean() > 0
    # deterministic-vs-stochastic transmittance: same expectation up to
    # quadrature/interpolation error + MC noise
    assert abs(b.mean() - a.mean()) / a.mean() < 0.08, (a.mean(), b.mean())


def test_cached_requires_bake(lit_scene):
    with pytest.raises(ValueError):
        ProgressiveRenderer(
            lit_scene,
            RenderParams(engine="fused", shadow_mode="cached",
                         **BASE)).render(1)


def test_cached_light_count_check(lit_scene):
    cached_scene = attach_shadow_cache(lit_scene, azimuth=BASE["azimuth"],
                                       elevation=BASE["elevation"])
    # drop the lights: channel count no longer matches
    no_lights = dataclasses.replace(cached_scene,
                                    lights=PointLights.empty())
    with pytest.raises(ValueError):
        ProgressiveRenderer(
            no_lights,
            RenderParams(engine="fused", shadow_mode="cached",
                         **BASE)).render(1)


def test_cached_anisotropic_transform():
    """The bake handles anisotropic instance transforms (dragon.vdb's
    voxels are non-uniform): cached vs tracked means agree on a blob
    with per-axis scales."""
    g = _blob_grid(n=24, voxel=0.2)
    g = dataclasses.replace(
        g, transform=np.diag([0.12, 0.2, 0.3, 1.0]), voxel_size=0.2)
    lights = PointLights.make([[1.0, 3.0, 4.0]], [[1.0, 1.0, 1.0]], [40.0])
    s = build_scene([g], lights=lights)
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 0.5, 6.0]), c, vfov=40.0,
                      aspect=1.0)
    s = dataclasses.replace(s, camera=cam)
    base = dict(width=24, height=24, ray_depth=5, max_track_steps=96,
                max_fused_steps=512,
                environment_type=int(Environment.BLACK),
                azimuth=70.0, elevation=25.0)
    tracked = ProgressiveRenderer(
        s, RenderParams(engine="fused", **base)).render(24)
    cs = attach_shadow_cache(s, azimuth=70.0, elevation=25.0)
    cached = ProgressiveRenderer(
        cs, RenderParams(engine="fused", shadow_mode="cached",
                         **base)).render(24)
    a = np.asarray(tracked.accum)
    b = np.asarray(cached.accum)
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_cached_multiple_lights():
    """Per-light tau channel indexing: 3 point lights at distinct
    positions, cached vs tracked means agree (exercises taus[...,1+i]
    routing and the min(L,11)/L weighting)."""
    g = _blob_grid(n=24)
    lights = PointLights.make(
        [[2.0, 4.0, 5.0], [-3.0, 2.0, 1.0], [0.0, 6.0, -2.0]],
        [[1.0, 0.8, 0.6], [0.5, 0.7, 1.0], [0.9, 1.0, 0.9]],
        [30.0, 45.0, 25.0])
    s = build_scene([g], lights=lights)
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 0.5, 7.0]), c, vfov=40.0,
                      aspect=1.0)
    s = dataclasses.replace(s, camera=cam)
    base = dict(width=24, height=24, ray_depth=5, max_track_steps=96,
                max_fused_steps=512,
                environment_type=int(Environment.BLACK),
                azimuth=100.0, elevation=35.0)
    tracked = ProgressiveRenderer(
        s, RenderParams(engine="fused", **base)).render(32)
    cs = attach_shadow_cache(s, azimuth=100.0, elevation=35.0)
    from vpt_tpu.volume.grid import unified_layout
    assert (cs.atlas.density_corners.shape[1]
            == unified_layout(cs.atlas)[2] + 8 * (1 + 3))
    cached = ProgressiveRenderer(
        cs, RenderParams(engine="fused", shadow_mode="cached",
                         **base)).render(32)
    a = np.asarray(tracked.accum)
    b = np.asarray(cached.accum)
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_rebake_replaces_old_channels(lit_scene):
    """Re-baking (the viewer's sun-move path) strips the previous tau
    channels instead of appending: width stable, sun channel changes."""
    a = attach_shadow_cache(lit_scene, azimuth=90.0, elevation=30.0)
    b = attach_shadow_cache(a, azimuth=270.0, elevation=30.0)
    assert (a.atlas.density_corners.shape
            == b.atlas.density_corners.shape)
    from vpt_tpu.volume.grid import unified_layout
    t0 = unified_layout(a.atlas)[2]
    ta = np.asarray(a.atlas.density_corners)[:, t0:t0 + 8]
    tb = np.asarray(b.atlas.density_corners)[:, t0:t0 + 8]
    assert not np.allclose(ta, tb)  # opposite sun -> different field


def _instanced_lit_scene():
    """Small instanced scene with a point light (world-cache tests)."""
    rng = np.random.RandomState(5)
    ids, xforms = [], []
    for i in range(12):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = rng.uniform(0.0, 5.0, 3)
        ids.append(0)
        xforms.append(xf)
    lights = PointLights.make([[8.0, 9.0, 8.0]], [[1.0, 1.0, 1.0]],
                              [200.0])
    scene = build_scene([_blob_grid(n=16)], instance_grid_ids=ids,
                        instance_xforms=xforms, lights=lights,
                        instance_list_threshold=4)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    d = float(np.linalg.norm(np.asarray(scene.root_pmax)
                             - np.asarray(scene.root_pmin))) * 1.2
    cam = Camera.make(c + np.array([0.0, 0.1 * d, d]), c, vfov=45.0,
                      aspect=1.0)
    return dataclasses.replace(scene, camera=cam)


def test_world_shadow_cache_tau_accuracy():
    """Cell-row tau columns vs brute quadrature of the exact summed
    density along the sun direction (multi-instance cached shadows —
    the taus ride the majorant cell rows, accel.shadow._fold_cell_taus)."""
    from vpt_tpu.accel.shadow import cell_tau_fetch as world_tau_fetch
    from vpt_tpu.core.vecmath import aabb_intersect, degree_to_cartesian
    from vpt_tpu.render.tracking import scene_density

    scene = _instanced_lit_scene()
    az, el = 150.0, 30.0
    cs = attach_shadow_cache(scene, azimuth=az, elevation=el,
                             world_resolution=128)
    assert cs.world_tau is None  # cell-list scene: taus fold into rows
    base = (scene.majorant.packed.shape[-1]
            + scene.majorant.cell_instances.shape[-1])
    assert cs.majorant.cell_rows.shape[-1] == base + 16

    rng = np.random.RandomState(1)
    lo = np.asarray(scene.root_pmin)
    hi = np.asarray(scene.root_pmax)
    pts = rng.uniform(lo + 0.5, hi - 0.5, size=(64, 3)).astype(np.float32)
    tau_cached = np.asarray(world_tau_fetch(cs, pts))[:, 0]

    sun = np.asarray(degree_to_cartesian(az, el))
    import jax.numpy as jnp
    _, _, dist = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                jnp.asarray(pts),
                                jnp.broadcast_to(sun, pts.shape))
    dist = np.maximum(np.asarray(dist), 0.0)
    n_q = 400
    tq = (np.arange(n_q) + 0.5) / n_q
    pos = pts[:, None, :] + sun[None, None, :] * (dist[:, None, None]
                                                  * tq[None, :, None])
    dens = np.asarray(scene_density(scene, pos.reshape(-1, 3))).reshape(
        64, n_q)
    tau_brute = (dens * (dist[:, None] / n_q)).sum(axis=1)
    # transmittance-level agreement (tau errors matter through exp)
    err = np.abs(np.exp(-tau_cached) - np.exp(-tau_brute)).max()
    assert err < 0.03, err


def test_world_shadow_cache_render_matches_tracked():
    """shadow_mode='cached' on an INSTANCED scene agrees with the
    tracked estimator within MC noise (the multi-instance analog of
    test_cached_matches_tracked_mean)."""
    scene = _instanced_lit_scene()
    kw = dict(width=32, height=32, ray_depth=4, max_track_steps=64,
              max_fused_steps=256,
              environment_type=int(Environment.BLACK))
    a = np.asarray(ProgressiveRenderer(
        scene, RenderParams(**kw)).render(12).accum)
    cs = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0,
                             world_resolution=128)
    b = np.asarray(ProgressiveRenderer(
        cs, RenderParams(**kw).replace(shadow_mode="cached")).render(
            12).accum)
    assert np.isfinite(b).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_world_shadow_cache_below_cell_threshold():
    """Instanced scenes WITHOUT cell lists fall back to the separate
    world-tau table (one extra gather per step) and still agree with
    the tracked estimator."""
    rng = np.random.RandomState(5)
    ids, xforms = [], []
    for i in range(3):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = rng.uniform(0.0, 4.0, 3)
        ids.append(0)
        xforms.append(xf)
    lights = PointLights.make([[8.0, 9.0, 8.0]], [[1.0, 1.0, 1.0]],
                              [200.0])
    scene = build_scene([_blob_grid(n=16)], instance_grid_ids=ids,
                        instance_xforms=xforms, lights=lights,
                        instance_list_threshold=64)
    assert scene.majorant.cell_instances is None  # below threshold
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    d = float(np.linalg.norm(np.asarray(scene.root_pmax)
                             - np.asarray(scene.root_pmin))) * 1.2
    cam = Camera.make(c + np.array([0.0, 0.1 * d, d]), c, vfov=45.0,
                      aspect=1.0)
    scene = dataclasses.replace(scene, camera=cam)
    kw = dict(width=24, height=24, ray_depth=4, max_track_steps=64,
              max_fused_steps=256,
              environment_type=int(Environment.BLACK))
    a = np.asarray(ProgressiveRenderer(
        scene, RenderParams(**kw)).render(12).accum)
    cs = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0,
                             world_resolution=96)
    assert cs.world_tau is not None  # fallback table populated
    b = np.asarray(ProgressiveRenderer(
        cs, RenderParams(**kw).replace(shadow_mode="cached")).render(
            12).accum)
    assert np.isfinite(b).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.12, (a.mean(), b.mean())


def test_tau_downsample_error():
    """tau_downsample=2 (the production-size bake proxy): optical depth
    from the 2x average-pooled density upsampled to the full node grid
    stays close to the full-res bake — pooling nearly commutes with the
    line integral; residual is a ~2-voxel blur of shadow boundaries."""
    import dataclasses

    from tests.golden_scenes import _blob
    from vpt_tpu.accel.shadow import _tau_base, attach_shadow_cache
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.scene.scene import build_scene

    lights = PointLights.make([[6.0, 7.0, 8.0]], [[1.0, 1.0, 1.0]], [100.0])
    scene = build_scene([_blob(n=40)], lights=lights)
    full = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0,
                               tau_downsample=1)
    half = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0,
                               tau_downsample=2)
    base = _tau_base(scene.atlas)
    a = np.asarray(full.atlas.density_corners)[:, base:]
    b = np.asarray(half.atlas.density_corners)[:, base:]
    assert a.shape == b.shape and a.shape[1] == 16  # sun + 1 light
    denom = max(float(np.abs(a).mean()), 1e-9)
    rel = float(np.abs(a - b).mean()) / denom
    assert rel < 0.08, rel
    # and the cached transmittances they imply stay close where it
    # matters (occupied voxels): compare exp(-tau)
    ta = np.exp(-a.astype(np.float64))
    tb = np.exp(-b.astype(np.float64))
    assert float(np.abs(ta - tb).mean()) < 0.03


def test_downsampled_point_tau_render_mean(lit_scene):
    """Point-light-only render mean with the PRODUCTION-SIZE bake path
    (tau_downsample=2 -> big spherical-resample settings) agrees with
    the tracked walks.  Pins the round-5 bias fix: the 120x240 angular
    grid tangentially blurred the low-tau creases light shines
    through, dimming point-lit radiance 18.5% at bench scale
    (accel/shadow.py attach_shadow_cache big-path comment)."""
    base = dict(BASE, sun_mult=0.0)  # isolate the point-light channel
    tracked = ProgressiveRenderer(
        lit_scene, RenderParams(engine="fused", **base)).render(24)
    cs = attach_shadow_cache(lit_scene, azimuth=base["azimuth"],
                             elevation=base["elevation"], tau_downsample=2)
    cached = ProgressiveRenderer(
        cs, RenderParams(engine="fused", shadow_mode="cached",
                         **base)).render(24)
    a = np.asarray(tracked.accum)
    b = np.asarray(cached.accum)
    assert np.isfinite(b).all() and a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.10, (a.mean(), b.mean())
