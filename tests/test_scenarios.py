"""BASELINE scenario coverage (configs 2-5 analogs with synthetic
assets — fireball.vdb / colored_smoke.vdb / the .hdr files are stripped
from the reference mirror, so equivalent scenes are synthesized)."""

import dataclasses
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import attach_env_map, build_scene
from vpt_tpu.volume.grid import HostGrid


def _blob_grid(n=24, emission=False, color=False, seed=0):
    rng = np.random.RandomState(seed)
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    dens = np.clip(1.0 - r / (n / 2.5), 0.0, 1.0).astype(np.float32)
    em = (dens * 0.8).astype(np.float32) if emission else None
    col = None
    if color:
        col = np.stack([dens, 0.5 * dens, 0.2 * np.ones_like(dens)],
                       -1).astype(np.float32)
    return HostGrid(
        density_zyx=dens, emission_zyx=em, color_zyx=col,
        bbox_min=np.zeros(3, np.int32), dim=np.array([n, n, n], np.int32),
        transform=np.diag([0.2, 0.2, 0.2, 1.0]), voxel_size=0.2,
        max_density=float(dens.max()), min_density=1e-6)


def _cam_for(scene, w=24, h=24):
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    d = float(np.linalg.norm(
        np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin)))
    return Camera.make(c + np.array([0.0, 0.2 * d, 1.3 * d]), c, vfov=45.0,
                       aspect=w / h)


BASE = dict(width=24, height=24, ray_depth=6, max_track_steps=96,
            max_fused_steps=384)


def test_config2_emission_blackbody():
    """Emissive volume + blackbody LUT (fireball analog)."""
    scene = build_scene([_blob_grid(emission=True)])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    p = RenderParams(environment_type=int(Environment.BLACK), **BASE
                     ).replace(emission_scale=5.0, sun_mult=0.0)
    off = RenderParams(environment_type=int(Environment.BLACK), **BASE
                       ).replace(emission_scale=0.0, sun_mult=0.0)
    f_on = ProgressiveRenderer(scene, p).render(8)
    f_off = ProgressiveRenderer(scene, off).render(8)
    a_on = np.asarray(f_on.accum)
    assert np.isfinite(a_on).all()
    assert a_on.mean() > np.asarray(f_off.accum).mean()  # emission adds light


def test_config3_hdri_env_dof():
    """HDRI environment + depth of field (colored_smoke analog)."""
    # synthetic equirect env: bright band on the horizon
    H, W = 32, 64
    v = np.linspace(0, 1, H)[:, None]
    env = np.exp(-((v - 0.5) / 0.15) ** 2) * np.ones((H, W))
    env_rgb = np.stack([env * 2.0, env * 1.5, env * 1.0], -1).astype(np.float32)
    scene = build_scene([_blob_grid(color=True)])
    scene = attach_env_map(scene, env_rgb)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 8.0]), c, vfov=45.0,
                      aspect=1.0, aperture=0.5)
    scene = dataclasses.replace(scene, camera=cam)
    p = RenderParams(environment_type=int(Environment.HDRI), **BASE)
    film = ProgressiveRenderer(scene, p).render(8)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all()
    assert a.max() > 0.01  # env visible


def test_config4_atmosphere_env():
    """Procedural Bruneton atmosphere as the environment."""
    from vpt_tpu.scene.scene import attach_atmosphere
    from vpt_tpu.sky.bruneton import LutDims
    dims = LutDims(transmittance_w=64, transmittance_h=16, r=4, mu=32,
                   mu_s=8, nu=4, irradiance_w=16, irradiance_h=4)
    scene = build_scene([_blob_grid()])
    scene = attach_atmosphere(scene, dims=dims)
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    p = RenderParams(environment_type=int(Environment.ATMOSPHERE), **BASE)
    film = ProgressiveRenderer(scene, p).render(4)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all()
    assert a.mean() > 0.01  # sky lights the frame


def test_config5_instancing_ins_roundtrip():
    """.ins write -> read -> instanced scene render (cloudscape analog)."""
    from vpt_tpu.scene.ins import InsFile, InsVolumeFile, load_ins_scene, write_ins

    # point the .ins at a real vdb on disk
    rows = []
    rng = np.random.RandomState(3)
    for i in range(6):
        pos = rng.uniform(-3, 3, 3)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        rows.append([*pos, *q, rng.uniform(0.5, 1.5)])
    ins = InsFile(volumes=[InsVolumeFile(
        vdb_file="/root/reference/assets/dragon.vdb",
        instances=np.array(rows))])
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cloud.ins")
        write_ins(path, ins)
        scene = load_ins_scene(path)
    assert scene.instances.count == 6
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    p = RenderParams(environment_type=int(Environment.CONSTANT), **BASE)
    film = ProgressiveRenderer(scene, p).render(2)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all()
    assert a.max() > 0


def test_ins_lights_variant():
    from vpt_tpu.scene.ins import InsFile, load_ins_scene, write_ins
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "lights.ins")
        write_ins(path, InsFile(lights=np.array(
            [[0, 5, 0, 1, 0.5, 0.2, 120.0], [2, 3, 1, 0.1, 0.9, 1.0, 80.0]])))
        scene = load_ins_scene(path)
    assert scene.lights.count == 2
    np.testing.assert_allclose(np.asarray(scene.lights.power), [120.0, 80.0])


def test_march_engine_on_scenarios():
    """March engine handles emission + color channels too."""
    scene = build_scene([_blob_grid(emission=True, color=True)])
    scene = dataclasses.replace(scene, camera=_cam_for(scene))
    p = RenderParams(environment_type=int(Environment.BLACK), engine="march",
                     march_samples=64, shadow_samples=32, **BASE
                     ).replace(emission_scale=2.0)
    film = ProgressiveRenderer(scene, p).render(4)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all()
    assert a.mean() > 0
