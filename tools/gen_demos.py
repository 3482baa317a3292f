"""Render the round-2 demo images (docs/img): instanced cloudscape +
emissive fireball.  Run on the TPU (one process, compile cache)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp
from PIL import Image

from vpt_tpu.core.camera import Camera
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "img")


def blob(n=64, emission=False, seed=0):
    rng = np.random.RandomState(seed)
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    base = np.clip(1.0 - r / (n / 2.6), 0.0, 1.0)
    ang = (np.sin(x * 0.37 + seed) * np.sin(y * 0.41) * np.sin(z * 0.29)
           + 0.4 * np.sin(x * 0.9) * np.sin(z * 0.8))
    dens = np.clip(base * (0.45 + 0.75 * ang), 0.0, 1.0).astype(np.float32)
    em = None
    if emission:
        em = np.clip(base ** 2 * (0.6 + 0.6 * ang), 0, 1).astype(np.float32)
    return HostGrid(density_zyx=dens, emission_zyx=em, color_zyx=None,
                    bbox_min=np.zeros(3, np.int32),
                    dim=np.array([n, n, n], np.int32),
                    transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
                    max_density=float(dens.max()), min_density=1e-6)


def save(name, renderer, spp):
    t0 = time.time()
    renderer.render(spp)
    img = renderer.display_image()[::-1]
    Image.fromarray(np.asarray(img)).save(os.path.join(OUT, name))
    print(f"{name}: {spp} spp in {time.time()-t0:.1f}s", flush=True)


def demo_cloudscape():
    rng = np.random.RandomState(7)
    cloud = blob(n=32, seed=3)
    ids, xforms = [], []
    for i in range(600):
        t = np.array([rng.uniform(0, 90), 2.0 + 3.0 * rng.beta(2, 5),
                      rng.uniform(0, 90)])
        s = rng.uniform(0.8, 2.2)
        xf = np.diag([0.1 * s, 0.06 * s, 0.1 * s, 1.0])
        xf[3, :3] = t
        ids.append(0)
        xforms.append(xf)
    scene = build_scene([cloud], instance_grid_ids=ids,
                        instance_xforms=xforms)
    cache = os.path.join(os.path.dirname(OUT), "..", "out",
                         "atmo_fullres_cache.npz")
    if os.path.exists(cache):
        from vpt_tpu.scene.scene import attach_atmosphere
        scene = attach_atmosphere(scene, cache_path=cache)
    eye = np.array([45.0, 2.2, 112.0])
    look = np.array([45.0, 8.0, 45.0])
    cam = Camera.make(eye, look, vfov=55.0, aspect=1.5)
    scene = dataclasses.replace(scene, camera=cam)
    params = RenderParams(width=768, height=512, ray_depth=16,
                          max_track_steps=256, max_fused_steps=192,
                          environment_type=int(Environment.ATMOSPHERE)
                          ).replace(elevation=20.0, azimuth=80.0,
                                    sun_mult=3.0, sky_mult=1.0,
                                    phase_g1=0.4, exposure_scale=1.4)
    print(f"cloudscape: {scene.instances.count} instances, "
          f"K={scene.majorant.cell_instances.shape[-1]}", flush=True)
    save("demo_cloudscape_600.png", ProgressiveRenderer(scene, params), 96)


def demo_fireball():
    fire = blob(n=64, emission=True, seed=5)
    scene = build_scene([fire])
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 0.6, 8.5]), c, vfov=45.0,
                      aspect=1.0)
    scene = dataclasses.replace(scene, camera=cam)
    params = RenderParams(width=512, height=512, ray_depth=16,
                          max_track_steps=256, max_fused_steps=192,
                          environment_type=int(Environment.BLACK)
                          ).replace(emission_scale=4.0, emission_pivot=1.0,
                                    exposure_scale=1.2)
    save("demo_fireball.png", ProgressiveRenderer(scene, params), 160)


if __name__ == "__main__":
    demo_fireball()
    demo_cloudscape()
