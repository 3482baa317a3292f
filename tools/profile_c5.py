"""Config-5 majorant resolution sweep: higher R cuts the per-cell
overlap K (fewer instance-row gathers per step) but shortens empty
jumps — find the optimum with the banded cell grid."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.core.camera import Camera
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_step
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid

print(f"device: {jax.devices()[0].platform}", flush=True)


def blob(n=24):
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    base = np.clip(1.0 - r / (n / 3.2), 0.0, 1.0)
    ang = np.sin(x * 0.4) * np.sin(y * 0.35) * np.sin(z * 0.3)
    dens = np.clip(base * (0.5 + 0.8 * ang), 0.0, 1.0).astype(np.float32)
    return HostGrid(density_zyx=dens, emission_zyx=None, color_zyx=None,
                    bbox_min=np.zeros(3, np.int32),
                    dim=np.array([n, n, n], np.int32),
                    transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
                    max_density=float(dens.max()), min_density=1e-6)


def scene_at(R):
    rng = np.random.RandomState(7)
    cloud = blob()
    ids, xforms = [], []
    for i in range(1024):
        t = np.array([rng.uniform(0, 120), rng.uniform(0, 14),
                      rng.uniform(0, 120)])
        s = rng.uniform(0.7, 1.6)
        xf = np.diag([0.1 * s, 0.1 * s, 0.1 * s, 1.0])
        xf[3, :3] = t
        ids.append(0)
        xforms.append(xf)
    sc = build_scene([cloud], instance_grid_ids=ids,
                     instance_xforms=xforms, majorant_resolution=R)
    K = int(sc.majorant.cell_instances.shape[-1])
    c = (np.asarray(sc.root_pmin) + np.asarray(sc.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 30.0, 90.0]), c, vfov=50.0,
                      aspect=1.0)
    return dataclasses.replace(sc, camera=cam), K


P = RenderParams(width=512, height=512, ray_depth=50, volume_depth=1,
                 max_track_steps=256, engine="fused", max_fused_steps=128,
                 environment_type=int(Environment.CONSTANT))


def bench(sc, label, iters=6):
    film = Film.zeros(512, 512)
    it = 0
    t0 = time.time()
    for _ in range(2):
        film = render_step(sc, P, film, jnp.uint32(it)); it += 1
    jax.block_until_ready(film.accum)
    tw = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        film = render_step(sc, P, film, jnp.uint32(it)); it += 1
    float(film.accum.sum())
    print(f"{label}: {(time.time()-t0)/iters*1000:.1f} ms/spp "
          f"(warmup {tw:.1f}s)", flush=True)


scenes = {}
for R in (64, 96, 128, 160):
    scenes[R], K = scene_at(R)
    print(f"R={R}: K={K}", flush=True)
for rnd in range(2):
    for R in (64, 96, 128, 160):
        bench(scenes[R], f"r{rnd}/R={R}")
