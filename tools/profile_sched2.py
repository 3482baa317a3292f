"""A/B: cost-feedback tile scheduling with the cached-shadow engine
(the shadow-walk variance that defeated sorting is gone — per-ray cost
is now mostly deterministic per pixel)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.accel.shadow import attach_shadow_cache
from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_step
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512
dev = jax.devices()[0]
print(f"device: {dev.platform}", flush=True)

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
cscene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)

P = RenderParams(width=W, height=H, environment_type=int(Environment.BLACK),
                 ray_depth=50, volume_depth=1, max_track_steps=256,
                 engine="fused", max_fused_steps=128, shadow_mode="cached")


def bench(sc, params, label, iters=10, warmup=3):
    film = Film.zeros(params.height, params.width)
    it = 0
    t0 = time.time()
    for _ in range(warmup):
        film = render_step(sc, params, film, jnp.uint32(it))
        it += 1
    jax.block_until_ready(film.accum)
    tw = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        film = render_step(sc, params, film, jnp.uint32(it))
        it += 1
    float(film.accum.sum())
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.1f} ms/spp  {W*H/dt/1e6:.2f} Mrays/s  "
          f"(warmup {tw:.1f}s)", flush=True)


for rnd in range(2):
    for bt in (0, 64, 32, 16):
        bench(cscene, P.replace(block_tiles=bt), f"r{rnd}/cached/block={bt}")
