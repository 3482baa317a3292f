"""Interleaved A/B: per-octant empty-box corner columns (72 extra
f32/voxel, round 3) vs the plain 15-col rows, on config 1 (dragon
512^2, cached shadows, AUTO queues — the primary bench mode).

Round-3 anomaly: octants cut iters/ray 2.58 -> 1.53 (CPU probe) but
BENCH_r03 recorded 31 ms/spp where the pre-octant probe measured 14.4
— more than weather explains.  This probe separates the iteration win
from any per-iteration cost the wider rows / 24-box select logic adds.
"""

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
lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])


def make_scene(octant):
    scene = load_vdb_scene("/root/reference/assets/dragon.vdb",
                           lights=lights, octant_boxes=octant)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0,
                      aspect=1.0)
    scene = dataclasses.replace(scene, camera=cam)
    return attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)


base = RenderParams(width=W, height=H,
                    environment_type=int(Environment.BLACK),
                    ray_depth=50, volume_depth=1, max_track_steps=256,
                    engine="fused", max_fused_steps=128,
                    shadow_mode="cached")

CONFIGS = {
    "octant0/auto": (make_scene(False), base),
    "octant1/auto": (make_scene(True), base),
    "octant0/q1_16k": (make_scene(False), base.replace(rays_per_lane=1)),
    "octant1/q1_16k": (make_scene(True), base.replace(rays_per_lane=1)),
}

films = {k: Film.zeros(H, W) for k in CONFIGS}
its = {k: 0 for k in CONFIGS}

for k, (s, p) in CONFIGS.items():
    t0 = time.time()
    films[k] = render_step(s, p, films[k], jnp.uint32(its[k]))
    jax.block_until_ready(films[k].accum)
    its[k] += 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 6
ROUNDS = 4
results = {k: [] for k in CONFIGS}
for r in range(ROUNDS):
    for k, (s, p) in CONFIGS.items():
        t0 = time.time()
        for _ in range(ITERS):
            films[k] = render_step(s, p, films[k], jnp.uint32(its[k]))
            its[k] += 1
        float(films[k].accum.sum())
        results[k].append((time.time() - t0) / ITERS * 1000)

ref = np.asarray(films["octant0/auto"].accum).mean()
for k, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[k].accum).mean()
    iters = float(np.asarray(films[k].cost).mean()) / its[k]
    print(f"{k:16s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  iters/ray={iters:.2f} "
          f"mean={mean:.4f} (ref {ref:.4f})", flush=True)
