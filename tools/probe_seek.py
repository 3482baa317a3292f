"""Interleaved A/B on config 1 (dragon 512^2, cached shadows) for the
round-4 trip-overhead levers:

  plain      queue_tiled2d=False seek_passes=1  (round-3 state)
  t2d        2D-tiled slot deal only
  seek4      4 retire+seek passes only
  both       t2d + seek4 (proposed default)
  both_q32   t2d + seek4 at Q=32 (tail shrinks ~1/sqrt(Q))

Motivation: today's rate calibration says config1 cached runs 77.6
loop trips while the mean lane queue-sum is ~37 — the gap is the
while-loop tail (vertical-stripe lane deal) plus 1-trip-per-terminal-
ray overhead.  Both levers are gather-free.
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
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
scene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)

base = RenderParams(width=W, height=H,
                    environment_type=int(Environment.BLACK),
                    ray_depth=50, volume_depth=1, max_track_steps=256,
                    engine="fused", max_fused_steps=128,
                    shadow_mode="cached")

CONFIGS = {
    "plain": base.replace(queue_tiled2d=False, seek_passes=1),
    "t2d": base.replace(queue_tiled2d=True, seek_passes=1),
    "seek4": base.replace(queue_tiled2d=False, seek_passes=4),
    "both": base.replace(queue_tiled2d=True, seek_passes=4),
    "both_s8": base.replace(queue_tiled2d=True, seek_passes=8),
    "both_q32": base.replace(queue_tiled2d=True, seek_passes=4,
                             rays_per_lane=32, fused_tile=262144),
}

films = {k: Film.zeros(H, W) for k in CONFIGS}
its = {k: 0 for k in CONFIGS}

for k, p in CONFIGS.items():
    t0 = time.time()
    films[k] = render_step(scene, p, films[k], jnp.uint32(its[k]))
    jax.block_until_ready(films[k].accum)
    its[k] += 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 8
ROUNDS = 4
results = {k: [] for k in CONFIGS}
for r in range(ROUNDS):
    for k, p in CONFIGS.items():
        t0 = time.time()
        for _ in range(ITERS):
            films[k] = render_step(scene, p, films[k], jnp.uint32(its[k]))
            its[k] += 1
        float(films[k].accum.sum())
        results[k].append((time.time() - t0) / ITERS * 1000)
        print(f"round {r} {k}: {results[k][-1]:.1f} ms/spp", flush=True)

ref = np.asarray(films["plain"].accum).mean() / its["plain"]
for k, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[k].accum).mean() / its[k]
    iters = float(np.asarray(films[k].cost).mean()) / its[k]
    print(f"{k:9s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  iters/ray={iters:.2f} "
          f"mean/spp={mean:.5f} (ref {ref:.5f})", flush=True)
