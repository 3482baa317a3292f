"""Interleaved A/B: cost-stratified lane assignment (strat_schedule,
round-3 commit cb0acad) on vs off for q16/256k queue tiles, config 1
cached.

Suspicion: the stratified permutation costs an argsort + 2 input takes
+ 4 output takes over the whole 256k batch — the exact "sort + 6
permutation gathers" pattern round 2 measured at ~19 ms/spp and
rejected.  The loop-trip win (70 -> ~24 trips) must beat that cost to
keep the feature on by default.
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
OCTANT = os.environ.get("PROBE_OCTANT", "1") == "1"

scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights,
                       octant_boxes=OCTANT)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
scene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)

base = RenderParams(width=W, height=H,
                    environment_type=int(Environment.BLACK),
                    ray_depth=50, volume_depth=1, max_track_steps=256,
                    engine="fused", max_fused_steps=128,
                    shadow_mode="cached",
                    rays_per_lane=16, fused_tile=262144)

CONFIGS = {
    "q16/strat1": base,
    "q16/strat0": base.replace(strat_schedule=False),
    "q16/strat1_cal": base,   # duplicate: in-run weather drift check
}

films = {k: Film.zeros(H, W) for k in CONFIGS}
its = {k: 0 for k in CONFIGS}

for k, p in CONFIGS.items():
    t0 = time.time()
    films[k] = render_step(scene, p, films[k], jnp.uint32(its[k]))
    jax.block_until_ready(films[k].accum)
    its[k] += 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 6
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

ref = np.asarray(films["q16/strat1"].accum).mean()
for k, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[k].accum).mean()
    iters = float(np.asarray(films[k].cost).mean()) / its[k]
    print(f"{k:14s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  iters/ray={iters:.2f} "
          f"mean={mean:.4f} (ref {ref:.4f})", flush=True)
