"""Dispatch-amortization A/B (config 1 cached, 512^2): python-loop
groups of render_step vs jit-folded render_chunk.  Each remote-TPU
call is an RPC through the axon tunnel; probe_trips measured ~4x wall
differences at identical trip counts across processes, suggesting a
large per-dispatch cost when calls don't pipeline."""

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
from vpt_tpu.render.renderer import render_chunk, render_step
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
scene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)

p = RenderParams(width=W, height=H,
                 environment_type=int(Environment.BLACK),
                 ray_depth=50, volume_depth=1, max_track_steps=256,
                 engine="fused", max_fused_steps=128,
                 shadow_mode="cached")

MODES = ["steps_g4", "steps_g16", "chunk4", "chunk16"]
films = {k: Film.zeros(H, W) for k in MODES}
its = {k: 0 for k in MODES}


def advance(mode, n):
    f = films[mode]
    if mode.startswith("steps"):
        for _ in range(n):
            f = render_step(scene, p, f, jnp.uint32(its[mode]))
            its[mode] += 1
    else:
        k = int(mode[5:])
        assert n % k == 0
        for _ in range(n // k):
            f = render_chunk(scene, p, f, k, jnp.uint32(its[mode]))
            its[mode] += k
    films[mode] = f
    float(f.accum.sum())


for m in MODES:
    t0 = time.time()
    advance(m, 16 if "16" in m else 4)
    print(f"warm {m}: {time.time()-t0:.1f}s", flush=True)

GROUP = {"steps_g4": 4, "steps_g16": 16, "chunk4": 4, "chunk16": 16}
results = {m: [] for m in MODES}
for r in range(4):
    for m in MODES:
        n = GROUP[m]
        t0 = time.time()
        advance(m, n)
        results[m].append((time.time() - t0) / n * 1000)
        print(f"round {r} {m}: {results[m][-1]:.1f} ms/spp", flush=True)

for m, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[m].accum).mean() / its[m]
    print(f"{m:10s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  mean/spp={mean:.5f}", flush=True)
