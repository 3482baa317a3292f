"""Interleaved A/B timing of render_step configurations (the axon
remote TPU is noisy across runs; interleave to cancel drift)."""

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

base = RenderParams(width=W, height=H,
                    environment_type=int(Environment.BLACK),
                    ray_depth=50, volume_depth=1, max_track_steps=256,
                    engine="fused", max_fused_steps=128)

CONFIGS = {
    "tile16k/while/b64": base,
    "tile16k/while/b0": base.replace(block_tiles=0),
    "tile64k/while/b0": base.replace(fused_tile=65536, block_tiles=0),
    "tile256k/while/b0": base.replace(fused_tile=262144, block_tiles=0),
    "tile64k/fori48/b0": base.replace(fused_tile=65536, block_tiles=0,
                                      fused_loop_mode="fori",
                                      max_fused_steps=48),
    "tile256k/fori48/b0": base.replace(fused_tile=262144, block_tiles=0,
                                       fused_loop_mode="fori",
                                       max_fused_steps=48),
}

films = {k: Film.zeros(H, W) for k in CONFIGS}
its = {k: 0 for k in CONFIGS}

# compile all
for k, p in CONFIGS.items():
    t0 = time.time()
    films[k] = render_step(scene, p, films[k], jnp.uint32(its[k]))
    jax.block_until_ready(films[k].accum)
    its[k] += 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 6
ROUNDS = 3
results = {k: [] for k in CONFIGS}
for r in range(ROUNDS):
    for k, p in CONFIGS.items():
        t0 = time.time()
        for _ in range(ITERS):
            films[k] = render_step(scene, p, films[k], jnp.uint32(its[k]))
            its[k] += 1
        float(films[k].accum.sum())
        results[k].append((time.time() - t0) / ITERS * 1000)

for k, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    print(f"{k:22s} ms/spp rounds={[f'{x:.1f}' for x in v]}  "
          f"best {min(v):.1f} -> {mr:.2f} Mrays/s", flush=True)
