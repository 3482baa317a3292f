"""Compare compiled-HLO gather lowering for fast vs slow fused
programs (the remote TPU shows bimodal per-program gather cost)."""
import dataclasses
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.accel.shadow import attach_shadow_cache
from vpt_tpu.core.camera import Camera
from vpt_tpu.core.rng import render_key
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_step
from vpt_tpu.scene.scene import load_vdb_scene

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
cscene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)


def analyze(sc, params, label, iters=3):
    film = Film.zeros(params.height, params.width)
    lowered = jax.jit(render_step).lower(sc, params, film, jnp.uint32(0))
    comp = lowered.compile()
    txt = comp.as_text()
    n_gather = len(re.findall(r" gather\(", txt))
    n_dyn = len(re.findall(r"dynamic-slice\(", txt))
    # fusion-embedded gathers (inside fusion computations) vs standalone
    fus = len(re.findall(r"fusion\(", txt))
    t0 = time.time()
    it = 0
    for _ in range(2):
        film = render_step(sc, params, film, jnp.uint32(it)); it += 1
    jax.block_until_ready(film.accum)
    t0 = time.time()
    for _ in range(iters):
        film = render_step(sc, params, film, jnp.uint32(it)); it += 1
    float(film.accum.sum())
    dt = (time.time() - t0) / iters * 1000
    print(f"{label}: {dt:.1f} ms/spp  gathers={n_gather} "
          f"dyn-slices={n_dyn} fusions={fus}", flush=True)
    return txt


P = RenderParams(width=512, height=512,
                 environment_type=int(Environment.BLACK),
                 ray_depth=50, volume_depth=1, max_track_steps=256,
                 engine="fused", max_fused_steps=128)
t1 = analyze(scene, P, "tracked/512")
t2 = analyze(cscene, P.replace(shadow_mode="cached"), "cached/512")
P2 = P.replace(width=256, height=256)
t3 = analyze(scene, P2, "tracked/256")
t4 = analyze(cscene, P2.replace(shadow_mode="cached"), "cached/256")
with open("/tmp/hlo_tracked512.txt", "w") as f:
    f.write(t1)
with open("/tmp/hlo_cached512.txt", "w") as f:
    f.write(t2)
