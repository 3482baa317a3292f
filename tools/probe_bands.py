"""Interleaved A/B: majorant BAND_DIVISORS granularity on config 1
(dragon 512^2, cached shadows, auto ray queues).

Motivation: phase counts (tools/probe_phases.py) measured a 95%
null-collision fraction WITH the coarse {0,1/8,1/4,1/2,1} bands — thin
densities all land in the lowest nonzero band and sample against
gmax/8.  Finer (geometric) bands raise within-band acceptance to >= 1/2
at zero extra gather cost; the trade is smaller boxes (more band-exit
hops) and build time (one native box sweep per band).
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
from vpt_tpu.core.rng import render_key
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_rays, render_step
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512

BANDS = {
    "r2-coarse": (0.0, 1 / 8, 1 / 4, 1 / 2, 1.0),
    "geo8": (0.0, 1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0),
    "geo11": (0.0, 1 / 512, 1 / 256, 1 / 128, 1 / 64, 1 / 32, 1 / 16,
              1 / 8, 1 / 4, 1 / 2, 1.0),
    "geo6-sqrt2": (0.0, 1 / 8, 1 / 5.66, 1 / 4, 1 / 2.83, 1 / 2,
                   1 / 1.41, 1.0),
}

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])

scenes = {}
for name, bands in BANDS.items():
    t0 = time.time()
    s = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights,
                       band_divisors=bands)
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0,
                      aspect=1.0)
    s = dataclasses.replace(s, camera=cam)
    s = attach_shadow_cache(s, azimuth=150.0, elevation=30.0)
    scenes[name] = s
    print(f"built {name} ({len(bands)} bands) in {time.time()-t0:.1f}s",
          flush=True)

params = RenderParams(width=W, height=H,
                      environment_type=int(Environment.BLACK),
                      ray_depth=50, volume_depth=1, max_track_steps=256,
                      engine="fused", max_fused_steps=128,
                      shadow_mode="cached")

films = {k: Film.zeros(H, W) for k in BANDS}
its = {k: 0 for k in BANDS}
for k in BANDS:
    t0 = time.time()
    films[k] = render_step(scenes[k], params, films[k], jnp.uint32(0))
    jax.block_until_ready(films[k].accum)
    its[k] = 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 6
ROUNDS = 4
results = {k: [] for k in BANDS}
for r in range(ROUNDS):
    for k in BANDS:
        t0 = time.time()
        for _ in range(ITERS):
            films[k] = render_step(scenes[k], params, films[k],
                                   jnp.uint32(its[k]))
            its[k] += 1
        float(films[k].accum.sum())
        results[k].append((time.time() - t0) / ITERS * 1000)

ref = np.asarray(films["r2-coarse"].accum).mean()
for k, v in results.items():
    _, _, aux = jax.jit(render_rays, static_argnums=())(
        scenes[k], params, render_key(0, 0))
    iters = float(np.asarray(aux["cost"]).mean())
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[k].accum).mean()
    print(f"{k:12s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  iters/ray={iters:.2f}  "
          f"mean={mean:.4f} (ref {ref:.4f})", flush=True)
