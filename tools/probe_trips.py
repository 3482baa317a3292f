"""Measure ACTUAL while-loop trip counts (fused_direct return_trips)
for the queue path on config 1 cached, decomposing wall into
trips x B x per-trip-lane-cost.  Answers: (a) how many trips does the
plain deal burn vs the 2D-tiled deal, (b) what fraction of wall is the
row gather vs the Q-dependent retire/VPU machinery."""

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
from vpt_tpu.render.fused import fused_direct
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import (_tiled2d_fwd, _tiled2d_rolls,
                                     _tiled2d_split, render_step)
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512
N = W * H

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

# ---- gather-rate calibration (bench.py's): fori, Q=1, 256^2 ---------------
cal = base.replace(width=256, height=256, fused_loop_mode="fori",
                   max_fused_steps=32)
film = Film.zeros(256, 256)
for i in range(2):
    film = render_step(scene, cal, film, jnp.uint32(i))
jax.block_until_ready(film.accum)
best = float("inf")
for i in range(4):
    t0 = time.time()
    film = render_step(scene, cal, film, jnp.uint32(2 + i))
    float(film.accum.sum())
    best = min(best, time.time() - t0)
rate = best / (32 * 256 * 256) * 1e9
print(f"cal rate: {rate:.2f} ns/lane-trip (Q=1 fori body)", flush=True)

# ---- frame rays (renderer raygen, jitterless enough for timing) -----------
xs = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W
ys = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H
u = jnp.broadcast_to(xs, (H, W)).reshape(-1)
v = jnp.broadcast_to(ys, (H, W)).reshape(-1)
o, d = scene.camera.get_rays(u, v, jax.random.PRNGKey(0))

VARIANTS = {
    "plain_q16": (16, False),
    "t2d_q16": (16, True),
    "t2d_q32": (32, True),
    "t2d_q64": (64, True),
}


def run_variant(Q, t2d):
    p = base.replace(rays_per_lane=Q, fused_tile=N, queue_tiled2d=t2d,
                     seek_passes=1)
    oo, dd = o, d
    if t2d:
        sy, sx = _tiled2d_split(Q, H, W)
        rolls = _tiled2d_rolls(Q, H // sy, W // sx)
        oo = _tiled2d_fwd(o, H, W, sy, sx, rolls)
        dd = _tiled2d_fwd(d, H, W, sy, sx, rolls)

    @jax.jit
    def step(key):
        out = fused_direct(scene, p, key, oo, dd, return_trips=True)
        return out[0].sum(), out[5]

    s, trips = step(jax.random.PRNGKey(1))
    jax.block_until_ready(s)
    best = float("inf")
    for i in range(4):
        t0 = time.time()
        s, trips = step(jax.random.PRNGKey(2 + i))
        float(s)
        best = min(best, time.time() - t0)
    return best, int(trips)


for name, (Q, t2d) in VARIANTS.items():
    wall, trips = run_variant(Q, t2d)
    B = N // Q
    per_trip = wall / max(trips, 1) / B * 1e9
    print(f"{name:10s} wall {wall*1000:6.1f} ms  trips {trips:4d} "
          f"(B={B})  per-trip-lane {per_trip:.2f} ns  "
          f"model(cal-rate) {trips*B*rate*1e-6:.1f} ms", flush=True)
