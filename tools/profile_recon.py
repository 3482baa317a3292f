"""Bisect the reconstructed fused-engine body cost on the real TPU."""

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
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.tracking import unified_fetch
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512
B = 16384

dev = jax.devices()[0]
print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}", flush=True)

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)

P = RenderParams(width=W, height=H, environment_type=int(Environment.BLACK),
                 ray_depth=50, volume_depth=1, max_track_steps=256,
                 engine="fused", max_fused_steps=128)

key = jax.random.PRNGKey(0)
u = (jnp.arange(B) % W + 0.5) / W
v = (jnp.arange(B) // W % H + 0.5) / H
origin, direction = scene.camera.get_rays(u, v, key)


def timeit(fn, label, iters=4):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    # force a scalar fetch (tunnel can return early)
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].sum())
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return dt


N_Iter = 64

# 1. gather-only fori loop: advance + unified_fetch
@jax.jit
def gather_only(origin, direction, key):
    def body(i, s):
        t, acc = s
        uu = jax.random.uniform(jax.random.fold_in(key, i), (B,))
        t = t + uu * 0.05
        p = origin + direction * t[:, None]
        d, skip = unified_fetch(scene, P, p, direction)
        return (t, acc + d + skip)
    return jax.lax.fori_loop(0, N_Iter, body, (jnp.zeros(B), jnp.zeros(B)))

t_g = timeit(lambda: gather_only(origin, direction, key),
             f"gather-only fori x{N_Iter} (B={B})")
print(f"  -> {t_g/N_Iter/B*1e9:.2f} ns/lane/iter", flush=True)

# 2. full fused body, fori mode, 64 iterations, one tile
from vpt_tpu.render.fused import fused_direct

Pf = P.replace(fused_loop_mode="fori", max_fused_steps=N_Iter)

@jax.jit
def fused_tile(origin, direction, key):
    return fused_direct(scene, Pf, key, origin, direction)

t_f = timeit(lambda: fused_tile(origin, direction, key),
             f"fused fori x{N_Iter} (B={B})")
print(f"  -> {t_f/N_Iter/B*1e9:.2f} ns/lane/iter", flush=True)

# 3. full fused while mode
Pw = P.replace(max_fused_steps=128)

@jax.jit
def fused_tile_w(origin, direction, key):
    return fused_direct(scene, Pw, key, origin, direction)

t_w = timeit(lambda: fused_tile_w(origin, direction, key),
             "fused while/128 one tile")

# 4. render_step without block scheduling
from vpt_tpu.render.film import Film
from vpt_tpu.render.renderer import render_step

for label, pp in [("render_step block=64", Pw),
                  ("render_step block=0", Pw.replace(block_tiles=0))]:
    film = Film.zeros(H, W)
    film = render_step(scene, pp, film, jnp.uint32(0))
    jax.block_until_ready(film.accum)
    t0 = time.time()
    for it in range(1, 5):
        film = render_step(scene, pp, film, jnp.uint32(it))
    float(film.accum.sum())
    print(f"{label}: {(time.time()-t0)/4*1000:.1f} ms/spp", flush=True)
