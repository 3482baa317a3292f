"""Diagnose fused-loop exit behavior: per-tile exit step + unfinished
lanes + phase histogram at exit."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import dataclasses
import jax.numpy as jnp

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512
lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)

import vpt_tpu.render.fused as fused_mod

# instrument: wrap fused_direct's loop exit (use internal pieces)
from vpt_tpu.render.fused import fused_direct


@jax.jit
def probe(params, key):
    kj, kl, ki = jax.random.split(key, 3)
    jit = jax.random.uniform(kj, (H, W, 2), jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = (xs + jit[..., 0]) / W
    v = (ys + jit[..., 1]) / H
    origin, direction = scene.camera.get_rays(u.reshape(-1), v.reshape(-1),
                                              kl)
    outs = []
    tile = params.fused_tile
    B = origin.shape[0]
    keys = jax.random.split(ki, B // tile)
    for ti in range(B // tile):
        sl = slice(ti * tile, (ti + 1) * tile)
        L, alpha, cost, unfin, _d = fused_direct(scene, params, keys[ti],
                                             origin[sl], direction[sl])
        outs.append((unfin.sum(), cost.max(), cost.mean()))
    return outs


params = RenderParams(width=W, height=H,
                      environment_type=int(Environment.BLACK),
                      ray_depth=50, volume_depth=1, max_track_steps=256,
                      engine="fused", max_fused_steps=128, fused_tile=16384,
                      block_tiles=0)
for budget in (64, 128, 256):
    outs = probe(params.replace(max_fused_steps=budget),
                 jax.random.PRNGKey(0))
    outs = [(int(a), float(b), float(c)) for a, b, c in
            [tuple(np.asarray(x) for x in o) for o in outs]]
    tot_unfin = sum(o[0] for o in outs)
    print(f"budget {budget}: unfinished lanes total={tot_unfin} "
          f"per-tile (unfin, cost_max, cost_mean)=")
    for o in outs:
        print("   ", o, flush=True)
