"""Identify the phase/state of budget-truncated lanes at 512^2."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.fused import fused_direct
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512
lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)

params = RenderParams(width=W, height=H,
                      environment_type=int(Environment.BLACK),
                      ray_depth=50, volume_depth=1, max_track_steps=256,
                      fused_loop_mode="fori", max_fused_steps=128)

key = jax.random.PRNGKey(0)
kj, kl, ki = jax.random.split(key, 3)
jit = jax.random.uniform(kj, (H, W, 2), jnp.float32)
xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
u = ((xs + jit[..., 0]) / W).reshape(-1)
v = ((ys + jit[..., 1]) / H).reshape(-1)
origin, direction = scene.camera.get_rays(u, v, kl)


@jax.jit
def run(o, d, k):
    return fused_direct(scene, params, k, o, d, return_state=True)


B = 65536
for ti in range(4):
    sl = slice(ti * B, (ti + 1) * B)
    L, alpha, cost, unfin, depth, state = run(origin[sl], direction[sl],
                                              jax.random.fold_in(ki, ti))
    phase = np.asarray(state[14])
    bad = phase != 4
    n = int(bad.sum())
    print(f"tile {ti}: unfinished {n}", flush=True)
    if n:
        asc = np.asarray(state[15])[bad]
        dn = np.asarray(state[17])[bad]
        tq = np.asarray(state[11])[bad]
        dist = np.asarray(state[10])[bad]
        skipv = np.asarray(state[12])[bad]
        pos = np.asarray(state[0])[bad]
        dirn = np.asarray(state[1])[bad]
        print("  phases:", dict(zip(*np.unique(phase[bad],
                                               return_counts=True))))
        print("  ascode:", dict(zip(*np.unique(asc, return_counts=True))))
        print("  depth_n:", dict(zip(*np.unique(dn, return_counts=True))))
        for j in range(min(3, n)):
            print(f"  lane: t={tq[j]:.4f} dist={dist[j]:.4f} "
                  f"skip={skipv[j]:.6f} pos={pos[j]} dir={dirn[j]}",
                  flush=True)
