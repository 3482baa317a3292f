"""Phase-step distribution on the config-2 emissive analog (the
bench's turbulent puff with emission = 0.9 x density): the evidence
for the EMIT empty-box jump (emission-safe zero band, grid._corner_pack).

Measured (CPU, 128^2): EMIT steps 5661 -> 3491 (1.62x), iters/ray
2.71 -> 2.58 with identical estimator mean.

Run on CPU (small batch) or TPU:  PROBE_TPU=1 python tools/probe_emit.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import dataclasses

import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.camera import Camera
from vpt_tpu.core.rng import render_key
from vpt_tpu.render.fused import fused_direct
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid

W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 128

n = 64
z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
base = np.clip(1.0 - r / (n / 3.2), 0.0, 1.0)
ang = np.sin(x * 0.4) * np.sin(y * 0.35) * np.sin(z * 0.3)
dens = np.clip(base * (0.5 + 0.8 * ang), 0.0, 1.0).astype(np.float32)
grid = HostGrid(density_zyx=dens, emission_zyx=(dens * 0.9).astype(np.float32),
                color_zyx=None, bbox_min=np.zeros(3, np.int32),
                dim=np.array([n, n, n], np.int32),
                transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
                max_density=float(dens.max()), min_density=1e-6)
scene = build_scene([grid])
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 9.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)
params = RenderParams(width=W, height=H, ray_depth=50, volume_depth=1,
                      engine="fused", max_fused_steps=256,
                      emission_scale=2.0, emission_pivot=1.0,
                      environment_type=int(Environment.BLACK))

key = render_key(params.seed, 0)
ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
u = (xs.ravel() + 0.5) / W
v = (ys.ravel() + 0.5) / H
origin, direction = scene.camera.get_rays(u, v, key)

L, alpha, cost, unfin, depth, pcnt = jax.jit(
    lambda k, o, d: fused_direct(scene, params, k, o, d,
                                 phase_counts=True))(key, origin, direction)
pcnt = np.asarray(pcnt)
cost = np.asarray(cost)
tot = pcnt.sum(0)
names = ["jump-merged", "MARCH-sample", "MARCH-exit", "SHADOW", "EMIT",
         "covers", "chained", "accept"]
print("iters/ray:", cost.mean())
for nm, val in zip(names, tot):
    print(f"{nm:14s} {val:10d}  {val / cost.sum():.3f}")
print("L mean:", np.asarray(L).mean())
