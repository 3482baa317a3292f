"""Measure the fused loop's per-phase step distribution (MARCH vs
SHADOW vs EMIT) on the config-1 dragon scene.  This is the evidence
for/against the cached-shadow (precomputed optical depth) mode: only
SHADOW steps can be eliminated by it.

Run on CPU (small batch) or TPU:  python tools/probe_phases.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("/root/.jax_compile_cache"))

import dataclasses

import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.camera import Camera
from vpt_tpu.core.rng import render_key
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.fused import fused_direct
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.scene.scene import load_vdb_scene

W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 128

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
scene = dataclasses.replace(scene, camera=cam)

params = RenderParams(width=W, height=H, ray_depth=50, volume_depth=1,
                      engine="fused", max_fused_steps=256,
                      environment_type=int(Environment.BLACK))
if os.environ.get("PROBE_CACHED", "0") == "1":
    from vpt_tpu.accel.shadow import attach_shadow_cache
    scene = attach_shadow_cache(scene, azimuth=150.0, elevation=30.0)
    params = params.replace(shadow_mode="cached")

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
         "covers-fold", "chained-jump", "accepts"]
print(f"rays: {W*H}   total walking steps: {cost.sum():.0f}")
for n, v in zip(names, tot):
    print(f"{n:<13s}: {v:>10d}  ({100*v/cost.sum():.1f}%)")
print(f"mean steps/ray: {cost.mean():.2f}   max: {cost.max():.0f}   "
      f"trunc: {unfin.mean():.4f}")


def q(x, label):
    x = np.asarray(x, np.float64)
    print(f"{label:<28s} mean {x.mean():6.2f}  p90 {np.percentile(x,90):5.0f}"
          f"  p99 {np.percentile(x,99):5.0f}  p99.9 "
          f"{np.percentile(x,99.9):5.0f}  max {x.max():5.0f}")


q(cost, "walking steps/ray")
q(cost - pcnt[:, 3], "minus SHADOW (cached)")
acc = pcnt[:, 7].sum()
samp = pcnt[:, 1].sum()
print(f"accepts: {acc}  null fraction of MARCH samples: "
      f"{1 - acc / max(samp, 1):.2f}")
