"""Phase/iteration probe for the config-5 union-grid scene.

The union grid over the bench cloudscape is ~4M voxels, so per-octant
empty boxes auto-enable on it (grid auto cap 8M).  This measures the
ITERATION effect (the weather-normalized term: wall ~ rays x iters x
gather rate) on CPU, comparing octant_boxes on/off.

Run:  python tools/probe_union.py [W] [N_INST]
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
from vpt_tpu.volume.grid import HostGrid
from vpt_tpu.volume.union import build_union_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_INST = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

PHASES = ["jump", "march_sample", "march_exit", "shadow", "emit",
          "covers", "chained", "accepts"]


def blob(n=24):
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    base = np.clip(1.0 - r / (n / 3.2), 0.0, 1.0)
    ang = np.sin(x * 0.4) * np.sin(y * 0.35) * np.sin(z * 0.3)
    dens = np.clip(base * (0.5 + 0.8 * ang), 0.0, 1.0).astype(np.float32)
    return HostGrid(density_zyx=dens, emission_zyx=None, color_zyx=None,
                    bbox_min=np.zeros(3, np.int32),
                    dim=np.array([n, n, n], np.int32),
                    transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
                    max_density=float(dens.max()), min_density=1e-6)


def cloud_xforms(n_inst, seed=7):
    rng = np.random.RandomState(seed)
    ids, xforms = [], []
    for _ in range(n_inst):
        t = np.array([rng.uniform(0, 120), rng.uniform(0, 14),
                      rng.uniform(0, 120)])
        s = rng.uniform(0.7, 1.6)
        xf = np.diag([0.1 * s, 0.1 * s, 0.1 * s, 1.0])
        xf[3, :3] = t
        ids.append(0)
        xforms.append(xf)
    return ids, xforms


def run(octant_boxes):
    cloud = blob()
    ids, xforms = cloud_xforms(N_INST)
    scene = build_union_scene([cloud], ids, xforms, resolution=320,
                              octant_boxes=octant_boxes)
    print(f"octant_boxes={octant_boxes}: union dim="
          f"{np.asarray(scene.atlas.dim)[0]}, octant_cols="
          f"{scene.atlas.octant_cols}", flush=True)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 30.0, 90.0]), c, vfov=50.0,
                      aspect=1.0)
    scene = dataclasses.replace(scene, camera=cam)
    params = RenderParams(width=W, height=W, ray_depth=50, volume_depth=1,
                          engine="fused", max_fused_steps=128,
                          max_track_steps=256,
                          environment_type=int(Environment.CONSTANT))
    key = render_key(params.seed, 0)
    ys, xs = jnp.meshgrid(jnp.arange(W), jnp.arange(W), indexing="ij")
    u = (xs.ravel() + 0.5) / W
    v = (ys.ravel() + 0.5) / W
    origin, direction = scene.camera.get_rays(u, v, key)
    L, alpha, cost, unfinished, depth, pcnt = fused_direct(
        scene, params, key, origin, direction, phase_counts=True)
    iters = float(np.asarray(cost).mean())
    pc = np.asarray(pcnt).reshape(-1, len(PHASES)).mean(axis=0)
    comp = "  ".join(f"{n}={v:.3f}" for n, v in zip(PHASES, pc))
    print(f"  iters/ray={iters:.3f}  L_mean={float(np.asarray(L).mean()):.4f}")
    print(f"  {comp}", flush=True)
    return iters


i_on = run(True)
i_off = run(False)
print(f"octant iteration cut: {i_off:.3f} -> {i_on:.3f} "
      f"({i_off / max(i_on, 1e-9):.2f}x)")
