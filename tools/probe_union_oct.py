"""Interleaved A/B on the config-5 union fast path (1024-instance
cloudscape, 512^2): octant boxes ON/OFF x union resolution.  The
cloudscape is jump-dominated (round 3: 5.0 jumps vs 0.03 accepts/ray)
so the per-(octant x major-axis) anchored boxes should cut the
chained hops (CPU probe: iters 7.66 -> 5.38); this measures whether
the 15->87-col bf16 row pays for itself on the day's gather rate."""

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
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_step
from vpt_tpu.volume.grid import HostGrid
from vpt_tpu.volume.union import build_union_scene

W = H = 512
N_INST = int(os.environ.get("PROBE_INSTANCES", 1024))


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


def aim(scene):
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 30.0, 90.0]), c, vfov=50.0,
                      aspect=1.0)
    return dataclasses.replace(scene, camera=cam)


cloud = blob()
ids, xforms = cloud_xforms(N_INST)

SCENES = {}
for name, res, oct_on in [("u320", 320, False), ("u320oct", 320, True)]:
    t0 = time.time()
    SCENES[name] = aim(build_union_scene([cloud], ids, xforms,
                                         resolution=res,
                                         octant_boxes=oct_on))
    print(f"{name} built in {time.time()-t0:.1f}s", flush=True)

base = RenderParams(width=W, height=H,
                    environment_type=int(Environment.CONSTANT),
                    ray_depth=50, volume_depth=1, max_track_steps=256,
                    engine="fused", max_fused_steps=128)

films = {k: Film.zeros(H, W) for k in SCENES}
its = {k: 0 for k in SCENES}

for k, s in SCENES.items():
    t0 = time.time()
    films[k] = render_step(s, base, films[k], jnp.uint32(its[k]))
    jax.block_until_ready(films[k].accum)
    its[k] += 1
    print(f"compiled {k} in {time.time()-t0:.1f}s", flush=True)

ITERS = 4
ROUNDS = 4
results = {k: [] for k in SCENES}
for r in range(ROUNDS):
    for k, s in SCENES.items():
        t0 = time.time()
        for _ in range(ITERS):
            films[k] = render_step(s, base, films[k], jnp.uint32(its[k]))
            its[k] += 1
        float(films[k].accum.sum())
        results[k].append((time.time() - t0) / ITERS * 1000)
        print(f"round {r} {k}: {results[k][-1]:.1f} ms/spp", flush=True)

ref = np.asarray(films["u320"].accum).mean() / its["u320"]
for k, v in results.items():
    mr = W * H / (min(v) / 1000) / 1e6
    mean = np.asarray(films[k].accum).mean() / its[k]
    iters = float(np.asarray(films[k].cost).mean()) / its[k]
    print(f"{k:9s} rounds={[f'{x:.1f}' for x in v]}  best {min(v):.1f} "
          f"ms/spp -> {mr:.2f} Mrays/s  iters/ray={iters:.2f} "
          f"mean/spp={mean:.5f} (ref {ref:.5f})", flush=True)
