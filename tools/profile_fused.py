"""Interactive TPU profiling harness for the fused engine.

Run with `python -i tools/profile_fused.py` in tmux (keeps the TPU
process alive for follow-up experiments; device init is ~25 s).
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

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.film import Film
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import render_step
from vpt_tpu.scene.scene import load_vdb_scene

W = H = 512

dev = jax.devices()[0]
print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=W / H)
scene = dataclasses.replace(scene, camera=cam)

# ---- scene stats -----------------------------------------------------------
atlas = scene.atlas
print("atlas dim:", np.asarray(atlas.dim))
print("voxels:", int(np.prod(np.asarray(atlas.dim)[0])))
print("density_corners:", atlas.density_corners.shape,
      atlas.density_corners.dtype,
      f"{atlas.density_corners.size * 4 / 1e6:.1f} MB")
print("sigma_max:", float(scene.max_extinction),
      "sigma_min:", float(scene.min_extinction))
print("root bbox:", np.asarray(scene.root_pmin), np.asarray(scene.root_pmax))
d = np.asarray(atlas.dim)[0]
ext = np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin)
print("bbox extent:", ext, "=> voxel size (world):", ext / d)
print("mean free path (world units):", 1.0 / float(scene.max_extinction))
print("mean free path (voxels):",
      (1.0 / float(scene.max_extinction)) / (ext / d))
if scene.majorant is not None:
    mg = scene.majorant
    for f in dataclasses.fields(mg):
        v = getattr(mg, f.name)
        if hasattr(v, "shape"):
            print("majorant", f.name, v.shape, v.dtype)


def bench(params, label, iters=8, warmup=2):
    film = Film.zeros(params.height, params.width)
    it = 0
    t0 = time.time()
    for _ in range(warmup):
        film = render_step(scene, params, film, jnp.uint32(it))
        it += 1
    jax.block_until_ready(film.accum)
    tw = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        film = render_step(scene, params, film, jnp.uint32(it))
        it += 1
    jax.block_until_ready(film.accum)
    dt = (time.time() - t0) / iters
    mrays = params.width * params.height / dt / 1e6
    cost = np.asarray(film.cost) if film.cost is not None else None
    cmax = float(cost.max()) / it if cost is not None else -1
    cmean = float(cost.mean()) / it if cost is not None else -1
    print(f"{label}: {dt*1000:.1f} ms/spp  {mrays:.2f} Mrays/s  "
          f"(warmup {tw:.1f}s)  steps mean/max per spp: "
          f"{cmean:.1f}/{cmax:.1f}")
    return dt, film


P = RenderParams(width=W, height=H, environment_type=int(Environment.BLACK),
                 ray_depth=50, volume_depth=1, max_track_steps=256,
                 engine="fused", max_fused_steps=128)

if __name__ == "__main__" and os.environ.get("PROFILE_BASELINE", "1") == "1":
    bench(P, "fused/while/128")
    bench(P.replace(fused_loop_mode="fori"), "fused/fori/128")
    bench(P.replace(max_fused_steps=256), "fused/while/256")
    for tile in (16384, 32768, 65536, 131072):
        bench(P.replace(fused_tile=tile), f"fused/while/128/tile={tile}")
