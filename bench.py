"""Benchmark: dragon.vdb render throughput on the available device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

Metric: primary rays traced per second (width*height*spp / wall time)
on the BASELINE config-1 scene (dragon.vdb, one point light, 512x512,
no atmosphere, ray_depth 50 / volume_depth 1 — the reference's default
kernel params, main.cpp:1350-1376).

vs_baseline: the reference publishes no numbers (BASELINE.md); we use
a documented estimate of VPT on an RTX-class GPU for this scene:
~30 Mrays/s primary throughput (1080p at ~15 fps progressive preview).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 30.0

WIDTH = int(os.environ.get("BENCH_WIDTH", 512))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 512))
WARMUP = int(os.environ.get("BENCH_WARMUP", 2))
ITERS = int(os.environ.get("BENCH_ITERS", 16))
ENGINE = os.environ.get("BENCH_ENGINE", "fused")
FUSED_STEPS = int(os.environ.get("BENCH_FUSED_STEPS", 128))


def main():
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_compile_cache"))
    import jax.numpy as jnp

    from vpt_tpu.core.camera import Camera
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.render.film import Film
    from vpt_tpu.render.params import Environment, RenderParams
    from vpt_tpu.render.renderer import render_step
    from vpt_tpu.scene.scene import load_vdb_scene

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
    scene = load_vdb_scene("/root/reference/assets/dragon.vdb", lights=lights)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0,
                      aspect=WIDTH / HEIGHT)
    scene = dataclasses.replace(scene, camera=cam)
    params = RenderParams(width=WIDTH, height=HEIGHT,
                          environment_type=int(Environment.BLACK),
                          ray_depth=50, volume_depth=1, max_track_steps=256,
                          engine=ENGINE, max_fused_steps=FUSED_STEPS)

    film = Film.zeros(HEIGHT, WIDTH)
    it = 0
    t0 = time.time()
    for _ in range(WARMUP):
        film = render_step(scene, params, film, jnp.uint32(it))
        it += 1
    jax.block_until_ready(film.accum)
    print(f"# warmup (incl. compile): {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(ITERS):
        film = render_step(scene, params, film, jnp.uint32(it))
        it += 1
    jax.block_until_ready(film.accum)
    dt = time.time() - t0

    rays = WIDTH * HEIGHT * ITERS
    mrays = rays / dt / 1e6
    print(f"# {ITERS} spp at {WIDTH}x{HEIGHT} in {dt:.2f}s "
          f"({dt/ITERS*1000:.0f} ms/spp)", file=sys.stderr)
    print(json.dumps({
        "metric": "primary Mrays/s/chip (dragon.vdb 512x512, config-1)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
