"""Gather cost vs index distribution: in-volume, out-of-box (edge
voxels), identical, random-scattered."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.lights.lights import PointLights
from vpt_tpu.scene.scene import load_vdb_scene

B = 16384
N = 64

scene = load_vdb_scene("/root/reference/assets/dragon.vdb",
                       lights=PointLights.empty())
tbl = scene.atlas.density_corners
V = tbl.shape[0]
key = jax.random.PRNGKey(0)
print("table", tbl.shape, flush=True)


def timeit(fn, label, iters=4):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:8.2f} ms  {dt/N/B*1e9:7.2f} ns/lane/iter",
          flush=True)


def make_loop(base, spread):
    """fori loop gathering rows at base + (u*spread) mod V."""
    @jax.jit
    def run():
        def body(i, s):
            t, acc = s
            uu = jax.random.uniform(jax.random.fold_in(key, i), (B,))
            t = t + uu
            flat = (base + (t * spread).astype(jnp.int32)) % V
            (flat,) = jax.lax.optimization_barrier((flat,))
            rows = jnp.take(tbl, flat, axis=0)
            (rows,) = jax.lax.optimization_barrier((rows,))
            return (t, acc + rows.sum(-1))
        return jax.lax.fori_loop(0, N, body, (jnp.zeros(B), jnp.zeros(B)))
    return run


timeit(make_loop(0, 0.0), "identical idx (0)     ")
timeit(make_loop(0, 8.0), "small walk (0..~500)  ")
timeit(make_loop(0, float(V)), "scattered over table  ")
timeit(make_loop(V - 2, 0.0), "identical idx (V-2)   ")

# per-lane DIFFERENT but constant-ish: lane id + small walk
@jax.jit
def lane_coherent():
    lane = jnp.arange(B) % V

    def body(i, s):
        t, acc = s
        uu = jax.random.uniform(jax.random.fold_in(key, i), (B,))
        t = t + uu
        flat = (lane + t.astype(jnp.int32)) % V
        (flat,) = jax.lax.optimization_barrier((flat,))
        rows = jnp.take(tbl, flat, axis=0)
        (rows,) = jax.lax.optimization_barrier((rows,))
        return (t, acc + rows.sum(-1))
    return jax.lax.fori_loop(0, N, body, (jnp.zeros(B), jnp.zeros(B)))


timeit(lane_coherent, "lane-id + walk        ")
