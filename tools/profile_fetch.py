"""Bisect the per-step fetch cost: raw gather vs corner-row trilinear
vs the full unified fetch."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.core.vecmath import transform_point
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.ops import trilinear
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.tracking import unified_fetch
from vpt_tpu.scene.scene import load_vdb_scene

B = 16384
N = 64

scene = load_vdb_scene("/root/reference/assets/dragon.vdb",
                       lights=PointLights.empty())
P = RenderParams()
key = jax.random.PRNGKey(0)

c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
ext = np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin)
origin = jnp.asarray(
    c + np.random.RandomState(0).uniform(-0.3, 0.3, (B, 3)) * ext,
    jnp.float32)
direction = jnp.asarray(
    np.random.RandomState(1).standard_normal((B, 3)), jnp.float32)
direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)

V = scene.atlas.density_corners.shape[0]
print("corner table:", scene.atlas.density_corners.shape, flush=True)


def timeit(fn, label, iters=4):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:8.2f} ms   {dt/N/B*1e9:7.2f} ns/lane/iter",
          flush=True)


def loop(fetch):
    def body(i, s):
        t, acc = s
        uu = jax.random.uniform(jax.random.fold_in(key, i), (B,))
        t = t + uu * 0.05
        p = origin + direction * t[:, None]
        acc = acc + fetch(p)
        return (t, acc)
    return jax.lax.fori_loop(0, N, body, (jnp.zeros(B), jnp.zeros(B)))


# 1. raw row gather from a data-dependent flat index (the floor)
@jax.jit
def raw_gather():
    tbl = scene.atlas.density_corners

    def fetch(p):
        flat = jnp.clip((p[:, 0] * 1000 + p[:, 1] * 100
                         + p[:, 2]).astype(jnp.int32), 0, V - 1)
        (flat,) = jax.lax.optimization_barrier((flat,))
        rows = jnp.take(tbl, flat, axis=0)
        (rows,) = jax.lax.optimization_barrier((rows,))
        return rows.sum(axis=-1)
    return loop(fetch)


# 2. corner-row trilinear (ops/trilinear.sample_density)
@jax.jit
def tri():
    inv = scene.instances.inv_xform[0]

    def fetch(p):
        ipos = transform_point(inv, p)
        return trilinear.sample_density(scene.atlas, 0, ipos)
    return loop(fetch)


# 2b. trilinear with scalar grid_id from the instances array (traced)
@jax.jit
def tri_traced_gid():
    inv = scene.instances.inv_xform[0]
    gid = scene.instances.grid_id[0]

    def fetch(p):
        ipos = transform_point(inv, p)
        return trilinear.sample_density(scene.atlas, gid, ipos)
    return loop(fetch)


# 3. full unified fetch (density + skip)
@jax.jit
def unified():
    def fetch(p):
        d, s = unified_fetch(scene, P, p, direction)
        return d + s
    return loop(fetch)


# 4. unified fetch, density consumer only
@jax.jit
def unified_d_only():
    def fetch(p):
        d, s = unified_fetch(scene, P, p, direction)
        return d
    return loop(fetch)


timeit(raw_gather, "raw row gather      ")
timeit(tri, "trilinear corner-row")
timeit(tri_traced_gid, "trilinear traced gid")
timeit(unified, "unified fetch       ")
timeit(unified_d_only, "unified density-only")
