"""Structure-visualization debug render modes — the TPU equivalents of
the reference's `visualize_BVH` (render_kernel.cu:2108-2125) and
`visualize_OCTree` (:2127-2136) debug integrators.

Both are single-pass primary-ray evaluations (no sampling loop):

* ``bvh`` — per-ray count of instance-leaf AABB hits.  The reference
  walks its BVH recursively and accumulates leaf `rayBoxIntersect`
  hits; since internal nodes only *prune* (the hit count is identical
  with or without them), the TPU version tests every leaf box
  vectorized across the (B, N) grid — one fused elementwise block, no
  pointer chasing.
* ``occupancy`` — the octree-occupancy analog over the flat majorant
  grid (accel/majorant.py): fraction of equidistant samples along the
  ray's root-box span that land in occupied cells, i.e. a structure
  heat map of the acceleration grid the tracking loops actually skip
  through.
"""

from __future__ import annotations

import jax.numpy as jnp

from vpt_tpu.core.vecmath import aabb_intersect


def bvh_hits(scene, origin, direction):
    """(B,) float32 leaf-AABB hit counts (visualize_BVH analog)."""
    pmin = scene.instances.pmin  # (N, 3)
    pmax = scene.instances.pmax
    safe = jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    inv = 1.0 / safe  # (B, 3)
    t1 = (pmin[None, :, :] - origin[:, None, :]) * inv[:, None, :]
    t2 = (pmax[None, :, :] - origin[:, None, :]) * inv[:, None, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (B, N)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax > 0.0) & (tmin <= tmax)
    return jnp.sum(hit, axis=-1).astype(jnp.float32)


def occupancy_fraction(scene, origin, direction, samples: int = 128):
    """(B,) float32 occupied-cell sample fraction along the root-box
    span (visualize_OCTree analog over the flat majorant grid).
    Returns 0 where the ray misses the scene box or the scene has no
    majorant grid."""
    if scene.majorant is None:
        return jnp.zeros(origin.shape[0], jnp.float32)
    occ = scene.majorant.occupied
    R = occ.shape[0]
    hit, t_entry, t_exit = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                          origin, direction)
    t0 = jnp.maximum(jnp.minimum(t_entry, t_exit), 0.0)
    t1 = jnp.maximum(t_exit, t0)
    frac = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples
    t = t0[:, None] + frac[None, :] * (t1 - t0)[:, None]        # (B, S)
    pos = origin[:, None, :] + direction[:, None, :] * t[..., None]
    rel = ((pos - scene.root_pmin) / (scene.root_pmax - scene.root_pmin)
           * R)
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    vals = jnp.take(occ.reshape(-1), flat)                      # (B, S)
    out = jnp.mean(vals.astype(jnp.float32), axis=-1)
    return jnp.where(hit, out, 0.0)


def render_structure_aov(scene, params, kind: str):
    """Render a (H, W) float structure image with the scene camera
    (the reference shows these through the normal display path)."""
    import jax

    H, W = params.height, params.width
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = ((xs + 0.5) / W).reshape(-1)
    v = ((ys + 0.5) / H).reshape(-1)
    key = jax.random.PRNGKey(0)
    origin, direction = scene.camera.get_rays(u, v, key)
    if kind == "bvh":
        img = bvh_hits(scene, origin, direction)
    elif kind == "occupancy":
        img = occupancy_fraction(scene, origin, direction)
    else:
        raise ValueError(f"unknown structure AOV: {kind}")
    return img.reshape(H, W)
