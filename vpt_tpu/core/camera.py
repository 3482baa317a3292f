"""Thin-lens camera.

TPU-native equivalent of the reference camera (source/gpu_vdb/camera.h:
110-136): ``update_camera`` precomputes an orthonormal basis and the
film corner; ``get_rays`` generates a batch of primary rays with
aperture (depth-of-field) sampling.

Differences from the reference, by design (documented in
docs/QUIRKS.md): lens points are drawn with a concentric disk map from
the functional threefry RNG instead of curand + van-der-Corput
rejection sampling (camera.h:49-75) — same distribution, no data-
dependent loop, so it vectorizes on the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vpt_tpu.core.vecmath import cross, normalize, vec3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """Pytree of precomputed camera frame data (all float32)."""

    origin: jax.Array            # (3,)
    lower_left_corner: jax.Array  # (3,)
    horizontal: jax.Array        # (3,)
    vertical: jax.Array          # (3,)
    u: jax.Array                 # (3,) right
    v: jax.Array                 # (3,) up
    w: jax.Array                 # (3,) backward
    lens_radius: jax.Array       # ()
    focus_dist: jax.Array        # ()

    @staticmethod
    def make(lookfrom, lookat, vup=(0.0, 1.0, 0.0), vfov=30.0,
             aspect=1.0, aperture=0.0) -> "Camera":
        """Mirrors camera::update_camera (camera.h:110-129).

        The focus plane sits at the lookat distance.
        """
        lookfrom = jnp.asarray(lookfrom, jnp.float32)
        lookat = jnp.asarray(lookat, jnp.float32)
        vup = jnp.asarray(vup, jnp.float32)
        focus_dist = jnp.linalg.norm(lookfrom - lookat)
        lens_radius = jnp.asarray(aperture, jnp.float32) / 2.0
        theta = jnp.deg2rad(jnp.asarray(vfov, jnp.float32))
        half_height = jnp.tan(theta / 2.0)
        half_width = aspect * half_height
        w = normalize(lookfrom - lookat)
        u = normalize(cross(vup, w))
        v = cross(w, u)
        llc = (lookfrom - half_width * focus_dist * u
               - half_height * focus_dist * v - focus_dist * w)
        return Camera(
            origin=lookfrom,
            lower_left_corner=llc,
            horizontal=2.0 * half_width * focus_dist * u,
            vertical=2.0 * half_height * focus_dist * v,
            u=u, v=v, w=w,
            lens_radius=jnp.asarray(lens_radius, jnp.float32),
            focus_dist=jnp.asarray(focus_dist, jnp.float32),
        )

    def get_rays(self, s, t, key):
        """Primary rays for film coords (s, t) in [0,1)^2, batched.

        Returns (origin, direction) with direction normalized.
        Mirrors camera::get_ray (camera.h:131-136) with a concentric
        disk lens sample.
        """
        k1, k2 = jax.random.split(key)
        shape = jnp.shape(s)
        r = jnp.sqrt(jax.random.uniform(k1, shape, jnp.float32))
        phi = 2.0 * jnp.pi * jax.random.uniform(k2, shape, jnp.float32)
        rd = self.lens_radius * r
        offset = (self.u * (rd * jnp.cos(phi))[..., None]
                  + self.v * (rd * jnp.sin(phi))[..., None])
        origin = self.origin + offset
        direction = (self.lower_left_corner
                     + s[..., None] * self.horizontal
                     + t[..., None] * self.vertical
                     - origin)
        return origin, normalize(direction)
