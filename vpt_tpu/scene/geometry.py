"""Analytic geometry: the reference sphere (source/geometry/geometry.h).

The reference always passes one "reference sphere" to the render
kernel (main.cpp:1479-1483, default at (0,1000,0) r=1, i.e. far out of
frame).  Tracking walks treat a sphere hit as an opaque occluder
(render_kernel.cu:1160, :1648-1657) and the direct integrator shades
it with a roughness lerp of mirror/cosine-hemisphere scattering
(render_kernel.cu:1807-1834).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Sphere:
    center: jax.Array     # (3,)
    radius: jax.Array     # ()
    color: jax.Array      # (3,)
    roughness: jax.Array  # ()
    enabled: jax.Array    # () bool — extension: disable entirely

    @staticmethod
    def make(center=(0.0, 1000.0, 0.0), radius=1.0, color=(10.0, 0.0, 0.0),
             roughness=1.0, enabled=True) -> "Sphere":
        return Sphere(
            center=jnp.asarray(center, jnp.float32),
            radius=jnp.asarray(radius, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            roughness=jnp.asarray(roughness, jnp.float32),
            enabled=jnp.asarray(enabled, bool),
        )

    @staticmethod
    def none() -> "Sphere":
        return Sphere.make(enabled=False)


def sphere_intersect(sph: Sphere, ray_pos, ray_dir):
    """Quadratic intersect with the reference's t ordering rules
    (geometry.h:114-140): sorted roots; if t_min < 0 use t_max; miss if
    both negative.  Returns (hit, t_min, t_max)."""
    orig = ray_pos - sph.center
    a = jnp.sum(ray_dir * ray_dir, axis=-1)
    b = 2.0 * jnp.sum(ray_dir * orig, axis=-1)
    c = jnp.sum(orig * orig, axis=-1) - sph.radius * sph.radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    tmin = jnp.where(tmin < 0.0, tmax, tmin)
    hit = ok & (tmin >= 0.0) & sph.enabled
    return hit, tmin, tmax
