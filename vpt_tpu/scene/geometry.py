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


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SphereList:
    """Vectorized `geometry_list` of spheres (geometry.h:237-286) plus
    emissive sphere lights (sphere_light, geometry.h:174-235: scatter
    returns false and attenuation = its color, i.e. a pure emitter).

    The reference builds these only for its demo/test kernels
    (geometry_kernels.cu:81-112, main.cpp:1479-1502); here they are a
    first-class scene component usable by demo scenes and tests."""

    center: jax.Array      # (N, 3)
    radius: jax.Array      # (N,)
    color: jax.Array       # (N, 3)
    roughness: jax.Array   # (N,)  (ignored for emitters)
    is_light: jax.Array    # (N,) bool — sphere_light (emissive)

    @property
    def count(self) -> int:
        return self.center.shape[0]

    @staticmethod
    def make(centers, radii, colors, roughness=None, is_light=None
             ) -> "SphereList":
        import numpy as np
        centers = jnp.asarray(centers, jnp.float32).reshape(-1, 3)
        n = centers.shape[0]
        rough = (jnp.ones(n, jnp.float32) if roughness is None
                 else jnp.asarray(roughness, jnp.float32))
        lit = (jnp.zeros(n, bool) if is_light is None
               else jnp.asarray(np.asarray(is_light), bool))
        return SphereList(
            center=centers,
            radius=jnp.asarray(radii, jnp.float32).reshape(n),
            color=jnp.asarray(colors, jnp.float32).reshape(n, 3),
            roughness=rough, is_light=lit)

    @staticmethod
    def empty() -> "SphereList":
        return SphereList(center=jnp.zeros((0, 3), jnp.float32),
                          radius=jnp.zeros((0,), jnp.float32),
                          color=jnp.zeros((0, 3), jnp.float32),
                          roughness=jnp.zeros((0,), jnp.float32),
                          is_light=jnp.zeros((0,), bool))


def _sphere_roots(center, radius, ray_pos, ray_dir):
    orig = ray_pos - center
    a = jnp.sum(ray_dir * ray_dir, axis=-1)
    b = 2.0 * jnp.sum(ray_dir * orig, axis=-1)
    c = jnp.sum(orig * orig, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    tmin = jnp.where(tmin < 0.0, tmax, tmin)
    hit = ok & (tmin >= 0.0)
    return hit, tmin, tmax


def geometry_list_intersect(lst: SphereList, ray_pos, ray_dir):
    """Nearest-hit linear scan (geometry_list::intersect,
    geometry.h:243-264).  Returns (idx, t_min) with idx = -1 on miss —
    vectorized over rays, static loop over the (small) sphere list."""
    B = ray_pos.shape[:-1]
    best_t = jnp.full(B, 3.4e38, jnp.float32)
    best_i = jnp.full(B, -1, jnp.int32)
    for i in range(lst.count):
        hit, tmin, _ = _sphere_roots(lst.center[i], lst.radius[i],
                                     ray_pos, ray_dir)
        closer = hit & (tmin < best_t)
        best_t = jnp.where(closer, tmin, best_t)
        best_i = jnp.where(closer, i, best_i)
    return best_i, best_t


def geometry_list_shade(lst: SphereList, idx, ray_pos, ray_dir, t, key):
    """Scatter/emit at a geometry_list hit (geometry_list::scatter +
    sphere::scatter / sphere_light::scatter, geometry.h:142-235).

    Returns (new_pos, new_dir, attenuation, is_emitter): emitters
    terminate the path (scatter() returns false in the reference) with
    attenuation = emitted color."""
    from vpt_tpu.core.vecmath import lerp, normalize, reflect
    safe = jnp.maximum(idx, 0)
    center = lst.center[safe]
    radius = lst.radius[safe]
    color = lst.color[safe]
    rough = lst.roughness[safe]
    emit = lst.is_light[safe] & (idx >= 0)

    p = ray_pos + ray_dir * t[..., None]
    normal = normalize((p - center) / radius[..., None])
    nl = jnp.where((jnp.sum(normal * ray_dir, axis=-1) < 0)[..., None],
                   normal, -normal)
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, idx.shape, jnp.float32)
    u2 = jax.random.uniform(k2, idx.shape, jnp.float32)
    phi = 2.0 * jnp.pi * u1
    r2s = jnp.sqrt(u2)
    w = normalize(nl)
    a = jnp.where((jnp.abs(w[..., 0]) > 0.1)[..., None],
                  jnp.array([0.0, 1.0, 0.0], jnp.float32),
                  jnp.array([1.0, 0.0, 0.0], jnp.float32))
    u_ = normalize(jnp.cross(a, w))
    v_ = jnp.cross(w, u_)
    hemi = normalize(u_ * (jnp.cos(phi) * r2s)[..., None]
                     + v_ * (jnp.sin(phi) * r2s)[..., None]
                     + w * jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))[..., None])
    refl = reflect(ray_dir, nl)
    new_dir = lerp(refl, hemi, rough[..., None])
    new_pos = p + normal * 1e-3
    return new_pos, new_dir, color, emit


def triangle_intersect(v0, v1, v2, ray_pos, ray_dir, eps=1e-7):
    """Möller-Trumbore, no backface culling (triangle::intersect,
    plane.h:51-89).  Returns (hit, t) vectorized over rays."""
    v0 = jnp.asarray(v0, jnp.float32)
    e1 = jnp.asarray(v1, jnp.float32) - v0
    e2 = jnp.asarray(v2, jnp.float32) - v0
    P = jnp.cross(ray_dir, e2)
    det = jnp.sum(e1 * P, axis=-1)
    ok = jnp.abs(det) > eps
    inv = 1.0 / jnp.where(ok, det, 1.0)
    T = ray_pos - v0
    u = jnp.sum(T * P, axis=-1) * inv
    Q = jnp.cross(T, e1)
    v = jnp.sum(ray_dir * Q, axis=-1) * inv
    t = jnp.sum(e2 * Q, axis=-1) * inv
    hit = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > eps)
    return hit, jnp.where(hit, t, 3.4e38)


def plane_intersect(p0, p1, p2, p3, ray_pos, ray_dir):
    """Two-triangle quad (plane, plane.h:98-133: tris (p0,p1,p2) and
    (p0,p3,p2)).  Returns (hit, t)."""
    h1, t1 = triangle_intersect(p0, p1, p2, ray_pos, ray_dir)
    h2, t2 = triangle_intersect(p0, p3, p2, ray_pos, ray_dir)
    return h1 | h2, jnp.minimum(t1, t2)


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
