"""Vector / matrix / AABB math for the TPU volumetric path tracer.

Functional JAX equivalents of the reference's C++ helpers
(`source/gpu_vdb/matrix_math.h`, `source/bvh/AABB.h`,
`source/common/helper_math.h`).  All functions are batched: a "vec3"
is an array of shape ``(..., 3)``, a "mat4" is ``(..., 4, 4)``
(row-major, points transform as ``p' = p @ M[:3,:3] + M[3,:3]`` —
i.e. row-vector convention matching the reference's
``mat4::transform_point``, matrix_math.h:216-236).

The reference's kernels always convert world->object space with
``xform.transpose().inverse()`` (e.g. render_kernel.cu:913); with the
row-vector convention used here that is simply the inverse of the
stored matrix applied to a row vector.  See docs/QUIRKS.md.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

M_INF = np.float32(3.402823466e38)  # matches M_INF (FLT_MAX) helper_math.h:41
EPS = np.float32(1e-3)  # matches EPS render_kernel.cu:84


# ---------------------------------------------------------------------------
# vec3 helpers
# ---------------------------------------------------------------------------

def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)],
        axis=-1,
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a, eps=1e-20):
    return a * jax_rsqrt(jnp.maximum(dot(a, a), eps))[..., None]


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def lerp(a, b, t):
    t = jnp.asarray(t)
    if t.ndim and t.shape[-1:] != (1,) and jnp.ndim(a) > t.ndim:
        t = t[..., None]
    return a + (b - a) * t


def reflect(i, n):
    """Mirror reflection, CUDA helper_math.h semantics: i - 2 n (n.i)."""
    return i - 2.0 * n * dot(n, i)[..., None]


def is_black(v, eps=0.0):
    return jnp.all(v <= eps, axis=-1) & jnp.all(v >= -eps, axis=-1)


# ---------------------------------------------------------------------------
# Orthonormal frames & spherical directions (render_kernel.cu:91-116)
# ---------------------------------------------------------------------------

def coordinate_system(v1):
    """Build (v2, v3) orthogonal to v1.  Mirrors render_kernel.cu:91-102."""
    cond = jnp.abs(v1[..., 0]) > jnp.abs(v1[..., 1])
    v2 = jnp.where(
        cond[..., None],
        vec3(-v1[..., 2], jnp.zeros_like(v1[..., 0]), v1[..., 0]),
        vec3(jnp.zeros_like(v1[..., 0]), v1[..., 2], -v1[..., 1]),
    )
    v2 = normalize(v2)
    v3 = normalize(cross(v1, v2))
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi, x, y, z):
    """render_kernel.cu:104-116."""
    st = jnp.asarray(sin_theta)[..., None]
    ct = jnp.asarray(cos_theta)[..., None]
    return (
        x * st * jnp.cos(phi)[..., None]
        + y * st * jnp.sin(phi)[..., None]
        + z * ct
    )


def degree_to_cartesian(azimuth, elevation):
    """Sun direction from azimuth/elevation in degrees.

    Mirrors render_kernel.cu:125-141 (y-up, azimuth measured in the
    xz plane from +x).
    """
    az = jnp.clip(jnp.asarray(azimuth, jnp.float32), 0.0, 360.0)
    el = jnp.clip(jnp.asarray(elevation, jnp.float32), -90.0, 90.0)
    az = jnp.deg2rad(az)
    el = jnp.deg2rad(90.0 - el)
    x = jnp.sin(el) * jnp.cos(az)
    y = jnp.cos(el)
    z = jnp.sin(el) * jnp.sin(az)
    return normalize(vec3(x, y, z))


# ---------------------------------------------------------------------------
# mat4 (row-vector convention) & quaternions (matrix_math.h)
# ---------------------------------------------------------------------------

def mat4_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def transform_point(m, p):
    """p' = [p,1] @ M, returning the first three components.

    Row-vector convention; equivalent to matrix_math.h:216-227 where the
    translation lives in the fourth row.  Written as explicit
    multiply-adds (not einsum) so XLA:TPU lowers it on the VPU instead
    of padding a (B,3)x(3,3) dot onto the MXU.
    """
    if m.ndim == 2:
        return (p[..., 0:1] * m[0, :3] + p[..., 1:2] * m[1, :3]
                + p[..., 2:3] * m[2, :3] + m[3, :3])
    r = jnp.einsum("...i,...ij->...j", p, m[..., :3, :3])
    return r + m[..., 3, :3]


def transform_vector(m, v):
    """Direction transform: no translation (matrix_math.h:229-236)."""
    if m.ndim == 2:
        return (v[..., 0:1] * m[0, :3] + v[..., 1:2] * m[1, :3]
                + v[..., 2:3] * m[2, :3])
    return jnp.einsum("...i,...ij->...j", v, m[..., :3, :3])


def mat4_inverse(m):
    return jnp.linalg.inv(m)


def mat4_translate(t):
    m = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), t.shape[:-1] + (4, 4))
    return m.at[..., 3, :3].set(t)


def mat4_scale(s):
    s = jnp.asarray(s, jnp.float32)
    if s.ndim == 0 or s.shape[-1] != 3:
        s = jnp.broadcast_to(s[..., None], s.shape + (3,))
    d = jnp.concatenate([s, jnp.ones(s.shape[:-1] + (1,), s.dtype)], axis=-1)
    return jnp.eye(4, dtype=jnp.float32) * d[..., None, :]


def quaternion_to_mat4(q):
    """Unit quaternion (x, y, z, w) -> rotation mat4 (row-vector).

    Matches the instance-file convention of matrix_math.h:379-414 /
    main.cpp:1063-1099 (.ins files store ``qx qy qz qw``).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-30), 0.0)
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Row-vector convention: rows are the images of the basis vectors.
    rows = jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy + wz, xz - wy, zero], axis=-1),
            jnp.stack([xy - wz, 1.0 - (xx + zz), yz + wx, zero], axis=-1),
            jnp.stack([xz + wy, yz - wx, 1.0 - (xx + yy), zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return rows


def compose_trs(translate, quat, scale):
    """xform = S * R * T in row-vector convention (apply S, then R, then T).

    Mirrors the .ins instance transform build at main.cpp:1063-1099.
    """
    return mat4_scale(scale) @ quaternion_to_mat4(quat) @ mat4_translate(translate)


# ---------------------------------------------------------------------------
# AABB (source/bvh/AABB.h)
# ---------------------------------------------------------------------------

def aabb_intersect(pmin, pmax, origin, direction):
    """Slab test with the reference's tmin<0 -> tmax fallback.

    Returns (hit, tmin, tmax).  Mirrors AABB::Intersect (AABB.h:182-205):
    misses when tmax <= 0 or tmin > tmax; if the origin is inside the
    box (tmin < 0) the *exit* distance is returned as tmin.
    """
    inv = 1.0 / direction
    t1 = (pmin - origin) * inv
    t2 = (pmax - origin) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax > 0.0) & (tmin <= tmax)
    tmin_adj = jnp.where(tmin < 0.0, tmax, tmin)
    hit = hit & (tmin_adj >= 0.0)
    return hit, tmin_adj, tmax


def aabb_contains(pmin, pmax, p):
    """Inclusive containment (AABB.h Contains, :141-146)."""
    return jnp.all((p >= pmin) & (p <= pmax), axis=-1)


def aabb_union(pmin_a, pmax_a, pmin_b, pmax_b):
    return jnp.minimum(pmin_a, pmin_b), jnp.maximum(pmax_a, pmax_b)


def aabb_overlaps(pmin_a, pmax_a, pmin_b, pmax_b):
    return jnp.all((pmax_a >= pmin_b) & (pmin_a <= pmax_b), axis=-1)


# ---------------------------------------------------------------------------
# numpy twins (host-side scene building)
# ---------------------------------------------------------------------------

def np_quaternion_to_mat4(q: np.ndarray) -> np.ndarray:
    return np.asarray(quaternion_to_mat4(jnp.asarray(q, jnp.float32)))


def np_compose_trs(t, q, s) -> np.ndarray:
    return np.asarray(
        compose_trs(
            jnp.asarray(t, jnp.float32),
            jnp.asarray(q, jnp.float32),
            jnp.asarray(s, jnp.float32),
        )
    )
