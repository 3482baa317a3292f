"""Equirectangular environment maps: lookup and (later) CDF importance
sampling.  Port of sample_env_tex (render_kernel.cu:897-907).

Terminal/NEE lookups pay the TPU's serialized-gather cost per tap
(docs/ARCHITECTURE.md), so scenes store the map CORNER-PACKED
(pack_env_map): one (H, W, 12) row carries the full bilinear
neighborhood and a lookup is ONE row gather instead of 4.  The raw
texel grid stays recoverable as ``packed[..., 0:3]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_env_map(env_map):
    """(H, W, 3) -> (H, W, 12) bilinear corner rows (x wraps, y
    clamps — the same addressing sample_env_map uses)."""
    env_map = jnp.asarray(env_map, jnp.float32)
    H, W = env_map.shape[:2]
    xp = jnp.mod(jnp.arange(W) + 1, W)
    yp = jnp.minimum(jnp.arange(H) + 1, H - 1)
    return jnp.concatenate([env_map, env_map[:, xp], env_map[yp],
                            env_map[yp][:, xp]], axis=-1)


def env_uv(direction):
    """Direction -> equirect (u, v) per render_kernel.cu:901-905:
    u = atan2(z, x)/(2π) + 0.5, v = acos(clamp(y))/π."""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def sample_env_map(env_map, direction):
    """Bilinear equirect lookup (cudaFilterModeLinear semantics).

    env_map: (H, W, 3) raw (4 gathers) or (H, W, 12) corner-packed
    (1 row gather); direction: (..., 3) normalized.
    """
    H, W = env_map.shape[:2]
    u, v = env_uv(direction)
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # wrap horizontally, clamp vertically (typical env sampling)
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    y0i = y0.astype(jnp.int32)

    if env_map.shape[-1] == 12:  # corner-packed rows
        flat = y0i * W + x0i
        (flat,) = jax.lax.optimization_barrier((flat,))
        rows = jnp.take(env_map.reshape(-1, 12), flat, axis=0)
        (rows,) = jax.lax.optimization_barrier((rows,))
        return ((rows[..., 0:3] * (1 - fx) + rows[..., 3:6] * fx)
                * (1 - fy)
                + (rows[..., 6:9] * (1 - fx) + rows[..., 9:12] * fx) * fy)

    x1i = jnp.mod(x0i + 1, W)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def tap(yy, xx):
        return env_map[yy, xx]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)
