"""Equirectangular environment maps: lookup and (later) CDF importance
sampling.  Port of sample_env_tex (render_kernel.cu:897-907).
"""

from __future__ import annotations

import jax.numpy as jnp


def env_uv(direction):
    """Direction -> equirect (u, v) per render_kernel.cu:901-905:
    u = atan2(z, x)/(2π) + 0.5, v = acos(clamp(y))/π."""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def sample_env_map(env_map, direction):
    """Bilinear equirect lookup (cudaFilterModeLinear semantics).

    env_map: (H, W, 3); direction: (..., 3) normalized.
    """
    H, W = env_map.shape[:2]
    u, v = env_uv(direction)
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    fx = x - x0
    fy = y - y0
    # wrap horizontally, clamp vertically (typical env sampling)
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def tap(yy, xx):
        return env_map[yy, xx]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)
