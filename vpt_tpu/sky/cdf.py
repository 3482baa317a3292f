"""Environment importance sampling: 2-D CDF tables + samplers.

Port of the reference's CPU CDF construction (main.cpp:647-771) and the
device samplers `draw_sample_from_distribution` /
`draw_pdf_from_distribution` (render_kernel.cu:165-269), vectorized:
the hand-rolled per-thread binary search becomes a batched
`searchsorted` over rows.

Fixes vs the reference (docs/QUIRKS.md #10/#19): one consistent
resolution constant, and a consistent y-up (elevation = acos(y))
mapping between CDF build, direction sampling and pdf lookup — the
reference builds the table y-up but samples z-up
(render_kernel.cu:245-248), which misaligns pdf and radiance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

CDF_RES = 180  # main.cpp:664


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvCDF:
    value: jax.Array          # (H, W, 3) radiance
    func: jax.Array           # (H, W) luminous power |value|
    cdf: jax.Array            # (H, W) row-wise conditional CDF
    marginal_func: jax.Array  # (H,)
    marginal_cdf: jax.Array   # (H,)
    marginal_int: jax.Array   # ()


def build_env_cdf(value_grid) -> EnvCDF:
    """Build CDF tables from an (H, W, 3) radiance grid where row v
    is elevation v/(H-1)*pi and column u is azimuth u/(W-1)*2pi.

    Mirrors main.cpp:685-756 including its off-by-one shifts: cdf[x]
    accumulates func[x-1]/W, so cdf[0] = 0 and the last column is
    forced to 1.  Non-square grids (full-resolution HDRI CDFs) are an
    extension; the reference always resamples to 180x180.
    """
    n_v, n_u = value_grid.shape[:2]
    func = jnp.linalg.norm(value_grid, axis=-1)
    # cdf[y, x] = sum_{k<x} func[y, k] / W  (exclusive prefix sum)
    csum = jnp.cumsum(func, axis=1) / n_u
    cdf = jnp.concatenate([jnp.zeros((n_v, 1), jnp.float32), csum[:, :-1]],
                          axis=1)
    marginal_func = csum[:, -1]  # row integral (main.cpp:698)
    row_int = jnp.maximum(marginal_func, 1e-12)
    cdf = cdf / row_int[:, None]
    cdf = cdf.at[:, -1].set(1.0)

    mcsum = jnp.cumsum(marginal_func) / n_v
    marginal_cdf = jnp.concatenate([jnp.zeros((1,), jnp.float32), mcsum[:-1]])
    marginal_int = mcsum[-1]
    marginal_cdf = marginal_cdf / jnp.maximum(marginal_int, 1e-6)
    marginal_cdf = marginal_cdf.at[-1].set(1.0)

    return EnvCDF(value=value_grid, func=func, cdf=cdf,
                  marginal_func=marginal_func, marginal_cdf=marginal_cdf,
                  marginal_int=marginal_int)


def build_sky_cdf(azimuth, elevation, sky_color, res: int = CDF_RES) -> EnvCDF:
    """Procedural-sky CDF (create_cdf, main.cpp:647-771): evaluate the
    simple sky on an (el, az) grid."""
    from vpt_tpu.sky.procedural import sample_sky
    el = jnp.arange(res, dtype=jnp.float32) / (res - 1) * jnp.pi
    az = jnp.arange(res, dtype=jnp.float32) / (res - 1) * 2.0 * jnp.pi
    el_g, az_g = jnp.meshgrid(el, az, indexing="ij")
    dirs = jnp.stack([jnp.sin(el_g) * jnp.cos(az_g), jnp.cos(el_g),
                      jnp.sin(el_g) * jnp.sin(az_g)], axis=-1)
    value = sample_sky(dirs, azimuth, elevation, sky_color)
    # rays missing the atmosphere return the RED sentinel; zero them for
    # the distribution (they are below the horizon here)
    return build_env_cdf(value)


def build_envmap_cdf(env_map, res: int | None = CDF_RES) -> EnvCDF:
    """CDF from an equirect HDR environment (extension: the reference
    only importance-samples the procedural sky).  res=None keeps the
    map's NATIVE resolution (exact importance distribution — bright
    texels smaller than a 180^2 cell are otherwise diluted)."""
    if res is None:
        return build_env_cdf(jnp.asarray(env_map, jnp.float32))
    import jax.image as jimage
    resized = jimage.resize(env_map, (res, res, 3), method="linear")
    return build_env_cdf(resized.astype(jnp.float32))


def _interp1(table, x):
    """Linear interp of a 1-D table at fractional index x."""
    n = table.shape[0]
    x = jnp.clip(x, 0.0, n - 1.0)
    i0 = jnp.floor(x).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    f = x - i0.astype(jnp.float32)
    return table[i0] * (1.0 - f) + table[i1] * f


def _interp_rows(table2d, rows, x):
    n = table2d.shape[1]
    x = jnp.clip(x, 0.0, n - 1.0)
    i0 = jnp.floor(x).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    f = x - i0.astype(jnp.float32)
    return table2d[rows, i0] * (1.0 - f) + table2d[rows, i1] * f


def sample_env_cdf(env: EnvCDF, u1, u2):
    """Draw directions from the 2-D CDF (render_kernel.cu:165-252).

    u1, u2: (...,) uniforms.  Returns (wo (...,3), pdf (...,)).
    """
    n_v, n_u = env.cdf.shape
    # marginal row: reference binary search 'first interval with cdf > u'
    v = jnp.clip(jnp.searchsorted(env.marginal_cdf, u1, side="right") - 1,
                 0, n_v - 2)
    d_m = env.marginal_cdf[v + 1] - env.marginal_cdf[v]
    dv = jnp.where(d_m > 0.0, (u1 - env.marginal_cdf[v]) / jnp.maximum(d_m, 1e-20), 0.0)
    marginal_pdf = _interp1(env.marginal_func, v.astype(jnp.float32) + dv) \
        / jnp.maximum(env.marginal_int, 1e-12)
    theta = (v.astype(jnp.float32) + dv) / n_v * jnp.pi

    # conditional column within row v (batched searchsorted over rows)
    rows = env.cdf[v]
    u = jnp.clip(
        jax.vmap(lambda row, z: jnp.searchsorted(row, z, side="right"))(
            rows.reshape(-1, n_u), u2.reshape(-1)).reshape(u2.shape) - 1,
        0, n_u - 2)
    c0 = env.cdf[v, u]
    d_c = env.cdf[v, u + 1] - c0
    du = jnp.where(d_c > 0.0, (u2 - c0) / jnp.maximum(d_c, 1e-20), 0.0)
    cond_pdf = (_interp_rows(env.func, v, u.astype(jnp.float32) + du)
                / jnp.maximum(env.marginal_func[v], 1e-12))
    phi = (u.astype(jnp.float32) + du) / n_u * 2.0 * jnp.pi

    sin_t = jnp.sin(theta)
    # consistent y-up mapping (fix of render_kernel.cu:245-248, QUIRKS)
    wo = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta),
                    sin_t * jnp.sin(phi)], axis=-1)
    pdf = (marginal_pdf * cond_pdf) / (2.0 * jnp.pi * jnp.pi
                                       * jnp.maximum(sin_t, 1e-6))
    return wo, pdf


def pdf_env_cdf(env: EnvCDF, wi):
    """pdf of a given direction (pdf_li + draw_pdf_from_distribution,
    render_kernel.cu:258-269, 1342-1354)."""
    n_v, n_u = env.cdf.shape
    theta = jnp.arccos(jnp.clip(wi[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(wi[..., 2], wi[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    sin_theta = jnp.sin(theta)
    iu = jnp.clip((phi / (2.0 * jnp.pi) * n_u).astype(jnp.int32),
                  0, n_u - 1)
    iv = jnp.clip((theta / jnp.pi * n_v).astype(jnp.int32), 0, n_v - 1)
    cond = env.func[iv, iu] / jnp.maximum(env.marginal_func[iv], 1e-12)
    marg = env.marginal_func[iv] / jnp.maximum(env.marginal_int, 1e-12)
    pdf = (marg * cond) / (2.0 * jnp.pi * jnp.pi
                           * jnp.maximum(sin_theta, 1e-6))
    return jnp.where(sin_theta <= 0.0, 0.0, pdf)
