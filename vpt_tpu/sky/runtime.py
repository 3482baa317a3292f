"""Runtime atmosphere evaluation for the renderer — the device-side
`sample_atmosphere` (render_kernel.cu:839-895): full sky radiance with
ground intersection, sun disc, and the reference's exposure/whitepoint
tonemap curve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from vpt_tpu.core.vecmath import degree_to_cartesian, normalize
from vpt_tpu.sky import bruneton as br


import dataclasses as _dc


@dataclass(frozen=True)
class Atmosphere:
    """Scene-attachable bundle: params + LUTs + static texture dims.

    ``packed`` (br.pack_luts) holds the corner-packed runtime tables:
    when present, every terminal/ NEE atmosphere probe costs ONE row
    gather per texture instead of 4-32 serialized taps (VERDICT r2 #3;
    ~9x fewer terminal gathers on the planetary scenario)."""

    params: br.AtmosphereParams
    luts: br.AtmosphereLUTs
    packed: Optional[br.PackedLUTs] = None
    dims: br.LutDims = _dc.field(metadata=dict(static=True),
                                 default_factory=br.LutDims)

    @property
    def sample_luts(self):
        """The container the runtime samplers should read."""
        return self.packed if self.packed is not None else self.luts


jax.tree_util.register_dataclass(Atmosphere,
                                 data_fields=["params", "luts", "packed"],
                                 meta_fields=["dims"])


def make_atmosphere(dims: br.LutDims = br.LutDims(), cache_path=None,
                    use_ozone=True, use_constant_solar=False,
                    exposure=10.0, luminance_mode: str = "none",
                    do_white_balance: bool = False,
                    num_wavelengths: int = 15) -> Atmosphere:
    """Precompute (or load cached) LUTs — atmosphere::init()
    (atmosphere.cpp:1177-1291) with the npz cache standing in for the
    EXR texture cache.

    luminance_mode: "none" | "approximate" | "precomputed" (the
    reference's LUMINANCE enum): "approximate" keeps RGB-radiance LUTs
    and multiplies by the spectral k constants at runtime;
    "precomputed" runs `num_wavelengths` wavelengths in 3-λ batches
    blended through luminance_from_radiance (atmosphere.cpp:828-872).
    """
    import os
    use_lum = {"none": 0, "approximate": 1, "precomputed": 2}[luminance_mode]
    params = br.default_model(use_ozone=use_ozone,
                              use_constant_solar=use_constant_solar,
                              exposure=exposure, use_luminance=use_lum,
                              do_white_balance=do_white_balance)
    if cache_path and os.path.exists(cache_path):
        luts = br.load_luts(cache_path)
    elif use_lum == 2:
        luts = br.precompute_luminance(
            dims=dims, num_wavelengths=num_wavelengths, use_ozone=use_ozone,
            use_constant_solar=use_constant_solar)
        jax.block_until_ready(luts.transmittance)
        if cache_path:
            br.save_luts(cache_path, luts)
    else:
        # production-size LUTs kernel-fault the remote TPU runtime as a
        # single program; the per-slice chunked driver survives it
        big = dims.r * dims.mu * dims.scattering_w > 200_000
        on_tpu = jax.devices()[0].platform != "cpu"
        if big and on_tpu:
            luts = br.precompute_chunked(params, dims=dims)
        else:
            luts = jax.jit(br.precompute,
                          static_argnames=("dims", "num_scattering_orders"))(
                params, dims=dims)
        jax.block_until_ready(luts.transmittance)
        if cache_path:
            br.save_luts(cache_path, luts)
    return Atmosphere(params=params, luts=luts, packed=br.pack_luts(luts),
                      dims=dims)


def _sample_atmosphere_pre(atm: Atmosphere, ray_pos, ray_dir, azimuth,
                           elevation, dims: br.LutDims):
    """render_kernel.cu:839-877 minus the sun disc and tonemap:
    returns (pre-tonemap radiance, transmittance-to-space) — the
    bakeable part (the disc is too small for an equirect texel and the
    exposure curve uses DYNAMIC params)."""
    p = atm.params
    sun_direction = degree_to_cartesian(azimuth, elevation)
    earth_center = jnp.array([0.0, 1.0, 0.0], jnp.float32) * p.earth_center_y
    camera = ray_pos - earth_center
    view = normalize(ray_dir)

    # ground intersection (render_kernel.cu:847-860)
    pdc = camera  # relative to earth center already
    p_dot_v = jnp.sum(pdc * view, axis=-1)
    p_dot_p = jnp.sum(pdc * pdc, axis=-1)
    ray_ecd2 = p_dot_p - p_dot_v * p_dot_v
    disc = p.bottom_radius ** 2 - ray_ecd2
    dist = -p_dot_v - jnp.sqrt(jnp.maximum(disc, 0.0))
    hits_ground = (dist > 0.0) & (disc >= 0.0)

    # radiance -> luminance constants (render_kernel.cu:745, 821-833):
    # identity in NONE mode, the k factors in APPROXIMATE/PRECOMPUTED
    lum = p.use_luminance != 0
    sky_k = jnp.where(lum, p.sky_spectral_to_rgb, 1.0)
    sun_k = jnp.where(lum, p.sun_spectral_to_rgb, 1.0)

    # ground shading
    gp = camera + view * dist[..., None]
    normal = normalize(gp)
    luts = atm.sample_luts
    sun_irr, sky_irr = br.get_sun_and_sky_irradiance(
        p, luts, gp, normal, sun_direction, dims)
    ground_radiance = (p.ground_albedo / jnp.pi
                       * (sun_irr * sun_k + sky_irr * sky_k))
    in_scatter_g, trans_g = br.get_sky_radiance_to_point(
        p, luts, camera, gp, sun_direction, dims)
    ground_radiance = ground_radiance * trans_g + in_scatter_g * sky_k

    # sky (sun disc composed by the caller / _compose_sun_disc)
    radiance, trans = br.get_sky_radiance(p, luts, camera, view,
                                          sun_direction, dims)
    radiance = radiance * sky_k

    pre = jnp.where(hits_ground[..., None], ground_radiance, radiance)
    trans = jnp.where(hits_ground[..., None], jnp.zeros_like(trans), trans)
    return pre, trans


def _compose_sun_disc(p, pre, trans, view, sun_direction):
    """Add the analytic sun disc and apply the reference
    exposure/white-point curve (render_kernel.cu:862-886)."""
    lum = p.use_luminance != 0
    sun_k = jnp.where(lum, p.sun_spectral_to_rgb, 1.0)
    sun_cos = jnp.sum(view * sun_direction, axis=-1)
    sun_disc = sun_cos > jnp.cos(p.sun_angular_radius)
    out = pre + jnp.where(
        sun_disc[..., None], trans * br.get_solar_radiance(p) * sun_k, 0.0)
    exposure = jnp.where(p.use_luminance == 0, p.exposure,
                         p.exposure * 1e-5)
    return jnp.power(
        jnp.maximum(1.0 - jnp.exp(-out / p.white_point * exposure), 0.0),
        1.0 / 2.2)


def sample_atmosphere(atm: Atmosphere, ray_pos, ray_dir, azimuth,
                      elevation, dims: br.LutDims):
    """render_kernel.cu:839-895: sky + ground + sun disc, tonemapped
    with exposure/white-point (the reference bakes its tonemap into
    the environment lookup)."""
    pre, trans = _sample_atmosphere_pre(atm, ray_pos, ray_dir, azimuth,
                                        elevation, dims)
    sun_direction = degree_to_cartesian(azimuth, elevation)
    return _compose_sun_disc(atm.params, pre, trans, normalize(ray_dir),
                             sun_direction)


def bake_sky_cache(atm: Atmosphere, anchor_pos, azimuth, elevation,
                   height: int = 256, width: int = 512):
    """Bake the position-anchored sky into an equirect (H, W, 6) cache
    [pre-tonemap radiance | transmittance].  The full per-ray Bruneton
    evaluation measured ~80% of the planetary scenario's wall time;
    the cache turns the terminal lookup into one bilinear fetch.
    Valid for rays near `anchor_pos` (scene scale << planet scale) and
    for THIS sun direction — re-bake on sun moves (the reference
    rebuilds its CPU sky CDF on the same trigger, main.cpp:1702-1705).
    """
    th = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * jnp.pi
    ph = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width \
        * (2.0 * jnp.pi)
    tg, pg = jnp.meshgrid(th, ph, indexing="ij")
    st = jnp.sin(tg)
    dirs = jnp.stack([st * jnp.cos(pg), jnp.cos(tg), st * jnp.sin(pg)],
                     axis=-1).reshape(-1, 3)
    pos = jnp.broadcast_to(jnp.asarray(anchor_pos, jnp.float32),
                           dirs.shape)
    pre, trans = _sample_atmosphere_pre(atm, pos, dirs, azimuth,
                                        elevation, atm.dims)
    tex = jnp.concatenate([pre, trans], axis=-1).reshape(height, width, 6)
    # corner-pack the bilinear neighborhood (y clamped, x wrapping):
    # the terminal lookup becomes ONE row gather instead of 4
    xp = jnp.mod(jnp.arange(width) + 1, width)
    yp = jnp.minimum(jnp.arange(height) + 1, height - 1)
    return jnp.concatenate([tex, tex[:, xp], tex[yp], tex[yp][:, xp]],
                           axis=-1)  # (H, W, 24)


def sample_sky_cache(p, cache, ray_dir, azimuth, elevation):
    """Equirect lookup of the baked corner-packed cache (one row
    gather) + analytic sun disc + the dynamic tonemap curve."""
    view = normalize(ray_dir)
    h, w = cache.shape[0], cache.shape[1]
    theta = jnp.arccos(jnp.clip(view[..., 1], -1.0, 1.0))
    phi = jnp.mod(jnp.arctan2(view[..., 2], view[..., 0]), 2.0 * jnp.pi)
    y = jnp.clip(theta / jnp.pi * h - 0.5, 0.0, h - 1.0)
    x = phi / (2.0 * jnp.pi) * w - 0.5
    y0 = jnp.floor(y).astype(jnp.int32)
    fy = (y - y0)[..., None]
    x0f = jnp.floor(x)
    fx = (x - x0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    flat = y0 * w + x0
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(cache.reshape(-1, 24), flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    v = ((rows[..., 0:6] * (1 - fx) + rows[..., 6:12] * fx) * (1 - fy)
         + (rows[..., 12:18] * (1 - fx) + rows[..., 18:24] * fx) * fy)
    sun_direction = degree_to_cartesian(azimuth, elevation)
    return _compose_sun_disc(p, v[..., 0:3], v[..., 3:6], view,
                             sun_direction)


def render_earth(atm: Atmosphere, width: int = 512, height: int = 512,
                 azimuth: float = 150.0, elevation: float = 30.0,
                 altitude_factor: float = 2.5, vfov_deg: float = 50.0):
    """Camera-from-space planetary render — the reference's
    ``render_earth`` debug integrator (render_kernel.cu:2138-2180):
    a perspective camera in orbit looking at the planet centre, each
    pixel evaluating the full atmosphere model (ground + limb + sky +
    sun disc).  Returns an (H, W, 3) float image in [0, 1] (the
    exposure/white-point curve is baked in, as in the reference).
    """
    p = atm.params
    cam_r = p.top_radius * altitude_factor
    earth_center = jnp.array([0.0, 1.0, 0.0], jnp.float32) \
        * p.earth_center_y
    # camera above the +z axis of the planet, looking at the centre
    cam_pos = earth_center + jnp.array([0.0, 0.0, cam_r], jnp.float32)
    half = jnp.tan(jnp.deg2rad(vfov_deg) * 0.5)
    ys = (0.5 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height) \
        * 2.0 * half
    xs = ((jnp.arange(width, dtype=jnp.float32) + 0.5) / width - 0.5) \
        * 2.0 * half * (width / height)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    dirs = jnp.stack([xg, yg, -jnp.ones_like(xg)], axis=-1).reshape(-1, 3)
    dirs = normalize(dirs)
    pos = jnp.broadcast_to(cam_pos, dirs.shape)
    img = sample_atmosphere(atm, pos, dirs, azimuth, elevation, atm.dims)
    return img.reshape(height, width, 3)


def sample_atmosphere_scene(scene, params, ray_pos, ray_dir):
    atm = scene.atmosphere
    if getattr(scene, "sky_cache", None) is not None:
        return sample_sky_cache(atm.params, scene.sky_cache, ray_dir,
                                params.azimuth, params.elevation)
    return sample_atmosphere(atm, ray_pos, ray_dir, params.azimuth,
                             params.elevation, atm.dims)
