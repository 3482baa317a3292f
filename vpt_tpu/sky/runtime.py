"""Runtime atmosphere evaluation for the renderer — the device-side
`sample_atmosphere` (render_kernel.cu:839-895): full sky radiance with
ground intersection, sun disc, and the reference's exposure/whitepoint
tonemap curve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vpt_tpu.core.vecmath import degree_to_cartesian, normalize
from vpt_tpu.sky import bruneton as br


import dataclasses as _dc


@dataclass(frozen=True)
class Atmosphere:
    """Scene-attachable bundle: params + LUTs + static texture dims."""

    params: br.AtmosphereParams
    luts: br.AtmosphereLUTs
    dims: br.LutDims = _dc.field(metadata=dict(static=True),
                                 default_factory=br.LutDims)


jax.tree_util.register_dataclass(Atmosphere, data_fields=["params", "luts"],
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
    return Atmosphere(params=params, luts=luts, dims=dims)


def sample_atmosphere(atm: Atmosphere, ray_pos, ray_dir, azimuth, elevation,
                      dims: br.LutDims):
    """render_kernel.cu:839-895: sky + ground + sun disc, tonemapped
    with exposure/white-point (the reference bakes its tonemap into the
    environment lookup)."""
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
    sun_irr, sky_irr = br.get_sun_and_sky_irradiance(
        p, atm.luts, gp, normal, sun_direction, dims)
    ground_radiance = (p.ground_albedo / jnp.pi
                       * (sun_irr * sun_k + sky_irr * sky_k))
    in_scatter_g, trans_g = br.get_sky_radiance_to_point(
        p, atm.luts, camera, gp, sun_direction, dims)
    ground_radiance = ground_radiance * trans_g + in_scatter_g * sky_k

    # sky + sun disc
    radiance, trans = br.get_sky_radiance(p, atm.luts, camera, view,
                                          sun_direction, dims)
    radiance = radiance * sky_k
    sun_cos = jnp.sum(view * sun_direction, axis=-1)
    sun_disc = sun_cos > jnp.cos(p.sun_angular_radius)
    radiance = radiance + jnp.where(
        sun_disc[..., None], trans * br.get_solar_radiance(p) * sun_k, 0.0)

    out = jnp.where(hits_ground[..., None], ground_radiance, radiance)
    # reference exposure/white-point curve (render_kernel.cu:880-886)
    exposure = jnp.where(p.use_luminance == 0, p.exposure,
                         p.exposure * 1e-5)
    out = jnp.power(
        jnp.maximum(1.0 - jnp.exp(-out / p.white_point * exposure), 0.0),
        1.0 / 2.2)
    return out


def sample_atmosphere_scene(scene, params, ray_pos, ray_dir):
    atm = scene.atmosphere
    return sample_atmosphere(atm, ray_pos, ray_dir, params.azimuth,
                             params.elevation, atm.dims)
