"""Next-event estimation: sun, point lights, and the two-strategy sky
MIS — ports of estimate_sun (render_kernel.cu:1478-1516),
estimate_point_light (:1445-1475, QUIRKS #3 budget estimator) and
estimate_sky (:1356-1443).

All functions are batched over rays; ``direction`` is the ALREADY
HG-scattered outgoing direction, matching the reference's evaluation
order (QUIRKS #6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.phase import (isotropic, phase_eval, power_heuristic,
                                sample_spherical)
from vpt_tpu.core.vecmath import degree_to_cartesian, length, normalize
from vpt_tpu.render.tracking import transmittance, vec3_param

LIGHT_BUDGET = 11  # 10..0 inclusive (render_kernel.cu:1459)


def environment_light_radiance(scene, params, pos, wi):
    """Li for sky NEE (the light-sampling side of estimate_sky):
    ATMOSPHERE -> sample_atmosphere; HDRI -> env texture; CONSTANT ->
    sky_color (extension); BLACK -> 0.  The reference applies sky_mult
    OUTSIDE (uniform_sample_one_light, render_kernel.cu:1549)."""
    from vpt_tpu.render.params import Environment
    et = params.environment_type
    if et == int(Environment.BLACK):
        return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    if et == int(Environment.CONSTANT):
        return jnp.broadcast_to(vec3_param(params.sky_color),
                                pos.shape[:-1] + (3,))
    if et == int(Environment.HDRI):
        if scene.env_map is None:
            return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
        from vpt_tpu.sky.envmap import sample_env_map
        return sample_env_map(scene.env_map, wi)
    # ATMOSPHERE
    if scene.atmosphere is not None:
        from vpt_tpu.sky.runtime import sample_atmosphere_scene
        return sample_atmosphere_scene(scene, params, pos, wi)
    from vpt_tpu.sky.procedural import sample_sky
    return sample_sky(wi, params.azimuth, params.elevation,
                      vec3_param(params.sky_color))


def estimate_sun(scene, params, key, pos, direction, tr_fn=transmittance):
    """Sun NEE (render_kernel.cu:1478-1516): Tr * phase(cos) *
    sun_color * sun_mult (the Bruneton irradiance fetch there is dead —
    its result is commented out at :1509-1511).  ``tr_fn`` swaps the
    shadow-walk estimator (parallel.instance_shard injects the sharded
    product walk)."""
    wi = degree_to_cartesian(params.azimuth, params.elevation)
    cos_theta = jnp.sum(direction * wi, axis=-1)
    phase_pdf = phase_eval(params, cos_theta)
    wib = jnp.broadcast_to(wi, pos.shape)
    tr = tr_fn(scene, params, jax.random.fold_in(key, 0), pos, wib)
    ld = (tr * phase_pdf)[..., None]
    return ld * vec3_param(params.sun_color) * params.sun_mult


def estimate_point_lights(scene, params, key, pos, direction,
                          tr_fn=transmittance):
    """Point-light NEE with the reference's budget quirk (QUIRKS #3):
    min(L, 11) uniform random picks summed WITHOUT normalization; the
    reference's wasted non-contributing Tr walks are skipped (they
    cannot affect the result)."""
    L = scene.lights.count
    if L == 0:
        return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    n_walks = min(L, LIGHT_BUDGET)
    total = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    for w in range(n_walks):
        kw = jax.random.fold_in(key, w)
        u = jax.random.uniform(jax.random.fold_in(kw, 0), pos.shape[:-1])
        idx = jnp.minimum((u * L).astype(jnp.int32), L - 1)
        lpos = jnp.take(scene.lights.pos, idx, axis=0)
        lcol = jnp.take(scene.lights.color, idx, axis=0)
        lpow = jnp.take(scene.lights.power, idx, axis=0)
        wi = normalize(lpos - pos)
        tr = tr_fn(scene, params, jax.random.fold_in(kw, 1), pos, wi)
        cos_theta = jnp.sum(direction * wi, axis=-1)
        phase_pdf = phase_eval(params, cos_theta)
        if params.reference_falloff:  # QUIRKS #2
            sqr = length(lpos * lpos - pos * pos)
        else:
            sqr = jnp.sum((lpos - pos) ** 2, axis=-1)
        falloff = 1.0 / jnp.maximum(sqr, 1e-12)
        total = total + lcol * (lpow * phase_pdf * falloff * tr)[..., None]
    return total


def _sample_env_direction(scene, params, key, shape):
    """Light-strategy direction sample for estimate_sky.

    The reference importance-samples the env CDF only for the
    procedural atmosphere; HDRI gets uniform-sphere samples (QUIRKS
    #24) unless params.hdri_importance extends CDF sampling to HDRI.
    Returns (wi, pdf)."""
    from vpt_tpu.render.params import Environment
    et = params.environment_type
    use_cdf = scene.env_cdf is not None and (
        et == int(Environment.ATMOSPHERE)
        or (et == int(Environment.HDRI) and params.hdri_importance))
    if use_cdf:
        from vpt_tpu.sky.cdf import sample_env_cdf
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape)
        return sample_env_cdf(scene.env_cdf, u1, u2), True
    return sample_spherical(key, shape), False


def _pdf_env_direction(scene, params, wi, used_cdf: bool):
    if used_cdf:
        from vpt_tpu.sky.cdf import pdf_env_cdf
        return pdf_env_cdf(scene.env_cdf, wi)
    return jnp.broadcast_to(isotropic(), wi.shape[:-1])


def estimate_sky(scene, params, key, pos, direction):
    """Two-strategy MIS sky NEE (render_kernel.cu:1356-1443): (a)
    sample the light (CDF or uniform sphere), weight by the power
    heuristic against the phase pdf; (b) sample the phase, weight
    against the light pdf.  Both strategies shoot a Tr shadow walk."""
    shape = pos.shape[:-1]
    k_light, k_phase, k_tr1, k_tr2 = jax.random.split(key, 4)

    # strategy (a): sample light
    (wi, light_pdf), used_cdf = _sample_env_direction(scene, params,
                                                      k_light, shape)
    li = environment_light_radiance(scene, params, pos, wi)
    cos_theta = jnp.sum(direction * wi, axis=-1)
    phase_pdf = phase_eval(params, cos_theta)
    tr = transmittance(scene, params, k_tr1, pos, wi)
    weight = power_heuristic(1.0, light_pdf, 1.0, phase_pdf)
    ok = (light_pdf > 0.0) & (phase_pdf > 0.0)
    contrib_a = li * (tr * phase_pdf * weight
                      / jnp.maximum(light_pdf, 1e-20))[..., None]
    ld = jnp.where(ok[..., None], contrib_a, 0.0)

    # strategy (b): sample phase
    from vpt_tpu.core.phase import phase_sample
    wi_b, phase_pdf_b = phase_sample(params, direction, k_phase)
    light_pdf_b = _pdf_env_direction(scene, params, wi_b, used_cdf)
    weight_b = power_heuristic(1.0, phase_pdf_b, 1.0, light_pdf_b)
    tr_b = transmittance(scene, params, k_tr2, pos, wi_b)
    li_b = environment_light_radiance(scene, params, pos, wi_b)
    ok_b = (phase_pdf_b > 0.0) & (light_pdf_b > 0.0)
    contrib_b = li_b * (tr_b * weight_b)[..., None]
    ld = ld + jnp.where(ok_b[..., None], contrib_b, 0.0)
    return ld
