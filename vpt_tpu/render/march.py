"""The `march` engine: deterministic single-scatter transport from
bulk-gathered density profiles.

The reference's direct integrator is *effectively* single scattering
(QUIRKS #19: the post-event bounce teleports out of the volume), so
its expected radiance is an integral the TPU can evaluate by stratified
quadrature instead of per-lane stochastic walks:

    L = Int sigma_t(t) T(0,t) beta(t) dt * NEE(mean scatter point)
      + emission line integral (QUIRKS #21 rate weighting)
      + env(dir) * (T_end + (1 - T_end) * mean beta)

All density fetches are bulk (out of any loop) — they still pay the
serialized per-index gather cost (ROADMAP: ~24x slower than fused at
256 samples/ray), but the estimator is noise-free per spp.

Known approximations vs the stochastic engines (documented bias):
NEE transmittance and point-light falloff are evaluated at the
transmittance-weighted mean scatter point; the phase factor uses the
camera direction (exact for the default g = 0); the emission integral
runs forward along the camera ray from the mean scatter point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.phase import phase_eval
from vpt_tpu.core.vecmath import (aabb_intersect, degree_to_cartesian,
                                  length, normalize)
from vpt_tpu.render.tracking import (_sphere_block, density_color_lut,
                                     scene_color, scene_density,
                                     scene_emission, vec3_param)


def _profile_positions(origin, direction, t0, t1, n, u):
    """Stratified sample distances/positions along [t0, t1]."""
    i = jnp.arange(n, dtype=jnp.float32)
    frac = (i[None, :] + u) / n
    t = t0[:, None] + frac * (t1 - t0)[:, None]
    pos = origin[:, None, :] + direction[:, None, :] * t[..., None]
    return t, pos


def _transmittance_quadrature(scene, params, pos, w, dist, n, u):
    """Analytic Tr along w (expectation of the residual-ratio walk):
    exp(-Int (rho - sigma_c) ds / tr_depth - sigma_c * d), BLACK on a
    sphere hit (QUIRKS #7)."""
    t, p = _profile_positions(pos, w, jnp.zeros(dist.shape), dist, n, u)
    dens = scene_density(scene, p.reshape(-1, 3)).reshape(p.shape[:2])
    seg = (dist / n)[:, None]
    sigma_c = scene.min_extinction
    integral = jnp.sum((dens - sigma_c) * seg, axis=1) / params.tr_depth
    tr = jnp.exp(-integral - sigma_c * dist)
    sph_hit, _ = _sphere_block(scene, pos, w)
    return jnp.clip(jnp.where(sph_hit, 0.0, tr), 0.0, 1.0)


def march_single_scatter(scene, params, key, origin, direction):
    """Returns (L, alpha, aux) like the stochastic engines."""
    B = origin.shape[0]
    S = params.march_samples
    Ssh = params.shadow_samples

    hit, t_entry, t_exit = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                          origin, direction)
    t0 = jnp.where(hit, jnp.maximum(t_entry, 0.0), 0.0)
    # inside-origin rays: tmin<0->tmax rule returns the exit; start at 0
    t0 = jnp.minimum(t0, t_exit)
    t1 = jnp.where(hit, jnp.maximum(t_exit, t0), 0.0)

    ks = jax.random.split(key, 4)
    u = jax.random.uniform(ks[0], (B, S))
    t, pos = _profile_positions(origin, direction, t0, t1, S, u)
    flat = pos.reshape(-1, 3)
    dens = scene_density(scene, flat).reshape(B, S)
    seg = ((t1 - t0) / S)[:, None]
    sigma = dens * params.density_mult

    # transmittance to each segment start (exclusive cumulative sum)
    od = jnp.cumsum(sigma * seg, axis=1)
    od_excl = od - sigma * seg
    T = jnp.exp(-od_excl)
    T_end = jnp.exp(-od[:, -1])
    w_scatter = sigma * T * seg              # first-collision density
    W = jnp.sum(w_scatter, axis=1)

    # per-sample collision throughput (albedo * Cd * LUT / ext * energy)
    cd = scene_color(scene, flat).reshape(B, S, 3)
    lut = density_color_lut(scene, params, dens.reshape(-1)).reshape(B, S, 3)
    ext = vec3_param(params.extinction)
    beta_i = (vec3_param(params.albedo) * cd * lut / ext
              * params.energy_inject)
    scatter_beta = jnp.sum(w_scatter[..., None] * beta_i, axis=1)  # (B,3)

    # mean scatter point for the NEE transmittance
    t_mean = jnp.where(W > 0.0, jnp.sum(w_scatter * t, axis=1)
                       / jnp.maximum(W, 1e-20), 0.0)
    p_mean = origin + direction * t_mean[..., None]

    # sun NEE (estimate_sun: Tr * phase * sun_color * sun_mult)
    sun_dir = degree_to_cartesian(params.azimuth, params.elevation)
    sun_dirb = jnp.broadcast_to(sun_dir, p_mean.shape)
    _, _, d_sun = aabb_intersect(scene.root_pmin, scene.root_pmax, p_mean,
                                 sun_dirb)
    u_sh = jax.random.uniform(ks[1], (B, Ssh))
    tr_sun = _transmittance_quadrature(scene, params, p_mean, sun_dirb,
                                       jnp.maximum(d_sun, 0.0), Ssh, u_sh)
    cos_sun = jnp.sum(direction * sun_dir, axis=-1)
    nee = (vec3_param(params.sun_color) * params.sun_mult
           * (tr_sun * phase_eval(params, cos_sun))[..., None])

    # point lights: expectation of the budget estimator (QUIRKS #3) is
    # min(L, 11)/L * sum_l Le_l
    L_count = scene.lights.count
    if L_count > 0:
        scale = min(L_count, 11) / L_count
        for li in range(L_count):
            lpos = scene.lights.pos[li]
            wi = normalize(lpos - p_mean)
            _, _, d_l = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                       p_mean, wi)
            u_l = jax.random.uniform(jax.random.fold_in(ks[2], li), (B, Ssh))
            tr_l = _transmittance_quadrature(scene, params, p_mean, wi,
                                             jnp.maximum(d_l, 0.0), Ssh, u_l)
            cos_l = jnp.sum(direction * wi, axis=-1)
            if params.reference_falloff:  # QUIRKS #2
                sqr = length(lpos * lpos - p_mean * p_mean)
            else:
                sqr = jnp.sum((lpos - p_mean) ** 2, axis=-1)
            falloff = 1.0 / jnp.maximum(sqr, 1e-12)
            nee = nee + scene.lights.color[li] * (
                scale * scene.lights.power[li] * phase_eval(params, cos_l)
                * falloff * tr_l)[..., None]

    L = scatter_beta * nee

    # emission (QUIRKS #21 rate weighting), forward from the mean
    # scatter point, weighted by the collision probability
    if scene.atlas.has_emission:
        em = scene_emission(scene, flat, params).reshape(B, S, 3)
        rate = (scene.max_extinction * ext[0]) / params.tr_depth
        beyond = (t >= t_mean[:, None]).astype(jnp.float32)
        em_int = jnp.sum(em * (beyond * seg)[..., None], axis=1) * rate
        L = L + em_int * (1.0 - T_end)[..., None]

    # terminal environment: unattenuated for scattered paths (QUIRKS
    # #19 teleport) with the mean collision throughput
    from vpt_tpu.render.integrator import environment_radiance
    mean_beta = jnp.where(W[..., None] > 0.0,
                          scatter_beta / jnp.maximum(W, 1e-20)[..., None],
                          jnp.ones_like(scatter_beta))
    env = environment_radiance(scene, params, origin, direction)
    L = L + env * (T_end[..., None] + (1.0 - T_end)[..., None] * mean_beta)

    alpha = 1.0 - T_end
    depth = jnp.where(W > 0.0, t_mean, 0.0)
    aux = dict(cost=jnp.full((B,), float(S), jnp.float32), depth=depth,
               trunc=jnp.zeros(B, jnp.float32))
    return L, alpha, aux
