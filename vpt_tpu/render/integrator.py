"""The "reference" engine: a structure-faithful, lane-masked port of
the reference's direct integrator (Ray Tracing Gems ch.28 variant,
render_kernel.cu:1760-1857).

This is the validation baseline: nested bounded loops that mirror the
CUDA control flow one-to-one (including QUIRKS #5/#6/#19), against
which the fused state-machine engine is checked for statistical
equivalence (tests/test_fused.py).  The perf path is render/fused.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.phase import phase_sample
from vpt_tpu.core.vecmath import (EPS, aabb_intersect, cross, degree_to_cartesian,
                                  normalize, reflect, vec3)
from vpt_tpu.render.nee import (environment_light_radiance, estimate_point_lights,
                                estimate_sun)
from vpt_tpu.render.tracking import (_sphere_block, delta_track,
                                     estimate_emission, transmittance,
                                     vec3_param)


def environment_radiance(scene, params, pos, wi):
    """Terminal environment lookup (render_kernel.cu:1838-1850):
    ATMOSPHERE -> sample_atmosphere * sky_mult * sky_color; HDRI ->
    env texture * sky_color * isotropic() (QUIRKS #8); plus the BLACK
    and CONSTANT extensions."""
    from vpt_tpu.core.phase import isotropic
    from vpt_tpu.render.params import Environment
    et = params.environment_type
    if et == int(Environment.BLACK):
        return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    if et == int(Environment.CONSTANT):
        return jnp.broadcast_to(vec3_param(params.sky_color)
                                * params.sky_mult, pos.shape[:-1] + (3,))
    if et == int(Environment.HDRI):
        if scene.env_map is None:
            return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
        from vpt_tpu.sky.envmap import sample_env_map
        return (sample_env_map(scene.env_map, wi)
                * vec3_param(params.sky_color) * isotropic())
    li = environment_light_radiance(scene, params, pos, wi)
    return li * vec3_param(params.sky_color) * params.sky_mult


def _closest_object(scene, pos, direction):
    """get_closest_object (render_kernel.cu:1118-1135): 0 = none,
    1 = volume root box, 2 = reference sphere.  Returns (obj, t_min)
    with the AABB tmin<0 -> tmax quirk intact."""
    hit1, t1, _ = aabb_intersect(scene.root_pmin, scene.root_pmax, pos,
                                 direction)
    hit2, t2 = _sphere_block(scene, pos, direction)
    obj = jnp.where(hit1 & (~hit2 | (t1 < t2)), 1,
                    jnp.where(hit2, 2, 0))
    t_min = jnp.where(obj == 1, t1, jnp.where(obj == 2, t2, 0.0))
    return obj, t_min


def _shade_sphere(scene, params, key, pos, direction, beta, L, mask):
    """Sphere surface event (render_kernel.cu:1807-1834): roughness
    lerp of mirror and cosine-hemisphere scatter + direct sun."""
    sph = scene.sphere
    normal = normalize((pos - sph.center) / sph.radius)
    facing = jnp.sum(normal * direction, axis=-1) < 0.0
    nl = jnp.where(facing[..., None], normal, -normal)

    u = jax.random.uniform(key, pos.shape[:-1] + (2,))
    phi = 2.0 * jnp.pi * u[..., 0]
    r2 = u[..., 1]
    r2s = jnp.sqrt(r2)
    w = normalize(nl)
    pick = jnp.abs(w[..., 0]) > 0.1
    ref_axis = jnp.where(pick[..., None], vec3(0.0, 1.0, 0.0),
                         vec3(1.0, 0.0, 0.0))
    uax = normalize(cross(ref_axis, w))
    vax = cross(w, uax)
    hemi = normalize(uax * (jnp.cos(phi) * r2s)[..., None]
                     + vax * (jnp.sin(phi) * r2s)[..., None]
                     + w * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[..., None])
    mirror = reflect(direction, nl)
    new_dir = mirror + (hemi - mirror) * sph.roughness

    new_pos = pos + normal * EPS
    new_beta = beta * sph.color

    sun_dir = degree_to_cartesian(params.azimuth, params.elevation)
    sun_dirb = jnp.broadcast_to(sun_dir, pos.shape)
    v_tr = transmittance(scene, params, jax.random.fold_in(key, 3),
                         new_pos, sun_dirb)
    cos_l = jnp.maximum(jnp.sum(sun_dirb * normal, axis=-1), 0.0)
    sun_add = (vec3_param(params.sun_color) * params.sun_mult
               * (v_tr * cos_l)[..., None] * new_beta)

    m = mask[..., None]
    return (jnp.where(m, new_pos, pos), jnp.where(m, new_dir, direction),
            jnp.where(m, new_beta, beta), L + jnp.where(m, sun_add, 0.0))


def direct_integrator(scene, params, key, origin, direction):
    """Batched direct integrator.  Returns (L, alpha, aux) with aux
    holding 'cost' (primary tracking steps) and 'depth' (first-event
    distance, the depth_calculator AOV, render_kernel.cu:1859-1889)."""
    B = origin.shape[0]

    def body(state):
        (pos, dirn, beta, L, alpha, env_pos, depth_aov, cost, done,
         depth_i) = state
        kd = jax.random.fold_in(key, depth_i)

        obj, t_min = _closest_object(scene, pos, dirn)
        in_vol = (obj == 1) & ~done
        entry = jnp.where(in_vol[..., None],
                          pos + dirn * (t_min + EPS)[..., None], pos)

        pos_v = entry
        mi = jnp.zeros(B, bool)
        for vd in range(params.volume_depth):
            kv = jax.random.fold_in(kd, 100 + vd)
            new_pos, mi_v, val, hit_sph, alpha_add, steps = delta_track(
                scene, params, kv, pos_v, dirn, in_vol)
            beta = jnp.where(in_vol[..., None], beta * val, beta)
            alpha = alpha + jnp.where(in_vol, alpha_add, 0.0)
            cost = cost + jnp.where(in_vol, steps, 0)
            pos_v = jnp.where(in_vol[..., None], new_pos, pos_v)
            # mi carries the LAST active walk's outcome (the reference
            # checks the loop-final `mi`, render_kernel.cu:1798)
            mi = jnp.where(in_vol, mi_v, mi)
            # HG direction update at the medium event BEFORE the NEE
            # evaluations (QUIRKS #6, render_kernel.cu:1793)
            sdir, _ = phase_sample(params, dirn, jax.random.fold_in(kv, 1))
            dirn = jnp.where((mi_v & in_vol)[..., None], sdir, dirn)
            in_vol = in_vol & mi_v  # continue only after an interaction
        pos = jnp.where((obj == 1)[..., None] & ~done[..., None], pos_v, pos)

        # first-event depth AOV (one value per sample, from depth 0)
        first = (depth_i == 0)
        d_mi = jnp.linalg.norm(origin - pos, axis=-1)
        depth_aov = jnp.where(first & mi, d_mi, depth_aov)

        # NEE at the medium event (render_kernel.cu:1798-1804)
        sun = estimate_sun(scene, params, jax.random.fold_in(kd, 2), pos,
                           dirn)
        L = L + jnp.where(mi[..., None], sun * beta, 0.0)
        if scene.lights.count > 0:
            pl = estimate_point_lights(scene, params,
                                       jax.random.fold_in(kd, 3), pos, dirn)
            L = L + jnp.where(mi[..., None], pl * beta, 0.0)
        if scene.atlas.has_emission:
            em = estimate_emission(scene, params, jax.random.fold_in(kd, 4),
                                   pos, dirn, active=mi)
            # QUIRKS #5: emission is NOT scaled by beta
            L = L + jnp.where(mi[..., None], em, 0.0)

        # post-volume object check (render_kernel.cu:1806)
        obj2, t2 = _closest_object(scene, pos, dirn)
        sph_mask = (obj2 == 2) & ~done
        depth_aov = jnp.where(first & sph_mask & ~mi,
                              jnp.where(sph_mask, t2, 0.0), depth_aov)
        hit_pos = pos + dirn * t2[..., None]
        pos_s, dir_s, beta_s, L = _shade_sphere(
            scene, params, jax.random.fold_in(kd, 5), hit_pos, dirn, beta,
            L, sph_mask)
        pos = jnp.where(sph_mask[..., None], pos_s, pos)
        dirn = jnp.where(sph_mask[..., None], dir_s, dirn)
        beta = jnp.where(sph_mask[..., None], beta_s, beta)
        env_pos = jnp.where(sph_mask[..., None], pos, env_pos)

        done = done | ((obj == 0) & (obj2 != 2))
        return (pos, dirn, beta, L, alpha, env_pos, depth_aov, cost, done,
                depth_i + 1)

    def cond(state):
        done = state[8]
        depth_i = state[9]
        return (depth_i < params.ray_depth) & jnp.any(~done)

    state = (origin, direction, jnp.ones((B, 3), jnp.float32),
             jnp.zeros((B, 3), jnp.float32), jnp.zeros(B, jnp.float32),
             origin, jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
             jnp.zeros(B, bool), jnp.int32(0))
    (pos, dirn, beta, L, alpha, env_pos, depth_aov, cost, _done,
     _d) = jax.lax.while_loop(cond, body, state)

    L = L + environment_radiance(scene, params, env_pos, dirn) * beta
    alpha = jnp.minimum(alpha, 1.0)
    aux = dict(cost=cost.astype(jnp.float32), depth=depth_aov,
               trunc=jnp.zeros(B, jnp.float32))
    return L, alpha, aux
