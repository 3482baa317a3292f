"""PBRT-style volumetric integrator (render_kernel.cu:1712-1756) with
``uniform_sample_one_light`` (:1519-1554, QUIRKS #9: nLights = 3
hardcoded regardless of which light classes are enabled).

Unlike the direct integrator, this one has no closest-object dispatch:
the walk continues from each collision with the scattered direction,
so it performs true multiple scattering inside the volume.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.phase import phase_sample
from vpt_tpu.core.vecmath import EPS, aabb_intersect, is_black
from vpt_tpu.render.integrator import environment_radiance
from vpt_tpu.render.nee import (estimate_point_lights, estimate_sky,
                                estimate_sun)
from vpt_tpu.render.tracking import delta_track, estimate_emission

N_LIGHTS = 3  # QUIRKS #9 (render_kernel.cu:1531)


def uniform_sample_one_light(scene, params, key, pos, direction):
    """Pick one of {sun, point lights, sky} uniformly, multiply by 3
    (render_kernel.cu:1519-1554)."""
    shape = pos.shape[:-1]
    u = jax.random.uniform(jax.random.fold_in(key, 0), shape)
    pick = (u * N_LIGHTS).astype(jnp.int32)

    L = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    sun = estimate_sun(scene, params, jax.random.fold_in(key, 1), pos,
                       direction)
    L = L + jnp.where((pick == 0)[..., None], sun, 0.0)
    if scene.lights.count > 0:
        pl = estimate_point_lights(scene, params, jax.random.fold_in(key, 2),
                                   pos, direction)
        L = L + jnp.where((pick == 1)[..., None], pl, 0.0)
    sky = estimate_sky(scene, params, jax.random.fold_in(key, 3), pos,
                       direction) * params.sky_mult
    L = L + jnp.where((pick >= 2)[..., None], sky, 0.0)
    return L * float(N_LIGHTS)


def vol_integrator(scene, params, key, origin, direction):
    """Batched volumetric integrator.  Returns (L, alpha, aux)."""
    B = origin.shape[0]
    hit, t_entry, _ = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                     origin, direction)
    pos0 = jnp.where(hit[..., None],
                     origin + direction * (t_entry + EPS)[..., None], origin)

    def body(state):
        pos, dirn, beta, L, alpha, depth_aov, cost, active, depth_i = state
        kd = jax.random.fold_in(key, depth_i)
        new_pos, mi, val, _hit_sph, alpha_add, steps = delta_track(
            scene, params, jax.random.fold_in(kd, 0), pos, dirn, active)
        beta = jnp.where(active[..., None], beta * val, beta)
        alpha = alpha + jnp.where(active, alpha_add, 0.0)
        cost = cost + jnp.where(active, steps, 0)
        pos = jnp.where(active[..., None], new_pos, pos)
        active = active & ~is_black(beta)
        mi = mi & active

        first = depth_i == 0
        depth_aov = jnp.where(
            first & mi, jnp.linalg.norm(origin - pos, axis=-1), depth_aov)

        ld = uniform_sample_one_light(scene, params,
                                      jax.random.fold_in(kd, 1), pos, dirn)
        L = L + jnp.where(mi[..., None], beta * ld, 0.0)
        if scene.atlas.has_emission:
            em = estimate_emission(scene, params, jax.random.fold_in(kd, 2),
                                   pos, dirn, active=mi)
            L = L + jnp.where(mi[..., None], em, 0.0)  # unscaled (QUIRKS #5)
        sdir, _ = phase_sample(params, dirn, jax.random.fold_in(kd, 3))
        dirn = jnp.where(mi[..., None], sdir, dirn)
        active = active & mi  # non-interacting walks exited the medium
        return (pos, dirn, beta, L, alpha, depth_aov, cost, active,
                depth_i + 1)

    def cond(state):
        active = state[7]
        depth_i = state[8]
        return (depth_i < params.ray_depth) & jnp.any(active)

    state = (pos0, direction, jnp.ones((B, 3), jnp.float32),
             jnp.zeros((B, 3), jnp.float32), jnp.zeros(B, jnp.float32),
             jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32), hit,
             jnp.int32(0))
    (pos, dirn, beta, L, alpha, depth_aov, cost, _a,
     _d) = jax.lax.while_loop(cond, body, state)

    # terminal environment: rays that never scattered look up from the
    # camera (render_kernel.cu:1750-1752 restores env_pos when beta is
    # still WHITE)
    untouched = jnp.linalg.norm(beta, axis=-1) > 0.9999
    env_from = jnp.where(untouched[..., None], origin, pos)
    L = L + environment_radiance(scene, params, env_from, dirn) * beta
    alpha = jnp.minimum(alpha, 1.0)
    aux = dict(cost=cost.astype(jnp.float32), depth=depth_aov,
               trunc=jnp.zeros(B, jnp.float32))
    return L, alpha, aux
