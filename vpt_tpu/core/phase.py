"""Phase functions: Henyey-Greenstein (single & double lobe), isotropic.

Functional ports of light.h:55-64 and render_kernel.cu:271-362.

NOTE ON NORMALIZATION (docs/QUIRKS.md): the reference's
``henyey_greenstein`` uses a leading constant of pi/4 (``M_PI_4``,
light.h:61) instead of the physically normalized 1/(4 pi) — i.e. its
phase values are pi^2 x the textbook HG.  We keep the reference's
constant by default so renders match, and expose ``normalized=True``
for the physically correct variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.vecmath import (EPS, coordinate_system, lerp,
                                  spherical_direction, vec3)

M_PI_4 = np.float32(np.pi / 4.0)            # reference constant (light.h:61)
INV_4_PI = np.float32(1.0 / (4.0 * np.pi))


def henyey_greenstein(cos_theta, g, normalized: bool = False):
    """HG phase value (light.h:55-64)."""
    g = jnp.asarray(g, jnp.float32)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    k = INV_4_PI if normalized else M_PI_4
    return k * (1.0 - g * g) / (denom * jnp.sqrt(jnp.maximum(denom, 1e-20)))


def double_henyey_greenstein(cos_theta, f, g1, g2, normalized: bool = False):
    """Two-lobe HG blend (render_kernel.cu:278-287)."""
    return (f * henyey_greenstein(cos_theta, g1, normalized)
            + (1.0 - f) * henyey_greenstein(cos_theta, g2, normalized))


def isotropic():
    """render_kernel.cu:271-275."""
    return INV_4_PI


def sample_spherical(key, shape=()):
    """Uniform sphere direction + isotropic pdf (render_kernel.cu:292-303)."""
    k1, k2 = jax.random.split(key)
    phi = 2.0 * jnp.pi * jax.random.uniform(k1, shape, jnp.float32)
    cos_theta = 1.0 - 2.0 * jax.random.uniform(k2, shape, jnp.float32)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    wi = vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)
    return wi, jnp.broadcast_to(isotropic(), shape)


def sample_hg(wo, key, g, normalized: bool = False):
    """Sample a new direction around ``wo`` from the HG lobe.

    Returns (new_direction, phase_value).  Mirrors sample_hg
    (render_kernel.cu:306-325): builds a frame around -wo, samples
    cos_theta from the inverse-CDF, and evaluates HG at -cos_theta.
    """
    g = jnp.asarray(g, jnp.float32)
    shape = wo.shape[:-1]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, jnp.float32)
    g_b = jnp.broadcast_to(g, shape)
    sqr_term = (1.0 - g_b * g_b) / (1.0 - g_b + 2.0 * g_b * u1)
    cos_theta_aniso = (1.0 + g_b * g_b - sqr_term * sqr_term) / (
        2.0 * jnp.where(jnp.abs(g_b) < 1e-6, 1.0, g_b))
    cos_theta = jnp.where(jnp.abs(g_b) < EPS, 1.0 - 2.0 * u1, cos_theta_aniso)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * jax.random.uniform(k2, shape, jnp.float32)
    v1, v2 = coordinate_system(-wo)
    new_dir = spherical_direction(sin_theta, cos_theta, phi, v1, v2, wo)
    return new_dir, henyey_greenstein(-cos_theta, g_b, normalized)


def sample_double_hg(wi, key, f, g1, g2, normalized: bool = False):
    """Two-lobe HG direction sampling (render_kernel.cu:330-362).

    The reference draws both lobes and lerps the directions by (1-f);
    we reproduce that (a quirk — the result is not a true mixture
    sample, see docs/QUIRKS.md).
    """
    f = jnp.asarray(f, jnp.float32)
    wo = -wi
    k1, k2 = jax.random.split(key)
    d1, p1 = sample_hg(wo, k1, g1, normalized)
    d2, p2 = sample_hg(wo, k2, g2, normalized)
    # cos_theta recovered from phase inverses is not needed: the
    # reference lerps directions and evaluates double-HG at the lerped
    # cos-theta; we evaluate the blended phase at the actual sampled
    # cos-thetas to stay finite, matching behavior for f≈0 / f≈1.
    one_lobe_hi = f > 0.9999
    one_lobe_lo = f < EPS
    dir_mix = lerp(d1, d2, 1.0 - f)
    from vpt_tpu.core.vecmath import normalize
    dir_mix = normalize(dir_mix)
    val_mix = f * p1 + (1.0 - f) * p2
    new_dir = jnp.where(one_lobe_hi, d1, jnp.where(one_lobe_lo, d2, dir_mix))
    val = jnp.where(one_lobe_hi, p1, jnp.where(one_lobe_lo, p2, val_mix))
    return new_dir, val


def phase_eval(params, cos_theta, normalized: bool = False):
    """Config-dispatched phase value: single HG with g1 (the
    reference's effective integrator behavior) or the two-lobe blend
    when params.use_double_hg (render_kernel.cu:278-287 — present but
    dead in the reference's integrators; docs/QUIRKS.md #22)."""
    if params.use_double_hg:
        return double_henyey_greenstein(cos_theta, params.phase_f,
                                        params.phase_g1, params.phase_g2,
                                        normalized)
    return henyey_greenstein(cos_theta, params.phase_g1, normalized)


def phase_sample(params, direction, key, normalized: bool = False):
    """Config-dispatched direction sampling around ``direction``.
    Returns (new_direction, phase_value)."""
    if params.use_double_hg:
        return sample_double_hg(-direction, key, params.phase_f,
                                params.phase_g1, params.phase_g2, normalized)
    return sample_hg(direction, key, params.phase_g1, normalized)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic, beta=2 (light.h:65-69)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-30)
