"""Simple single-scattering sky — port of the reference's CPU
`sample_atmosphere` (main.cpp:242-312, scratchapixel-style Nishita
model).  Used to build the environment importance-sampling CDF
(sky/cdf.py), exactly as the reference uses its CPU sky only for
`create_cdf` (main.cpp:647-942).

Vectorized over direction batches in JAX (the reference's 16x8 nested
ray march becomes two scans).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.vecmath import degree_to_cartesian, vec3

ATMOSPHERE_R = 6420e3
EARTH_R = 6360e3
HR = 7994.0
HM = 1200.0
# module constants are PLAIN NUMPY: this module is imported lazily,
# sometimes while a jit trace is active — a module-level jnp op traced
# at import time leaks a tracer into later traces (UnexpectedTracerError)
BETA_R = np.array([3.8e-6, 13.5e-6, 33.1e-6], np.float32)
BETA_M = np.array([21e-6, 21e-6, 21e-6], np.float32)
N_SAMPLES = 16
N_SAMPLES_LIGHT = 8
MIE_G = 0.76


def _ray_sphere(orig, direction, radius):
    """Returns (hit, t0, t1) with t0 <= t1 (main.cpp:203-217)."""
    b = 2.0 * jnp.sum(direction * orig, axis=-1)
    c = jnp.sum(orig * orig, axis=-1) - radius * radius
    disc = b * b - 4.0 * c
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    return hit, jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def sample_sky(direction, azimuth, elevation, intensity):
    """Radiance of the simple sky for (..., 3) directions.

    Mirrors main.cpp:242-312: observer at y = 1000 m above the earth
    sphere; returns RED (1,0,0) for rays missing the atmosphere
    (a reference debug sentinel we keep).
    """
    shape = direction.shape[:-1]
    sun_dir = degree_to_cartesian(azimuth, elevation)
    pos = jnp.zeros(shape + (3,), jnp.float32)
    pos = pos.at[..., 1].set(1000.0 + EARTH_R)

    ehit, et0, et1 = _ray_sphere(pos, direction, EARTH_R)
    tmax = jnp.where(ehit & (et1 > 0.0), jnp.maximum(0.0, et0), 3.4e38)
    ahit, at0, at1 = _ray_sphere(pos, direction, ATMOSPHERE_R)
    miss = ~ahit | (at1 < 0.0)
    tmin = jnp.where((at0 > 0.0), jnp.maximum(at0, 0.0), 0.0)
    tmax = jnp.minimum(tmax, at1)

    seg = (tmax - tmin) / N_SAMPLES
    mu = jnp.sum(direction * sun_dir, axis=-1)
    phase_r = 3.0 / (16.0 * jnp.pi) * (1.0 + mu * mu)
    g = MIE_G
    phase_m = (3.0 / (8.0 * jnp.pi) * ((1.0 - g * g) * (1.0 + mu * mu))
               / ((2.0 + g * g)
                  * jnp.power(1.0 + g * g - 2.0 * g * mu, 1.5)))

    sum_r = jnp.zeros(shape + (3,), jnp.float32)
    sum_m = jnp.zeros(shape + (3,), jnp.float32)
    od_r = jnp.zeros(shape, jnp.float32)
    od_m = jnp.zeros(shape, jnp.float32)

    for i in range(N_SAMPLES):
        t_cur = tmin + seg * (i + 0.5)
        sp = pos + direction * t_cur[..., None]
        height = jnp.linalg.norm(sp, axis=-1) - EARTH_R
        hr = jnp.exp(-height / HR) * seg
        hm = jnp.exp(-height / HM) * seg
        od_r = od_r + hr
        od_m = od_m + hm
        # light march toward the sun
        _, _, t1l = _ray_sphere(sp, jnp.broadcast_to(sun_dir, sp.shape),
                                ATMOSPHERE_R)
        segl = t1l / N_SAMPLES_LIGHT
        odl_r = jnp.zeros(shape, jnp.float32)
        odl_m = jnp.zeros(shape, jnp.float32)
        below = jnp.zeros(shape, bool)
        for j in range(N_SAMPLES_LIGHT):
            tl = segl * (j + 0.5)
            spl = sp + sun_dir * tl[..., None]
            hl = jnp.linalg.norm(spl, axis=-1) - EARTH_R
            below = below | (hl < 0.0)
            odl_r = jnp.where(below, odl_r, odl_r + jnp.exp(-hl / HR) * segl)
            odl_m = jnp.where(below, odl_m, odl_m + jnp.exp(-hl / HM) * segl)
        visible = ~below
        tau = (BETA_R * (od_r + odl_r)[..., None]
               + BETA_M * 1.1 * (od_m + odl_m)[..., None])
        atten = jnp.exp(-tau)
        sum_r = sum_r + jnp.where(visible[..., None], atten * hr[..., None], 0.0)
        sum_m = sum_m + jnp.where(visible[..., None], atten * hm[..., None], 0.0)

    out = (sum_r * BETA_R * phase_r[..., None]
           + sum_m * BETA_M * phase_m[..., None]) * intensity
    red = jnp.broadcast_to(vec3(1.0, 0.0, 0.0), out.shape)
    return jnp.where(miss[..., None], red, out)
