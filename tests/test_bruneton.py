"""Bruneton atmosphere: physical sanity of LUTs and runtime sampling
(SURVEY.md §7 hard part 6 — validated against physics invariants; the
texel-level EXR comparison needs reference dumps we don't have)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.sky import bruneton as br

TINY = br.LutDims(transmittance_w=64, transmittance_h=16, r=4, mu=32,
                  mu_s=8, nu=4, irradiance_w=16, irradiance_h=4)


@pytest.fixture(scope="module")
def atm():
    params = br.default_model()
    luts = jax.jit(br.precompute,
        static_argnames=("dims", "num_scattering_orders"))(
        params, dims=TINY, num_scattering_orders=2)
    return params, luts


def test_transmittance_range(atm):
    params, luts = atm
    t = np.asarray(luts.transmittance)
    assert np.isfinite(t).all()
    assert (t >= 0).all() and (t <= 1.0 + 1e-5).all()
    # zenith transmittance from the ground is substantial in the red
    tz = np.asarray(br.transmittance_to_top(
        params, luts.transmittance, params.bottom_radius, jnp.float32(1.0),
        TINY))
    assert 0.5 < tz[0] <= 1.0         # red barely attenuated
    assert tz[2] < tz[0] + 1e-6       # blue scatters at least as much


def test_transmittance_monotonic_in_mu(atm):
    """Grazing rays traverse more atmosphere than zenith rays."""
    params, luts = atm
    mus = jnp.linspace(0.1, 1.0, 8)
    r = jnp.full((8,), float(params.bottom_radius) + 10.0)
    t = np.asarray(br.transmittance_to_top(params, luts.transmittance, r,
                                           mus, TINY))
    assert (np.diff(t[:, 2]) >= -1e-4).all()  # blue increases with mu


def test_sky_radiance_blue_dominates(atm):
    """Away from the sun, clear-sky radiance is blue-heavy."""
    params, luts = atm
    cam = jnp.array([[0.0, float(params.bottom_radius) + 1000.0, 0.0]])
    view = jnp.array([[0.6, 0.55, 0.58]])
    view = view / jnp.linalg.norm(view)
    sun = jnp.array([-0.5, 0.6, -0.62])
    sun = sun / jnp.linalg.norm(sun)
    rad, trans = br.get_sky_radiance(params, luts, cam, view, sun, TINY)
    rad = np.asarray(rad)[0]
    assert np.isfinite(rad).all() and (rad >= 0).all()
    assert rad[2] > rad[0]  # blue > red


def test_irradiance_positive_sunlit(atm):
    params, luts = atm
    point = jnp.array([[0.0, float(params.bottom_radius) + 10.0, 0.0]])
    normal = jnp.array([[0.0, 1.0, 0.0]])
    sun = jnp.array([0.0, 1.0, 0.0])
    sun_irr, sky_irr = br.get_sun_and_sky_irradiance(params, luts, point,
                                                     normal, sun, TINY)
    assert float(np.asarray(sun_irr).min()) > 0.0
    assert float(np.asarray(sky_irr).min()) >= 0.0


def test_sample_atmosphere_image():
    """Whole-sky sampling through the scene-level API produces a finite,
    tonemapped [0,1] image with a bright sun region."""
    from vpt_tpu.sky.runtime import Atmosphere, sample_atmosphere
    params = br.default_model()
    luts = jax.jit(br.precompute,
        static_argnames=("dims", "num_scattering_orders"))(
        params, dims=TINY, num_scattering_orders=2)
    atm = Atmosphere(params=params, luts=luts, dims=TINY)
    n = 16
    theta = jnp.linspace(0.05, jnp.pi / 2 - 0.05, n)
    phi = jnp.linspace(0.0, 2 * jnp.pi, n, endpoint=False)
    tg, pg = jnp.meshgrid(theta, phi, indexing="ij")
    dirs = jnp.stack([jnp.sin(tg) * jnp.cos(pg), jnp.cos(tg),
                      jnp.sin(tg) * jnp.sin(pg)], -1).reshape(-1, 3)
    pos = jnp.zeros((n * n, 3), jnp.float32)
    img = np.asarray(sample_atmosphere(atm, pos, dirs, 150.0, 30.0, TINY))
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1.0).all()
    assert img.max() > 0.05
