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


def test_multiple_scattering_phase_division(atm):
    """Orders >= 2 are stored pre-divided by the Rayleigh phase
    (atmosphere_kernels.cu:696): the combined texture must equal
    single-Rayleigh + multi/rayleigh_phase(nu), i.e. re-multiplying by
    the phase at runtime reconstructs raw multiple scattering."""
    params, luts = atm
    # recompute the order-2 pipeline pieces independently
    ttex = br.compute_transmittance_lut(params, TINY)
    direct_irr = br.compute_direct_irradiance_lut(params, ttex, TINY)
    ray_tex, mie_tex = br.compute_single_scattering_lut(params, ttex, TINY)
    zero = jnp.zeros_like(ray_tex)
    density = br.compute_scattering_density_lut(
        params, ttex, ray_tex, mie_tex, zero, direct_irr, 2, TINY)
    multi = br.compute_multiple_scattering_lut(params, ttex, density, TINY)
    nu = br._scattering_texel_nu(params, TINY)
    expect = np.asarray(ray_tex
                        + multi / br.rayleigh_phase(nu)[..., None])
    got = np.asarray(luts.scattering)
    # tolerance: fixture LUTs are computed under jit (different fusion
    # rounding than this eager recomputation)
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=1e-7)
    # and the division must matter (multi is not annihilated):
    assert float(np.abs(np.asarray(multi)).max()) > 0.0


def test_space_ray_sun_disc_transmittance(atm):
    """A camera above the atmosphere looking away from the planet keeps
    transmittance 1 (the sun disc survives); rays to the ground get 0."""
    params, luts = atm
    r_space = float(params.top_radius) * 1.5
    cam = jnp.array([[0.0, r_space, 0.0]])
    sun = jnp.array([0.0, 1.0, 0.0])
    up = jnp.array([[0.0, 1.0, 0.0]])     # away from the planet: miss
    down = jnp.array([[0.0, -1.0, 0.0]])  # straight down: hits ground
    _, t_miss = br.get_sky_radiance(params, luts, cam, up, sun, TINY)
    _, t_ground = br.get_sky_radiance(params, luts, cam, down, sun, TINY)
    np.testing.assert_allclose(np.asarray(t_miss), 1.0)
    np.testing.assert_allclose(np.asarray(t_ground), 0.0)


def test_transmittance_texels_match_direct_integration(atm):
    """Texel-level validation vs the reference FORMULA (SURVEY §7 hard
    part 6): the LUT value at sampled (r, mu) points must equal
    exp(-tau) with tau computed here by independent high-resolution
    numerical integration of the three extinction profiles along the
    ray to the top boundary (atmosphere_kernels.cu:67-101)."""
    params, luts = atm

    def direct_transmittance(r, mu, n=4096):
        d_top = float(br.dist_to_top(params, jnp.float32(r),
                                     jnp.float32(mu)))
        t = (np.arange(n) + 0.5) / n * d_top
        r_d = np.sqrt(t * t + 2.0 * r * mu * t + r * r)
        alt = r_d - float(params.bottom_radius)
        dens_r = np.exp(float(params.rayleigh_exp_scale) * alt)
        dens_m = np.exp(float(params.mie_exp_scale) * alt)
        dens_o = np.maximum(
            0.0, 1.0 - np.abs(alt - float(params.ozone_center))
            / float(params.ozone_width))
        dx = d_top / n
        tau = (np.asarray(params.rayleigh_scattering) * dens_r.sum() * dx
               + np.asarray(params.mie_extinction) * dens_m.sum() * dx
               + np.asarray(params.absorption_extinction)
               * dens_o.sum() * dx)
        return np.exp(-tau)

    rb, rt = float(params.bottom_radius), float(params.top_radius)
    for r, mu in [(rb + 500.0, 1.0), (rb + 500.0, 0.3),
                  (rb + 30000.0, 0.7), ((rb + rt) / 2, 0.05)]:
        lut_val = np.asarray(br.transmittance_to_top(
            params, luts.transmittance, jnp.float32(r), jnp.float32(mu),
            TINY))
        ref_val = direct_transmittance(r, mu)
        # LUT parameterization + 500-sample trapezoid vs 4096-sample
        # midpoint: agree to a few percent everywhere but grazing
        np.testing.assert_allclose(lut_val, ref_val, rtol=0.06,
                                   atol=1e-4, err_msg=f"r={r} mu={mu}")


def test_luminance_constants_match_bruneton():
    """The APPROXIMATE-mode k constants (atmosphere.cpp:184-214)
    reproduce the reference implementation's published values (computed
    from the same solar spectrum + CIE observer) to ~1%."""
    wl, solar, *_ = br._spectral_tables()
    sky_k = br.spectral_radiance_to_luminance_factors(wl, solar, -3)
    sun_k = br.spectral_radiance_to_luminance_factors(wl, solar, 0)
    np.testing.assert_allclose(sky_k, [114974.9, 71305.9, 65310.5],
                               rtol=0.02)
    np.testing.assert_allclose(sun_k, [98242.8, 69954.4, 66475.0],
                               rtol=0.02)


def test_white_balance_point():
    """convert_spectrum_to_linear_srgb (atmosphere.cpp:217-233,
    677-695): warm solar white point, normalized to mean 1."""
    wl, solar, *_ = br._spectral_tables()
    wp = br.white_point_srgb(wl, solar)
    assert abs(wp.mean() - 1.0) < 1e-9
    assert wp[0] > wp[2]  # solar spectrum is warm: red > blue
    p = br.default_model(do_white_balance=True)
    np.testing.assert_allclose(np.asarray(p.white_point), wp, rtol=1e-6)


def test_precomputed_luminance_pipeline():
    """15-λ batched precompute (atmosphere.cpp:828-872) at tiny dims:
    finite LUTs in illuminance/683 units; the sky evaluated through the
    scene API stays finite and sun-bright."""
    luts = br.precompute_luminance(dims=TINY, num_scattering_orders=2,
                                   num_wavelengths=6)
    for tex in (luts.transmittance, luts.scattering, luts.single_mie,
                luts.irradiance):
        assert np.isfinite(np.asarray(tex)).all()
    # illuminance-scale scattering: ~1e2-1e4 x the radiance texture
    p_rad = br.default_model()
    luts_rad = jax.jit(br.precompute,
        static_argnames=("dims", "num_scattering_orders"))(
        p_rad, dims=TINY, num_scattering_orders=2)
    ratio = (float(np.abs(np.asarray(luts.scattering)).mean())
             / max(float(np.abs(np.asarray(luts_rad.scattering)).mean()),
                   1e-30))
    assert 10.0 < ratio < 1e6, ratio

    from vpt_tpu.sky.runtime import Atmosphere, sample_atmosphere
    p_lum = br.default_model(use_luminance=2)
    atm = Atmosphere(params=p_lum, luts=luts, dims=TINY)
    n = 8
    theta = jnp.linspace(0.1, jnp.pi / 2 - 0.1, n)
    dirs = jnp.stack([jnp.sin(theta), jnp.cos(theta),
                      jnp.zeros_like(theta)], -1)
    img = np.asarray(sample_atmosphere(
        atm, jnp.zeros((n, 3)), dirs, 90.0, 30.0, TINY))
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1.0).all()
    assert img.max() > 0.01


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


def test_sky_cache_matches_direct(atm):
    """Baked equirect sky cache vs the direct per-ray evaluation:
    agreement over random directions away from the horizon band (the
    ground/sky boundary is a hard edge bilinear smears over ~1 texel)."""
    from vpt_tpu.sky.runtime import (Atmosphere, bake_sky_cache,
                                     sample_atmosphere, sample_sky_cache)
    params, luts = atm
    atm = Atmosphere(params=params, luts=luts, dims=TINY)
    anchor = jnp.array([0.0, 2.0, 0.0])
    az, el = 140.0, 35.0
    cache = bake_sky_cache(atm, anchor, az, el, height=128, width=256)
    assert np.isfinite(np.asarray(cache)).all()

    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (4000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    direct = np.asarray(sample_atmosphere(
        atm, jnp.broadcast_to(anchor, d.shape), d, az, el, atm.dims))
    cached = np.asarray(sample_sky_cache(atm.params, cache, d, az, el))
    dn = np.asarray(d)
    # mask the horizon band and the sun-disc edge
    horizon = np.abs(dn[:, 1]) < 0.08
    sun = np.asarray(jnp.sum(
        d * jnp.asarray([np.cos(np.deg2rad(el)) * np.cos(np.deg2rad(az)),
                         np.sin(np.deg2rad(el)),
                         np.cos(np.deg2rad(el)) * np.sin(np.deg2rad(az))]),
        axis=-1)) > 0.995
    m = ~horizon & ~sun
    err = np.abs(cached[m] - direct[m]).mean()
    scale = max(direct[m].mean(), 1e-6)
    assert err / scale < 0.03, (err, scale)


def test_render_earth_from_orbit(atm):
    """Camera-from-space planetary render (render_earth,
    render_kernel.cu:2138-2180): the planet disc fills the frame
    centre, space stays dark, and the limb is brighter than deep
    space."""
    from vpt_tpu.sky.runtime import Atmosphere, render_earth
    p, luts = atm
    a = Atmosphere(params=p, luts=luts, dims=TINY)
    img = np.asarray(render_earth(a, width=48, height=48, azimuth=150.0,
                                  elevation=40.0, altitude_factor=3.0))
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    center = img[20:28, 20:28].mean()
    corners = np.stack([img[:4, :4], img[:4, -4:], img[-4:, :4],
                        img[-4:, -4:]]).mean()
    assert center > corners + 0.01, (center, corners)


def test_packed_luts_match_unpacked(atm):
    """Corner-packed runtime LUT lookups (br.pack_luts) must agree
    with the multi-tap originals — same corners, same weights, only
    the gather count changes (VERDICT r2 #3 surgery)."""
    from vpt_tpu.core.vecmath import degree_to_cartesian
    params, luts = atm
    packed = br.pack_luts(luts)
    key = jax.random.PRNGKey(7)
    n = 2000
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r = params.bottom_radius + jax.random.uniform(
        jax.random.fold_in(key, 1), (n,)) \
        * (params.top_radius - params.bottom_radius)
    cam = jnp.stack([jnp.zeros(n), r, jnp.zeros(n)], axis=-1)
    sun = degree_to_cartesian(140.0, 30.0)

    a0, t0 = br.get_sky_radiance(params, luts, cam, d, sun, TINY)
    a1, t1 = br.get_sky_radiance(params, packed, cam, d, sun, TINY)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=2e-5,
                               atol=1e-7)

    gp = cam + d * 5.0
    a0, t0 = br.get_sky_radiance_to_point(params, luts, cam, gp, sun, TINY)
    a1, t1 = br.get_sky_radiance_to_point(params, packed, cam, gp, sun,
                                          TINY)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=2e-5,
                               atol=1e-7)

    nrm = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)
    s0, k0 = br.get_sun_and_sky_irradiance(params, luts, cam, nrm, sun,
                                           TINY)
    s1, k1 = br.get_sun_and_sky_irradiance(params, packed, cam, nrm, sun,
                                           TINY)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0), rtol=2e-5,
                               atol=1e-7)
