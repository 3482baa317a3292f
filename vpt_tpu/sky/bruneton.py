"""Bruneton precomputed atmospheric scattering, TPU-native.

Re-implementation of the reference's atmosphere module
(source/atmosphere/: atmosphere.cpp host driver, atmosphere_kernels.cu
precompute kernels, definitions.h parameter struct) as pure JAX: every
precompute "kernel" is a per-texel function vmapped over the LUT
lattice, the 4-order multiple-scattering loop is a Python loop at
trace time, and the LUTs are plain arrays sampled with manual
bilinear/trilinear filtering (no texture units).

Model constants match atmosphere.h:66-96 / atmosphere.cpp:1195-1224
(spectral tables at 10nm bins over 360-830nm, earth radii 6360/6420km,
Angstrom Mie, ozone tent profile).  Texture dimensions match
constants.h:50-62 but are configurable (tests use small LUTs).

The algorithm follows E. Bruneton & F. Neyret, "Precomputed
Atmospheric Scattering" (EGSR 2008) and the 2017 reference
implementation's functional breakdown.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Spectral model constants (atmosphere.h:66-96)
# ---------------------------------------------------------------------------

K_SOLAR_IRRADIANCE = np.array([
    1.11776, 1.14259, 1.01249, 1.14716, 1.72765, 1.73054, 1.6887, 1.61253,
    1.91198, 2.03474, 2.02042, 2.02212, 1.93377, 1.95809, 1.91686, 1.8298,
    1.8685, 1.8931, 1.85149, 1.8504, 1.8341, 1.8345, 1.8147, 1.78158, 1.7533,
    1.6965, 1.68194, 1.64654, 1.6048, 1.52143, 1.55622, 1.5113, 1.474, 1.4482,
    1.41018, 1.36775, 1.34188, 1.31429, 1.28303, 1.26758, 1.2367, 1.2082,
    1.18737, 1.14683, 1.12362, 1.1058, 1.07124, 1.04992])
K_OZONE_CROSS_SECTION = np.array([
    1.18e-27, 2.182e-28, 2.818e-28, 6.636e-28, 1.527e-27, 2.763e-27, 5.52e-27,
    8.451e-27, 1.582e-26, 2.316e-26, 3.669e-26, 4.924e-26, 7.752e-26,
    9.016e-26, 1.48e-25, 1.602e-25, 2.139e-25, 2.755e-25, 3.091e-25, 3.5e-25,
    4.266e-25, 4.672e-25, 4.398e-25, 4.701e-25, 5.019e-25, 4.305e-25,
    3.74e-25, 3.215e-25, 2.662e-25, 2.238e-25, 1.852e-25, 1.473e-25,
    1.209e-25, 9.423e-26, 7.455e-26, 6.566e-26, 5.105e-26, 4.15e-26,
    4.228e-26, 3.237e-26, 2.451e-26, 2.801e-26, 2.534e-26, 1.624e-26,
    1.465e-26, 2.078e-26, 1.383e-26, 7.105e-27])
K_DOBSON_UNIT = 2.687e20
K_MAX_OZONE_NUMBER_DENSITY = 300.0 * K_DOBSON_UNIT / 15000.0
K_CONSTANT_SOLAR_IRRADIANCE = 1.5
K_RAYLEIGH = 1.24062e-6
K_RAYLEIGH_SCALE_HEIGHT = 8000.0
K_MIE_SCALE_HEIGHT = 1200.0
K_MIE_ANGSTROM_ALPHA = 0.0
K_MIE_ANGSTROM_BETA = 5.328e-3
K_MIE_SINGLE_SCATTERING_ALBEDO = 0.9
K_GROUND_ALBEDO = 0.01
LAMBDA_MIN, LAMBDA_MAX = 360, 830
LAMBDA_R, LAMBDA_G, LAMBDA_B = 680.0, 550.0, 440.0
MAX_LUMINOUS_EFFICACY = 683.0

# Linear-sRGB (D65) from CIE XYZ — the standard matrix
# (constants.h XYZ_TO_SRGB equivalent).
XYZ_TO_SRGB = np.array([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570]])


def _cie_piecewise_gauss(lam, mu, s1, s2):
    s = np.where(lam < mu, s1, s2)
    return np.exp(-0.5 * ((lam - mu) / s) ** 2)


def cie_xyz_bar(lam):
    """CIE 1931 2-deg color matching functions via the Wyman-Sloan-
    Shirley multi-lobe Gaussian fit (JCGT 2013) — ~1% accurate, used
    instead of the tabulated observer (atmosphere constants.h:71-167;
    parity is statistical here, never bit-exact)."""
    lam = np.asarray(lam, np.float64)
    x = (1.056 * _cie_piecewise_gauss(lam, 599.8, 37.9, 31.0)
         + 0.362 * _cie_piecewise_gauss(lam, 442.0, 16.0, 26.7)
         - 0.065 * _cie_piecewise_gauss(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _cie_piecewise_gauss(lam, 568.8, 46.9, 40.5)
         + 0.286 * _cie_piecewise_gauss(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _cie_piecewise_gauss(lam, 437.0, 11.8, 36.0)
         + 0.681 * _cie_piecewise_gauss(lam, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], axis=-1)


def srgb_coeff(lam):
    """coeff(lambda, component) (atmosphere.cpp:137-145): linear-sRGB
    response of the CIE observer at `lam`; shape (..., 3) = (r, g, b)."""
    return cie_xyz_bar(lam) @ XYZ_TO_SRGB.T


def spectral_radiance_to_luminance_factors(wavelengths, solar,
                                           lambda_power):
    """compute_spectral_radiance_to_luminance_factors
    (atmosphere.cpp:184-214): the APPROXIMATE-luminance k constants."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX, 1.0)
    rgb_bar = srgb_coeff(lam)                       # (L, 3)
    irr = np.interp(lam, wavelengths, solar)        # (L,)
    sol_rgb = np.interp([LAMBDA_R, LAMBDA_G, LAMBDA_B], wavelengths, solar)
    lam_ratio = (lam[:, None]
                 / np.array([LAMBDA_R, LAMBDA_G, LAMBDA_B])) ** lambda_power
    k = (rgb_bar * (irr[:, None] / sol_rgb) * lam_ratio).sum(0)
    return k * MAX_LUMINOUS_EFFICACY  # dlambda = 1


def white_point_srgb(wavelengths, solar):
    """convert_spectrum_to_linear_srgb + normalization
    (atmosphere.cpp:217-233, 677-695): the white-balance divisor."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX, 1.0)
    irr = np.interp(lam, wavelengths, solar)
    xyz = (cie_xyz_bar(lam) * irr[:, None]).sum(0)
    rgb = MAX_LUMINOUS_EFFICACY * (XYZ_TO_SRGB @ xyz)
    return rgb / rgb.mean()


@dataclass(frozen=True)
class LutDims:
    transmittance_w: int = 256
    transmittance_h: int = 64
    r: int = 32
    mu: int = 128
    mu_s: int = 32
    nu: int = 8
    irradiance_w: int = 64
    irradiance_h: int = 16

    @property
    def scattering_w(self):
        return self.nu * self.mu_s


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AtmosphereParams:
    """Per-RGB-wavelength physical parameters (definitions.h:53-99)."""

    solar_irradiance: jax.Array   # (3,)
    sun_angular_radius: jax.Array  # ()
    bottom_radius: jax.Array      # ()
    top_radius: jax.Array         # ()
    rayleigh_scattering: jax.Array  # (3,)
    rayleigh_exp_scale: jax.Array   # () = -1/Hr
    mie_scattering: jax.Array     # (3,)
    mie_extinction: jax.Array     # (3,)
    mie_exp_scale: jax.Array      # () = -1/Hm
    mie_phase_g: jax.Array        # ()
    absorption_extinction: jax.Array  # (3,) ozone
    ozone_center: jax.Array       # () 25km
    ozone_width: jax.Array        # () layer half-extent scale
    ground_albedo: jax.Array      # (3,)
    mu_s_min: jax.Array           # ()
    # display-model extras (GetSolarRadiance / tonemap)
    sun_radiance_scale: jax.Array  # (3,) solar_irradiance/(pi*sar^2) factor
    exposure: jax.Array           # ()
    white_point: jax.Array        # (3,)
    earth_center_y: jax.Array     # () = -bottom_radius
    use_luminance: jax.Array      # () int: 0 NONE, 1 APPROXIMATE,
    #                                  2 PRECOMPUTED (definitions.h:62)
    # runtime radiance->luminance constants (definitions.h:55-56):
    # sky_k multiplies sky/scattering lookups, sun_k the solar terms
    sky_spectral_to_rgb: jax.Array  # (3,)
    sun_spectral_to_rgb: jax.Array  # (3,)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AtmosphereLUTs:
    transmittance: jax.Array  # (TH, TW, 3)
    scattering: jax.Array     # (R, MU, W=NU*MU_S, 3) rayleigh+multiple
    single_mie: jax.Array     # (R, MU, W, 3)
    irradiance: jax.Array     # (IH, IW, 3)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedLUTs:
    """Corner-packed runtime LUTs (round-3 perf surgery, VERDICT r2 #3).

    In-loop/terminal gathers serialize per index on the TPU
    (docs/ARCHITECTURE.md), so a bilinear tex2d (4 taps) costs 4
    serialized gathers and the 4-D scattering lookup (2 trilinear taps
    x 2 textures) costs 32.  Packing every texel's interpolation
    corners into ONE row makes each probe ONE row gather (rows up to
    128 floats cost the same as width-1): a full `sample_atmosphere`
    terminal evaluation drops from ~124 serialized gathers to 13.
    The rayleigh+multiple and single-mie scattering corners share one
    48-wide row, halving the combined-scattering fetch.

    Field names mirror AtmosphereLUTs so the runtime samplers accept
    either container; the packed arrays are 2-D (texel-flat), which is
    how the samplers dispatch."""

    transmittance: jax.Array  # (TH*TW, 12)  [c00|c01|c10|c11] x rgb
    scattering: jax.Array     # (R*MU*W, 48) [rayleigh 8 corners | mie 8]
    irradiance: jax.Array     # (IH*IW, 12)


def _pack2d(tex):
    """(H, W, 3) -> (H*W, 12) rows of clamped bilinear corners."""
    H, W = tex.shape[:2]
    xp = jnp.minimum(jnp.arange(W) + 1, W - 1)
    yp = jnp.minimum(jnp.arange(H) + 1, H - 1)
    c00 = tex
    c01 = tex[:, xp]
    c10 = tex[yp]
    c11 = tex[yp][:, xp]
    return jnp.concatenate([c00, c01, c10, c11], axis=-1).reshape(H * W, 12)


def _corners3d(tex):
    """(D, H, W, 3) -> (D, H, W, 24): the 8 trilinear corners per
    texel, x fastest (corner c: x+=c&1, y+=(c>>1)&1, z+=(c>>2)&1)."""
    D, H, W = tex.shape[:3]
    xp = jnp.minimum(jnp.arange(W) + 1, W - 1)
    yp = jnp.minimum(jnp.arange(H) + 1, H - 1)
    zp = jnp.minimum(jnp.arange(D) + 1, D - 1)
    outs = []
    for c in range(8):
        t = tex
        if c & 1:
            t = t[:, :, xp]
        if c & 2:
            t = t[:, yp]
        if c & 4:
            t = t[zp]
        outs.append(t)
    return jnp.concatenate(outs, axis=-1)


def pack_luts(luts: AtmosphereLUTs) -> PackedLUTs:
    scat = jnp.concatenate([_corners3d(luts.scattering),
                            _corners3d(luts.single_mie)], axis=-1)
    return PackedLUTs(
        transmittance=_pack2d(luts.transmittance),
        scattering=scat.reshape(-1, 48),
        irradiance=_pack2d(luts.irradiance))


def _spectral_tables(use_ozone=True, use_constant_solar=False):
    """Spectral tables at 10 nm bins (atmosphere.cpp:1195-1224)."""
    wl = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1, 10, dtype=np.float64)
    solar = (np.full_like(wl, K_CONSTANT_SOLAR_IRRADIANCE)
             if use_constant_solar else K_SOLAR_IRRADIANCE)
    rayleigh = K_RAYLEIGH * (wl * 1e-3) ** -4
    mie_all = (K_MIE_ANGSTROM_BETA / K_MIE_SCALE_HEIGHT
               * (wl * 1e-3) ** -K_MIE_ANGSTROM_ALPHA)
    mie_scat = mie_all * K_MIE_SINGLE_SCATTERING_ALBEDO
    absorption = (K_MAX_OZONE_NUMBER_DENSITY * K_OZONE_CROSS_SECTION
                  if use_ozone else np.zeros_like(wl))
    return wl, solar, rayleigh, mie_scat, mie_all, absorption


def model_at_lambdas(lams, use_ozone=True, use_constant_solar=False,
                     exposure=10.0, use_luminance=0,
                     do_white_balance=False):
    """AtmosphereParams with the physical spectra interpolated at an
    arbitrary wavelength triple (the per-batch models of the
    PRECOMPUTED-luminance pipeline, atmosphere.cpp:838-858)."""
    wl, solar, rayleigh, mie_scat, mie_all, absorption = _spectral_tables(
        use_ozone, use_constant_solar)

    def interp(tab, lam):
        return np.interp(lam, wl, tab)

    lams = np.asarray(lams, np.float64)
    sar = 0.00935 / 2.0
    sol3 = np.array([interp(solar, l) for l in lams])
    if use_luminance == 2:
        # PRECOMPUTED: textures hold illuminance/683 (sky_k folds the
        # efficacy back in; atmosphere.cpp:151-157)
        sky_k = np.full(3, MAX_LUMINOUS_EFFICACY)
    elif use_luminance == 1:
        sky_k = spectral_radiance_to_luminance_factors(wl, solar, -3)
    else:
        sky_k = np.ones(3)
    sun_k = (spectral_radiance_to_luminance_factors(wl, solar, 0)
             if use_luminance else np.ones(3))
    wp = white_point_srgb(wl, solar) if do_white_balance else np.ones(3)
    params = AtmosphereParams(
        solar_irradiance=jnp.asarray(sol3, jnp.float32),
        sun_angular_radius=jnp.float32(sar),
        bottom_radius=jnp.float32(6360000.0),
        top_radius=jnp.float32(6420000.0),
        rayleigh_scattering=jnp.asarray(
            [interp(rayleigh, l) for l in lams], jnp.float32),
        rayleigh_exp_scale=jnp.float32(-1.0 / K_RAYLEIGH_SCALE_HEIGHT),
        mie_scattering=jnp.asarray(
            [interp(mie_scat, l) for l in lams], jnp.float32),
        mie_extinction=jnp.asarray(
            [interp(mie_all, l) for l in lams], jnp.float32),
        mie_exp_scale=jnp.float32(-1.0 / K_MIE_SCALE_HEIGHT),
        mie_phase_g=jnp.float32(0.8),
        absorption_extinction=jnp.asarray(
            [interp(absorption, l) for l in lams], jnp.float32),
        ozone_center=jnp.float32(25000.0),
        ozone_width=jnp.float32(15000.0),
        ground_albedo=jnp.asarray([K_GROUND_ALBEDO] * 3, jnp.float32),
        mu_s_min=jnp.float32(np.cos(120.0 / 180.0 * np.pi)),
        sun_radiance_scale=jnp.asarray(
            sol3 / (np.pi * sar * sar), jnp.float32),
        exposure=jnp.float32(exposure),
        white_point=jnp.asarray(wp, jnp.float32),
        earth_center_y=jnp.float32(-6360000.0),
        use_luminance=jnp.int32(use_luminance),
        sky_spectral_to_rgb=jnp.asarray(sky_k, jnp.float32),
        sun_spectral_to_rgb=jnp.asarray(sun_k, jnp.float32),
    )
    return params


def default_model(use_ozone=True, use_constant_solar=False,
                  exposure=10.0, use_luminance=0, do_white_balance=False):
    """Model at the RGB wavelengths (kDefaultLambdas, atmosphere.h:97)."""
    return model_at_lambdas(
        np.array([LAMBDA_R, LAMBDA_G, LAMBDA_B]), use_ozone=use_ozone,
        use_constant_solar=use_constant_solar, exposure=exposure,
        use_luminance=use_luminance, do_white_balance=do_white_balance)


# ---------------------------------------------------------------------------
# Geometry helpers (atmosphere_kernels.cu:103-214)
# ---------------------------------------------------------------------------

def _clamp_cosine(mu):
    return jnp.clip(mu, -1.0, 1.0)


def _clamp_radius(p, r):
    return jnp.clip(r, p.bottom_radius, p.top_radius)


def _safe_sqrt(a):
    return jnp.sqrt(jnp.maximum(a, 0.0))


def dist_to_top(p, r, mu):
    disc = r * r * (mu * mu - 1.0) + p.top_radius ** 2
    return jnp.maximum(-r * mu + _safe_sqrt(disc), 0.0)


def dist_to_bottom(p, r, mu):
    disc = r * r * (mu * mu - 1.0) + p.bottom_radius ** 2
    return jnp.maximum(-r * mu - _safe_sqrt(disc), 0.0)


def ray_hits_ground(p, r, mu):
    return (mu < 0.0) & (r * r * (mu * mu - 1.0)
                         + p.bottom_radius ** 2 >= 0.0)


def _uv_from_unit(x, size):
    return 0.5 / size + x * (1.0 - 1.0 / size)


def _unit_from_uv(u, size):
    return (u - 0.5 / size) / (1.0 - 1.0 / size)


# ---------------------------------------------------------------------------
# Density profiles
# ---------------------------------------------------------------------------

def rayleigh_density(p, altitude):
    return jnp.exp(p.rayleigh_exp_scale * altitude)


def mie_density(p, altitude):
    return jnp.exp(p.mie_exp_scale * altitude)


def ozone_density(p, altitude):
    """Tent profile: two linear layers around 25km (atmosphere.cpp:
    725-737: layer widths 25km, slopes ±1/15km)."""
    lower = altitude / 15000.0 - 2.0 / 3.0
    upper = -altitude / 15000.0 + 8.0 / 3.0
    return jnp.clip(jnp.where(altitude < 25000.0, lower, upper), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Transmittance LUT
# ---------------------------------------------------------------------------

_N_TRANS_SAMPLES = 500  # atmosphere_kernels.cu:72


def _optical_length(p, density_fn, r, mu):
    dx = dist_to_top(p, r, mu) / _N_TRANS_SAMPLES
    i = jnp.arange(_N_TRANS_SAMPLES + 1, dtype=jnp.float32)
    d = i * dx
    r_i = _safe_sqrt(d * d + 2.0 * r * mu * d + r * r)
    y = density_fn(p, r_i - p.bottom_radius)
    w = jnp.where((i == 0) | (i == _N_TRANS_SAMPLES), 0.5, 1.0)
    return jnp.sum(y * w) * dx


def _transmittance_rmu_from_uv(p, u, v, dims: LutDims):
    x_mu = _unit_from_uv(u, dims.transmittance_w)
    x_r = _unit_from_uv(v, dims.transmittance_h)
    H = _safe_sqrt(p.top_radius ** 2 - p.bottom_radius ** 2)
    rho = H * x_r
    r = _safe_sqrt(rho * rho + p.bottom_radius ** 2)
    d_min = p.top_radius - r
    d_max = rho + H
    d = d_min + x_mu * (d_max - d_min)
    mu = jnp.where(d == 0.0, 1.0,
                   (H * H - rho * rho - d * d) / (2.0 * r * d))
    return r, _clamp_cosine(mu)


def _transmittance_uv_from_rmu(p, r, mu, dims: LutDims):
    H = _safe_sqrt(p.top_radius ** 2 - p.bottom_radius ** 2)
    rho = _safe_sqrt(r * r - p.bottom_radius ** 2)
    d = dist_to_top(p, r, mu)
    d_min = p.top_radius - r
    d_max = rho + H
    x_mu = jnp.where(d_max == d_min, 0.0, (d - d_min) / (d_max - d_min))
    x_r = rho / H
    return (_uv_from_unit(x_mu, dims.transmittance_w),
            _uv_from_unit(x_r, dims.transmittance_h))


def compute_transmittance_lut(p, dims: LutDims):
    """ComputeTransmittanceToTopAtmosphereBoundaryTexture
    (atmosphere_kernels.cu:621-632)."""
    us = (jnp.arange(dims.transmittance_w) + 0.5) / dims.transmittance_w
    vs = (jnp.arange(dims.transmittance_h) + 0.5) / dims.transmittance_h

    def texel(u, v):
        r, mu = _transmittance_rmu_from_uv(p, u, v, dims)
        tau = (p.rayleigh_scattering * _optical_length(p, rayleigh_density,
                                                       r, mu)
               + p.mie_extinction * _optical_length(p, mie_density, r, mu)
               + p.absorption_extinction * _optical_length(p, ozone_density,
                                                           r, mu))
        return jnp.exp(-tau)

    return jax.vmap(lambda v: jax.vmap(lambda u: texel(u, v))(us))(vs)


def tex2d(tex, u, v):
    """Bilinear lookup with clamped edges (cuda tex2D semantics)."""
    H, W = tex.shape[0], tex.shape[1]
    x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return ((tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx) * (1 - fy)
            + (tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx) * fy)


def tex3d(tex, u, v, w):
    """Trilinear lookup; tex shape (D, H, W, C), coords normalized."""
    D, H, W = tex.shape[0], tex.shape[1], tex.shape[2]
    x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    z = jnp.clip(w * D - 0.5, 0.0, D - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]
    c00 = tex[z0, y0, x0] * (1 - fx) + tex[z0, y0, x1] * fx
    c01 = tex[z0, y1, x0] * (1 - fx) + tex[z0, y1, x1] * fx
    c10 = tex[z1, y0, x0] * (1 - fx) + tex[z1, y0, x1] * fx
    c11 = tex[z1, y1, x0] * (1 - fx) + tex[z1, y1, x1] * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def tex2d_rows(ptex, H, W, u, v):
    """Packed bilinear lookup: ONE row gather instead of 4 taps.
    Bit-compatible with tex2d up to summation order."""
    x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = y0 * W + x0
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(ptex, flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    c00, c01 = rows[..., 0:3], rows[..., 3:6]
    c10, c11 = rows[..., 6:9], rows[..., 9:12]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def transmittance_to_top(p, luts_or_tex, r, mu, dims: LutDims):
    tex = (luts_or_tex.transmittance
           if hasattr(luts_or_tex, "transmittance") else luts_or_tex)
    u, v = _transmittance_uv_from_rmu(p, r, mu, dims)
    if tex.ndim == 2:  # PackedLUTs rows
        return tex2d_rows(tex, dims.transmittance_h, dims.transmittance_w,
                          u, v)
    return tex2d(tex, u, v)


def transmittance_between(p, tex, r, mu, d, hits_ground, dims: LutDims):
    """GetTransmittance (two LUT taps, atmosphere_kernels.cu device)."""
    r_d = _clamp_radius(p, _safe_sqrt(d * d + 2.0 * r * mu * d + r * r))
    mu_d = _clamp_cosine((r * mu + d) / r_d)
    t_up = (transmittance_to_top(p, tex, r, mu, dims)
            / jnp.maximum(transmittance_to_top(p, tex, r_d, mu_d, dims),
                          1e-20))
    t_dn = (transmittance_to_top(p, tex, r_d, -mu_d, dims)
            / jnp.maximum(transmittance_to_top(p, tex, r, -mu, dims), 1e-20))
    t = jnp.where(hits_ground[..., None], t_dn, t_up)
    return jnp.minimum(t, 1.0)


def transmittance_to_sun(p, tex, r, mu_s, dims: LutDims):
    sin_h = p.bottom_radius / r
    cos_h = -_safe_sqrt(jnp.maximum(1.0 - sin_h * sin_h, 0.0))
    visible = jnp.clip(
        (mu_s - cos_h) / jnp.maximum(p.sun_angular_radius, 1e-6) * 0.5 + 0.5,
        0.0, 1.0)
    # smoothstep
    visible = visible * visible * (3.0 - 2.0 * visible)
    return transmittance_to_top(p, tex, r, mu_s, dims) * visible[..., None]


# ---------------------------------------------------------------------------
# Scattering texture mapping (atmosphere_kernels.cu:254-363)
# ---------------------------------------------------------------------------

def _scattering_uvwz_from_rmumusnu(p, r, mu, mu_s, nu, hits_ground,
                                   dims: LutDims):
    H = _safe_sqrt(p.top_radius ** 2 - p.bottom_radius ** 2)
    rho = _safe_sqrt(jnp.maximum(r * r - p.bottom_radius ** 2, 0.0))
    u_r = _uv_from_unit(rho / H, dims.r)

    r_mu = r * mu
    disc = r_mu * r_mu - r * r + p.bottom_radius ** 2
    d_g = -r_mu - _safe_sqrt(disc)
    d_g_min = r - p.bottom_radius
    d_g_max = rho
    u_mu_g = 0.5 - 0.5 * _uv_from_unit(
        jnp.where(d_g_max == d_g_min, 0.0,
                  (d_g - d_g_min) / jnp.maximum(d_g_max - d_g_min, 1e-20)),
        dims.mu // 2)
    d_t = -r_mu + _safe_sqrt(disc + H * H)
    d_t_min = p.top_radius - r
    d_t_max = rho + H
    u_mu_t = 0.5 + 0.5 * _uv_from_unit(
        (d_t - d_t_min) / jnp.maximum(d_t_max - d_t_min, 1e-20), dims.mu // 2)
    u_mu = jnp.where(hits_ground, u_mu_g, u_mu_t)

    d_s = dist_to_top(p, p.bottom_radius, mu_s)
    d_s_min = p.top_radius - p.bottom_radius
    d_s_max = H
    a = (d_s - d_s_min) / (d_s_max - d_s_min)
    D_ = dist_to_top(p, p.bottom_radius, p.mu_s_min)
    A = (D_ - d_s_min) / (d_s_max - d_s_min)
    u_mu_s = _uv_from_unit(
        jnp.maximum(1.0 - a / A, 0.0) / (1.0 + a), dims.mu_s)
    u_nu = (nu + 1.0) / 2.0
    return u_nu, u_mu_s, u_mu, u_r


def _rmumusnu_from_scattering_frag(p, fx, fy, fz, dims: LutDims):
    """Inverse mapping for precompute (GetRMuMuSNuFromScatteringTexture
    Coord, atmosphere_kernels.cu:300-363).  Returns r, mu, mu_s, nu,
    ray_r_mu_intersects_ground."""
    frag_nu = jnp.floor(fx / dims.mu_s)
    frag_mu_s = fx - frag_nu * dims.mu_s
    u_nu = frag_nu / (dims.nu - 1.0)
    u_mu_s = _unit_from_uv((frag_mu_s + 0.5) / dims.mu_s, dims.mu_s)
    u_mu = (fy + 0.5) / dims.mu
    u_r = _unit_from_uv((fz + 0.5) / dims.r, dims.r)

    H = _safe_sqrt(p.top_radius ** 2 - p.bottom_radius ** 2)
    rho = H * u_r
    r = _safe_sqrt(rho * rho + p.bottom_radius ** 2)

    below = u_mu < 0.5
    # ground branch
    d_g_min = r - p.bottom_radius
    d_g_max = rho
    x_mu_g = _unit_from_uv(1.0 - 2.0 * (fy + 0.5) / dims.mu, dims.mu // 2)
    d_g = d_g_min + (d_g_max - d_g_min) * x_mu_g
    mu_g = jnp.where(d_g == 0.0, -1.0,
                     -(rho * rho + d_g * d_g) / (2.0 * r * d_g))
    # top branch
    x_mu_t = _unit_from_uv(2.0 * (fy + 0.5) / dims.mu - 1.0, dims.mu // 2)
    d_t_min = p.top_radius - r
    d_t_max = rho + H
    d_t = d_t_min + (d_t_max - d_t_min) * x_mu_t
    mu_t = jnp.where(d_t == 0.0, 1.0,
                     (H * H - rho * rho - d_t * d_t) / (2.0 * r * d_t))
    mu = _clamp_cosine(jnp.where(below, mu_g, mu_t))
    hits_ground = below

    d_s_min = p.top_radius - p.bottom_radius
    d_s_max = H
    D_ = dist_to_top(p, p.bottom_radius, p.mu_s_min)
    A = (D_ - d_s_min) / (d_s_max - d_s_min)
    a = (A - u_mu_s * A) / jnp.maximum(1.0 + u_mu_s * A, 1e-20)
    d_s = d_s_min + jnp.minimum(a, A) * (d_s_max - d_s_min)
    mu_s = jnp.where(d_s == 0.0, 1.0,
                     (H * H - d_s * d_s) / (2.0 * p.bottom_radius * d_s))
    mu_s = _clamp_cosine(mu_s)
    nu = _clamp_cosine(u_nu * 2.0 - 1.0)
    # clamp nu to physically valid range
    lo = mu * mu_s - _safe_sqrt((1.0 - mu * mu) * (1.0 - mu_s * mu_s))
    hi = mu * mu_s + _safe_sqrt((1.0 - mu * mu) * (1.0 - mu_s * mu_s))
    nu = jnp.clip(nu, lo, hi)
    return r, mu, mu_s, nu, hits_ground


def _scattering_texel_nu(p, dims: LutDims):
    """nu at every texel of the 4-D scattering texture, shape
    (r, mu, scattering_w) — used to pre-divide stored multiple
    scattering by the Rayleigh phase (atmosphere_kernels.cu:696)."""
    fz = jnp.arange(dims.r, dtype=jnp.float32)[:, None, None]
    fy = jnp.arange(dims.mu, dtype=jnp.float32)[None, :, None]
    fx = jnp.arange(dims.scattering_w, dtype=jnp.float32)[None, None, :]
    _, _, _, nu, _ = _rmumusnu_from_scattering_frag(p, fx, fy, fz, dims)
    return nu


def sample_scattering(p, tex, r, mu, mu_s, nu, hits_ground, dims: LutDims):
    """4-D lookup via two trilinear taps lerped over nu."""
    u_nu, u_mu_s, u_mu, u_r = _scattering_uvwz_from_rmumusnu(
        p, r, mu, mu_s, nu, hits_ground, dims)
    tex_x = u_nu * (dims.nu - 1.0)
    tex_x0 = jnp.floor(tex_x)
    lerp = (tex_x - tex_x0)[..., None]
    u0 = (tex_x0 + u_mu_s) / dims.nu
    u1 = (tex_x0 + 1.0 + u_mu_s) / dims.nu
    return (tex3d(tex, u0, u_mu, u_r) * (1.0 - lerp)
            + tex3d(tex, u1, u_mu, u_r) * lerp)


# phase functions (atmosphere_kernels.cu device)
def rayleigh_phase(nu):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + nu * nu)


def mie_phase(g, nu):
    k = 3.0 / (8.0 * jnp.pi) * (1.0 - g * g) / (2.0 + g * g)
    return k * (1.0 + nu * nu) / jnp.power(
        jnp.maximum(1.0 + g * g - 2.0 * g * nu, 1e-12), 1.5)


# ---------------------------------------------------------------------------
# Single scattering precompute
# ---------------------------------------------------------------------------

_N_SCAT_SAMPLES = 50


def _single_scattering_integrand(p, ttex, r, mu, mu_s, nu, d, hits_ground,
                                 dims):
    r_d = _clamp_radius(p, _safe_sqrt(d * d + 2.0 * r * mu * d + r * r))
    mu_s_d = _clamp_cosine((r * mu_s + d * nu) / r_d)
    trans = (transmittance_between(p, ttex, r, mu, d, hits_ground, dims)
             * transmittance_to_sun(p, ttex, r_d, mu_s_d, dims))
    ray = trans * rayleigh_density(p, r_d - p.bottom_radius)[..., None]
    mie = trans * mie_density(p, r_d - p.bottom_radius)[..., None]
    return ray, mie


def compute_single_scattering_lut(p, ttex, dims: LutDims):
    fz = jnp.arange(dims.r, dtype=jnp.float32)
    fy = jnp.arange(dims.mu, dtype=jnp.float32)
    fx = jnp.arange(dims.scattering_w, dtype=jnp.float32)

    def texel(fz_, fy_, fx_):
        r, mu, mu_s, nu, hg = _rmumusnu_from_scattering_frag(p, fx_, fy_, fz_,
                                                             dims)
        dmax = jnp.where(hg, dist_to_bottom(p, r, mu), dist_to_top(p, r, mu))
        dx = dmax / _N_SCAT_SAMPLES
        i = jnp.arange(_N_SCAT_SAMPLES + 1, dtype=jnp.float32)
        d = i * dx
        ray, mie = _single_scattering_integrand(
            p, ttex, r, mu, mu_s, nu, d, hg, dims)
        w = jnp.where((i == 0) | (i == _N_SCAT_SAMPLES), 0.5, 1.0)[:, None]
        ray = jnp.sum(ray * w, axis=0) * dx
        mie = jnp.sum(mie * w, axis=0) * dx
        return (ray * p.solar_irradiance * p.rayleigh_scattering,
                mie * p.solar_irradiance * p.mie_scattering)

    # sequential over depth slices (lax.map) to bound peak memory —
    # a full vmap materializes texels x sphere-samples intermediates
    # that exceed HBM at production LUT sizes
    slice_fn = jax.vmap(jax.vmap(texel, in_axes=(None, None, 0)),
                        in_axes=(None, 0, None))
    return jax.lax.map(lambda fz_: slice_fn(fz_, fy, fx), fz)


# ---------------------------------------------------------------------------
# Irradiance
# ---------------------------------------------------------------------------

def _irradiance_rmus_from_uv(p, u, v, dims: LutDims):
    x_mu_s = _unit_from_uv(u, dims.irradiance_w)
    x_r = _unit_from_uv(v, dims.irradiance_h)
    r = p.bottom_radius + x_r * (p.top_radius - p.bottom_radius)
    mu_s = _clamp_cosine(2.0 * x_mu_s - 1.0)
    return r, mu_s


def _irradiance_uv_from_rmus(p, r, mu_s, dims: LutDims):
    x_r = (r - p.bottom_radius) / (p.top_radius - p.bottom_radius)
    x_mu_s = mu_s * 0.5 + 0.5
    return (_uv_from_unit(x_mu_s, dims.irradiance_w),
            _uv_from_unit(x_r, dims.irradiance_h))


def compute_direct_irradiance_lut(p, ttex, dims: LutDims):
    us = (jnp.arange(dims.irradiance_w) + 0.5) / dims.irradiance_w
    vs = (jnp.arange(dims.irradiance_h) + 0.5) / dims.irradiance_h

    def texel(u, v):
        r, mu_s = _irradiance_rmus_from_uv(p, u, v, dims)
        alpha_s = p.sun_angular_radius
        avg_cos = jnp.where(
            mu_s < -alpha_s, 0.0,
            jnp.where(mu_s > alpha_s, mu_s,
                      (mu_s + alpha_s) ** 2 / (4.0 * alpha_s)))
        return (p.solar_irradiance
                * transmittance_to_top(p, ttex, r, mu_s, dims) * avg_cos)

    return jax.vmap(lambda v: jax.vmap(lambda u: texel(u, v))(us))(vs)


def sample_irradiance(p, itex, r, mu_s, dims: LutDims):
    u, v = _irradiance_uv_from_rmus(p, r, mu_s, dims)
    if itex.ndim == 2:  # PackedLUTs rows
        return tex2d_rows(itex, dims.irradiance_h, dims.irradiance_w, u, v)
    return tex2d(itex, u, v)


# ---------------------------------------------------------------------------
# Multiple scattering (orders 2..n)
# ---------------------------------------------------------------------------

_SPHERE_SAMPLES_THETA = 16  # atmosphere_kernels.cu:432 dtheta=pi/16
_SPHERE_SAMPLES_PHI = 8


def _combined_scattering_for_density(p, ray_tex, mie_tex, multi_tex, r, mu,
                                     mu_s, nu, hits_ground, order, dims):
    """Radiance arriving at (r, omega) from the previous order."""
    if order == 2:
        ray = sample_scattering(p, ray_tex, r, mu, mu_s, nu, hits_ground,
                                dims)
        mie = sample_scattering(p, mie_tex, r, mu, mu_s, nu, hits_ground,
                                dims)
        return (ray * rayleigh_phase(nu)[..., None]
                + mie * mie_phase(p.mie_phase_g, nu)[..., None])
    return sample_scattering(p, multi_tex, r, mu, mu_s, nu, hits_ground,
                             dims)


def compute_scattering_density_lut(p, ttex, ray_tex, mie_tex, multi_tex,
                                   itex, order: int, dims: LutDims,
                                   fz_values=None):
    """ComputeScatteringDensityTexture (atmosphere_kernels.cu:411-483,
    702-717): the in-scattered radiance J at each texel, integrating the
    previous order over the sphere with ground-bounce.

    ``fz_values``: optional (k,) depth-slice indices to compute only a
    subset (host-driven chunking for the remote TPU runtime)."""
    fz = jnp.arange(dims.r, dtype=jnp.float32)
    fy = jnp.arange(dims.mu, dtype=jnp.float32)
    fx = jnp.arange(dims.scattering_w, dtype=jnp.float32)

    n_t, n_p = _SPHERE_SAMPLES_THETA, _SPHERE_SAMPLES_PHI
    dtheta = jnp.pi / n_t
    dphi = jnp.pi / n_p
    theta = (jnp.arange(n_t, dtype=jnp.float32) + 0.5) * dtheta
    phi = (jnp.arange(2 * n_p, dtype=jnp.float32) + 0.5) * dphi
    theta_g, phi_g = jnp.meshgrid(theta, phi, indexing="ij")
    cos_t = jnp.cos(theta_g).reshape(-1)
    sin_t = jnp.sin(theta_g).reshape(-1)
    cos_p = jnp.cos(phi_g).reshape(-1)
    sin_p = jnp.sin(phi_g).reshape(-1)
    domega = (dtheta * dphi) * sin_t

    def texel(fz_, fy_, fx_):
        r, mu, mu_s, nu, _hg = _rmumusnu_from_scattering_frag(
            p, fx_, fy_, fz_, dims)
        # local frame: zenith = z; view in xz plane
        zenith = jnp.array([0.0, 0.0, 1.0])
        omega = jnp.stack([_safe_sqrt(1.0 - mu * mu), jnp.zeros_like(mu), mu])
        # f32 slack in the nu clamp can leave (nu - mu*mu_s)/omega.x
        # unbounded at grazing mu; the component is a cosine — clamp it
        sun_x = jnp.where(omega[0] < 1e-5, 1.0, (nu - mu * mu_s) / jnp.maximum(
            omega[0], 1e-5))
        sun_x = _clamp_cosine(sun_x)
        sun_y = _safe_sqrt(jnp.maximum(1.0 - sun_x ** 2 - mu_s ** 2, 0.0))
        omega_s = jnp.stack([sun_x, sun_y, mu_s])

        # incident directions omega_i over the sphere
        wi = jnp.stack([sin_t * cos_p, sin_t * sin_p, cos_t], axis=-1)
        hits_g = ray_hits_ground(p, r, cos_t)
        # radiance from previous order
        nu1 = _clamp_cosine(jnp.einsum("j,ij->i", omega_s, wi))
        Li = _combined_scattering_for_density(
            p, ray_tex, mie_tex, multi_tex, r, cos_t, mu_s, nu1, hits_g,
            order, dims)
        # ground bounce contribution; the irradiance lookup uses the
        # sun cosine at the ground point, dot(ground_normal, omega_s)
        # = (r*mu_s + d*nu1)/bottom_radius (atmosphere_kernels.cu:463)
        d_g = dist_to_bottom(p, r, cos_t)
        trans_g = transmittance_between(p, ttex, r, cos_t, d_g, hits_g, dims)
        mu_s_g = _clamp_cosine((r * mu_s + d_g * nu1) / p.bottom_radius)
        irr_g = sample_irradiance(
            p, itex, jnp.full_like(mu_s_g, p.bottom_radius), mu_s_g, dims)
        Li = Li + jnp.where(
            hits_g[:, None],
            trans_g * (p.ground_albedo / jnp.pi) * irr_g, 0.0)

        nu2 = _clamp_cosine(jnp.einsum("j,ij->i", omega, wi))
        dens_r = rayleigh_density(p, r - p.bottom_radius)
        dens_m = mie_density(p, r - p.bottom_radius)
        contrib = Li * (
            p.rayleigh_scattering * (dens_r * rayleigh_phase(nu2))[:, None]
            + p.mie_scattering * (dens_m * mie_phase(p.mie_phase_g,
                                                     nu2))[:, None])
        return jnp.sum(contrib * domega[:, None], axis=0)

    # doubly-sequential (lax.map over fz, then over fy rows): a full
    # vmap materializes texels x sphere-samples intermediates that
    # exceed HBM at production LUT sizes (and the remote TPU runtime
    # kernel-faults on the full-size single program — precompute_chunked
    # additionally splits fz slices into separate executions)
    row_fn = jax.vmap(texel, in_axes=(None, None, 0))

    def do_slice(fz_):
        return jax.lax.map(lambda fy_: row_fn(fz_, fy_, fx), fy)

    if fz_values is not None:
        return jax.lax.map(do_slice, jnp.asarray(fz_values, jnp.float32))
    return jax.lax.map(do_slice, fz)


def compute_indirect_irradiance_lut(p, ray_tex, mie_tex, multi_tex,
                                    order: int, dims: LutDims):
    """ComputeIndirectIrradianceTexture (atmosphere_kernels.cu:548-570)."""
    us = (jnp.arange(dims.irradiance_w) + 0.5) / dims.irradiance_w
    vs = (jnp.arange(dims.irradiance_h) + 0.5) / dims.irradiance_h
    n_t, n_p = _SPHERE_SAMPLES_THETA // 2, _SPHERE_SAMPLES_PHI
    dtheta = jnp.pi / (2.0 * n_t)
    dphi = jnp.pi / n_p
    theta = (jnp.arange(n_t, dtype=jnp.float32) + 0.5) * dtheta
    phi = (jnp.arange(2 * n_p, dtype=jnp.float32) + 0.5) * dphi
    tg, pg = jnp.meshgrid(theta, phi, indexing="ij")
    cos_t = jnp.cos(tg).reshape(-1)
    sin_t = jnp.sin(tg).reshape(-1)
    cos_p = jnp.cos(pg).reshape(-1)
    sin_p = jnp.sin(pg).reshape(-1)
    domega = (dtheta * dphi) * sin_t * cos_t  # cos-weighted

    def texel(u, v):
        r, mu_s = _irradiance_rmus_from_uv(p, u, v, dims)
        omega_s = jnp.stack([_safe_sqrt(1.0 - mu_s * mu_s),
                             jnp.zeros_like(mu_s), mu_s])
        wi = jnp.stack([sin_t * cos_p, sin_t * sin_p, cos_t], axis=-1)
        nu = jnp.einsum("j,ij->i", omega_s, wi)
        hg = jnp.zeros_like(cos_t, bool)  # upward hemisphere never hits
        Li = _combined_scattering_for_density(
            p, ray_tex, mie_tex, multi_tex, r, cos_t, mu_s, nu, hg,
            order + 1, dims)
        return jnp.sum(Li * domega[:, None], axis=0)

    return jax.vmap(lambda v: jax.vmap(lambda u: texel(u, v))(us))(vs)


def compute_multiple_scattering_lut(p, ttex, density_tex, dims: LutDims,
                                    fz_values=None):
    """ComputeMultipleScatteringTexture (atmosphere_kernels.cu:485-516):
    integrate the scattering density J along the ray."""
    fz = jnp.arange(dims.r, dtype=jnp.float32)
    fy = jnp.arange(dims.mu, dtype=jnp.float32)
    fx = jnp.arange(dims.scattering_w, dtype=jnp.float32)
    n = 50

    def texel(fz_, fy_, fx_):
        r, mu, mu_s, nu, hg = _rmumusnu_from_scattering_frag(p, fx_, fy_, fz_,
                                                             dims)
        dmax = jnp.where(hg, dist_to_bottom(p, r, mu), dist_to_top(p, r, mu))
        dx = dmax / n
        i = jnp.arange(n + 1, dtype=jnp.float32)
        d = i * dx
        r_d = _clamp_radius(p, _safe_sqrt(d * d + 2.0 * r * mu * d + r * r))
        mu_d = _clamp_cosine((r * mu + d) / r_d)
        mu_s_d = _clamp_cosine((r * mu_s + d * nu) / r_d)
        Ji = sample_scattering(p, density_tex, r_d, mu_d, mu_s_d,
                               jnp.broadcast_to(nu, r_d.shape),
                               jnp.broadcast_to(hg, r_d.shape), dims)
        trans = transmittance_between(p, ttex, r, mu, d, hg, dims)
        w = jnp.where((i == 0) | (i == n), 0.5, 1.0)[:, None]
        return jnp.sum(Ji * trans * w, axis=0) * dx

    # sequential over depth slices (lax.map) to bound peak memory —
    # a full vmap materializes texels x sphere-samples intermediates
    # that exceed HBM at production LUT sizes
    slice_fn = jax.vmap(jax.vmap(texel, in_axes=(None, None, 0)),
                        in_axes=(None, 0, None))
    if fz_values is not None:
        return jax.lax.map(lambda fz_: slice_fn(fz_, fy, fx),
                           jnp.asarray(fz_values, jnp.float32))
    return jax.lax.map(lambda fz_: slice_fn(fz_, fy, fx), fz)


# ---------------------------------------------------------------------------
# Full precompute pipeline (atmosphere.cpp precompute(), :888-1114)
# ---------------------------------------------------------------------------

def precompute(params: AtmosphereParams, dims: LutDims = LutDims(),
               num_scattering_orders: int = 4) -> AtmosphereLUTs:
    ttex = compute_transmittance_lut(params, dims)
    direct_irr = compute_direct_irradiance_lut(params, ttex, dims)
    ray_tex, mie_tex = compute_single_scattering_lut(params, ttex, dims)
    # accumulated outputs: scattering (rayleigh+multiple), irradiance
    scattering_acc = ray_tex
    # NOTE: direct irradiance is NOT accumulated into the irradiance
    # texture output (Bruneton stores only indirect); but it feeds the
    # ground bounce of order 2.
    irradiance_acc = jnp.zeros_like(direct_irr)
    irr_prev = direct_irr
    multi_tex = jnp.zeros_like(ray_tex)
    # orders >= 2 are stored PRE-divided by the Rayleigh phase at the
    # texel's nu (atmosphere_kernels.cu:696 stores
    # delta_multiple_scattering / RayleighPhaseFunction(nu)); the
    # runtime multiplies the combined texture by rayleigh_phase(nu).
    # multi_tex itself stays raw for the density/irradiance feedback.
    inv_ray_phase = 1.0 / rayleigh_phase(
        _scattering_texel_nu(params, dims))[..., None]
    for order in range(2, num_scattering_orders + 1):
        density = compute_scattering_density_lut(
            params, ttex, ray_tex, mie_tex, multi_tex, irr_prev, order, dims)
        indirect = compute_indirect_irradiance_lut(
            params, ray_tex, mie_tex, multi_tex, order - 1, dims)
        multi_tex = compute_multiple_scattering_lut(params, ttex, density,
                                                    dims)
        scattering_acc = scattering_acc + multi_tex * inv_ray_phase
        irradiance_acc = irradiance_acc + indirect
        irr_prev = indirect
    return AtmosphereLUTs(
        transmittance=ttex,
        scattering=scattering_acc,
        single_mie=mie_tex,
        irradiance=irradiance_acc,
    )


def precompute_chunked(params: AtmosphereParams, dims: LutDims = LutDims(),
                       num_scattering_orders: int = 4) -> AtmosphereLUTs:
    """`precompute` with each pipeline stage jitted and executed
    SEPARATELY (results materialized between stages).  The monolithic
    4-order program at full production LUT sizes (constants.h:50-62)
    faults the remote-TPU runtime; per-stage execution keeps each
    compiled program small and survives it.  Numerically identical to
    `precompute` up to fusion rounding."""
    t_fn = jax.jit(compute_transmittance_lut, static_argnames=("dims",))
    di_fn = jax.jit(compute_direct_irradiance_lut, static_argnames=("dims",))
    ss_fn = jax.jit(compute_single_scattering_lut, static_argnames=("dims",))
    # density + multiple scattering run ONE fz slice per device
    # execution: the full-texture single program kernel-faults the
    # remote runtime at production sizes (each slice fn is compiled
    # once and reused — fz arrives as a traced (1,) array)
    sd_fn = jax.jit(compute_scattering_density_lut,
                    static_argnames=("order", "dims"))
    ii_fn = jax.jit(compute_indirect_irradiance_lut,
                    static_argnames=("order", "dims"))
    ms_fn = jax.jit(compute_multiple_scattering_lut,
                    static_argnames=("dims",))

    def done(*arrs):
        for a in arrs:
            jax.block_until_ready(a)

    def by_slice(fn, *args, **kw):
        slices = []
        for z in range(dims.r):
            fzv = jnp.asarray([float(z)], jnp.float32)
            out = fn(*args, fz_values=fzv, **kw)
            done(out)
            slices.append(out)
        return jnp.concatenate(slices, axis=0)

    ttex = t_fn(params, dims=dims)
    done(ttex)
    direct_irr = di_fn(params, ttex, dims=dims)
    done(direct_irr)
    ray_tex, mie_tex = ss_fn(params, ttex, dims=dims)
    done(ray_tex, mie_tex)
    scattering_acc = ray_tex
    irradiance_acc = jnp.zeros_like(direct_irr)
    irr_prev = direct_irr
    multi_tex = jnp.zeros_like(ray_tex)
    inv_ray_phase = 1.0 / rayleigh_phase(
        _scattering_texel_nu(params, dims))[..., None]
    for order in range(2, num_scattering_orders + 1):
        density = by_slice(sd_fn, params, ttex, ray_tex, mie_tex,
                           multi_tex, irr_prev, order=order, dims=dims)
        indirect = ii_fn(params, ray_tex, mie_tex, multi_tex,
                         order=order - 1, dims=dims)
        done(indirect)
        multi_tex = by_slice(ms_fn, params, ttex, density, dims=dims)
        del density
        scattering_acc = scattering_acc + multi_tex * inv_ray_phase
        irradiance_acc = irradiance_acc + indirect
        irr_prev = indirect
    return AtmosphereLUTs(transmittance=ttex, scattering=scattering_acc,
                          single_mie=mie_tex, irradiance=irradiance_acc)


def precompute_luminance(dims: LutDims = LutDims(),
                         num_scattering_orders: int = 4,
                         num_wavelengths: int = 15,
                         use_ozone=True, use_constant_solar=False
                         ) -> AtmosphereLUTs:
    """PRECOMPUTED-luminance pipeline (atmosphere.cpp:828-872 and
    1230-1275): run the radiance precompute in 3-wavelength batches
    covering [360, 830] nm and accumulate each batch's textures through
    its 3x3 `luminance_from_radiance` matrix (rows = sRGB responses of
    the batch wavelengths x dlambda).  The resulting textures hold
    illuminance / MAX_LUMINOUS_EFFICACY; the runtime multiplies by
    sky_k = 683.  The transmittance texture is recomputed at the RGB
    wavelengths at the end (atmosphere.cpp:866-871)."""
    n_iter = (num_wavelengths + 2) // 3
    dlambda = (LAMBDA_MAX - LAMBDA_MIN) / (3.0 * n_iter)
    jit_pre = jax.jit(precompute,
                      static_argnames=("dims", "num_scattering_orders"))
    acc = None
    for i in range(n_iter):
        lams = np.array([LAMBDA_MIN + (3 * i + 0.5) * dlambda,
                         LAMBDA_MIN + (3 * i + 1.5) * dlambda,
                         LAMBDA_MIN + (3 * i + 2.5) * dlambda])
        # rows r = sRGB component, cols c = batch wavelength
        lfr = jnp.asarray(srgb_coeff(lams).T * dlambda, jnp.float32)
        p_i = model_at_lambdas(lams, use_ozone=use_ozone,
                               use_constant_solar=use_constant_solar)
        luts_i = jit_pre(p_i, dims=dims,
                         num_scattering_orders=num_scattering_orders)

        def blend(tex):
            return jnp.einsum("...c,rc->...r", tex, lfr)

        batch = AtmosphereLUTs(
            transmittance=luts_i.transmittance,  # replaced below
            scattering=blend(luts_i.scattering),
            single_mie=blend(luts_i.single_mie),
            irradiance=blend(luts_i.irradiance))
        if acc is None:
            acc = batch
        else:
            acc = AtmosphereLUTs(
                transmittance=batch.transmittance,
                scattering=acc.scattering + batch.scattering,
                single_mie=acc.single_mie + batch.single_mie,
                irradiance=acc.irradiance + batch.irradiance)
    rgb_params = default_model(use_ozone=use_ozone,
                               use_constant_solar=use_constant_solar)
    ttex = jax.jit(compute_transmittance_lut, static_argnames=("dims",))(
        rgb_params, dims)
    return AtmosphereLUTs(transmittance=ttex, scattering=acc.scattering,
                          single_mie=acc.single_mie,
                          irradiance=acc.irradiance)


# ---------------------------------------------------------------------------
# Runtime sky sampling (render_kernel.cu:369-895 device copies)
# ---------------------------------------------------------------------------

def _scat_rows_trilerp(prows, D, H, W, u, v, w):
    """One packed 48-wide row gather -> (rayleigh+multiple, single-mie)
    trilinear values (corner order matches _corners3d: x fastest)."""
    x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    z = jnp.clip(w * D - 0.5, 0.0, D - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0
    flat = (z0 * H + y0) * W + x0
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(prows, flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    ray = 0.0
    mie = 0.0
    for c in range(8):
        wgt = (wx[c & 1] * wy[(c >> 1) & 1] * wz[(c >> 2) & 1])[..., None]
        ray = ray + rows[..., 3 * c:3 * c + 3] * wgt
        mie = mie + rows[..., 24 + 3 * c:24 + 3 * c + 3] * wgt
    return ray, mie


def _combined_scattering(p, luts, r, mu, mu_s, nu, hits_ground, dims):
    if luts.scattering.ndim == 2:  # PackedLUTs: 2 row gathers total
        u_nu, u_mu_s, u_mu, u_r = _scattering_uvwz_from_rmumusnu(
            p, r, mu, mu_s, nu, hits_ground, dims)
        tex_x = u_nu * (dims.nu - 1.0)
        tex_x0 = jnp.floor(tex_x)
        lerp = (tex_x - tex_x0)[..., None]
        u0 = (tex_x0 + u_mu_s) / dims.nu
        u1 = (tex_x0 + 1.0 + u_mu_s) / dims.nu
        ray0, mie0 = _scat_rows_trilerp(
            luts.scattering, dims.r, dims.mu, dims.scattering_w,
            u0, u_mu, u_r)
        ray1, mie1 = _scat_rows_trilerp(
            luts.scattering, dims.r, dims.mu, dims.scattering_w,
            u1, u_mu, u_r)
        return (ray0 * (1.0 - lerp) + ray1 * lerp,
                mie0 * (1.0 - lerp) + mie1 * lerp)
    scat = sample_scattering(p, luts.scattering, r, mu, mu_s, nu,
                             hits_ground, dims)
    mie = sample_scattering(p, luts.single_mie, r, mu, mu_s, nu,
                            hits_ground, dims)
    return scat, mie


def get_sky_radiance(p, luts, camera, view_ray, sun_direction,
                     dims: LutDims = LutDims()):
    """GetSkyRadiance (render_kernel.cu:694-747): radiance of the sky
    seen from `camera` (earth-centered coords) along view_ray, plus the
    transmittance for compositing the sun disc."""
    r = jnp.linalg.norm(camera, axis=-1)
    rmu = jnp.sum(camera * view_ray, axis=-1)
    d_top = -rmu - _safe_sqrt(rmu * rmu - r * r + p.top_radius ** 2)
    in_space = (r > p.top_radius) & (d_top > 0.0)
    camera = jnp.where(in_space[..., None],
                       camera + view_ray * d_top[..., None], camera)
    r = jnp.where(in_space, p.top_radius, r)
    rmu = jnp.where(in_space, rmu + d_top, rmu)
    outside = r > p.top_radius
    mu = rmu / jnp.maximum(r, 1e-6)
    mu_s = jnp.sum(camera * sun_direction, axis=-1) / jnp.maximum(r, 1e-6)
    nu = jnp.sum(view_ray * sun_direction, axis=-1)
    hits_ground = ray_hits_ground(p, r, mu)

    # hits_ground -> 0; ray missing the atmosphere from space -> 1
    # (the sun disc must survive, render_kernel.cu:712-714);
    # otherwise the transmittance-to-top lookup
    trans = jnp.where(
        hits_ground[..., None], 0.0,
        jnp.where(outside[..., None], 1.0,
                  transmittance_to_top(p, luts.transmittance, r, mu, dims)))
    scat, mie = _combined_scattering(p, luts, r, mu, mu_s, nu, hits_ground,
                                     dims)
    radiance = (scat * rayleigh_phase(nu)[..., None]
                + mie * mie_phase(p.mie_phase_g, nu)[..., None])
    radiance = jnp.where(outside[..., None], 0.0, radiance)
    return radiance, trans


def get_sky_radiance_to_point(p, luts, camera, point, sun_direction,
                              dims: LutDims = LutDims()):
    """GetSkyRadianceToPoint (render_kernel.cu:749-810): aerial
    perspective between camera and a ground point."""
    view_ray = point - camera
    d = jnp.linalg.norm(view_ray, axis=-1)
    view_ray = view_ray / jnp.maximum(d[..., None], 1e-9)
    r = jnp.linalg.norm(camera, axis=-1)
    rmu = jnp.sum(camera * view_ray, axis=-1)
    d_top = -rmu - _safe_sqrt(rmu * rmu - r * r + p.top_radius ** 2)
    in_space = (r > p.top_radius) & (d_top > 0.0)
    camera = jnp.where(in_space[..., None],
                       camera + view_ray * d_top[..., None], camera)
    r = jnp.where(in_space, p.top_radius, r)
    rmu = jnp.where(in_space, rmu + d_top, rmu)
    d = jnp.where(in_space, d - d_top, d)
    mu = rmu / jnp.maximum(r, 1e-6)
    mu_s = jnp.sum(camera * sun_direction, axis=-1) / jnp.maximum(r, 1e-6)
    nu = jnp.sum(view_ray * sun_direction, axis=-1)
    hits_ground = ray_hits_ground(p, r, mu)

    trans = transmittance_between(p, luts.transmittance, r, mu, d,
                                  hits_ground, dims)
    scat, mie = _combined_scattering(p, luts, r, mu, mu_s, nu, hits_ground,
                                     dims)
    r_p = _clamp_radius(p, _safe_sqrt(d * d + 2.0 * r * mu * d + r * r))
    mu_p = (r * mu + d) / r_p
    mu_s_p = (r * mu_s + d * nu) / r_p
    scat_p, mie_p = _combined_scattering(p, luts, r_p, mu_p, mu_s_p, nu,
                                         hits_ground, dims)
    scat = scat - trans * scat_p
    mie = mie - trans * mie_p
    radiance = (jnp.maximum(scat, 0.0) * rayleigh_phase(nu)[..., None]
                + jnp.maximum(mie, 0.0)
                * mie_phase(p.mie_phase_g, nu)[..., None])
    return radiance, trans


def get_sun_and_sky_irradiance(p, luts, point, normal, sun_direction,
                               dims: LutDims = LutDims()):
    """GetSunAndSkyIrradiance (render_kernel.cu:812-828)."""
    r = jnp.linalg.norm(point, axis=-1)
    mu_s = jnp.sum(point * sun_direction, axis=-1) / jnp.maximum(r, 1e-6)
    sky = (sample_irradiance(p, luts.irradiance, r, mu_s, dims)
           * (1.0 + jnp.sum(point * normal, axis=-1)[..., None]
              / jnp.maximum(r, 1e-6)[..., None]) * 0.5)
    sun = (p.solar_irradiance
           * transmittance_to_sun(p, luts.transmittance, r, mu_s, dims)
           * jnp.maximum(jnp.sum(normal * sun_direction, axis=-1),
                         0.0)[..., None])
    return sun, sky


def get_solar_radiance(p):
    """GetSolarRadiance (render_kernel.cu:830-835)."""
    return p.solar_irradiance / (jnp.pi * p.sun_angular_radius ** 2)


# ---------------------------------------------------------------------------
# LUT cache (the reference caches EXRs, atmosphere.cpp:247-456)
# ---------------------------------------------------------------------------

def save_luts(path: str, luts: AtmosphereLUTs):
    np.savez_compressed(
        path,
        transmittance=np.asarray(luts.transmittance),
        scattering=np.asarray(luts.scattering),
        single_mie=np.asarray(luts.single_mie),
        irradiance=np.asarray(luts.irradiance))


def load_luts(path: str) -> AtmosphereLUTs:
    z = np.load(path)
    return AtmosphereLUTs(
        transmittance=jnp.asarray(z["transmittance"]),
        scattering=jnp.asarray(z["scattering"]),
        single_mie=jnp.asarray(z["single_mie"]),
        irradiance=jnp.asarray(z["irradiance"]))
