"""Procedural noise volumes — TPU-native equivalent of GPU_PROC_VOL
(gpu_vdb.cpp:478-609) and the cuda-noise `fill_volume_buffer` kernel
(texture_kernels.cu:76-128).

The nine noise types mirror the reference's menu (perlin, simplex,
worley, fbm perlin, fbm |perlin|, fractal simplex, turbulence, cubic
value, spots).  Hashing differs from cuda-noise (we use a counter-based
integer mix), so fields are statistically similar, not bit-identical —
the reference's own noise is seeded from curand draws and is not
reproducible across runs either (texture_kernels.cu:91-94).

All evaluation is vectorized jnp over the full voxel lattice (the 3-D
grid-parallel fill of SURVEY.md §2.9 row 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NOISE_PERLIN = 0
NOISE_SIMPLEX = 1          # approximated with perlin-derived gradient noise
NOISE_WORLEY = 2
NOISE_FBM_PERLIN = 3
NOISE_FBM_PERLIN_ABS = 4
NOISE_FRACTAL_SIMPLEX = 5
NOISE_TURBULENCE = 6
NOISE_CUBIC_VALUE = 7
NOISE_SPOTS = 8


def _hash3(ix, iy, iz, seed):
    """Integer lattice hash -> uint32."""
    h = (ix.astype(jnp.uint32) * jnp.uint32(0x8da6b343)
         + iy.astype(jnp.uint32) * jnp.uint32(0xd8163841)
         + iz.astype(jnp.uint32) * jnp.uint32(0xcb1ab31f)
         + jnp.uint32(seed) * jnp.uint32(0x9e3779b9))
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x85ebca6b)
    h = h ^ (h >> 16)
    return h


def _hash_unit(ix, iy, iz, seed, salt=0):
    """uniform [0,1) from lattice point."""
    h = _hash3(ix, iy, iz, seed + salt * 101)
    return h.astype(jnp.float32) * (1.0 / 4294967296.0)


def _gradient(ix, iy, iz, seed):
    """Pseudo-random unit gradient per lattice point."""
    u1 = _hash_unit(ix, iy, iz, seed, 1)
    u2 = _hash_unit(ix, iy, iz, seed, 2)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin(pos, scale, seed):
    """Classic gradient noise in [-1, 1]-ish range."""
    p = pos * scale
    pi = jnp.floor(p)
    pf = p - pi
    ix, iy, iz = (pi[..., 0].astype(jnp.int32), pi[..., 1].astype(jnp.int32),
                  pi[..., 2].astype(jnp.int32))

    def dot_grad(ox, oy, oz):
        gx, gy, gz = _gradient(ix + ox, iy + oy, iz + oz, seed)
        return (gx * (pf[..., 0] - ox) + gy * (pf[..., 1] - oy)
                + gz * (pf[..., 2] - oz))

    u = _fade(pf[..., 0])
    v = _fade(pf[..., 1])
    w = _fade(pf[..., 2])

    def lerp(a, b, t):
        return a + (b - a) * t

    x00 = lerp(dot_grad(0, 0, 0), dot_grad(1, 0, 0), u)
    x10 = lerp(dot_grad(0, 1, 0), dot_grad(1, 1, 0), u)
    x01 = lerp(dot_grad(0, 0, 1), dot_grad(1, 0, 1), u)
    x11 = lerp(dot_grad(0, 1, 1), dot_grad(1, 1, 1), u)
    y0 = lerp(x00, x10, v)
    y1 = lerp(x01, x11, v)
    return lerp(y0, y1, w)


def value_noise(pos, scale, seed, cubic=True):
    """Value noise with smooth (cubic-fade) interpolation."""
    p = pos * scale
    pi = jnp.floor(p)
    pf = p - pi
    ix, iy, iz = (pi[..., 0].astype(jnp.int32), pi[..., 1].astype(jnp.int32),
                  pi[..., 2].astype(jnp.int32))

    def val(ox, oy, oz):
        return _hash_unit(ix + ox, iy + oy, iz + oz, seed) * 2.0 - 1.0

    t = _fade(pf) if cubic else pf
    u, v, w = t[..., 0], t[..., 1], t[..., 2]

    def lerp(a, b, tt):
        return a + (b - a) * tt

    x00 = lerp(val(0, 0, 0), val(1, 0, 0), u)
    x10 = lerp(val(0, 1, 0), val(1, 1, 0), u)
    x01 = lerp(val(0, 0, 1), val(1, 0, 1), u)
    x11 = lerp(val(0, 1, 1), val(1, 1, 1), u)
    return lerp(lerp(x00, x10, v), lerp(x01, x11, v), w)


def worley(pos, scale, seed):
    """Cellular noise: distance to nearest feature point (negated so
    cell centers are dense, like cudaNoise::worleyNoise usage)."""
    p = pos * scale
    pi = jnp.floor(p)
    ix, iy, iz = (pi[..., 0].astype(jnp.int32), pi[..., 1].astype(jnp.int32),
                  pi[..., 2].astype(jnp.int32))
    best = jnp.full(p.shape[:-1], 1e9, jnp.float32)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                fx = _hash_unit(ix + ox, iy + oy, iz + oz, seed, 3)
                fy = _hash_unit(ix + ox, iy + oy, iz + oz, seed, 4)
                fz = _hash_unit(ix + ox, iy + oy, iz + oz, seed, 5)
                feat = jnp.stack([ix + ox + fx, iy + oy + fy, iz + oz + fz],
                                 axis=-1).astype(jnp.float32)
                d = jnp.linalg.norm(p - feat, axis=-1)
                best = jnp.minimum(best, d)
    return 1.0 - best  # dense at feature points


def fbm(pos, scale, seed, octaves=8, lacunarity=1.9, gain=0.5,
        use_abs=False):
    """repeaterPerlin / repeaterPerlinAbs (texture_kernels.cu:104-109)."""
    acc = jnp.zeros(pos.shape[:-1], jnp.float32)
    amp = 1.0
    freq = scale
    for o in range(octaves):
        n = perlin(pos, freq, seed + o * 7)
        acc = acc + amp * (jnp.abs(n) if use_abs else n)
        amp *= gain
        freq *= lacunarity
    return acc


def turbulence(pos, scale, seed, strength=0.8, octaves=6):
    """repeaterTurbulence: perlin distorted by perlin."""
    d = fbm(pos + 17.17, scale * 0.2, seed + 31, octaves=4)
    return fbm(pos + strength * d[..., None], scale, seed, octaves=octaves)


def spots(pos, scale, seed, threshold=0.1):
    """cudaNoise::spots with SHAPE_STEP: thresholded cell noise."""
    w = worley(pos, scale, seed)
    return jnp.where(w > (1.0 - threshold * 4.0), 1.0, 0.0)


def evaluate_noise(pos, noise_type: int, scale, seed=123):
    """Dispatch mirroring fill_volume_buffer (texture_kernels.cu:96-127)."""
    if noise_type == NOISE_PERLIN:
        return perlin(pos, scale, seed)
    if noise_type in (NOISE_SIMPLEX, NOISE_FRACTAL_SIMPLEX):
        if noise_type == NOISE_SIMPLEX:
            return perlin(pos + 31.7, scale, seed + 1)
        return fbm(pos + 31.7, scale, seed + 1, octaves=6, lacunarity=1.5,
                   gain=0.95)
    if noise_type == NOISE_WORLEY:
        return worley(pos, scale, seed)
    if noise_type == NOISE_FBM_PERLIN:
        return fbm(pos, scale, seed)
    if noise_type == NOISE_FBM_PERLIN_ABS:
        return fbm(pos, scale, seed, use_abs=True)
    if noise_type == NOISE_TURBULENCE:
        return turbulence(pos, scale, seed)
    if noise_type == NOISE_CUBIC_VALUE:
        return value_noise(pos, scale, seed)
    if noise_type == NOISE_SPOTS:
        return spots(pos, scale, seed)
    raise ValueError(f"unknown noise type {noise_type}")


def create_procedural_grid(vmin=(-100.0, -100.0, -100.0),
                           vmax=(100.0, 100.0, 100.0), res=1.0,
                           noise_type: int = NOISE_FBM_PERLIN,
                           scale: float = 0.01, seed: int = 123,
                           chunk_z: int = 0):
    """GPU_PROC_VOL::create_volume equivalent (gpu_vdb.cpp:508-609):
    noise-filled dense grid over [vmin, vmax] at voxel size `res`.
    Negative noise clamps to zero (empty space).

    ``chunk_z`` > 0 evaluates the noise in z-slabs of that many slices
    (host loop), bounding peak device memory for production-size grids
    (512^3 fbm would otherwise materialize multi-GB octave
    temporaries)."""
    from vpt_tpu.volume.grid import HostGrid

    vmin = np.asarray(vmin, np.float64)
    vmax = np.asarray(vmax, np.float64)
    dims = np.maximum(((vmax - vmin) / res).astype(int), 1)
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])

    def slab(z0, z1):
        zz, yy, xx = jnp.meshgrid(jnp.arange(z0, z1), jnp.arange(ny),
                                  jnp.arange(nx), indexing="ij")
        pos = jnp.stack([xx, yy, zz], axis=-1).astype(jnp.float32) + 0.5
        vals = evaluate_noise(pos, noise_type, jnp.float32(scale), seed)
        return np.asarray(jnp.maximum(vals, 0.0), np.float32)

    if chunk_z and chunk_z < nz:
        dens = np.empty((nz, ny, nx), np.float32)
        for z0 in range(0, nz, chunk_z):
            z1 = min(z0 + chunk_z, nz)
            dens[z0:z1] = slab(z0, z1)
    else:
        dens = slab(0, nz)
    max_d = float(dens.max()) if dens.size else 0.0
    if max_d <= 0.0:
        dens[nz // 2, ny // 2, nx // 2] = 1.0  # avoid fully-empty scene
        max_d = 1.0
    xform = np.diag([res, res, res, 1.0])
    xform[3, :3] = vmin
    return HostGrid(
        density_zyx=dens, emission_zyx=None, color_zyx=None,
        bbox_min=np.zeros(3, np.int32),
        dim=np.array([nx, ny, nz], np.int32),
        transform=xform, voxel_size=float(res),
        max_density=max_d,
        min_density=float(np.maximum(dens, np.finfo(np.float32).eps).min()),
    )


def default_procedural_grid():
    """The reference's no-asset demo volume (main.cpp:1281-1297 uses a
    [-100,100]^3 box at res 1)."""
    return create_procedural_grid()
