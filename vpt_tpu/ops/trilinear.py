"""Trilinear volume sampling — the software replacement for tex3D.

Reproduces the CUDA texture semantics the reference relies on
(gpu_vdb.cpp:236-249: normalizedCoords, cudaFilterModeLinear,
cudaAddressModeClamp): a normalized coordinate u in [0,1] addresses
voxel-center space ``u*N - 0.5`` clamped to [0, N-1], with trilinear
filtering of the 8 surrounding voxels.

Property-fetch semantics mirror render_kernel.cu:909-1014:
* positions outside the grid's [0,1]^3 normalized box return 0
  (get_density render_kernel.cu:997, get_color :922, get_emission :961)
* world -> index conversion happens in the caller (instance transform).

Implementation note: these are jnp gathers over a flat atlas; XLA
lowers them to dynamic-gather loops on TPU.  The hot engines minimize
gather COUNT by using the corner-packed table (one row gather per
trilinear sample; `render.tracking.unified_fetch` additionally packs
the majorant/skip fields into the same row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.volume.grid import VolumeAtlas


def _tex_coords(norm_pos, dim):
    """Normalized [0,1]^3 coords -> (i0, i1, frac, in_bounds).

    norm_pos: (..., 3) float32 in xyz order; dim: (..., 3) int32.
    """
    in_bounds = jnp.all((norm_pos >= 0.0) & (norm_pos <= 1.0), axis=-1)
    dimf = dim.astype(jnp.float32)
    x = jnp.clip(norm_pos * dimf - 0.5, 0.0, dimf - 1.0)
    i0 = jnp.floor(x)
    frac = x - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, dim - 1)
    return i0, i1, frac, in_bounds


def _flat_index(ix, iy, iz, dim, offset):
    return offset + (iz * dim[..., 1] + iy) * dim[..., 0] + ix


def _gather_trilinear(flat, i0, i1, frac, dim, offset):
    """8-tap gather + lerp.  flat: (V,) or (V, C)."""
    wx1, wy1, wz1 = frac[..., 0], frac[..., 1], frac[..., 2]
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    def tap(ix, iy, iz):
        idx = _flat_index(ix, iy, iz, dim, offset)
        return jnp.take(flat, idx, axis=0)

    def w(a, b, c):
        r = a * b * c
        return r[..., None] if flat.ndim > 1 else r

    v = (tap(i0[..., 0], i0[..., 1], i0[..., 2]) * w(wx0, wy0, wz0)
         + tap(i1[..., 0], i0[..., 1], i0[..., 2]) * w(wx1, wy0, wz0)
         + tap(i0[..., 0], i1[..., 1], i0[..., 2]) * w(wx0, wy1, wz0)
         + tap(i1[..., 0], i1[..., 1], i0[..., 2]) * w(wx1, wy1, wz0)
         + tap(i0[..., 0], i0[..., 1], i1[..., 2]) * w(wx0, wy0, wz1)
         + tap(i1[..., 0], i0[..., 1], i1[..., 2]) * w(wx1, wy0, wz1)
         + tap(i0[..., 0], i1[..., 1], i1[..., 2]) * w(wx0, wy1, wz1)
         + tap(i1[..., 0], i1[..., 1], i1[..., 2]) * w(wx1, wy1, wz1))
    return v


def normalized_pos(index_pos, bmin, dim):
    """Index-space position -> normalized [0,1]^3 (render_kernel.cu:988-994)."""
    return (index_pos - bmin) / dim.astype(jnp.float32)


def sample_density(atlas: VolumeAtlas, grid_id, index_pos):
    """Density fetch at index-space positions (render_kernel.cu:984-1001).

    Uses the corner-packed table: ONE (V, 8) row gather + a VPU
    weighted sum replaces eight scalar gathers (TPU in-loop gathers
    serialize per index, so gather count is the cost driver).

    grid_id: scalar or (...,) int32; index_pos: (..., 3) f32.
    """
    dim = atlas.dim[grid_id]
    bmin = atlas.bmin[grid_id]
    offset = atlas.offset[grid_id]
    npos = normalized_pos(index_pos, bmin, dim)
    i0, _i1, frac, inb = _tex_coords(npos, dim)
    flat = _flat_index(i0[..., 0], i0[..., 1], i0[..., 2], dim, offset)
    # optimization_barrier fences the gather out of the surrounding
    # fusion: XLA:TPU's standalone gather kernel runs ~80x faster than
    # the scalar in-fusion gather path (measured on v5e)
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.density_corners, flat, axis=0)  # (..., 8)
    (rows,) = jax.lax.optimization_barrier((rows,))
    rows = rows.astype(jnp.float32)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = jnp.stack([wx[..., c & 1] * wy[..., (c >> 1) & 1]
                   * wz[..., (c >> 2) & 1] for c in range(8)], axis=-1)
    val = jnp.sum(rows[..., :8] * w, axis=-1)
    return jnp.where(inb, val, 0.0)


def sample_density_8tap(atlas: VolumeAtlas, grid_id, index_pos):
    """Reference 8-scalar-gather trilinear (validation path)."""
    dim = atlas.dim[grid_id]
    bmin = atlas.bmin[grid_id]
    offset = atlas.offset[grid_id]
    npos = normalized_pos(index_pos, bmin, dim)
    i0, i1, frac, inb = _tex_coords(npos, dim)
    val = _gather_trilinear(atlas.density, i0, i1, frac, dim, offset)
    return jnp.where(inb, val, 0.0)


def sample_emission_index(atlas: VolumeAtlas, grid_id, index_pos):
    """Raw emission-channel value (pre-LUT), 0 where absent."""
    val, valid = sample_emission_index_masked(atlas, grid_id, index_pos)
    return val


def sample_emission_index_masked(atlas: VolumeAtlas, grid_id, index_pos):
    """(value, valid): valid=False where the grid has no emission
    channel or the position is outside its box — those positions must
    contribute NOTHING, not LUT[0] (get_emission returns BLACK before
    the LUT, render_kernel.cu:960).

    ONE corner-row gather (the EMIT walk fetches emission every
    iteration; the 8-tap path made emissive scenes ~4x slower)."""
    dim = atlas.dim[grid_id]
    bmin = atlas.bmin[grid_id]
    offset = atlas.emission_offset[grid_id]
    has = offset >= 0
    npos = normalized_pos(index_pos, bmin, dim)
    i0, _i1, frac, inb = _tex_coords(npos, dim)
    flat = _flat_index(i0[..., 0], i0[..., 1], i0[..., 2], dim,
                       jnp.maximum(offset, 0))
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.emission_corners, flat, axis=0)  # (..., 8)
    (rows,) = jax.lax.optimization_barrier((rows,))
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = jnp.stack([wx[..., c & 1] * wy[..., (c >> 1) & 1]
                   * wz[..., (c >> 2) & 1] for c in range(8)], axis=-1)
    val = jnp.sum(rows * w, axis=-1)
    valid = has & inb
    return jnp.where(valid, val, 0.0), valid


def sample_color(atlas: VolumeAtlas, grid_id, index_pos):
    """Cd fetch; WHITE where the grid has no color channel
    (render_kernel.cu:911), 0 outside the box (:922).

    ONE 24-wide corner-row gather (8 corners x RGB) — the collision
    shading fetches Cd every fused iteration when the channel exists."""
    dim = atlas.dim[grid_id]
    bmin = atlas.bmin[grid_id]
    offset = atlas.color_offset[grid_id]
    has = offset >= 0
    npos = normalized_pos(index_pos, bmin, dim)
    i0, _i1, frac, inb = _tex_coords(npos, dim)
    flat = _flat_index(i0[..., 0], i0[..., 1], i0[..., 2], dim,
                       jnp.maximum(offset, 0))
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.color_corners, flat, axis=0)  # (..., 24)
    (rows,) = jax.lax.optimization_barrier((rows,))
    rows = rows.reshape(rows.shape[:-1] + (8, 3))
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = jnp.stack([wx[..., c & 1] * wy[..., (c >> 1) & 1]
                   * wz[..., (c >> 2) & 1] for c in range(8)], axis=-1)
    val = jnp.sum(rows * w[..., None], axis=-2)
    white = jnp.ones_like(val)
    return jnp.where(has[..., None], jnp.where(inb[..., None], val, 0.0),
                     white)
