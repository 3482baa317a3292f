"""Trilinear sampling vs. direct voxel reads and CUDA tex3D semantics."""

import jax.numpy as jnp
import numpy as np

from vpt_tpu.ops import trilinear
from vpt_tpu.volume.grid import HostGrid, build_atlas


def _grid_from_dense(d_zyx, bmin=(0, 0, 0)):
    nz, ny, nx = d_zyx.shape
    return HostGrid(
        density_zyx=np.asarray(d_zyx, np.float32),
        emission_zyx=None, color_zyx=None,
        bbox_min=np.array(bmin, np.int32),
        dim=np.array([nx, ny, nz], np.int32),
        transform=np.eye(4), voxel_size=1.0,
        max_density=float(d_zyx.max()), min_density=1e-7,
    )


def test_voxel_center_exact():
    rng = np.random.RandomState(0)
    d = rng.rand(4, 5, 6).astype(np.float32)  # (nz, ny, nx)
    atlas = build_atlas([_grid_from_dense(d)])
    # voxel centers are at index-space bmin + i + 0.5 in tex coords:
    # normalized u = (i + 0.5)/N  ->  u*N - 0.5 = i exactly
    xs, ys, zs = np.meshgrid(np.arange(6), np.arange(5), np.arange(4),
                             indexing="ij")
    pos = np.stack([xs + 0.5, ys + 0.5, zs + 0.5], -1).reshape(-1, 3)
    # index_pos is relative to bmin=0; normalized = pos/dim
    gid = jnp.zeros(pos.shape[0], jnp.int32)
    vals = np.asarray(trilinear.sample_density(
        atlas, gid, jnp.asarray(pos, jnp.float32)))
    expect = d[zs.reshape(-1), ys.reshape(-1), xs.reshape(-1)]
    np.testing.assert_allclose(vals, expect, atol=1e-6)


def test_midpoint_interpolation():
    d = np.zeros((1, 1, 2), np.float32)
    d[0, 0, 0] = 1.0
    d[0, 0, 1] = 3.0
    atlas = build_atlas([_grid_from_dense(d)])
    gid = jnp.zeros(1, jnp.int32)
    val = float(trilinear.sample_density(
        atlas, gid, jnp.array([[1.0, 0.5, 0.5]], jnp.float32))[0])
    np.testing.assert_allclose(val, 2.0, atol=1e-6)


def test_outside_returns_zero():
    d = np.ones((2, 2, 2), np.float32)
    atlas = build_atlas([_grid_from_dense(d)])
    gid = jnp.zeros(2, jnp.int32)
    pos = jnp.array([[-0.5, 1.0, 1.0], [2.5, 1.0, 1.0]], jnp.float32)
    vals = np.asarray(trilinear.sample_density(atlas, gid, pos))
    np.testing.assert_allclose(vals, 0.0)


def test_clamp_at_edges():
    """tex3D clamp addressing: just inside the boundary uses edge voxel."""
    d = np.zeros((1, 1, 4), np.float32)
    d[0, 0, :] = [1.0, 2.0, 3.0, 4.0]
    atlas = build_atlas([_grid_from_dense(d)])
    gid = jnp.zeros(1, jnp.int32)
    val = float(trilinear.sample_density(
        atlas, gid, jnp.array([[0.05, 0.5, 0.5]], jnp.float32))[0])
    np.testing.assert_allclose(val, 1.0, atol=1e-6)


def test_color_absent_returns_white():
    d = np.ones((2, 2, 2), np.float32)
    atlas = build_atlas([_grid_from_dense(d)])
    gid = jnp.zeros(1, jnp.int32)
    col = np.asarray(trilinear.sample_color(
        atlas, gid, jnp.array([[1.0, 1.0, 1.0]], jnp.float32)))
    np.testing.assert_allclose(col, 1.0)


def test_multi_grid_offsets():
    d0 = np.full((2, 2, 2), 5.0, np.float32)
    d1 = np.full((3, 3, 3), 7.0, np.float32)
    atlas = build_atlas([_grid_from_dense(d0), _grid_from_dense(d1)])
    gid = jnp.array([0, 1], jnp.int32)
    pos = jnp.array([[1.0, 1.0, 1.0], [1.5, 1.5, 1.5]], jnp.float32)
    vals = np.asarray(trilinear.sample_density(atlas, gid, pos))
    np.testing.assert_allclose(vals, [5.0, 7.0], atol=1e-6)
