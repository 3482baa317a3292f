"""Flat majorant / occupancy super-grid — the TPU-native replacement
for the reference's 3-level pointer-chasing octree
(bvh_kernels.cu:204-246, AABB.h:217-234).

The octree's only runtime roles are (a) empty-space skipping (nodes
with no volumes are jumped to their exit plane, render_kernel.cu:
1607-1643) and (b) restricting the density sum to overlapping
instances.  A dense R³ grid of {max density, occupancy, instance
masks} over the scene bounds provides both with O(1) branchless
lookups — no pointer chasing, fully vectorizable.

Built host-side in numpy at scene build time (the analog of
BVH_Builder::build_bvh, once per scene).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _dilate_max(grid: np.ndarray, r: int) -> np.ndarray:
    """Grey dilation by a cube of radius r.  np.roll wraps around the
    boundary, which can only over-estimate a cell's majorant — safe
    (a looser majorant costs speed, never correctness)."""
    out = grid.copy()
    for axis in (0, 1, 2):
        acc = out.copy()
        for s in range(1, r + 1):
            acc = np.maximum(acc, np.roll(out, s, axis=axis))
            acc = np.maximum(acc, np.roll(out, -s, axis=axis))
        out = acc
    return out


def _build_cell_lists(pmins, pmaxs, root_pmin, root_pmax, R: int,
                      pad_cells: int = 1, k_max: int = 600):
    """Per-cell overlapping-instance id lists, -1 padded to the max
    observed overlap (the flat equivalent of OCTNode.vol_indices[600],
    AABB.h:217-234; k_max mirrors the reference's 600 cap).

    Conservative: an instance is listed in every cell its world AABB
    (padded by `pad_cells` for trilinear spill) touches, so any point
    with nonzero density from instance i has i in its cell's list.
    """
    n = len(pmins)
    cell = (root_pmax - root_pmin) / R
    lo = np.floor((pmins - root_pmin) / cell).astype(np.int64) - pad_cells
    hi = np.floor((pmaxs - root_pmin) / cell).astype(np.int64) + pad_cells
    lo = np.clip(lo, 0, R - 1)
    hi = np.clip(hi, 0, R - 1)

    counts = np.zeros((R, R, R), np.int32)  # [z, y, x]
    for i in range(n):
        counts[lo[i, 2]:hi[i, 2] + 1, lo[i, 1]:hi[i, 1] + 1,
               lo[i, 0]:hi[i, 0] + 1] += 1
    K = int(min(max(counts.max(), 1), k_max))
    if counts.max() > k_max:
        from vpt_tpu.utils.logger import VPT_WARNING, log
        log(f"cell instance overlap {counts.max()} exceeds cap {k_max}; "
            f"densities under-counted in hot cells", VPT_WARNING)

    table = np.full((R, R, R, K), -1, np.int32)
    fill = np.zeros((R, R, R), np.int32)
    for i in range(n):
        sl = (slice(lo[i, 2], hi[i, 2] + 1), slice(lo[i, 1], hi[i, 1] + 1),
              slice(lo[i, 0], hi[i, 0] + 1))
        f = fill[sl]
        zz, yy, xx = np.nonzero(f < K)
        view = table[sl]
        view[zz, yy, xx, f[zz, yy, xx]] = i
        fill[sl] = f + (f < K)
    return table.reshape(R * R * R, K)


def build_majorant_grid(host_grids, instance_grid_ids, xforms,
                        root_pmin, root_pmax, resolution: int,
                        instance_bounds=None):
    """Returns a MajorantGrid pytree (scene.py dataclass).

    Splat each instance's nonzero voxels into world-space cells
    (max-reduce), then dilate by the worst-case trilinear influence
    radius in cells so the per-cell value is a true majorant of the
    interpolated field.

    ``instance_bounds``: optional (pmins, pmaxs) per-instance world
    AABBs — when given, per-cell instance lists are built so the
    density fetch visits only the cell's overlapping instances
    (config-5 scale; render_kernel.cu:1003-1014).
    """
    from vpt_tpu.scene.scene import MajorantGrid

    R = int(resolution)
    root_pmin = np.asarray(root_pmin, np.float64)
    root_pmax = np.asarray(root_pmax, np.float64)
    extent = root_pmax - root_pmin
    cell = extent / R
    grid_max = np.zeros((R, R, R), np.float32)  # [z, y, x]

    max_influence = 0.0
    for gid, xf in zip(instance_grid_ids, xforms):
        g = host_grids[int(gid)]
        d = g.density_zyx
        nz = np.nonzero(d > 0)
        if len(nz[0]) == 0:
            continue
        zz, yy, xx = nz
        vals = d[zz, yy, xx]
        # index-space voxel centers relative to bbox_min, +0.5 offset:
        # tex coordinate i samples voxel i at index position bmin+i+0.5
        ipos = np.stack([xx, yy, zz], axis=-1).astype(np.float64)
        ipos += g.bbox_min + 0.5
        wpos = ipos @ xf[:3, :3] + xf[3, :3]
        ci = np.floor((wpos - root_pmin) / cell).astype(np.int64)
        ci = np.clip(ci, 0, R - 1)
        flat = (ci[:, 2] * R + ci[:, 1]) * R + ci[:, 0]
        np.maximum.at(grid_max.reshape(-1), flat, vals)
        # trilinear influence reaches ±1 voxel in index space; its
        # world-space radius bounds the needed dilation
        voxel_world = np.linalg.norm(xf[:3, :3], axis=1).max()
        max_influence = max(max_influence, 1.5 * voxel_world)

    r_cells = int(np.ceil(max_influence / cell.min())) if max_influence else 0
    r_cells = min(max(r_cells, 1), 3)
    grid_max = _dilate_max(grid_max, r_cells)

    occ = grid_max > 0.0
    # Chebyshev distance-to-occupied transform: a cell with value d
    # guarantees every cell within L-inf radius d-1 is empty, so a ray
    # can jump the whole empty cube in ONE step (vs the octree's
    # cell-by-cell node stepping, render_kernel.cu:1611-1643).
    from scipy import ndimage
    skip = ndimage.distance_transform_cdt(
        ~occ, metric="chessboard").astype(np.int32)

    packed = np.stack([grid_max.reshape(-1),
                       skip.reshape(-1).astype(np.float32)], axis=-1)
    cell_instances = None
    if instance_bounds is not None:
        pmins, pmaxs = instance_bounds
        cell_instances = jnp.asarray(_build_cell_lists(
            np.asarray(pmins, np.float64), np.asarray(pmaxs, np.float64),
            root_pmin, root_pmax, R, pad_cells=max(r_cells, 1)))
    return MajorantGrid(
        max_density=jnp.asarray(grid_max),
        occupied=jnp.asarray(occ),
        skip_dist=jnp.asarray(skip),
        packed=jnp.asarray(packed),
        cell_instances=cell_instances,
    )


def majorant_lookup(major, root_pmin, root_pmax, pos):
    """Occupancy + cell majorant at world positions (branchless).

    Returns (occupied (...,), cell_max (...,), t_cell_exit (...,))
    where t_cell_exit needs direction — computed by `cell_exit_t`.
    """
    R = major.occupied.shape[0]
    extent = root_pmax - root_pmin
    rel = (pos - root_pmin) / extent * R
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    occ = jnp.take(major.occupied.reshape(-1), flat)
    cmax = jnp.take(major.max_density.reshape(-1), flat)
    return occ, cmax, ci


def local_majorant_query(major, root_pmin, root_pmax, pos, direction):
    """Per-cell majorant + guaranteed-free travel distance.

    Returns (sigma_cell, dt_exit):
      sigma_cell — density majorant of the current cell (0 if empty);
      dt_exit    — distance to exit the cube of cells guaranteed to
                   share that bound: the single cell when occupied, the
                   chebyshev empty cube when skip_dist > 0.

    This powers local-majorant delta tracking: steps are drawn at the
    *cell* majorant and clamped to dt_exit (boundary crossings are
    null events — memorylessness keeps the estimator exact; see
    e.g. PBRT 4e §11.4 "majorant grids").
    """
    R = major.occupied.shape[0]
    extent = root_pmax - root_pmin
    cs = extent / R
    rel = (pos - root_pmin) / cs
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    row = jnp.take(major.packed, flat, axis=0)  # one gather for both
    (row,) = jax.lax.optimization_barrier((row,))
    sigma_cell = row[..., 0]
    d = row[..., 1]
    r = jnp.maximum(d - 1.0, 0.0)
    cube_min = root_pmin + (ci.astype(jnp.float32) - r[..., None]) * cs
    cube_max = root_pmin + (ci.astype(jnp.float32) + 1.0
                            + r[..., None]) * cs
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    t1 = (cube_min - pos) * inv
    t2 = (cube_max - pos) * inv
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return sigma_cell, jnp.maximum(t_exit, 0.0)


def empty_skip_t(major, root_pmin, root_pmax, pos, direction):
    """Distance a ray may advance from `pos` while provably staying in
    empty space (0 if the current cell is occupied).

    Uses the precomputed chebyshev distance field: with d =
    skip_dist[cell] > 0, the cube of cells within L-inf radius d-1 of
    the current cell is empty; return the exit distance of that cube.
    """
    R = major.occupied.shape[0]
    extent = root_pmax - root_pmin
    cs = extent / R
    rel = (pos - root_pmin) / cs
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    row = jnp.take(major.packed, flat, axis=0)
    (row,) = jax.lax.optimization_barrier((row,))
    d = row[..., 1]
    empty = d > 0
    r = d - 1.0
    cube_min = root_pmin + (ci.astype(jnp.float32) - r[..., None]) * cs
    cube_max = root_pmin + (ci.astype(jnp.float32) + 1.0
                            + r[..., None]) * cs
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    t1 = (cube_min - pos) * inv
    t2 = (cube_max - pos) * inv
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return empty, jnp.maximum(t_exit, 0.0)


def cell_exit_t(root_pmin, root_pmax, resolution, pos, direction):
    """Distance along `direction` to exit the current grid cell
    (the DDA 'advance to node exit' of render_kernel.cu:1611-1618)."""
    R = resolution
    extent = root_pmax - root_pmin
    cs = extent / R
    rel = (pos - root_pmin) / cs
    ci = jnp.floor(rel)
    step_pos = direction > 0
    next_bound = (ci + step_pos.astype(jnp.float32)) * cs + root_pmin
    t_axes = (next_bound - pos) / direction
    # directions ~0 give inf; clamp via large value
    t_axes = jnp.where(jnp.abs(direction) < 1e-12, 3.4e38, t_axes)
    return jnp.maximum(jnp.min(t_axes, axis=-1), 0.0)
