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


def _build_cell_lists(inst_cells, n_instances: int, R: int,
                      pad_cells: int = 1, k_max: int = 600):
    """Per-cell overlapping-instance id lists, -1 padded to the max
    observed overlap (the flat equivalent of OCTNode.vol_indices[600],
    AABB.h:217-234; k_max mirrors the reference's 600 cap).

    ``inst_cells[i]``: flat indices of the cells instance i's NONZERO
    voxels splat into.  Each set is dilated by `pad_cells` (L-inf) so
    trilinear spill stays covered; occupancy-based lists give a much
    smaller K than AABB rasterization for round volumes in boxy
    bounds (the density sum per step does 2 gathers per K slot).
    """
    # dilation offsets
    r = pad_cells
    offs = np.array([(dz * R + dy) * R + dx
                     for dz in range(-r, r + 1)
                     for dy in range(-r, r + 1)
                     for dx in range(-r, r + 1)], np.int64)
    # per-instance dilated cell sets (clip by recomputing coords)
    dilated = []
    for i in range(n_instances):
        cells = inst_cells.get(i)
        if cells is None or len(cells) == 0:
            dilated.append(np.zeros(0, np.int64))
            continue
        cz, rem = np.divmod(cells, R * R)
        cy, cx = np.divmod(rem, R)
        dz, dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                 np.arange(-r, r + 1), indexing="ij")
        zz = np.clip(cz[:, None] + dz.reshape(-1)[None, :], 0, R - 1)
        yy = np.clip(cy[:, None] + dy.reshape(-1)[None, :], 0, R - 1)
        xx = np.clip(cx[:, None] + dx.reshape(-1)[None, :], 0, R - 1)
        dilated.append(np.unique((zz * R + yy) * R + xx))
    del offs

    counts = np.zeros(R * R * R, np.int32)
    for cells in dilated:
        counts[cells] += 1
    K = int(min(max(counts.max(), 1), k_max))
    if counts.max() > k_max:
        from vpt_tpu.utils.logger import VPT_WARNING, log
        log(f"cell instance overlap {counts.max()} exceeds cap {k_max}; "
            f"densities under-counted in hot cells", VPT_WARNING)

    table = np.full((R * R * R, K), -1, np.int32)
    fill = np.zeros(R * R * R, np.int32)
    for i, cells in enumerate(dilated):
        f = fill[cells]
        ok = f < K
        table[cells[ok], f[ok]] = i
        fill[cells] = f + ok
    return table


def build_majorant_grid(host_grids, instance_grid_ids, xforms,
                        root_pmin, root_pmax, resolution: int,
                        build_instance_lists: bool = False,
                        octant_cells: bool | str = "auto"):
    """Returns a MajorantGrid pytree (scene.py dataclass).

    Splat each instance's nonzero voxels into world-space cells
    (max-reduce), then dilate by the worst-case trilinear influence
    radius in cells so the per-cell value is a true majorant of the
    interpolated field.

    ``build_instance_lists``: also build per-cell instance id lists
    from each instance's OCCUPIED cells, so the density fetch visits
    only the cell's overlapping instances (config-5 scale;
    render_kernel.cu:1003-1014).
    """
    from vpt_tpu.scene.scene import MajorantGrid

    R = int(resolution)
    root_pmin = np.asarray(root_pmin, np.float64)
    root_pmax = np.asarray(root_pmax, np.float64)
    extent = root_pmax - root_pmin
    cell = extent / R
    grid_max = np.zeros((R, R, R), np.float32)  # [z, y, x]

    max_influence = 0.0
    inst_cells: dict[int, np.ndarray] = {}
    for inst_i, (gid, xf) in enumerate(zip(instance_grid_ids, xforms)):
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
        if build_instance_lists:
            if g.emission_zyx is not None or g.color_zyx is not None:
                # emission/color contribute for ANY in-box position
                # (get_emission maps in-box zero emission to LUT[0],
                # render_kernel.cu:960-966) — list the instance in its
                # whole box, not just density-occupied cells
                bmin = np.asarray(g.bbox_min, np.float64)
                corners = np.array(
                    [[x, y, z] for x in (bmin[0], bmin[0] + g.dim[0])
                     for y in (bmin[1], bmin[1] + g.dim[1])
                     for z in (bmin[2], bmin[2] + g.dim[2])])
                wc = corners @ xf[:3, :3] + xf[3, :3]
                lo = np.clip(np.floor((wc.min(0) - root_pmin)
                                      / cell).astype(np.int64), 0, R - 1)
                hi = np.clip(np.floor((wc.max(0) - root_pmin)
                                      / cell).astype(np.int64), 0, R - 1)
                gz, gy, gx = np.meshgrid(
                    np.arange(lo[2], hi[2] + 1),
                    np.arange(lo[1], hi[1] + 1),
                    np.arange(lo[0], hi[0] + 1), indexing="ij")
                inst_cells[inst_i] = np.unique(
                    (gz.ravel() * R + gy.ravel()) * R + gx.ravel())
            else:
                inst_cells[inst_i] = np.unique(flat)
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

    # banded bounded-density BOX extents (grid._empty_box_extents per
    # band, mirroring the single-instance corner rows): packed cols =
    # [T_box, xm, ym, zm, xp, yp, zp] where T_box bounds the cell
    # majorant throughout the box (0 = guaranteed empty).  Rays sample
    # at the LOCAL bound inside the box (fused banded stepping) and
    # fly whole empty slabs instead of crawling chebyshev cubes.
    from vpt_tpu.volume.grid import BAND_DIVISORS, _empty_box_extents
    gmax = float(grid_max.max()) if grid_max.size else 0.0
    bands = [gmax * f for f in BAND_DIVISORS]
    band_idx = np.zeros(grid_max.shape, np.int8)
    for b, t in enumerate(bands):
        band_idx[grid_max > t] = min(b + 1, len(bands) - 1)
    t_box = np.zeros(grid_max.shape, np.float32)
    ext = np.zeros((6,) + grid_max.shape, np.float32)
    for b, t in enumerate(bands):
        sel = band_idx == b
        if not sel.any():
            continue
        eb = _empty_box_extents(grid_max > t, where=sel)
        ext[:, sel] = eb[:, sel]
        t_box[sel] = t
    packed = np.concatenate([t_box.reshape(-1, 1),
                             ext.reshape(6, -1).T], axis=-1)
    if octant_cells == "auto":
        octant_cells = R <= 128 and len(instance_grid_ids) > 1
    if octant_cells:
        # per-(octant x major-axis) anchored forward extents for the
        # empty cells (grid._octant_box_extents — the single-instance
        # corner rows carry the same cols 15:87): merges chained
        # empty-cell hops on instanced scenes.  +288 B/cell, so only
        # at R <= 128 (<= 600 MB); single-instance scenes never read
        # the packed rows (they fetch from the corner table).
        from vpt_tpu.volume.grid import _octant_box_extents
        oct_ext = _octant_box_extents(grid_max > 0.0)
        packed = np.concatenate(
            [packed, oct_ext.reshape(oct_ext.shape[0], -1).T], axis=-1)
    cell_instances = None
    cell_rows = None
    if build_instance_lists:
        table = _build_cell_lists(inst_cells, len(instance_grid_ids), R,
                                  pad_cells=max(r_cells, 1))
        cell_instances = jnp.asarray(table)
        assert len(instance_grid_ids) < (1 << 24)
        cell_rows = jnp.asarray(np.concatenate(
            [packed.astype(np.float32), table.astype(np.float32)], axis=1))
    return MajorantGrid(
        max_density=jnp.asarray(grid_max),
        occupied=jnp.asarray(occ),
        skip_dist=jnp.asarray(skip),
        packed=jnp.asarray(packed),
        cell_instances=cell_instances,
        cell_rows=cell_rows,
    )


def octant_exit(oct_rows, i0f, pos_u, dvec):
    """Exit distance of the per-(octant x major-axis) anchored empty
    box (grid._octant_box_extents cols, (..., 72)).

    ``i0f``: floor cell coordinate (grid units); ``pos_u``: position in
    the same units; ``dvec``: direction scaled so pos_u + t*dvec tracks
    the caller's world parameterization.  Returns t (same units as the
    caller's exit distances); only valid on guaranteed-empty cells."""
    # bit-tree select (5 wheres) instead of a 24-long where chain: the
    # chain was ~200 VPU element-ops per lane-iteration — measurable
    # against the ~1.5 iters/ray the octant boxes save (probe_octant_
    # strat).  Column index = octant(sx + 2 sy + 4 sz) * 3 + major, so
    # reshape to (sz, sy, sx, major, axis) and halve with each bit.
    oct_ext = oct_rows.reshape(oct_rows.shape[:-1] + (2, 2, 2, 3, 3))
    pos_dir = dvec > 0.0
    adir = jnp.abs(dvec)
    e = jnp.where(pos_dir[..., 2, None, None, None, None],
                  oct_ext[..., 1, :, :, :, :], oct_ext[..., 0, :, :, :, :])
    e = jnp.where(pos_dir[..., 1, None, None, None],
                  e[..., 1, :, :, :], e[..., 0, :, :, :])
    e = jnp.where(pos_dir[..., 0, None, None],
                  e[..., 1, :, :], e[..., 0, :, :])
    # major axis = argmax |d|: two comparisons instead of argmax+eq
    m01 = jnp.where((adir[..., 1] > adir[..., 0])[..., None],
                    e[..., 1, :], e[..., 0, :])
    m01_mag = jnp.maximum(adir[..., 0], adir[..., 1])
    e3 = jnp.where((adir[..., 2] > m01_mag)[..., None], e[..., 2, :], m01)
    e3 = jnp.maximum(e3, 0.0)
    # forward face per axis: i0f + 1 + e (dir > 0) or i0f - e; a ~zero
    # direction component never reaches its face
    face = jnp.where(pos_dir, i0f + 1.0 + e3, i0f - e3)
    safe = jnp.where(jnp.abs(dvec) < 1e-12, 1e-12, dvec)
    t_ax = jnp.where(jnp.abs(dvec) < 1e-12, 3.4e38, (face - pos_u) / safe)
    return jnp.min(t_ax, axis=-1)


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
      dt_exit    — distance to exit the region of cells guaranteed to
                   share that bound: the single cell when occupied, the
                   guaranteed-empty box otherwise.

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
    # empty-box extents (-1 on occupied cells -> own cell after clamp)
    ext_m = jnp.maximum(row[..., 1:4], 0.0)
    ext_p = jnp.maximum(row[..., 4:7], 0.0)
    cube_min = root_pmin + (ci.astype(jnp.float32) - ext_m) * cs
    cube_max = root_pmin + (ci.astype(jnp.float32) + 1.0 + ext_p) * cs
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    t1 = (cube_min - pos) * inv
    t2 = (cube_max - pos) * inv
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    if row.shape[-1] >= 79:
        t_oct = octant_exit(row[..., 7:79], ci.astype(jnp.float32),
                            rel, direction / cs)
        t_exit = jnp.where(sigma_cell <= 0.0,
                           jnp.maximum(t_exit, t_oct), t_exit)
    return sigma_cell, jnp.maximum(t_exit, 0.0)


def empty_skip_t(major, root_pmin, root_pmax, pos, direction):
    """Distance a ray may advance from `pos` while provably staying in
    empty space (0 if the current cell is occupied).

    Uses the precomputed bounded-density box extents (packed cols
    [T_box, ext 1:7]): empty iff T_box == 0; return the exit distance
    of the current cell's box.
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
    empty = row[..., 0] <= 0.0
    ext_m = jnp.maximum(row[..., 1:4], 0.0)
    ext_p = jnp.maximum(row[..., 4:7], 0.0)
    cube_min = root_pmin + (ci.astype(jnp.float32) - ext_m) * cs
    cube_max = root_pmin + (ci.astype(jnp.float32) + 1.0 + ext_p) * cs
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    t1 = (cube_min - pos) * inv
    t2 = (cube_max - pos) * inv
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    if row.shape[-1] >= 79:
        t_oct = octant_exit(row[..., 7:79], ci.astype(jnp.float32),
                            rel, direction / cs)
        t_exit = jnp.where(empty, jnp.maximum(t_exit, t_oct), t_exit)
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
