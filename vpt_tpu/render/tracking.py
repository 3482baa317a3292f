"""Volume fetches and stochastic tracking walks.

TPU-native re-design of the reference's hot device loops
(render_kernel.cu): property fetches over multi-instance scenes
(sum_density/sum_color/sum_emission, :909-1014), the delta-tracking
free-path sampler (``sample``, :1556-1681), residual-ratio
transmittance (``Tr``, :1138-1273), and the rate-weighted emission
walk (``estimate_emission``, :1275-1339).

Key TPU decisions (measured — docs/ARCHITECTURE.md):

* In-loop gathers serialize per index, so gather COUNT per step is the
  cost.  Trilinear sampling is ONE corner-row gather (ops/trilinear).
* The instance axis is a STATIC Python loop (a vmap over it costs
  ~600x) — or, above the instance-list threshold, the per-cell
  instance table (the flat analog of OCTNode.vol_indices[600],
  AABB.h:217-234) with a static K-slot loop
  (render_kernel.cu:1003-1014).
* Walks are lane-masked bounded ``lax.while_loop``s: every lane
  advances one step per iteration; finished lanes idle (QUIRKS #4: we
  use textbook fixed-exit stepping, not the reference's cumulative-t
  run-away — parity is statistical per BASELINE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.vecmath import aabb_intersect, transform_point
from vpt_tpu.ops import trilinear


# ---------------------------------------------------------------------------
# scene-level property fetches
# ---------------------------------------------------------------------------

def _cell_flat_index(scene, pos):
    major = scene.majorant
    R = major.occupied.shape[0]
    rel = (pos - scene.root_pmin) / (scene.root_pmax - scene.root_pmin) * R
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    return (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]


def _row_norm_coords(row, pos):
    """Packed instance row (Instances.packed_rows) -> trilinear coords.

    Returns (i0 (...,3) int32, frac (...,3), dim_i (...,3) int32,
    in_bounds (...,)).
    """
    ipos = (pos[..., 0:1] * row[..., 0:3] + pos[..., 1:2] * row[..., 3:6]
            + pos[..., 2:3] * row[..., 6:9] + row[..., 9:12])
    bmin = row[..., 12:15]
    dimf = row[..., 15:18]
    npos = (ipos - bmin) / dimf
    inb = jnp.all((npos >= 0.0) & (npos <= 1.0), axis=-1)
    x = jnp.clip(npos * dimf - 0.5, 0.0, dimf - 1.0)
    i0 = jnp.floor(x)
    frac = x - i0
    return i0.astype(jnp.int32), frac, dimf.astype(jnp.int32), inb


def _trilerp_weights(frac):
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    return jnp.stack([wx[..., c & 1] * wy[..., (c >> 1) & 1]
                      * wz[..., (c >> 2) & 1] for c in range(8)], axis=-1)


def _density_from_row(atlas, row, pos):
    """Density for one packed instance row: ONE corner-row gather."""
    i0, frac, dim, inb = _row_norm_coords(row, pos)
    off = row[..., 18].astype(jnp.int32)
    flat = off + (i0[..., 2] * dim[..., 1] + i0[..., 1]) * dim[..., 0] \
        + i0[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.density_corners, flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    rows = rows.astype(jnp.float32)
    val = jnp.sum(rows[..., :8] * _trilerp_weights(frac), axis=-1)
    return jnp.where(inb, val, 0.0)


def _emission_from_row(atlas, row, pos):
    """(raw emission value, valid) for one packed row (QUIRKS #23:
    out-of-box or channel-absent positions contribute NOTHING)."""
    i0, frac, dim, inb = _row_norm_coords(row, pos)
    eoff = row[..., 19].astype(jnp.int32)
    has = eoff >= 0
    flat = jnp.maximum(eoff, 0) + (i0[..., 2] * dim[..., 1]
                                   + i0[..., 1]) * dim[..., 0] + i0[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.emission_corners, flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    val = jnp.sum(rows * _trilerp_weights(frac), axis=-1)
    valid = has & inb
    return jnp.where(valid, val, 0.0), valid


def _color_from_row(atlas, row, pos):
    """Cd for one packed row: WHITE if the channel is absent
    (render_kernel.cu:911), 0 outside the box (:922)."""
    i0, frac, dim, inb = _row_norm_coords(row, pos)
    coff = row[..., 20].astype(jnp.int32)
    has = coff >= 0
    flat = jnp.maximum(coff, 0) + (i0[..., 2] * dim[..., 1]
                                   + i0[..., 1]) * dim[..., 0] + i0[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(atlas.color_corners, flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    rows = rows.reshape(rows.shape[:-1] + (8, 3))
    val = jnp.sum(rows * _trilerp_weights(frac)[..., None], axis=-2)
    val = jnp.where(inb[..., None], val, 0.0)
    return jnp.where(has[..., None], val, jnp.ones_like(val))


def _use_cells(scene) -> bool:
    return (scene.majorant is not None
            and scene.majorant.cell_instances is not None)


def _cell_rows(scene, pos):
    """(slot_valid (...,K), packed rows (...,K,24)) for pos's cell.

    The K per-slot instance-METADATA fetches are one-hot MXU picks,
    not gathers: serialized in-loop gathers cost ~5-6 ns/lane each, so
    K=6 metadata gathers would double a step's gather bill, while a
    (..., K, N) @ (N, 24) matmul is nearly free at N <= ~4096.  Above
    that the gather path wins (one-hot FLOPs scale with N)."""
    flat = _cell_flat_index(scene, pos)
    (flat,) = jax.lax.optimization_barrier((flat,))
    ids = jnp.take(scene.majorant.cell_instances, flat, axis=0)  # (...,K)
    (ids,) = jax.lax.optimization_barrier((ids,))
    valid = ids >= 0
    n_inst = scene.instances.packed_rows.shape[0]
    if n_inst <= 4096:
        oh = jax.nn.one_hot(jnp.maximum(ids, 0), n_inst,
                            dtype=jnp.float32)
        rows = oh @ scene.instances.packed_rows  # (...,K,24)
    else:
        rows = jnp.take(scene.instances.packed_rows, jnp.maximum(ids, 0),
                        axis=0)  # (...,K,24)
        (rows,) = jax.lax.optimization_barrier((rows,))
    return valid, rows


def _cells_banded_fetch(scene, pos, direction, with_tau: bool = False):
    """(density, s_box, t_box[, taus]) for instanced scenes from ONE
    combined cell-row gather (MajorantGrid.cell_rows: [T_box,
    empty-box ext 6, octant ext 72?, instance ids K, tau 8*(1+L)?]) +
    the K candidate corner-row gathers — one fewer serialized gather
    per tracking step than the split cell-list + majorant-row path
    (round 3).  ``with_tau`` interpolates the shadow-cache optical
    depths (accel.shadow._fold_cell_taus) from the same row — the
    cached NEE costs ZERO extra gathers."""
    major = scene.majorant
    R = major.occupied.shape[0]
    cs = (scene.root_pmax - scene.root_pmin) / R
    rel = (pos - scene.root_pmin) / cs
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    row = jnp.take(major.cell_rows, flat, axis=0)  # (..., 7[+72]+K)
    (row,) = jax.lax.optimization_barrier((row,))
    t_box = row[..., 0]
    ext_m = jnp.maximum(row[..., 1:4], 0.0)
    ext_p = jnp.maximum(row[..., 4:7], 0.0)
    cube_min = scene.root_pmin + (ci.astype(jnp.float32) - ext_m) * cs
    cube_max = scene.root_pmin + (ci.astype(jnp.float32) + 1.0 + ext_p) * cs
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
    t1 = (cube_min - pos) * inv
    t2 = (cube_max - pos) * inv
    s_box = jnp.maximum(jnp.min(jnp.maximum(t1, t2), axis=-1), 0.0)

    ids_off = major.packed.shape[-1]  # 7, or 79 with octant extents
    if ids_off >= 79:
        from vpt_tpu.accel.majorant import octant_exit
        t_oct = octant_exit(row[..., 7:79], ci.astype(jnp.float32),
                            rel, direction / cs)
        s_box = jnp.where(t_box <= 0.0,
                          jnp.maximum(s_box, jnp.maximum(t_oct, 0.0)),
                          s_box)
    n_slots = scene.majorant.cell_instances.shape[-1]
    ids = row[..., ids_off:ids_off + n_slots].astype(jnp.int32)
    valid = ids >= 0
    n_inst = scene.instances.packed_rows.shape[0]
    if n_inst <= 4096:
        oh = jax.nn.one_hot(jnp.maximum(ids, 0), n_inst,
                            dtype=jnp.float32)
        rows = oh @ scene.instances.packed_rows  # (..., K, 24)
    else:
        rows = jnp.take(scene.instances.packed_rows, jnp.maximum(ids, 0),
                        axis=0)
        (rows,) = jax.lax.optimization_barrier((rows,))
    K = rows.shape[-2]
    density = jnp.zeros(pos.shape[:-1], jnp.float32)
    for k in range(K):
        d = _density_from_row(scene.atlas, rows[..., k, :], pos)
        density = density + jnp.where(valid[..., k], d, 0.0)
    if with_tau:
        tau8 = row[..., ids_off + n_slots:]
        n_ch = tau8.shape[-1] // 8
        if n_ch == 0:
            raise ValueError("with_tau: cell rows carry no tau columns "
                             "(run accel.shadow.attach_shadow_cache)")
        frac = jnp.clip(rel - ci.astype(jnp.float32), 0.0, 1.0)
        w8 = _trilerp_weights(frac)
        taus = jnp.stack(
            [jnp.sum(tau8[..., 8 * c:8 * c + 8] * w8, axis=-1)
             for c in range(n_ch)], axis=-1)
        return density, s_box, t_box, taus
    return density, s_box, t_box


def _scene_density_cells(scene, pos):
    """Gather-over-candidates density sum (render_kernel.cu:1003-1014
    over the per-cell instance list)."""
    valid, rows = _cell_rows(scene, pos)
    K = rows.shape[-2]
    total = jnp.zeros(pos.shape[:-1], jnp.float32)
    for k in range(K):
        d = _density_from_row(scene.atlas, rows[..., k, :], pos)
        total = total + jnp.where(valid[..., k], d, 0.0)
    return total


def scene_density(scene, pos):
    """Raw summed density at world positions (no density_mult) —
    sum_density over all instances (render_kernel.cu:1003-1014;
    the static loop is the root-node fallback, the cell-list path the
    per-leaf restriction)."""
    if _use_cells(scene):
        return _scene_density_cells(scene, pos)
    total = jnp.zeros(pos.shape[:-1], jnp.float32)
    for i in range(scene.instances.count):
        ipos = transform_point(scene.instances.inv_xform[i], pos)
        total = total + trilinear.sample_density(
            scene.atlas, scene.instances.grid_id[i], ipos)
    return total


def _emission_lut(scene, params, raw, valid):
    """Emission index -> blackbody LUT (render_kernel.cu:963-966,
    QUIRKS #15: int() truncation).

    256-entry table: one-hot on the MXU, NOT jnp.take — an in-loop
    take serializes per lane (~8 ns each), and this runs EVERY fused
    iteration on emissive scenes.  Found round 5: the take made
    config-2 steps ~2x the cost of config-1's (34.8 vs 18.3
    ns/lane-iter) — the same fix density_color_lut got in round 2."""
    idx = jnp.clip(raw * 255.0 / params.emission_pivot, 0.0, 255.0)
    idx = idx.astype(jnp.int32)
    oh = jax.nn.one_hot(idx, 256, dtype=jnp.float32)
    rgb = oh @ scene.emission_lut
    return jnp.where(valid[..., None], rgb * params.emission_scale, 0.0)


def scene_emission(scene, pos, params):
    """sum_emission (render_kernel.cu:970-982): per-instance blackbody
    LUT of the emission channel x emission_scale, summed."""
    if not scene.atlas.has_emission:
        return jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    if _use_cells(scene):
        valid, rows = _cell_rows(scene, pos)
        K = rows.shape[-2]
        total = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
        for k in range(K):
            raw, ok = _emission_from_row(scene.atlas, rows[..., k, :], pos)
            total = total + _emission_lut(scene, params, raw,
                                          ok & valid[..., k])
        return total
    total = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    for i in range(scene.instances.count):
        ipos = transform_point(scene.instances.inv_xform[i], pos)
        raw, ok = trilinear.sample_emission_index_masked(
            scene.atlas, scene.instances.grid_id[i], ipos)
        total = total + _emission_lut(scene, params, raw, ok)
    return total


def scene_color(scene, pos):
    """sum_color (render_kernel.cu:931-943): component-wise max of
    per-instance Cd (WHITE where a grid has no color channel)."""
    if not scene.atlas.has_color:
        return jnp.ones(pos.shape[:-1] + (3,), jnp.float32)
    if _use_cells(scene):
        valid, rows = _cell_rows(scene, pos)
        K = rows.shape[-2]
        color = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
        for k in range(K):
            c = _color_from_row(scene.atlas, rows[..., k, :], pos)
            color = jnp.maximum(color,
                                jnp.where(valid[..., k, None], c, 0.0))
        return color
    color = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    for i in range(scene.instances.count):
        ipos = transform_point(scene.instances.inv_xform[i], pos)
        color = jnp.maximum(color, trilinear.sample_color(
            scene.atlas, scene.instances.grid_id[i], ipos))
    return color


def density_color_lut(scene, params, density):
    """Density-indexed color LUT (render_kernel.cu:1664-1668, QUIRKS
    #14: index = density / sigma_max * 255 / emission_pivot)."""
    idx = jnp.clip(density / scene.max_extinction * 255.0
                   / params.emission_pivot, 0.0, 255.0).astype(jnp.int32)
    # 256-entry table: one-hot on the MXU instead of a serialized gather
    oh = jax.nn.one_hot(idx, 256, dtype=jnp.float32)
    return oh @ scene.density_color_lut


# ---------------------------------------------------------------------------
# unified per-step fetch (density + empty-space skip in minimal gathers)
# ---------------------------------------------------------------------------

def unified_fetch(scene, params, pos, direction, with_tau: bool = False,
                  banded: bool = False):
    """One tracking-step fetch: (density, skip_dt[, tau]).

    ``density`` — summed raw scene density at ``pos``;
    ``skip_dt``  — a distance (world units, along ``direction``) the
    ray may advance from ``pos`` while provably staying in zero
    density (0 when the local region is occupied).  Skipping is a
    sequence of null events, so it leaves every tracking estimator's
    distribution unchanged (QUIRKS #13, #20);
    ``tau``      — (..., C) cached optical depths toward the sun and
    point lights (accel/shadow.py), interpolated from the SAME row —
    only when ``with_tau`` (single-instance scenes with a baked
    shadow cache).

    Gather budget (the TPU cost driver): single-instance scenes use
    ONE (V,15[+8C]) corner-row gather that carries the 8 trilinear
    taps, the local majorant, the empty-box skip extents and the
    shadow-cache channels; multi-instance scenes add one (R^3,7)
    majorant-grid row for the skip field.
    """
    if scene.instances.count == 1 and not _use_cells(scene):
        return _unified_fetch_single(scene, params, pos, direction,
                                     with_tau, banded)
    if (banded and params.use_majorant and _use_cells(scene)
            and scene.majorant.cell_rows is not None):
        return _cells_banded_fetch(scene, pos, direction,
                                   with_tau=with_tau)
    if with_tau:
        raise ValueError("in-row shadow taus require a single-instance "
                         "scene or an instanced scene with cell lists "
                         "(below the threshold, the world tau grid / "
                         "accel.shadow.world_tau_fetch path applies)")
    density = scene_density(scene, pos)
    if not params.use_majorant or scene.majorant is None:
        zero = jnp.zeros_like(density)
        if banded:
            return density, zero, jnp.full_like(density,
                                                scene.max_extinction)
        return density, zero
    if banded:
        # multi-instance banded fetch: the majorant cell grid's packed
        # row carries [T_box, box extents] (accel/majorant.py) — same
        # contract as the single-instance corner row
        from vpt_tpu.accel.majorant import local_majorant_query
        t_box, s_box = local_majorant_query(
            scene.majorant, scene.root_pmin, scene.root_pmax, pos,
            direction)
        return density, s_box, t_box
    from vpt_tpu.accel.majorant import empty_skip_t
    empty, t_exit = empty_skip_t(scene.majorant, scene.root_pmin,
                                 scene.root_pmax, pos, direction)
    # degenerate exits (boundary-pinned positions) fall back to an
    # exponential step — a 1e-3 "jump" crawls for hundreds of steps
    skip_dt = jnp.where(empty & (density <= 0.0) & (t_exit > 0.0),
                        t_exit + 1e-3, 0.0)
    return density, skip_dt


from typing import NamedTuple, Optional


class FetchResult(NamedTuple):
    """Everything one unified corner-row gather carries (single-
    instance fast path): fields are None when the channel is absent
    (static — gates the consuming code at trace time)."""

    density: object
    s_box: object
    t_box: object
    tau: Optional[object] = None            # (..., 1+L) optical depths
    emission_raw: Optional[object] = None   # pre-LUT emission channel
    emission_valid: Optional[object] = None
    color: Optional[object] = None          # (..., 3) Cd (0 outside box)


def unified_fetch_full(scene, params, pos, direction,
                       with_tau: bool = False) -> FetchResult:
    """Single-instance banded fetch returning EVERY channel the row
    carries — the fused engine's one-gather-per-step contract
    (emission/color as separate fetches made those scenes 2-4x
    slower)."""
    return _unified_fetch_single(scene, params, pos, direction,
                                 with_tau=with_tau, banded=True,
                                 full=True)


def _unified_fetch_single(scene, params, pos, direction,
                          with_tau: bool = False, banded: bool = False,
                          full: bool = False):
    """Single-instance fast path: one corner-row gather serves density,
    banded majorant, skip and (optionally) the cached shadow optical
    depths plus the emission/color channels (ARCHITECTURE
    'corner-packed rows').

    banded=False: (density, skip_dt[, tau]) — skip_dt > 0 only for
    guaranteed-EMPTY regions (T_box == 0), the reference-engine walk
    contract.
    banded=True: (density, s_box, t_box[, tau]) — s_box is the exit
    distance of the current bounded-density box and t_box its density
    bound (0 = empty; out-of-grid positions report an empty box
    reaching to the grid entry).  Powers the fused engine's
    spatially-varying-majorant stepping."""
    inv = scene.instances.inv_xform[0]
    row = scene.instances.packed_rows[0]
    bmin = row[12:15]
    dimf = row[15:18]
    off = row[18].astype(jnp.int32)

    ipos = transform_point(inv, pos)
    idir = (direction[..., 0:1] * inv[0, :3] + direction[..., 1:2]
            * inv[1, :3] + direction[..., 2:3] * inv[2, :3])

    npos = (ipos - bmin) / dimf
    inb = jnp.all((npos >= 0.0) & (npos <= 1.0), axis=-1)
    x_u = npos * dimf - 0.5  # unclipped voxel-center coordinate
    x = jnp.clip(x_u, 0.0, dimf - 1.0)
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = i0f.astype(jnp.int32)
    dim = dimf.astype(jnp.int32)
    flat = off + (i0[..., 2] * dim[1] + i0[..., 1]) * dim[0] + i0[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(scene.atlas.density_corners, flat, axis=0)  # (...,15+)
    (rows,) = jax.lax.optimization_barrier((rows,))
    rows = rows.astype(jnp.float32)
    w8 = _trilerp_weights(frac)
    density = jnp.sum(rows[..., :8] * w8, axis=-1)
    density = jnp.where(inb, density, 0.0)

    from vpt_tpu.volume.grid import unified_layout
    em_off, col_off, tau_off = unified_layout(scene.atlas)
    tau = None
    if with_tau:
        n_ch = (rows.shape[-1] - tau_off) // 8
        if n_ch < 1:
            raise ValueError("shadow_mode='cached' but the scene has no "
                             "baked cache — call accel.shadow."
                             "attach_shadow_cache first")
        tau = jnp.stack(
            [jnp.sum(rows[..., tau_off + 8 * c:tau_off + 8 + 8 * c] * w8,
                     axis=-1)
             for c in range(n_ch)], axis=-1)
    emission_raw = emission_valid = color = None
    if full and em_off >= 0:
        emission_raw = jnp.sum(rows[..., em_off:em_off + 8] * w8, axis=-1)
        emission_valid = inb
    if full and col_off >= 0:
        crows = rows[..., col_off:col_off + 24].reshape(
            rows.shape[:-1] + (8, 3))
        color = jnp.sum(crows * w8[..., None], axis=-2)
        color = jnp.where(inb[..., None], color, 0.0)

    if not params.use_majorant:
        zero = jnp.zeros_like(density)
        if full:
            return FetchResult(density, zero,
                               jnp.full_like(density, scene.max_extinction),
                               tau, emission_raw, emission_valid, color)
        if banded:
            out = (density, zero, jnp.full_like(density,
                                                scene.max_extinction))
        else:
            out = (density, zero)
        return out + (tau,) if with_tau else out

    # in-box: the bounded-density BOX around the base voxel
    # (grid._corner_pack): T_box in col 8 (0 = guaranteed empty),
    # extents [xm,ym,zm] / [xp,yp,zp] in cols 9:12 / 12:15.  Exit
    # distance of that index-space box is safe (in world units because
    # the index position is parameterized by world t), computed in
    # UNCLIPPED voxel-center space (the clipped coordinate pins
    # boundary-layer samples onto the cube face -> zero-length steps).
    t_box = rows[..., 8]
    ext_m = rows[..., 9:12]
    ext_p = rows[..., 12:15]
    cube_min = i0f - jnp.maximum(ext_m, 0.0)
    cube_max = i0f + 1.0 + jnp.maximum(ext_p, 0.0)
    safe_dir = jnp.where(jnp.abs(idir) < 1e-12, 1e-12, idir)
    t1 = (cube_min - x_u) / safe_dir
    t2 = (cube_max - x_u) / safe_dir
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    if scene.atlas.octant_cols:
        # per-(octant x major-axis) anchored forward extents
        # (grid._octant_box_extents, cols 15:87): a box grown
        # forward-only in the ray's direction octant, deepest along
        # its dominant axis — merges the chained empty-box hops the
        # symmetric box leaves behind (47% of walking iterations,
        # probe_phases).  Exit distances from BOTH boxes are valid;
        # take the max.
        from vpt_tpu.accel.majorant import octant_exit
        t_oct = octant_exit(rows[..., 15:87], i0f, x_u, idir)
        t_exit = jnp.where(t_box <= 0.0,
                           jnp.maximum(t_exit, t_oct), t_exit)
    in_skip = inb & (t_box <= 0.0)

    # out-of-box: density is identically 0 outside the grid; advance to
    # the grid-box entry along the ray (the reference pushes shadow
    # rays to the volume box the same way, render_kernel.cu:1153-1156).
    # Rays that MISS the grid box entirely jump "to infinity" — the
    # walk's exit-distance check ends them on the next step.
    lo = bmin
    hi = bmin + dimf
    t1b = (lo - ipos) / safe_dir
    t2b = (hi - ipos) / safe_dir
    t_entry = jnp.max(jnp.minimum(t1b, t2b), axis=-1)
    t_leave = jnp.min(jnp.maximum(t1b, t2b), axis=-1)
    misses_box = (t_leave < jnp.maximum(t_entry, 0.0)) | (t_leave <= 0.0)
    t_entry = jnp.where(misses_box, 1e30, jnp.maximum(t_entry, 0.0))

    # degenerate jumps (exit/entry distance <= 0: the sample sits in a
    # boundary band moving outward, or exactly on a face) fall back to
    # a plain exponential step — zero-density samples there are null
    # events, and a "+1e-3" jump would crawl for hundreds of steps
    skip_in = jnp.where(t_exit > 0.0, t_exit + 1e-3, 0.0)
    skip_out = jnp.where(t_entry > 0.0, t_entry + 1e-3, 0.0)
    if banded:
        # (s_box, t_box): out-of-grid = empty box reaching the grid
        # entry.  No +1e-3 nudge here — the bound is only valid
        # INSIDE the box (a nudged landing could exceed T), and the
        # banded step rule always adds a global-rate exponential
        # beyond the box, so degenerate exits cannot crawl.
        s_box = jnp.where(inb, jnp.maximum(t_exit, 0.0),
                          jnp.maximum(t_entry, 0.0))
        t_out = jnp.where(inb, t_box, 0.0)
        if full:
            return FetchResult(density, s_box, t_out, tau, emission_raw,
                               emission_valid, color)
        return (density, s_box, t_out, tau) if with_tau \
            else (density, s_box, t_out)
    skip_dt = jnp.where(in_skip, skip_in, jnp.where(inb, 0.0, skip_out))
    return (density, skip_dt, tau) if with_tau else (density, skip_dt)


# ---------------------------------------------------------------------------
# bounded lane-masked walks (the reference engine's building blocks)
# ---------------------------------------------------------------------------

def vec3_param(x):
    """Scalar-or-(3,) dynamic param -> (3,) f32 (Kernel_params float3
    fields like albedo/extinction/sun_color accept both here)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 0:
        x = jnp.broadcast_to(x, (3,))
    return x

def _sphere_block(scene, pos, direction):
    """(hit, t) of the reference sphere; miss when disabled."""
    sph = scene.sphere
    from vpt_tpu.scene.geometry import _sphere_roots
    hit, tmin, _ = _sphere_roots(sph.center, sph.radius, pos, direction)
    hit = hit & sph.enabled
    return hit, jnp.where(hit, tmin, 3.4e38)


def delta_track(scene, params, key, pos, direction, active):
    """Free-path sampling (``sample``, render_kernel.cu:1556-1681) for
    a batch of rays assumed at/inside the root box.

    Returns (new_pos, interaction, value, hit_sphere, alpha_add,
    steps): ``value`` is the throughput factor (WHITE on a no-collision
    exit; albedo*Cd*LUT/extinction*energy_inject on a real collision,
    render_kernel.cu:1674).
    """
    B = pos.shape[0]
    sigma_max = scene.max_extinction * params.density_mult
    inv_rate = 1.0 / jnp.maximum(sigma_max, 1e-12)

    _, _, t_box = aabb_intersect(scene.root_pmin, scene.root_pmax, pos,
                                 direction)
    sph_hit, t_sph = _sphere_block(scene, pos, direction)
    distance = jnp.where(sph_hit & (t_sph < t_box), t_sph, t_box)
    sphere_limited = sph_hit & (t_sph < t_box)

    # fetch once per loop iteration: the skip decision uses the carried
    # fetch from the previous step (gather count is the TPU cost driver)
    _, skip0 = unified_fetch(scene, params, pos, direction)

    def body(state):
        t, skip, cur_active, interaction, alpha_add, steps, step_i = state
        u = jax.random.uniform(jax.random.fold_in(key, step_i), (B, 2))
        do_skip = cur_active & (skip > 0.0)
        dt = jnp.where(do_skip, skip, -jnp.log1p(-u[:, 0]) * inv_rate)
        t_new = jnp.where(cur_active, t + dt, t)
        exited = cur_active & (t_new >= distance)
        p_new = pos + direction * t_new[..., None]
        d_new, skip_new = unified_fetch(scene, params, p_new, direction)
        sampled = cur_active & ~do_skip & ~exited
        alpha_add = alpha_add + jnp.where(sampled, d_new, 0.0)
        accept = sampled & (d_new / scene.max_extinction > u[:, 1])
        interaction = interaction | accept
        cur_active = cur_active & ~exited & ~accept
        steps = steps + cur_active.astype(jnp.int32)
        return (t_new, skip_new, cur_active, interaction, alpha_add, steps,
                step_i + 1)

    def cond(state):
        _, _, cur_active, _, _, _, step_i = state
        return jnp.any(cur_active) & (step_i < params.max_track_steps)

    t0 = jnp.zeros(B, jnp.float32)
    state = (t0, skip0, active, jnp.zeros(B, bool),
             jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
             jnp.int32(0))
    (t, _skip, _act, interaction, alpha_add, steps,
     _i) = jax.lax.while_loop(cond, body, state)

    new_pos = pos + direction * t[..., None]
    hit_sphere = active & sphere_limited & ~interaction

    d_final = scene_density(scene, new_pos)
    cd = scene_color(scene, new_pos)
    lut = density_color_lut(scene, params, d_final)
    coll_val = (vec3_param(params.albedo) * cd * lut
                / vec3_param(params.extinction)) * params.energy_inject
    value = jnp.where(interaction[..., None], coll_val,
                      jnp.ones_like(coll_val))
    return new_pos, interaction, value, hit_sphere, alpha_add, steps


def transmittance(scene, params, key, pos, direction):
    """Residual ratio tracking (``Tr``, render_kernel.cu:1138-1273):
    control variate sigma_c = scene min extinction, T_c = exp(-sigma_c
    * distance); sphere hits return BLACK (QUIRKS #7)."""
    B = pos.shape[0]
    hit, t_entry, t_exit = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                          pos, direction)
    from vpt_tpu.core.vecmath import EPS, aabb_contains
    inside = aabb_contains(scene.root_pmin, scene.root_pmax, pos)
    # outside + miss -> tr stays 1 (no medium along the ray)
    miss = ~inside & ~hit
    start = jnp.where((~inside & hit)[..., None],
                      pos + direction * (t_entry + EPS)[..., None], pos)
    _, _, distance = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                    start, direction)
    distance = jnp.maximum(distance, 0.0)

    sph_hit, _ = _sphere_block(scene, start, direction)

    sigma_c = scene.min_extinction
    sigma_r = jnp.maximum(scene.max_extinction - sigma_c, 1e-12)
    rate_inv = params.tr_depth / sigma_r
    t_c = jnp.exp(-sigma_c * distance)

    _, skip0 = unified_fetch(scene, params, start, direction)

    def body(state):
        t, skip, tr, cur_active, step_i = state
        u = jax.random.uniform(jax.random.fold_in(key, step_i), (B,))
        do_skip = cur_active & (skip > 0.0)
        dt = jnp.where(do_skip, skip, -jnp.log1p(-u) * rate_inv)
        t_new = jnp.where(cur_active, t + dt, t)
        exited = cur_active & (t_new >= distance)
        p_new = start + direction * t_new[..., None]
        d_new, skip_new = unified_fetch(scene, params, p_new, direction)
        sampled = cur_active & ~do_skip & ~exited
        factor = 1.0 - (d_new - sigma_c) / sigma_r
        tr = jnp.where(sampled, tr * factor, tr)
        cur_active = cur_active & ~exited & (jnp.abs(tr) >= EPS)
        return (t_new, skip_new, tr, cur_active, step_i + 1)

    def cond(state):
        _, _, _, cur_active, step_i = state
        return jnp.any(cur_active) & (step_i < params.max_track_steps)

    active0 = ~miss & ~sph_hit
    state = (jnp.zeros(B, jnp.float32), skip0, jnp.ones(B, jnp.float32),
             active0, jnp.int32(0))
    _, _, tr, _, _ = jax.lax.while_loop(cond, body, state)

    tr = jnp.clip(tr * t_c, 0.0, 1.0)
    tr = jnp.where(miss, 1.0, tr)
    tr = jnp.where(sph_hit, 0.0, tr)
    return tr


def estimate_emission(scene, params, key, pos, direction, active=None,
                      max_extinction=None):
    """Rate-weighted emission line integral (render_kernel.cu:1275-1339,
    QUIRKS #21): a ratio-tracking-rate walk summing sum_emission at
    every sampled point.  No empty-space skipping — emission can live
    where density is zero (the reference's octree skip only skips
    no-VOLUME nodes).

    ``max_extinction`` overrides the sampling-rate extinction (QUIRKS
    #21: the estimator's expectation CARRIES the rate factor, so a
    sharded union scene must walk every component at the union's rate
    — parallel.instance_shard.estimate_emission_sharded)."""
    B = pos.shape[0]
    if not scene.atlas.has_emission:
        return jnp.zeros((B, 3), jnp.float32)
    ext_x = vec3_param(params.extinction)[0]
    sig = (scene.max_extinction if max_extinction is None
           else max_extinction)
    rate_inv = params.tr_depth / jnp.maximum(sig * ext_x, 1e-12)
    _, _, distance = aabb_intersect(scene.root_pmin, scene.root_pmax, pos,
                                    direction)
    distance = jnp.maximum(distance, 0.0)
    if active is None:
        active = jnp.ones(B, bool)

    def body(state):
        t, emission, cur_active, step_i = state
        u = jax.random.uniform(jax.random.fold_in(key, step_i), (B,))
        dt = -jnp.log1p(-u) * rate_inv
        t_new = jnp.where(cur_active, t + dt, t)
        exited = cur_active & (t_new >= distance)
        p_new = pos + direction * t_new[..., None]
        sampled = cur_active & ~exited
        e = scene_emission(scene, p_new, params)
        emission = emission + jnp.where(sampled[..., None], e, 0.0)
        return (t_new, emission, cur_active & ~exited, step_i + 1)

    def cond(state):
        _, _, cur_active, step_i = state
        return jnp.any(cur_active) & (step_i < params.max_track_steps)

    state = (jnp.zeros(B, jnp.float32), jnp.zeros((B, 3), jnp.float32),
             active, jnp.int32(0))
    _, emission, _, _ = jax.lax.while_loop(cond, body, state)
    return emission
