"""World-space union resampling for instanced scenes.

The exact instanced density fetch visits every overlapping instance
per tracking step (K corner-row gathers + the cell-list row,
render_kernel.cu:1003-1014 semantics) — on the TPU each gather
serializes per lane, so config-5-scale scenes pay ~(K+2) serialized
gathers per step where a single-volume scene pays ONE.

``resample_union_grid`` collapses the whole instanced scene into one
world-axis-aligned HostGrid by evaluating the summed instance density
(and emission / max-combined color, tracking.scene_density semantics)
at every world voxel center.  The result renders through the ENTIRE
single-instance fast path — unified corner rows, banded majorants,
greedy empty boxes, cached shadow taus — at one gather per step.

This is an opt-in APPROXIMATION (resampling error, like the baked sky
cache): the exact per-instance path remains the default and the
golden corpus pins it; tests/test_union.py bounds the union-mode
error at a given resolution.  Memory: the corner table costs
~15 channels/voxel — pass ``corner_dtype='bfloat16'`` to build_scene
for big resolutions.
"""

from __future__ import annotations

import numpy as np

from vpt_tpu.volume.grid import HostGrid


def _trilinear_channel(vol_zyx, ipos):
    """Host trilinear at fractional node coords (node i at coordinate
    i), zero outside support (accel.shadow._trilinear_index for an
    arbitrary channel count)."""
    from vpt_tpu.accel.shadow import _trilinear_index
    if vol_zyx.ndim == 3:
        return _trilinear_index(vol_zyx, ipos)
    return np.stack([_trilinear_index(vol_zyx[..., c], ipos)
                     for c in range(vol_zyx.shape[-1])], axis=-1)


def resample_union_grid(host_grids, instance_grid_ids, instance_xforms,
                        resolution: int = 256) -> HostGrid:
    """Resample an instanced scene's union fields onto one world grid.

    ``resolution`` sets the voxel count along the LONGEST root-box
    axis (isotropic voxels; other axes scale).  Density/emission sum
    over instances, color takes the component-wise max — exactly the
    multi-instance fetch semantics (tracking.scene_density/_emission/
    _color).
    """
    from vpt_tpu.scene.scene import _world_bounds

    ids = np.asarray(instance_grid_ids, np.int64)
    xforms = [np.asarray(x, np.float64) for x in instance_xforms]
    pmins, pmaxs = [], []
    for gid, xf in zip(ids, xforms):
        lo, hi = _world_bounds(host_grids[int(gid)], xf)
        pmins.append(lo)
        pmaxs.append(hi)
    root_pmin = np.stack(pmins).min(axis=0) - 1.0
    root_pmax = np.stack(pmaxs).max(axis=0) + 1.0
    extent = root_pmax - root_pmin
    cell = float(extent.max()) / int(resolution)
    dim = np.maximum(np.ceil(extent / cell).astype(np.int64), 1)  # x,y,z
    nx, ny, nz = int(dim[0]), int(dim[1]), int(dim[2])

    has_emission = any(host_grids[int(g)].emission_zyx is not None
                       for g in ids)
    has_color = any(host_grids[int(g)].color_zyx is not None for g in ids)
    dens = np.zeros((nz, ny, nx), np.float32)
    emis = np.zeros((nz, ny, nx), np.float32) if has_emission else None
    col = np.zeros((nz, ny, nx, 3), np.float32) if has_color else None

    for gid, xf in zip(ids, xforms):
        g = host_grids[int(gid)]
        inv = np.linalg.inv(xf)
        lo_w, hi_w = _world_bounds(g, xf)
        lo = np.clip(np.floor((lo_w - root_pmin) / cell).astype(np.int64)
                     - 1, 0, dim - 1)
        hi = np.clip(np.ceil((hi_w - root_pmin) / cell).astype(np.int64)
                     + 1, 0, dim - 1)
        gz, gy, gx = np.meshgrid(np.arange(lo[2], hi[2] + 1),
                                 np.arange(lo[1], hi[1] + 1),
                                 np.arange(lo[0], hi[0] + 1), indexing="ij")
        # world voxel centers -> instance node coordinates
        wpos = (np.stack([gx, gy, gz], axis=-1).astype(np.float64) + 0.5) \
            * cell + root_pmin
        ipos = (wpos.reshape(-1, 3) @ inv[:3, :3] + inv[3, :3]
                - (np.asarray(g.bbox_min, np.float64) + 0.5))
        ipos = ipos.reshape(gz.shape + (3,))
        sub = (slice(lo[2], hi[2] + 1), slice(lo[1], hi[1] + 1),
               slice(lo[0], hi[0] + 1))
        dens[sub] += _trilinear_channel(g.density_zyx, ipos)
        if emis is not None and g.emission_zyx is not None:
            emis[sub] += _trilinear_channel(g.emission_zyx, ipos)
        if col is not None and g.color_zyx is not None:
            np.maximum(col[sub], _trilinear_channel(g.color_zyx, ipos),
                       out=col[sub])

    xf_u = np.diag([cell, cell, cell, 1.0])
    xf_u[3, :3] = root_pmin
    return HostGrid(
        density_zyx=dens, emission_zyx=emis, color_zyx=col,
        bbox_min=np.zeros(3, np.int32),
        dim=np.array([nx, ny, nz], np.int32),
        transform=xf_u, voxel_size=cell,
        max_density=float(dens.max()),
        min_density=min(host_grids[int(g)].min_density for g in ids))


def build_union_scene(host_grids, instance_grid_ids, instance_xforms,
                      resolution: int = 256,
                      corner_dtype: str = "bfloat16",
                      octant_boxes: bool | str = "auto", **build_kw):
    """resample_union_grid + build_scene: an instanced scene collapsed
    to the single-instance fast path (approximate; see module doc).

    ``octant_boxes=True`` is worth turning on for sparse cloudscapes
    (unlike single-volume scenes where it is break-even): they are
    jump-dominated and the per-(octant x major-axis) anchored boxes
    measured 71.4 -> 49.7 ms/spp (1.44x, identical means) on the
    1024-instance bench scene (tools/probe_union_oct.py).  Cost: the
    bf16 corner row widens 15 -> 87 cols (~6x the table bytes — build
    sweep + host->device transfer + HBM) and the build sweep itself is
    minutes of host time at 320^3, so the default stays "auto" (=
    build_scene's resolution-gated heuristic); opt in per scene.
    """
    from vpt_tpu.scene.scene import build_scene
    union = resample_union_grid(host_grids, instance_grid_ids,
                                instance_xforms, resolution=resolution)
    return build_scene([union], corner_dtype=corner_dtype,
                       octant_boxes=octant_boxes, **build_kw)
