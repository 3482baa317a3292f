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


def exact_density_at(host_grids, instance_grid_ids, instance_xforms,
                     wpos):
    """Exact summed instance density at world points (host-side;
    tracking.scene_density / render_kernel.cu:1003-1014 semantics).
    Used as ground truth by the union error estimators."""
    from vpt_tpu.scene.scene import _world_bounds
    ids = np.asarray(instance_grid_ids, np.int64)
    wpos = np.asarray(wpos, np.float64)
    total = np.zeros(len(wpos), np.float64)
    for gid, xf in zip(ids, instance_xforms):
        g = host_grids[int(gid)]
        xf = np.asarray(xf, np.float64)
        inv = np.linalg.inv(xf)
        lo, hi = _world_bounds(g, xf)
        # bbox pre-filter only (outside trilinear support reads 0);
        # widen a voxel so boundary samples aren't clipped
        pad = float(g.voxel_size) * float(np.abs(xf[:3, :3]).max()) + 1e-6
        m = np.all((wpos >= lo - pad) & (wpos <= hi + pad), axis=1)
        if not m.any():
            continue
        ipos = (wpos[m] @ inv[:3, :3] + inv[3, :3]
                - (np.asarray(g.bbox_min, np.float64) + 0.5))
        total[m] += _trilinear_channel(g.density_zyx, ipos)
    return total


def _sample_points(host_grids, instance_grid_ids, instance_xforms, n, seed):
    """Sample world points uniformly inside random instances' world
    boxes — error probes concentrated where the medium actually lives
    (uniform root-box sampling wastes most probes on empty sky)."""
    from vpt_tpu.scene.scene import _world_bounds
    rng = np.random.RandomState(seed)
    ids = np.asarray(instance_grid_ids, np.int64)
    pick = rng.randint(0, len(ids), size=n)
    pts = np.empty((n, 3), np.float64)
    bounds = [_world_bounds(host_grids[int(g)], np.asarray(x, np.float64))
              for g, x in zip(ids, instance_xforms)]
    for i, k in enumerate(pick):
        lo, hi = bounds[k]
        pts[i] = lo + rng.rand(3) * (hi - lo)
    return pts


def union_field_error(union: HostGrid, host_grids, instance_grid_ids,
                      instance_xforms, n: int = 4096, seed: int = 0):
    """Measured union-vs-exact density error of a BUILT union grid.

    Returns ``mean |union(p) - exact(p)| / mean exact(p)`` over ``n``
    points sampled inside instance boxes — the per-run error figure the
    bench emits next to every union-mode throughput number (VERDICT r4
    #3: an approximation must carry its measured error wherever its
    speed is reported).  tests/test_union.py bounds the same quantity
    at test resolution."""
    pts = _sample_points(host_grids, instance_grid_ids, instance_xforms,
                         n, seed)
    exact = exact_density_at(host_grids, instance_grid_ids,
                             instance_xforms, pts)
    inv = np.linalg.inv(np.asarray(union.transform, np.float64))
    ipos = (pts @ inv[:3, :3] + inv[3, :3]
            - (np.asarray(union.bbox_min, np.float64) + 0.5))
    approx = _trilinear_channel(union.density_zyx, ipos)
    denom = max(float(exact.mean()), 1e-12)
    return float(np.abs(approx - exact).mean() / denom)


def union_error_at_resolution(host_grids, instance_grid_ids,
                              instance_xforms, resolution: int,
                              n: int = 2048, seed: int = 0):
    """Estimate the union error AT a candidate resolution WITHOUT
    building the grid: the union's value at p is the trilinear blend of
    exact sums at the 8 surrounding union voxel centers, so evaluating
    those on the fly prices a resolution at O(8n) exact fetches instead
    of a minutes-long full resample."""
    from vpt_tpu.scene.scene import _world_bounds
    ids = np.asarray(instance_grid_ids, np.int64)
    pmins, pmaxs = [], []
    for gid, xf in zip(ids, instance_xforms):
        lo, hi = _world_bounds(host_grids[int(gid)],
                               np.asarray(xf, np.float64))
        pmins.append(lo)
        pmaxs.append(hi)
    root_pmin = np.stack(pmins).min(axis=0) - 1.0
    root_pmax = np.stack(pmaxs).max(axis=0) + 1.0
    cell = float((root_pmax - root_pmin).max()) / int(resolution)

    pts = _sample_points(host_grids, instance_grid_ids, instance_xforms,
                         n, seed)
    exact = exact_density_at(host_grids, instance_grid_ids,
                             instance_xforms, pts)
    # voxel-center coordinates of the union grid: center i at
    # root_pmin + (i + 0.5) * cell
    x = (pts - root_pmin) / cell - 0.5
    i0 = np.floor(x)
    frac = x - i0
    approx = np.zeros(n, np.float64)
    for c in range(8):
        d = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], np.float64)
        centers = root_pmin + (i0 + d + 0.5) * cell
        w = np.prod(np.where(d > 0, frac, 1.0 - frac), axis=1)
        approx += w * exact_density_at(host_grids, instance_grid_ids,
                                       instance_xforms, centers)
    denom = max(float(exact.mean()), 1e-12)
    return float(np.abs(approx - exact).mean() / denom)


def choose_union_resolution(host_grids, instance_grid_ids,
                            instance_xforms, error_budget: float = 0.05,
                            candidates=(160, 224, 320, 448, 640),
                            n: int = 2048, seed: int = 0):
    """Auto-pick the coarsest union resolution whose estimated field
    error fits ``error_budget`` (VERDICT r4 #3).  Returns
    (resolution, estimated_error); falls back to the finest candidate
    when none fits (callers should surface the returned error either
    way)."""
    err = float("inf")
    for res in candidates:
        err = union_error_at_resolution(host_grids, instance_grid_ids,
                                        instance_xforms, res, n=n,
                                        seed=seed)
        if err <= error_budget:
            return int(res), err
    return int(candidates[-1]), err


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
