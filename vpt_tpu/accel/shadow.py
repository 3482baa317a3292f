"""Precomputed light-transmittance (optical depth) fields.

The reference estimates every NEE transmittance with a stochastic
residual-ratio walk (``Tr``, render_kernel.cu:1138-1273) — up to
1 (sun) + 11 (point lights) walks per medium event.  On a TPU each
walk step costs one serialized row gather, and the walks dominate the
per-tile step tail that sets wall-clock (docs/ARCHITECTURE.md).

But transmittance through a *known* density field is deterministic:
``Tr = exp(-tau)`` with ``tau = integral of sigma along the segment``.
This module precomputes tau toward the sun (one directional sweep)
and toward each point light (a spherical resample around the light)
at every voxel node, and bakes the fields into the corner-packed
density rows — so a medium event reads its shadow transmittances from
the SAME row gather that produced the collision density: the whole
NEE transmittance costs ZERO extra gathers and ZERO walk iterations.

This is the volumetric analog of deep shadow maps (Lokovic & Veach
2000) as used by production volume renderers.  The only deviation
from the tracked estimator is deterministic quadrature+interpolation
error (no statistical bias term — the tracked walks are unbiased
estimators of the same exp(-tau)); tests/test_shadow.py bounds it.

Enable with ``RenderParams.shadow_mode="cached"`` after calling
``attach_shadow_cache`` (single-instance scenes; re-call when the sun
direction or lights change — the bake is a sub-second host pass).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

MAX_CACHED_LIGHTS = 8


def _tau_base(atlas) -> int:
    """First tau column in the unified corner row (grid.unified_layout:
    density+accel 15 | emission 8? | color 24? | tau...)."""
    from vpt_tpu.volume.grid import unified_layout
    return unified_layout(atlas)[2]


def _trilinear_index(density_zyx, ipos):
    """Trilinear sample of the node field at fractional node coords
    (node i at coordinate i); zero outside [0, n-1] support."""
    nz, ny, nx = density_zyx.shape
    x, y, z = ipos[..., 0], ipos[..., 1], ipos[..., 2]
    inb = ((x > -1.0) & (x < nx) & (y > -1.0) & (y < ny)
           & (z > -1.0) & (z < nz))
    x0 = np.floor(x)
    y0 = np.floor(y)
    z0 = np.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    out = np.zeros(ipos.shape[:-1], np.float32)
    for c in range(8):
        dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        xi = (x0 + dx).astype(np.int64)
        yi = (y0 + dy).astype(np.int64)
        zi = (z0 + dz).astype(np.int64)
        ok = ((xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
              & (zi >= 0) & (zi < nz))
        v = np.where(
            ok, density_zyx[np.clip(zi, 0, nz - 1), np.clip(yi, 0, ny - 1),
                            np.clip(xi, 0, nx - 1)], 0.0)
        w = ((fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
             * (fz if dz else 1.0 - fz))
        out += v * w
    return np.where(inb, out, 0.0).astype(np.float32)


def directional_tau_nodes(density_zyx: np.ndarray, dir_idx: np.ndarray,
                          world_per_idx: float,
                          step_vox: float = 0.5) -> np.ndarray:
    """tau(node) = integral of density from each node to the grid exit
    along a constant direction (the sun).

    dir_idx: direction in index space (A @ sun_dir for instance linear
    inverse A); world_per_idx: world length of a unit index-space step
    along dir_idx (= 1/|A @ sun_dir| for unit world sun_dir).

    Midpoint quadrature with ``step_vox``-voxel steps; each step is a
    CONSTANT-offset trilinear shift of the whole node field (pure
    dense slicing — no per-node gathers), so the sweep is O(K) dense
    passes, not O(V*K) samples.
    """
    nz, ny, nx = density_zyx.shape
    u = dir_idx / max(np.linalg.norm(dir_idx), 1e-12)
    h_idx = step_vox                       # index-space step length
    h_world = h_idx * world_per_idx
    diag = np.linalg.norm([nx, ny, nz])
    K = int(np.ceil(diag / h_idx)) + 1
    tau = np.zeros_like(density_zyx, np.float32)
    # evaluate with constant offsets: S(x + o) for all nodes x at once
    for k in range(K):
        o = (k + 0.5) * h_idx * u          # (3,) xyz offset
        m = np.floor(o).astype(np.int64)
        f = (o - m).astype(np.float32)
        acc = np.zeros_like(tau)
        for c in range(8):
            dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            w = ((f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1])
                 * (f[2] if dz else 1 - f[2]))
            if w == 0.0:
                continue
            sx, sy, sz = int(m[0] + dx), int(m[1] + dy), int(m[2] + dz)
            acc += w * _shift3(density_zyx, sz, sy, sx)
        tau += acc
    return tau * np.float32(h_world)


def _shift3(a, sz, sy, sx):
    """a[z+sz, y+sy, x+sx] with zero fill (a is zyx)."""
    nz, ny, nx = a.shape
    out = np.zeros_like(a)
    z0, z1 = max(0, -sz), min(nz, nz - sz)
    y0, y1 = max(0, -sy), min(ny, ny - sy)
    x0, x1 = max(0, -sx), min(nx, nx - sx)
    if z0 >= z1 or y0 >= y1 or x0 >= x1:
        return out
    out[z0:z1, y0:y1, x0:x1] = a[z0 + sz:z1 + sz, y0 + sy:y1 + sy,
                                 x0 + sx:x1 + sx]
    return out


def point_tau_nodes(density_zyx: np.ndarray, xform: np.ndarray,
                    bbox_min: np.ndarray, light_world: np.ndarray,
                    n_theta: int = 180, n_phi: int = 360,
                    step_world: float | None = None) -> np.ndarray:
    """tau(node) = integral of density from each node THROUGH the
    point light to the grid exit (the reference's Tr walks run the
    full segment to the scene box, not stopping at the light —
    render_kernel.cu:1148-1167).

    Strategy: resample density onto a spherical grid centred on the
    light (one-time bulk sampling), radially cumsum to get
    F(theta, phi, r) = tau from the light out to radius r, then
    tau(node) = F(dir(node), r(node))            [node -> light]
              + F(antipode(dir(node)), R_max)    [beyond the light].

    xform: index->world row-vector 4x4 of the instance (node i at
    index bmin + i + 0.5); bbox_min: grid index bbox min.
    """
    nz, ny, nx = density_zyx.shape
    # world positions of the 8 grid corners bound the needed radius
    corners_idx = np.array([[x, y, z]
                            for x in (0, nx) for y in (0, ny)
                            for z in (0, nz)], np.float64)
    corners_idx += np.asarray(bbox_min, np.float64) - 0.5
    corners_w = corners_idx @ xform[:3, :3] + xform[3, :3]
    r_max = float(np.max(np.linalg.norm(corners_w - light_world, axis=-1)))
    r_max = max(r_max, 1e-6)
    if step_world is None:
        # ~half-voxel steps in the smallest world voxel dimension
        vox_w = np.linalg.norm(xform[:3, :3], axis=1)
        step_world = 0.5 * float(vox_w.min())
    n_r = max(int(np.ceil(r_max / step_world)), 2)

    theta = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    phi = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    rr = (np.arange(n_r) + 0.5) * step_world
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    # directions (n_theta, n_phi, 3)
    dirs = np.stack([st[:, None] * cp[None, :], st[:, None] * sp[None, :],
                     np.broadcast_to(ct[:, None], (n_theta, n_phi))],
                    axis=-1)
    inv = np.linalg.inv(np.asarray(xform, np.float64))
    # adjust for node coords: index = world @ inv - (bmin + 0.5)
    shift = np.asarray(bbox_min, np.float64) + 0.5

    # radial chunks keep the resample memory bounded
    F = np.zeros((n_theta, n_phi, n_r + 1), np.float32)
    chunk = max(1, int(2e7 // (n_theta * n_phi)))
    acc = np.zeros((n_theta, n_phi), np.float32)
    for r0 in range(0, n_r, chunk):
        r1 = min(r0 + chunk, n_r)
        pts = (light_world[None, None, None, :]
               + dirs[:, :, None, :] * rr[None, None, r0:r1, None])
        ipos = (pts.reshape(-1, 3) @ inv[:3, :3] + inv[3, :3]
                - shift).reshape(n_theta, n_phi, r1 - r0, 3)
        sig = _trilinear_index(density_zyx, ipos)
        seg = np.cumsum(sig, axis=-1, dtype=np.float64) * step_world
        F[:, :, r0 + 1:r1 + 1] = acc[..., None] + seg
        acc = acc + seg[..., -1].astype(np.float32)
    F_tot = F[:, :, -1]

    # evaluate at every node
    node_idx = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                    np.arange(nz), indexing="ij"),
                        axis=-1).astype(np.float64)
    node_idx = np.moveaxis(node_idx, (0, 1, 2), (2, 1, 0))  # zyx order
    node_idx += np.asarray(bbox_min, np.float64) + 0.5
    node_w = node_idx @ xform[:3, :3] + xform[3, :3]
    rel = node_w - light_world
    r = np.linalg.norm(rel, axis=-1)
    safe_r = np.maximum(r, 1e-12)
    u = rel / safe_r[..., None]

    tau_in = _sph_lerp(F, u, r / step_world)          # node -> light
    tau_out = _sph_lerp_total(F_tot, -u)              # beyond the light
    return (tau_in + tau_out).astype(np.float32)


def _sph_angles(u):
    th = np.arccos(np.clip(u[..., 2], -1.0, 1.0))
    ph = np.arctan2(u[..., 1], u[..., 0]) % (2 * np.pi)
    return th, ph


def _sph_lerp(F, u, r_frac):
    """Trilinear (theta, phi-wrapped, r) interpolation of F at
    direction u / radius index r_frac (F has an implicit r=0 plane at
    index 0)."""
    n_theta, n_phi, n_r1 = F.shape
    th, ph = _sph_angles(u)
    ti = th / np.pi * n_theta - 0.5
    pi_ = ph / (2 * np.pi) * n_phi - 0.5
    ri = np.clip(r_frac, 0.0, n_r1 - 1.0)
    t0 = np.clip(np.floor(ti), 0, n_theta - 1).astype(np.int64)
    t1 = np.minimum(t0 + 1, n_theta - 1)
    ft = np.clip(ti - t0, 0.0, 1.0)
    p0 = np.floor(pi_).astype(np.int64) % n_phi
    p1 = (p0 + 1) % n_phi
    fp = np.clip(pi_ - np.floor(pi_), 0.0, 1.0)
    r0 = np.floor(ri).astype(np.int64)
    r1 = np.minimum(r0 + 1, n_r1 - 1)
    fr = ri - r0
    out = 0.0
    for (tt, wt) in ((t0, 1 - ft), (t1, ft)):
        for (pp, wp) in ((p0, 1 - fp), (p1, fp)):
            for (rr_, wr) in ((r0, 1 - fr), (r1, fr)):
                out = out + F[tt, pp, rr_] * (wt * wp * wr)
    return out


def _sph_lerp_total(F_tot, u):
    n_theta, n_phi = F_tot.shape
    th, ph = _sph_angles(u)
    ti = th / np.pi * n_theta - 0.5
    pi_ = ph / (2 * np.pi) * n_phi - 0.5
    t0 = np.clip(np.floor(ti), 0, n_theta - 1).astype(np.int64)
    t1 = np.minimum(t0 + 1, n_theta - 1)
    ft = np.clip(ti - t0, 0.0, 1.0)
    p0 = np.floor(pi_).astype(np.int64) % n_phi
    p1 = (p0 + 1) % n_phi
    fp = np.clip(pi_ - np.floor(pi_), 0.0, 1.0)
    return (F_tot[t0, p0] * (1 - ft) * (1 - fp)
            + F_tot[t1, p0] * ft * (1 - fp)
            + F_tot[t0, p1] * (1 - ft) * fp
            + F_tot[t1, p1] * ft * fp)


def n_cached_lights(atlas) -> int:
    """Static count of cached point-light tau channels (row width)."""
    w = atlas.density_corners.shape[1]
    base = _tau_base(atlas)
    if w <= base:
        return -1  # no cache at all (not even sun)
    return (w - base) // 8 - 1


def _downsample2(a: np.ndarray) -> np.ndarray:
    """2x average-pool (edge-padded to even dims): the tau-bake proxy
    density for production-size grids."""
    nz, ny, nx = a.shape
    pz, py, px = nz % 2, ny % 2, nx % 2
    if pz or py or px:
        a = np.pad(a, ((0, pz), (0, py), (0, px)), mode="edge")
    return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2,
                     a.shape[2] // 2, 2).mean(axis=(1, 3, 5))


def _upsample_tau(field: np.ndarray, shape, s: float) -> np.ndarray:
    """Trilinear upsample of an s-x pooled voxel-center field back to
    the full-res voxel centers: pooled voxel k covers full voxels
    s*k .. s*k+s-1, so full center j maps to pooled coordinate
    (j - (s-1)/2) / s."""
    nz, ny, nx = shape
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    ipos = (np.stack([xx, yy, zz], axis=-1).astype(np.float64)
            - (s - 1.0) / 2.0) / s
    return _trilinear_index(field, ipos)


def attach_shadow_cache(scene, azimuth: float, elevation: float,
                        step_vox: float = 0.5,
                        world_resolution: int = 192,
                        tau_downsample: int | None = None):
    """Bake sun + point-light optical-depth fields.

    Single-instance scenes bake the taus into the unified corner rows
    (``atlas.density_corners`` becomes (V, 15 + 8*(1+L))) — the NEE
    transmittances ride the same gather as the collision density.
    Multi-instance scenes bake a WORLD-SPACE tau grid instead
    (``scene.world_tau``, round 3 / VERDICT r2 #2): the union density
    is resampled onto a ``world_resolution`` grid over the root box,
    swept for sun/point-light optical depths, and fetched with ONE
    extra corner-row gather per step — the per-event shadow walks
    (1 + n_lights tracked walks of K-gather steps each) disappear.
    Deterministic quadrature+resampling error; bounded in
    tests/test_shadow.py::test_world_shadow_cache_*.

    Render with ``RenderParams(shadow_mode="cached", azimuth=...,
    elevation=...)`` (the angles MUST match — the bake is directional).
    Re-call after moving the sun or the lights.

    ``tau_downsample``: bake the tau fields on a 2x/4x average-pooled
    proxy density and trilinearly upsample back to the full node grid
    (production-size single grids — the full-res sweep at 512^3 costs
    host-hours where the pooled one costs ~a minute).  Optical depth
    is an integral of the density, so pooling mostly commutes with the
    sweep; the residual error is a ~k-voxel blur of shadow boundaries
    (bounded in tests/test_shadow.py::test_tau_downsample_error).
    Default None = auto: 1 below 32M voxels, 2 at/above.
    """
    from vpt_tpu.core.vecmath import degree_to_cartesian
    from vpt_tpu.volume.grid import _corner_pack_plain

    if scene.instances.count != 1:
        return _attach_world_shadow_cache(scene, azimuth, elevation,
                                          step_vox, world_resolution)
    n_lights = int(scene.lights.count)
    if n_lights > MAX_CACHED_LIGHTS:
        raise ValueError(f"shadow cache supports <= {MAX_CACHED_LIGHTS} "
                         f"point lights (scene has {n_lights})")

    atlas = scene.atlas
    dim = np.asarray(atlas.dim)[0]          # nx, ny, nz
    nx, ny, nz = int(dim[0]), int(dim[1]), int(dim[2])
    if atlas.density.shape[0] < nx * ny * nz:
        raise ValueError("shadow cache bake needs the raw density atlas "
                         "(build_scene(keep_raw_density=True)); bake "
                         "before dropping it")
    dens = np.asarray(atlas.density[:nx * ny * nz]).reshape(nz, ny, nx)
    if tau_downsample is None:
        tau_downsample = 2 if dens.size >= 32 * 2 ** 20 else 1
    ds = max(int(tau_downsample), 1)
    big = ds > 1
    dens_p = dens
    vox_scale = 1.0
    while vox_scale * 2 <= ds:
        dens_p = _downsample2(dens_p)
        vox_scale *= 2.0

    xform = np.asarray(scene.instances.xform[0], np.float64)
    inv = np.asarray(scene.instances.inv_xform[0], np.float64)
    bmin = np.asarray(atlas.bmin)[0]

    sun_dir = np.asarray(degree_to_cartesian(azimuth, elevation), np.float64)
    dir_idx = sun_dir @ inv[:3, :3]
    world_per_idx = vox_scale / max(np.linalg.norm(dir_idx), 1e-12)
    tau_sun = directional_tau_nodes(dens_p, dir_idx, world_per_idx,
                                    step_vox=step_vox)
    if vox_scale > 1.0:
        tau_sun = _upsample_tau(tau_sun, (nz, ny, nx), vox_scale)
    channels = [_corner_pack_plain(tau_sun)]

    # proxy-grid transform: pooled voxel k covers full voxels
    # s*k..s*k+s-1, center at full index-coordinate bmin + s*k + s/2 —
    # exactly (bmin/s + k + 0.5) @ (s*A) + t, so the proxy transform
    # scales the linear part by s, keeps the translation, and divides
    # bbox_min by s (point_tau_nodes' node convention then lands every
    # proxy node on its true world position)
    xform_p = xform.copy()
    if vox_scale > 1.0:
        xform_p[:3, :3] = xform[:3, :3] * vox_scale
    bmin_p = np.asarray(bmin, np.float64) / vox_scale if vox_scale > 1.0 \
        else bmin

    lpos = np.asarray(scene.lights.pos, np.float64)
    pt_kw = {}
    if big:
        # production-size grids: the sample budget goes to ANGULAR
        # resolution, not radial.  Tangential blur of the spherical
        # resample biases tau UP where radiance originates (blur fills
        # the low-tau creases the light shines through — measured
        # -18.5% point-lit radiance at 120x240 on the 512^3 bench
        # scene); radial coarseness only softens the quadrature along
        # the integration axis.  240x480 cells + 2-voxel radial steps
        # cost the same samples and cut the bias ~4x.
        vox_w = float(np.linalg.norm(xform_p[:3, :3], axis=1).min())
        pt_kw = dict(n_theta=240, n_phi=480, step_world=2.0 * vox_w)
    for i in range(n_lights):
        tau_l = point_tau_nodes(dens_p, xform_p, bmin_p, lpos[i], **pt_kw)
        if vox_scale > 1.0:
            tau_l = _upsample_tau(tau_l, (nz, ny, nx), vox_scale)
        channels.append(_corner_pack_plain(tau_l))

    dtype = np.asarray(atlas.density_corners).dtype
    base = np.asarray(atlas.density_corners)[:, :_tau_base(atlas)]
    rows = np.concatenate(
        [base] + [c.astype(dtype) for c in channels], axis=1)
    new_atlas = dataclasses.replace(atlas,
                                    density_corners=jnp.asarray(rows))
    return dataclasses.replace(scene, atlas=new_atlas)


def _union_density_from_scene(scene, resolution: int):
    """Resample the scene's summed instance density onto a world grid
    over the root box (see volume/union.py for the semantics).

    Returns (density (nz, ny, nx), cell (float), root_pmin (3,)).
    """
    atlas = scene.atlas
    if atlas.density is None:
        raise ValueError("world shadow cache needs the raw density "
                         "(build_scene(keep_raw_density=True))")
    root_pmin = np.asarray(scene.root_pmin, np.float64)
    root_pmax = np.asarray(scene.root_pmax, np.float64)
    extent = root_pmax - root_pmin
    cell = float(extent.max()) / int(resolution)
    dim = np.maximum(np.ceil(extent / cell).astype(np.int64), 1)
    nx, ny, nz = int(dim[0]), int(dim[1]), int(dim[2])
    dens = np.zeros((nz, ny, nx), np.float32)

    density_flat = np.asarray(atlas.density)
    offs = np.asarray(atlas.offset)
    dims = np.asarray(atlas.dim)
    bmins = np.asarray(atlas.bmin)
    gids = np.asarray(scene.instances.grid_id)
    invs = np.asarray(scene.instances.inv_xform, np.float64)
    pmins = np.asarray(scene.instances.pmin, np.float64)
    pmaxs = np.asarray(scene.instances.pmax, np.float64)
    grid_cache = {}
    for i in range(int(scene.instances.count)):
        g = int(gids[i])
        if g not in grid_cache:
            gx, gy, gz = int(dims[g][0]), int(dims[g][1]), int(dims[g][2])
            off = int(offs[g])
            grid_cache[g] = density_flat[off:off + gx * gy * gz].reshape(
                gz, gy, gx)
        vol = grid_cache[g]
        lo = np.clip(np.floor((pmins[i] - root_pmin) / cell).astype(
            np.int64) - 1, 0, dim - 1)
        hi = np.clip(np.ceil((pmaxs[i] - root_pmin) / cell).astype(
            np.int64) + 1, 0, dim - 1)
        zz, yy, xx = np.meshgrid(np.arange(lo[2], hi[2] + 1),
                                 np.arange(lo[1], hi[1] + 1),
                                 np.arange(lo[0], hi[0] + 1), indexing="ij")
        wpos = (np.stack([xx, yy, zz], axis=-1).astype(np.float64) + 0.5) \
            * cell + root_pmin
        inv = invs[i]
        ipos = (wpos.reshape(-1, 3) @ inv[:3, :3] + inv[3, :3]
                - (np.asarray(bmins[g], np.float64) + 0.5))
        d = _trilinear_index(vol, ipos.reshape(zz.shape + (3,)))
        dens[lo[2]:hi[2] + 1, lo[1]:hi[1] + 1, lo[0]:hi[0] + 1] += d
    return dens, cell, root_pmin


def _attach_world_shadow_cache(scene, azimuth, elevation, step_vox,
                               resolution):
    """Multi-instance branch of attach_shadow_cache (see its doc)."""
    import dataclasses as _dc

    from vpt_tpu.core.vecmath import degree_to_cartesian
    from vpt_tpu.volume.grid import _corner_pack_plain

    n_lights = int(scene.lights.count)
    if n_lights > MAX_CACHED_LIGHTS:
        raise ValueError(f"shadow cache supports <= {MAX_CACHED_LIGHTS} "
                         f"point lights (scene has {n_lights})")
    dens, cell, root_pmin = _union_density_from_scene(scene, resolution)
    nz, ny, nx = dens.shape

    sun_dir = np.asarray(degree_to_cartesian(azimuth, elevation),
                         np.float64)
    # isotropic world cells: index-space direction == world direction,
    # one index step covers `cell` world units
    tau_sun = directional_tau_nodes(dens, sun_dir, cell,
                                    step_vox=step_vox)
    channels = [_corner_pack_plain(tau_sun)]

    xf = np.diag([cell, cell, cell, 1.0])
    xf[3, :3] = root_pmin
    lpos = np.asarray(scene.lights.pos, np.float64)
    tau_fields = [tau_sun]
    for i in range(n_lights):
        tau_fields.append(point_tau_nodes(dens, xf, np.zeros(3), lpos[i]))

    major = scene.majorant
    if major is not None and major.cell_rows is not None:
        # cell-list scenes: fold the tau node values INTO the majorant
        # cell rows, so the cached NEE rides the SAME per-step row
        # gather the tracking loop already pays — zero extra gathers
        # (the separate world_tau table costs one per step, measured
        # slower than the tracked shadow walks it replaces on sparse
        # scenes).  Tau nodes live on the cell grid's (R+1)^3 corner
        # lattice (trilinear within a cell is continuous across
        # cells); effective tau resolution = majorant_resolution.
        return _fold_cell_taus(scene, tau_fields, cell, root_pmin)

    channels = [_corner_pack_plain(t) for t in tau_fields]
    rows = np.concatenate(channels, axis=1).reshape(
        nz, ny, nx, 8 * (1 + n_lights))
    return _dc.replace(scene, world_tau=jnp.asarray(rows))


def _fold_cell_taus(scene, tau_fields, cell_t, root_t):
    """Append 8*(1+L) tau corner columns to MajorantGrid.cell_rows.

    ``tau_fields``: node fields (nz,ny,nx) on the isotropic world tau
    grid (voxel centers at root_t + (i+0.5)*cell_t); resampled onto
    the cell grid's corner lattice and packed per cell in
    _trilerp_weights order (c = x + 2y + 4z)."""
    import dataclasses as _dc

    major = scene.majorant
    R = int(major.occupied.shape[0])
    root_pmin = np.asarray(scene.root_pmin, np.float64)
    root_pmax = np.asarray(scene.root_pmax, np.float64)
    cs = (root_pmax - root_pmin) / R   # per-axis cell size
    ax = [np.arange(R + 1, dtype=np.float64) * cs[a] + root_pmin[a]
          for a in range(3)]
    gz, gy, gx = np.meshgrid(ax[2], ax[1], ax[0], indexing="ij")
    wpos = np.stack([gx, gy, gz], axis=-1)       # (R+1,R+1,R+1, xyz)
    fidx = (wpos - np.asarray(root_t)) / cell_t - 0.5
    packs = []
    for field in tau_fields:
        nodes = _trilinear_index(field, fidx)    # (R+1)^3 zyx
        rc = np.empty((R, R, R, 8), np.float32)
        for c in range(8):
            dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            rc[..., c] = nodes[dz:dz + R, dy:dy + R, dx:dx + R]
        packs.append(rc.reshape(-1, 8))
    tau_rows = np.concatenate(packs, axis=1).astype(np.float32)
    base = int(major.packed.shape[-1]) + int(major.cell_instances.shape[-1])
    old = np.asarray(major.cell_rows)[:, :base]  # strip a prior bake
    new_rows = np.concatenate([old, tau_rows], axis=1)
    new_major = _dc.replace(major, cell_rows=jnp.asarray(new_rows))
    return _dc.replace(scene, majorant=new_major, world_tau=None)


def cell_tau_fetch(scene, pos):
    """(..., 1+L) cached optical depths from the tau columns of the
    majorant cell rows (the runtime path's interpolation, exposed for
    tests/tools — the fused loop reads them via the SAME row gather
    as the tracking step, tracking._cells_banded_fetch)."""
    import jax

    from vpt_tpu.render.tracking import _trilerp_weights
    major = scene.majorant
    R = major.occupied.shape[0]
    base = int(major.packed.shape[-1]) + int(major.cell_instances.shape[-1])
    cs = (scene.root_pmax - scene.root_pmin) / R
    rel = (pos - scene.root_pmin) / cs
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, R - 1)
    flat = (ci[..., 2] * R + ci[..., 1]) * R + ci[..., 0]
    (flat,) = jax.lax.optimization_barrier((flat,))
    row = jnp.take(major.cell_rows, flat, axis=0)
    tau8 = row[..., base:]
    n_ch = tau8.shape[-1] // 8
    frac = jnp.clip(rel - ci.astype(jnp.float32), 0.0, 1.0)
    w8 = _trilerp_weights(frac)
    return jnp.stack([jnp.sum(tau8[..., 8 * c:8 * c + 8] * w8, axis=-1)
                      for c in range(n_ch)], axis=-1)


def world_tau_fetch(scene, pos):
    """(..., 1+L) cached optical depths from the world tau grid: ONE
    corner-row gather + trilinear (the multi-instance analog of the
    in-row tau channels)."""
    wt = scene.world_tau  # (nz, ny, nx, 8*(1+L))
    nz, ny, nx = wt.shape[0], wt.shape[1], wt.shape[2]
    n_ch = wt.shape[3] // 8
    dimf = jnp.asarray([nx, ny, nz], jnp.float32)
    extent = scene.root_pmax - scene.root_pmin
    cell = jnp.max(extent) / jnp.float32(max(nx, ny, nz))
    x = jnp.clip((pos - scene.root_pmin) / cell - 0.5, 0.0, dimf - 1.0)
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = i0f.astype(jnp.int32)
    flat = (i0[..., 2] * ny + i0[..., 1]) * nx + i0[..., 0]
    import jax

    from vpt_tpu.render.tracking import _trilerp_weights
    (flat,) = jax.lax.optimization_barrier((flat,))
    rows = jnp.take(wt.reshape(-1, wt.shape[3]), flat, axis=0)
    (rows,) = jax.lax.optimization_barrier((rows,))
    w8 = _trilerp_weights(frac)
    return jnp.stack(
        [jnp.sum(rows[..., 8 * c:8 * c + 8] * w8, axis=-1)
         for c in range(n_ch)], axis=-1)
