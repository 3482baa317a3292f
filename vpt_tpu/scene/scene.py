"""Scene container and host-side scene building.

The device ``Scene`` pytree is everything the render step needs: the
volume atlas, per-instance transforms, the scene (octree-root
equivalent) bounds + extinction majorants, lights, the reference
sphere, LUTs, and (optionally) an environment map.

Host-side builders mirror the reference's scene dispatch
(main.cpp:1258-1297): a single `.vdb`, an `.ins` instance file, an
`.hdr` environment, or a procedural volume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.scene.geometry import Sphere
from vpt_tpu.sky.envmap import pack_env_map
from vpt_tpu.volume.grid import HostGrid, VolumeAtlas, build_atlas, load_vdb_grid


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Instances:
    grid_id: jax.Array    # (N,) int32
    xform: jax.Array      # (N, 4, 4) f32 index->world (row-vector)
    inv_xform: jax.Array  # (N, 4, 4) f32 world->index
    pmin: jax.Array       # (N, 3) world-space AABB
    pmax: jax.Array       # (N, 3)
    # denormalized per-instance row: world->index transform + the
    # instance's grid metadata, so a per-lane dynamic-instance fetch is
    # ONE row gather (+ the corner-row gather) instead of five
    # metadata gathers.  Layout (24 floats):
    #   [0:12]  inv_xform rows m[0,:3], m[1,:3], m[2,:3], m[3,:3]
    #   [12:15] grid bbox_min (index space)
    #   [15:18] grid dim (f32, exact — dims are small ints)
    #   [18]    density atlas offset    (f32 exact, < 2^24 asserted)
    #   [19]    emission atlas offset   (-1 = channel absent)
    #   [20]    color atlas offset      (-1 = channel absent)
    #   [21]    grid max_density
    #   [22:24] pad
    packed_rows: jax.Array  # (N, 24) f32

    @property
    def count(self) -> int:
        return self.grid_id.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MajorantGrid:
    """Flat super-grid replacing the reference's 3-level octree
    (bvh_kernels.cu:204-246): per-cell density majorant/minorant and
    occupancy over the scene bounds.  Resolution is static."""

    max_density: jax.Array  # (R, R, R) f32, [z, y, x]
    occupied: jax.Array     # (R, R, R) bool
    skip_dist: jax.Array    # (R, R, R) int32 chebyshev cells to occupancy
    packed: jax.Array       # (R^3, 7) f32 [cell majorant, empty-box ext] —
    #                         one row gather serves both lookups
    # per-cell overlapping-instance lists (the flat analog of
    # OCTNode.vol_indices[600], AABB.h:217-234), -1-padded to the max
    # observed overlap K.  None for small scenes where the static
    # instance loop is cheaper (tracking.scene_density dispatches).
    cell_instances: Optional[jax.Array] = None  # (R^3, K) int32
    # combined per-cell row [T_box, empty-box ext 6, instance ids K]
    # (f32; ids are f32-exact) — the instanced tracking step reads its
    # banded majorant AND its candidate list from ONE gather instead
    # of two (round 3, VERDICT r2 #2).
    cell_rows: Optional[jax.Array] = None  # (R^3, 7+K) f32


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scene:
    atlas: VolumeAtlas
    instances: Instances
    # octree-root equivalents (bvh_builder.cpp:61-93)
    root_pmin: jax.Array        # (3,)
    root_pmax: jax.Array        # (3,)
    max_extinction: jax.Array   # () max over instance grid max_density
    min_extinction: jax.Array   # () min over instance grid min_density
    lights: PointLights
    sphere: Sphere
    camera: Camera
    emission_lut: jax.Array       # (256, 3) blackbody LUT
    density_color_lut: jax.Array  # (256, 3)
    majorant: Optional[MajorantGrid]
    env_map: Optional[jax.Array]  # (H, W, 12) corner-packed equirect
    #                                 radiance (envmap.pack_env_map);
    #                                 raw texels = env_map[..., 0:3]
    env_cdf: Optional[object]     # sky.cdf.EnvCDF tables (sky/env NEE)
    atmosphere: Optional[object] = None  # sky.runtime.Atmosphere (Bruneton)
    # baked sky cache (sky.runtime.bake_sky_cache): (H, W, 24) equirect
    # corner-packed rows of [radiance-without-sun-disc rgb |
    # transmittance rgb] x 4 bilinear corners, pre-tonemap.
    # When present, the ATMOSPHERE terminal lookup becomes one bilinear
    # fetch (the full per-ray Bruneton evaluation measured 80% of the
    # planetary scenario's wall time).  Directional: re-bake on sun
    # moves, like the shadow cache.
    sky_cache: Optional[jax.Array] = None
    # world-space shadow-tau grid for MULTI-instance cached shadows
    # (accel.shadow.attach_shadow_cache on an instanced scene):
    # (nz, ny, nx, 8*(1+L)) corner-packed optical depths toward the
    # sun and each point light over the root box.  Directional —
    # re-bake on sun/light moves.
    world_tau: Optional[jax.Array] = None


def _world_bounds(host: HostGrid, xform: np.ndarray):
    """AABB of the transformed index-space bbox corners
    (GPU_VDB::Bounds, gpu_vdb.h:131-146)."""
    bmin = host.bbox_min.astype(np.float64)
    bmax = (host.bbox_min + host.dim - 1).astype(np.float64)
    corners = np.array([[bmin[0], bmin[1], bmin[2]],
                        [bmax[0], bmin[1], bmin[2]],
                        [bmin[0], bmax[1], bmin[2]],
                        [bmax[0], bmax[1], bmin[2]],
                        [bmin[0], bmin[1], bmax[2]],
                        [bmax[0], bmin[1], bmax[2]],
                        [bmin[0], bmax[1], bmax[2]],
                        [bmax[0], bmax[1], bmax[2]]])
    w = corners @ xform[:3, :3] + xform[3, :3]
    return w.min(axis=0), w.max(axis=0)


def default_luts():
    """Identity LUTs (white) used when the EXR assets aren't loaded."""
    return (np.ones((256, 3), np.float32), np.ones((256, 3), np.float32))


def _pack_instance_rows(atlas: VolumeAtlas, instance_grid_ids: np.ndarray,
                        inv_xforms: np.ndarray) -> np.ndarray:
    """Build the (N, 24) denormalized instance rows (Instances doc)."""
    gids = np.asarray(instance_grid_ids, np.int64)
    offs = np.asarray(atlas.offset)[gids]
    assert int(np.asarray(atlas.offset).max(initial=0)) < (1 << 24), \
        "atlas too large for f32-exact offsets in instance rows"
    rows = np.zeros((len(gids), 24), np.float32)
    rows[:, 0:12] = inv_xforms[:, :4, :3].reshape(len(gids), 12)
    rows[:, 12:15] = np.asarray(atlas.bmin)[gids]
    rows[:, 15:18] = np.asarray(atlas.dim)[gids].astype(np.float32)
    rows[:, 18] = offs.astype(np.float32)
    rows[:, 19] = np.asarray(atlas.emission_offset)[gids].astype(np.float32)
    rows[:, 20] = np.asarray(atlas.color_offset)[gids].astype(np.float32)
    rows[:, 21] = np.asarray(atlas.max_density)[gids]
    return rows


def build_scene(
    host_grids: list[HostGrid],
    instance_grid_ids: list[int] | np.ndarray | None = None,
    instance_xforms: list[np.ndarray] | None = None,
    camera: Camera | None = None,
    lights: PointLights | None = None,
    sphere: Sphere | None = None,
    emission_lut: np.ndarray | None = None,
    density_color_lut: np.ndarray | None = None,
    env_map: np.ndarray | None = None,
    majorant_resolution: int = 64,
    instance_list_threshold: int = 8,
    keep_raw_density: bool = True,
    corner_dtype: str = "float32",
    band_divisors: tuple | None = None,
    octant_boxes: bool | str = "auto",
    octant_cells: bool | str = "auto",
) -> Scene:
    """Assemble a device Scene.

    ``instance_xforms[i]`` is an extra index->world transform for
    instance i; defaults to each grid's own file transform (the
    single-volume path, main.cpp:1265-1272).
    """
    n_grids = len(host_grids)
    if instance_grid_ids is None:
        instance_grid_ids = np.arange(n_grids)
        instance_xforms = [g.transform for g in host_grids]
    instance_grid_ids = np.asarray(instance_grid_ids, np.int32)
    assert instance_xforms is not None

    xforms = np.stack([np.asarray(x, np.float64) for x in instance_xforms])
    inv_xforms = np.linalg.inv(xforms)
    pmins, pmaxs = [], []
    for gid, xf in zip(instance_grid_ids, xforms):
        lo, hi = _world_bounds(host_grids[int(gid)], xf)
        pmins.append(lo)
        pmaxs.append(hi)
    pmins = np.stack(pmins)
    pmaxs = np.stack(pmaxs)

    # octree-root equivalents: union of instance bounds padded by 1
    # (bvh_builder.cpp:76-78), scene majorant/minorant over instances
    root_pmin = pmins.min(axis=0) - 1.0
    root_pmax = pmaxs.max(axis=0) + 1.0
    max_ext = max(host_grids[int(g)].max_density for g in instance_grid_ids)
    min_ext = min(host_grids[int(g)].min_density for g in instance_grid_ids)

    if octant_boxes == "auto":
        # per-(octant x major-axis) extents ride the single-instance
        # fast path's row gather and cut iters/ray 1.73 -> 1.52 on
        # config 1 cached — but WALL-clock measured break-even to
        # slightly negative (10.6 vs 10.4 ms/spp,
        # tools/probe_octant_strat.py, even with the bit-tree select),
        # while the build costs ~3.5 s native (+72 f32/voxel packed,
        # transferred, and carried in HBM).  Auto is therefore OFF;
        # the flag stays for scenes whose hop chains dominate
        # (probe first — the win must beat the row-width cost).
        octant_boxes = False
    atlas = build_atlas(host_grids, keep_raw_density=keep_raw_density,
                        corner_dtype=corner_dtype,
                        band_divisors=band_divisors,
                        octant_boxes=bool(octant_boxes))
    if emission_lut is None or density_color_lut is None:
        from vpt_tpu.scene.assets import (load_blackbody_lut,
                                          load_density_color_lut)
        em_d, dc_d = default_luts()
        if emission_lut is None:
            loaded = load_blackbody_lut()
            emission_lut = loaded if loaded is not None else em_d
        if density_color_lut is None:
            loaded = load_density_color_lut()
            density_color_lut = loaded if loaded is not None else dc_d

    majorant = None
    if majorant_resolution:
        from vpt_tpu.accel.majorant import build_majorant_grid
        # per-cell instance lists once the static per-instance fetch
        # loop stops being the cheaper option (config-5 scale)
        want_lists = len(instance_grid_ids) > instance_list_threshold
        majorant = build_majorant_grid(
            host_grids, instance_grid_ids, xforms, root_pmin, root_pmax,
            majorant_resolution, build_instance_lists=want_lists,
            octant_cells=octant_cells)

    if camera is None:
        # default framing similar to main.cpp:1320-1334 (look at volume)
        center = (root_pmin + root_pmax) / 2
        dist = float(np.linalg.norm(root_pmax - root_pmin)) * 1.5
        camera = Camera.make(center + np.array([0.0, 0.0, dist]), center,
                             vfov=30.0, aspect=1.0)

    packed_rows = _pack_instance_rows(
        atlas, instance_grid_ids, np.asarray(inv_xforms, np.float32))

    return Scene(
        atlas=atlas,
        instances=Instances(
            grid_id=jnp.asarray(instance_grid_ids),
            xform=jnp.asarray(xforms, jnp.float32),
            inv_xform=jnp.asarray(inv_xforms, jnp.float32),
            pmin=jnp.asarray(pmins, jnp.float32),
            pmax=jnp.asarray(pmaxs, jnp.float32),
            packed_rows=jnp.asarray(packed_rows),
        ),
        root_pmin=jnp.asarray(root_pmin, jnp.float32),
        root_pmax=jnp.asarray(root_pmax, jnp.float32),
        max_extinction=jnp.float32(max_ext),
        min_extinction=jnp.float32(min_ext),
        lights=lights if lights is not None else PointLights.empty(),
        sphere=sphere if sphere is not None else Sphere.make(),
        camera=camera,
        emission_lut=jnp.asarray(emission_lut, jnp.float32),
        density_color_lut=jnp.asarray(density_color_lut, jnp.float32),
        majorant=majorant,
        env_map=None if env_map is None else pack_env_map(env_map),
        env_cdf=None,
    )


def load_vdb_scene(path: str, **kw) -> Scene:
    """`.vdb` single-volume scene (main.cpp:1265-1272): channels
    density/heat/Cd."""
    return build_scene([load_vdb_grid(path)], **kw)


def attach_atmosphere(scene: Scene, atmosphere=None, cache_path=None,
                      dims=None) -> Scene:
    """Attach a Bruneton precomputed atmosphere (earth_atmosphere.init(),
    main.cpp:1504 / atmosphere.cpp:1177)."""
    import dataclasses

    if atmosphere is None:
        from vpt_tpu.sky.bruneton import LutDims
        from vpt_tpu.sky.runtime import make_atmosphere
        atmosphere = make_atmosphere(dims or LutDims(),
                                     cache_path=cache_path)
    return dataclasses.replace(scene, atmosphere=atmosphere)


def attach_sky_cdf(scene: Scene, azimuth=150.0, elevation=30.0,
                   sky_color=(1.0, 1.0, 1.0)) -> Scene:
    """Build/refresh the procedural-sky importance CDF for the current
    sun position (the reference rebuilds it whenever the sun moves,
    main.cpp:1702-1705)."""
    import dataclasses

    from vpt_tpu.sky.cdf import build_sky_cdf
    cdf = build_sky_cdf(jnp.float32(azimuth), jnp.float32(elevation),
                        jnp.asarray(sky_color, jnp.float32))
    return dataclasses.replace(scene, env_cdf=cdf)


def attach_env_map(scene: Scene, env_map: np.ndarray,
                   importance_sample: bool = True,
                   full_res_cdf: bool = False) -> Scene:
    """Attach an equirect HDR environment (create_environment,
    main.cpp:945-978) and optionally its importance CDF.

    full_res_cdf=True builds the CDF at the map's native resolution
    (exact importance distribution); default keeps the reference's
    180^2 resample (main.cpp:664)."""
    import dataclasses

    env = jnp.asarray(env_map, jnp.float32)
    cdf = None
    if importance_sample:
        from vpt_tpu.sky.cdf import CDF_RES, build_envmap_cdf
        cdf = build_envmap_cdf(env, res=None if full_res_cdf else CDF_RES)
    return dataclasses.replace(scene, env_map=pack_env_map(env),
                               env_cdf=cdf)


def attach_sky_cache(scene: Scene, azimuth: float, elevation: float,
                     height: int = 256, width: int = 512) -> Scene:
    """Bake the attached Bruneton atmosphere into an equirect cache
    anchored at the scene centre (sky.runtime.bake_sky_cache): the
    terminal ATMOSPHERE lookup becomes one bilinear fetch instead of
    the full per-ray LUT evaluation (~80% of the planetary scenario's
    wall time).  Directional — re-bake when the sun moves."""
    import dataclasses

    if scene.atmosphere is None:
        raise ValueError("attach_sky_cache needs an attached atmosphere "
                         "(attach_atmosphere first)")
    from vpt_tpu.sky.runtime import bake_sky_cache
    centre = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cache = bake_sky_cache(scene.atmosphere, centre, azimuth, elevation,
                           height, width)
    return dataclasses.replace(scene, sky_cache=cache)


def load_hdr_env_scene(hdr_path: str, **kw) -> Scene:
    """`.hdr`-only scene: environment light with the default procedural
    volume (main.cpp:1276-1297 pattern, minus the GUI)."""
    from vpt_tpu.utils.hdr import load_hdr
    from vpt_tpu.volume.procedural import default_procedural_grid
    scene = build_scene([default_procedural_grid()], **kw)
    return attach_env_map(scene, load_hdr(hdr_path))
