"""Shared scene definitions for the golden-image corpus — imported by
both tools/gen_golden.py (writer) and tests/test_golden.py (checker).

Each entry renders a tiny fixed-seed image per engine; scenes are the
five BASELINE config analogs (assets for 2/3 are synthesized — the
reference's fireball/colored_smoke/hdr files are stripped).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

DRAGON = "/root/reference/assets/dragon.vdb"
SIZE = 32
SPP = 8

BASE_KW = dict(width=SIZE, height=SIZE, ray_depth=4, volume_depth=1,
               max_track_steps=64, max_fused_steps=256)


def _camera(scene, dist_scale=1.2):
    from vpt_tpu.core.camera import Camera
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    d = float(np.linalg.norm(np.asarray(scene.root_pmax)
                             - np.asarray(scene.root_pmin))) * dist_scale
    cam = Camera.make(c + np.array([0.0, 0.15 * d, d]), c, vfov=45.0,
                      aspect=1.0)
    return dataclasses.replace(scene, camera=cam)


def _blob(n=24, emission=False, color=False):
    from vpt_tpu.volume.grid import HostGrid
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    dens = np.clip(1.0 - r / (n / 2.4), 0.0, 1.0).astype(np.float32)
    em = (dens * 0.7).astype(np.float32) if emission else None
    col = None
    if color:
        col = np.stack([dens, 0.6 * dens, 0.25 * np.ones_like(dens)],
                       -1).astype(np.float32)
    return HostGrid(density_zyx=dens, emission_zyx=em, color_zyx=col,
                    bbox_min=np.zeros(3, np.int32),
                    dim=np.array([n, n, n], np.int32),
                    transform=np.diag([0.2, 0.2, 0.2, 1.0]), voxel_size=0.2,
                    max_density=float(dens.max()), min_density=1e-6)


def scenes():
    """{name: (scene, params)} — all five config analogs."""
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.render.params import Environment, RenderParams
    from vpt_tpu.scene.scene import (attach_env_map, build_scene,
                                     load_vdb_scene)
    out = {}

    if os.path.exists(DRAGON):
        lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]],
                                  [300.0])
        s = _camera(load_vdb_scene(DRAGON, lights=lights))
        out["c1_dragon_pointlight"] = (
            s, RenderParams(environment_type=int(Environment.BLACK),
                            **BASE_KW))

    s = _camera(build_scene([_blob(emission=True)]))
    out["c2_emission"] = (
        s, RenderParams(environment_type=int(Environment.BLACK),
                        **BASE_KW).replace(emission_scale=1.5))

    eh, ew = 32, 64
    ty = np.linspace(1.0, 0.0, eh, dtype=np.float32)[:, None, None]
    env = (np.array([0.3, 0.5, 1.0], np.float32) * ty
           + np.array([0.9, 0.6, 0.3], np.float32) * (1.0 - ty))
    env = np.broadcast_to(env, (eh, ew, 3)).copy()
    env[eh // 4, ew // 3] = [40.0, 38.0, 30.0]
    s = attach_env_map(_camera(build_scene([_blob(color=True)])), env)
    out["c3_hdri_color"] = (
        s, RenderParams(environment_type=int(Environment.HDRI), **BASE_KW))

    # c4: procedural sky via the simple CPU model (no Bruneton LUTs ->
    # deterministic across platforms, fast)
    s = _camera(build_scene([_blob()]))
    out["c4_procedural_sky"] = (
        s, RenderParams(environment_type=int(Environment.ATMOSPHERE),
                        **BASE_KW))

    ids, xforms = [], []
    rng = np.random.RandomState(3)
    for i in range(27):
        iz, iy, ix = np.unravel_index(i, (3, 3, 3))
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = (np.array([ix, iy, iz], np.float64) * 4.0
                     + rng.uniform(-1, 1, 3))
        ids.append(0)
        xforms.append(xf)
    s = _camera(build_scene([_blob(n=12)], instance_grid_ids=ids,
                            instance_xforms=xforms))
    out["c5_instanced"] = (
        s, RenderParams(environment_type=int(Environment.CONSTANT),
                        **BASE_KW))

    # cached-shadow variant of config 1 (accel/shadow.py): pins the
    # precomputed-tau NEE path into the regression corpus
    if os.path.exists(DRAGON):
        from vpt_tpu.accel.shadow import attach_shadow_cache
        base = out["c1_dragon_pointlight"]
        cs = attach_shadow_cache(base[0], azimuth=150.0, elevation=30.0)
        out["c1_cached_shadows"] = (
            cs, base[1].replace(shadow_mode="cached"))

    # c4 through the FULL Bruneton pipeline baked into an equirect sky
    # cache (attach_sky_cache) — pins the baked-sky fast path.  Tiny
    # LUT dims; the LUTs themselves are cached in tests/golden so the
    # corpus does not depend on recompute rounding.
    from vpt_tpu.scene.scene import attach_atmosphere, attach_sky_cache
    from vpt_tpu.sky import bruneton as br
    tiny = br.LutDims(transmittance_w=64, transmittance_h=16, r=4, mu=32,
                      mu_s=8, nu=4, irradiance_w=16, irradiance_h=4)
    lut_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "golden", "tiny_luts.npz")
    s = _camera(build_scene([_blob()]))
    s = attach_atmosphere(s, cache_path=lut_cache, dims=tiny)
    s = attach_sky_cache(s, azimuth=150.0, elevation=30.0, height=64,
                         width=128)
    out["c4_baked_sky"] = (
        s, RenderParams(environment_type=int(Environment.ATMOSPHERE),
                        **BASE_KW))
    return out


def render(scene, params, engine: str, spp: int = SPP) -> np.ndarray:
    from vpt_tpu.render.renderer import ProgressiveRenderer
    p = dataclasses.replace(params, engine=engine)
    film = ProgressiveRenderer(scene, p).render(spp)
    return np.asarray(film.accum)


ENGINES = {  # engine -> scenes it is validated on (full 5x3 matrix)
    "fused": ["c1_dragon_pointlight", "c2_emission", "c3_hdri_color",
              "c4_procedural_sky", "c5_instanced", "c1_cached_shadows",
              "c4_baked_sky"],
    "reference": ["c1_dragon_pointlight", "c2_emission", "c3_hdri_color",
                  "c4_procedural_sky", "c5_instanced"],
    "march": ["c1_dragon_pointlight", "c2_emission", "c3_hdri_color",
              "c4_procedural_sky", "c5_instanced"],
}

# Combos intentionally NOT in the matrix, with reasons:
# * c1_cached_shadows runs only on `fused` — the reference/march
#   engines ignore shadow_mode (their NEE is tracked/quadrature by
#   design), so a golden there would duplicate c1_dragon_pointlight.
# * c4_baked_sky runs only on `fused` — the baked equirect cache is a
#   terminal-lookup substitution validated against the live path in
#   tests/test_scenarios.py; reference/march exercise the live
#   Bruneton-free procedural sky via c4_procedural_sky.
# march's estimator differences (single-scatter quadrature, mean-
# scatter-point NEE) are documented in render/march.py — its goldens
# regress its own deterministic output, not cross-engine agreement
# (that lives in tests/test_fused.py / test_parity_fills.py).
