"""Headless render CLI — the batch equivalent of the reference's
interactive app (main.cpp:1252-1297 scene dispatch + render loop).

Usage:
    vpt render SCENE [ENV.hdr] -o out.png --spp 64 [options]

SCENE may be a `.vdb` (single volume: density/heat/Cd channels), a
`.ins` (instances or lights), a `.hdr` (environment + default
procedural volume), or `procedural` (no-asset demo volume,
main.cpp:1281-1297).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

from vpt_tpu.utils.logger import log


def build_parser():
    ap = argparse.ArgumentParser(prog="vpt", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("render", help="render a scene to an image")
    r.add_argument("scene", help=".vdb/.ins/.hdr path or 'procedural'")
    r.add_argument("env", nargs="?", default=None,
                   help="optional .hdr environment map")
    r.add_argument("-o", "--output", default="render/out.png",
                   help="output image (.png/.jpg/.exr)")
    r.add_argument("--spp", type=int, default=64)
    r.add_argument("--width", type=int, default=512)
    r.add_argument("--height", type=int, default=512)
    r.add_argument("--ray-depth", type=int, default=50)
    r.add_argument("--volume-depth", type=int, default=1)
    r.add_argument("--integrator", choices=["direct", "volumetric"],
                   default="direct")
    r.add_argument("--engine", choices=["fused", "march", "reference"],
                   default="fused",
                   help="fused (default, production), reference "
                        "(validation), march (analytic single-scatter "
                        "validation — NOTE: ~24x slower than fused; "
                        "docs/ROADMAP.md)")
    r.add_argument("--env-type",
                   choices=["atmosphere", "hdri", "black", "constant"],
                   default=None, help="default: hdri if env given else atmosphere")
    r.add_argument("--camera", nargs=6, type=float, metavar="V",
                   default=None, help="lookfrom xyz lookat xyz")
    r.add_argument("--fov", type=float, default=30.0)
    r.add_argument("--aperture", type=float, default=0.0)
    r.add_argument("--exposure", type=float, default=1.0)
    r.add_argument("--azimuth", type=float, default=150.0)
    r.add_argument("--elevation", type=float, default=30.0)
    r.add_argument("--sun-mult", type=float, default=1.0)
    r.add_argument("--sky-mult", type=float, default=1.0)
    r.add_argument("--phase-g", type=float, default=0.0)
    r.add_argument("--density-mult", type=float, default=1.0)
    r.add_argument("--emission-scale", type=float, default=0.0)
    r.add_argument("--light", nargs=7, type=float, action="append",
                   metavar="V", default=None,
                   help="px py pz r g b power (repeatable)")
    r.add_argument("--union", default="off", metavar="off|auto|RES",
                   help="collapse an instanced .ins scene onto one "
                        "world grid (volume/union.py): the whole "
                        "single-instance fast path at one gather/step. "
                        "Documented approximation — the measured field "
                        "error is logged; 'auto' picks the coarsest "
                        "resolution within a 5%% error budget, an "
                        "integer fixes the resolution")
    r.add_argument("--shadow-mode", choices=["tracked", "cached"],
                   default="tracked",
                   help="cached = precomputed light-transmittance "
                        "fields (deep-shadow style; single-instance "
                        "scenes, fused engine)")
    r.add_argument("--denoise", choices=["none", "atrous", "nn"],
                   default="none",
                   help="denoise the accumulated radiance before saving "
                        "(the reference's OIDN button, main.cpp:1508-"
                        "1520): nn = learned kernel-predicting filter "
                        "(falls back to atrous without trained weights)")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--checkpoint-every", type=int, default=0, metavar="N",
                   help="save the progressive film every N spp (the "
                        "reference's auto-save at max_interactions, "
                        "main.cpp:1699; SURVEY §5 checkpoint/resume). "
                        "Default path: OUTPUT.ckpt.npz")
    r.add_argument("--checkpoint-path", default=None,
                   help="override the checkpoint file path")
    r.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume a checkpointed render: loads the film + "
                        "iteration and continues to --spp total samples. "
                        "Seeding is deterministic per absolute iteration, "
                        "so kill+resume is bit-identical to an "
                        "uninterrupted run (tests/test_cli.py)")
    r.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    r.add_argument("--sharded", action="store_true",
                   help="render over all devices (tile x spp mesh)")
    r.add_argument("--inst-shards", type=int, default=0,
                   help="beyond-HBM: shard the scene itself over an "
                        "('inst',) mesh of N devices (.ins partitions "
                        "the instance list; .vdb/procedural splits the "
                        "grid into exact-sum spatial slabs); composes "
                        "with cached shadows and atmosphere "
                        "environments (docs/SCALING.md)")
    r.add_argument("--save-exr", action="store_true",
                   help="also save raw radiance as EXR next to output")
    r.add_argument("--aov",
                   choices=["none", "alpha", "cost", "depth", "dof",
                            "occupancy", "bvh"],
                   default="none", help="save an extra AOV image (dof = "
                   "focus-band overlay, render_kernel.cu:2270-2274; "
                   "occupancy/bvh = structure visualizations, "
                   ":2108-2136)")
    r.add_argument("--atmosphere", action="store_true",
                   help="precompute/attach the full Bruneton atmosphere "
                   "(otherwise env-type=atmosphere uses the simple sky)")
    r.add_argument("--luminance", choices=["none", "approximate",
                                           "precomputed"], default="none",
                   help="Bruneton luminance mode (with --atmosphere)")
    r.add_argument("--white-balance", action="store_true",
                   help="CIE white balance (with --atmosphere)")
    r.add_argument("--atmosphere-cache", default="out/atmosphere_luts.npz",
                   help="npz LUT cache path (with --atmosphere)")
    r.add_argument("--bake-sky", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bake the atmosphere to an equirect cache "
                        "(one-fetch terminal lookups, ~1.6x on "
                        "atmosphere scenes; directional — re-baked per "
                        "sun position).  DEFAULT ON (VERDICT r4 #8): "
                        "equirect-resample error is bounded by "
                        "tests/test_bruneton.py::test_sky_cache_matches_"
                        "direct; --no-bake-sky restores the full per-ray "
                        "LUT evaluation")

    e = sub.add_parser("earth", help="planetary render from orbit — the "
                       "reference's render_earth debug integrator "
                       "(render_kernel.cu:2138-2180)")
    e.add_argument("-o", "--output", default="render/earth.png")
    e.add_argument("--width", type=int, default=512)
    e.add_argument("--height", type=int, default=512)
    e.add_argument("--azimuth", type=float, default=150.0)
    e.add_argument("--elevation", type=float, default=30.0)
    e.add_argument("--altitude", type=float, default=2.5,
                   help="camera distance in top-atmosphere radii")
    e.add_argument("--atmosphere-cache", default="out/atmosphere_luts.npz")
    e.add_argument("--cpu", action="store_true")

    v = sub.add_parser("view", help="interactive progressive viewer "
                       "(web page with live parameter controls)")
    v.add_argument("scene", help=".vdb/.ins/.hdr path or 'procedural'")
    v.add_argument("env", nargs="?", default=None)
    v.add_argument("--width", type=int, default=384)
    v.add_argument("--height", type=int, default=384)
    v.add_argument("--ray-depth", type=int, default=50)
    v.add_argument("--env-type",
                   choices=["atmosphere", "hdri", "black", "constant"],
                   default=None)
    v.add_argument("--light", nargs=7, type=float, action="append",
                   metavar="V", default=None)
    v.add_argument("--shadow-mode", choices=["tracked", "cached"],
                   default="tracked")
    v.add_argument("--atmosphere", action="store_true",
                   help="attach the Bruneton atmosphere (half-res LUTs) "
                        "with live luminance/ozone/solar/white-balance "
                        "recompute selects (main.cpp:1709-1732)")
    v.add_argument("--port", type=int, default=8787)
    v.add_argument("--cpu", action="store_true")
    v.add_argument("--open", action="store_true", help="open a browser")
    return ap


def _load_scene(args, lights):
    from vpt_tpu.scene.scene import (attach_env_map, build_scene,
                                     load_vdb_scene)
    path = args.scene
    if path == "procedural":
        from vpt_tpu.volume.procedural import default_procedural_grid
        scene = build_scene([default_procedural_grid()], lights=lights)
    elif path.endswith(".vdb"):
        scene = load_vdb_scene(path, lights=lights)
    elif path.endswith(".ins"):
        union = getattr(args, "union", "off")
        if union != "off":
            from vpt_tpu.scene.ins import read_ins_host
            from vpt_tpu.volume.union import (build_union_scene,
                                              choose_union_resolution,
                                              union_error_at_resolution)
            host_grids, ids, xforms, ins_lights = read_ins_host(path)
            if union == "auto":
                res, err = choose_union_resolution(host_grids, ids,
                                                   xforms,
                                                   error_budget=0.05)
            else:
                res = int(union)
                err = union_error_at_resolution(host_grids, ids, xforms,
                                                res)
            log(f"union mode: resolution {res}, measured field error "
                f"{err:.4f} vs exact (documented bound 0.05; "
                "volume/union.py)")
            scene = build_union_scene(
                host_grids, ids, xforms, resolution=res,
                lights=ins_lights if ins_lights is not None else lights)
        else:
            from vpt_tpu.scene.ins import load_ins_scene
            scene = load_ins_scene(path, lights=lights)
    elif path.endswith(".hdr"):
        from vpt_tpu.scene.scene import load_hdr_env_scene
        return load_hdr_env_scene(path, lights=lights)
    else:
        raise SystemExit(f"unsupported scene file: {path}")
    if args.env:
        from vpt_tpu.utils.hdr import load_hdr
        scene = attach_env_map(scene, load_hdr(args.env))
    return scene


def _render_inst_sharded(args, lights):
    """`vpt render --inst-shards N`: the beyond-HBM path — the SCENE
    (not the rays) shards over an ('inst',) mesh of N devices and the
    devices jointly track the union medium exactly (docs/SCALING.md,
    parallel/instance_shard.py).  .ins partitions the instance list;
    .vdb / 'procedural' split the single grid into exact-sum spatial
    slabs.  Composes with cached shadows (per-shard tau bakes,
    product-exact) and atmosphere environments (replicated LUTs)."""
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from vpt_tpu.core.camera import Camera
    from vpt_tpu.parallel.instance_shard import (
        build_grid_sharded_scene, build_instance_sharded_scene,
        make_inst_mesh, render_instance_sharded, shard_scene)
    from vpt_tpu.render.params import Environment, Integrator, RenderParams
    from vpt_tpu.scene.scene import _world_bounds

    n = args.inst_shards
    if n > jax.device_count():
        raise SystemExit(f"--inst-shards {n}: only {jax.device_count()} "
                         f"devices visible")
    env_name = args.env_type or ("hdri" if args.env else "constant")
    env_type = dict(hdri=Environment.HDRI, black=Environment.BLACK,
                    constant=Environment.CONSTANT,
                    atmosphere=Environment.ATMOSPHERE)[env_name]

    shard_kw = {}
    if getattr(args, "shadow_mode", "tracked") == "cached":
        # per-shard tau bakes against the LOCAL subset; the cached
        # factors multiply to the exact union E[Tr]
        # (parallel.instance_shard.attach_sharded_caches)
        shard_kw["shadow_cache"] = (args.azimuth, args.elevation)
    if args.atmosphere or env_name == "atmosphere":
        from vpt_tpu.sky.runtime import make_atmosphere
        import os as _os
        _os.makedirs(_os.path.dirname(args.atmosphere_cache) or ".",
                     exist_ok=True)
        shard_kw["atmosphere"] = make_atmosphere(
            cache_path=args.atmosphere_cache,
            luminance_mode=args.luminance,
            do_white_balance=args.white_balance)

    build_kw = dict(lights=lights)
    if args.env:
        from vpt_tpu.utils.hdr import load_hdr
        build_kw["env_map"] = load_hdr(args.env)

    t0 = time.time()
    path = args.scene
    if path == "procedural":
        from vpt_tpu.volume.procedural import default_procedural_grid
        host_grids = [default_procedural_grid()]
        ids, xforms = [0], [host_grids[0].transform]
    elif path.endswith(".vdb"):
        from vpt_tpu.volume.grid import load_vdb_grid
        host_grids = [load_vdb_grid(path)]
        ids, xforms = [0], [host_grids[0].transform]
    elif path.endswith(".ins"):
        from vpt_tpu.scene.ins import read_ins_host
        host_grids, ids, xforms, ins_lights = read_ins_host(path)
        if ins_lights is not None:
            build_kw["lights"] = ins_lights
    else:
        raise SystemExit(f"--inst-shards: unsupported scene {path}")

    # default framing from the HOST-side union of instance bounds (the
    # stacked scene only carries per-shard root boxes)
    if args.camera:
        cam = Camera.make(args.camera[:3], args.camera[3:], vfov=args.fov,
                          aspect=args.width / args.height,
                          aperture=args.aperture)
    else:
        los, his = zip(*[_world_bounds(host_grids[g], np.asarray(xf))
                         for g, xf in zip(ids, xforms)])
        lo = np.min(np.stack(los), axis=0) - 1.0
        hi = np.max(np.stack(his), axis=0) + 1.0
        c = (lo + hi) / 2
        dist = float(np.linalg.norm(hi - lo)) * 1.2
        cam = Camera.make(c + np.array([0.0, dist * 0.15, dist]), c,
                          vfov=args.fov, aspect=args.width / args.height,
                          aperture=args.aperture)
    build_kw["camera"] = cam

    if len(ids) == 1:
        stack = build_grid_sharded_scene(host_grids[ids[0]], n,
                                        **shard_kw, **build_kw)
    else:
        if len(ids) % n:
            raise SystemExit(f"--inst-shards: {len(ids)} instances not "
                             f"divisible by {n}")
        stack = build_instance_sharded_scene(host_grids, ids, xforms, n,
                                             **shard_kw, **build_kw)
    log(f"sharded scene built in {time.time()-t0:.1f}s "
        f"({len(ids)} instance(s) over {n} shards)")

    params = RenderParams(
        width=args.width, height=args.height, ray_depth=args.ray_depth,
        volume_depth=args.volume_depth,
        integrator=int(Integrator.DIRECT), environment_type=int(env_type),
        seed=args.seed,
    ).replace(
        exposure_scale=args.exposure, azimuth=args.azimuth,
        elevation=args.elevation, sun_mult=args.sun_mult,
        sky_mult=args.sky_mult, phase_g1=args.phase_g,
        density_mult=args.density_mult, emission_scale=args.emission_scale,
    )

    t0 = time.time()
    mesh = make_inst_mesh(n)
    film = render_instance_sharded(shard_scene(stack, mesh), params,
                                   args.spp, mesh)
    from vpt_tpu.render.film import to_display
    img = np.asarray(to_display(film, params.exposure_scale))[::-1]
    dt = time.time() - t0
    rays = args.width * args.height * args.spp
    log(f"{args.spp} spp in {dt:.1f}s ({rays/dt/1e6:.2f} Mrays/s)")

    if args.denoise != "none":
        import dataclasses as _dc
        if args.denoise == "nn":
            from vpt_tpu.render.denoise_nn import denoise_film
            den = denoise_film(film)
        else:
            from vpt_tpu.render.denoise import denoise_image
            den = denoise_image(film.accum, film.alpha)
        film = _dc.replace(film, accum=den)
        img = np.asarray(to_display(film, params.exposure_scale))[::-1]

    from vpt_tpu.utils.io import save_image
    save_image(args.output, img, accum=np.asarray(film.accum)[::-1],
               save_exr=args.save_exr)
    log(f"wrote {args.output}")


def cmd_render(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from vpt_tpu.core.camera import Camera
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.render.params import Environment, Integrator, RenderParams
    from vpt_tpu.render.renderer import ProgressiveRenderer

    lights = PointLights.empty()
    if args.light:
        arr = np.array(args.light)
        lights = PointLights.make(arr[:, 0:3], arr[:, 3:6], arr[:, 6])

    if getattr(args, "inst_shards", 0) > 1:
        return _render_inst_sharded(args, lights)

    t0 = time.time()
    scene = _load_scene(args, lights)
    log(f"scene loaded in {time.time()-t0:.1f}s")

    if args.camera:
        cam = Camera.make(args.camera[:3], args.camera[3:], vfov=args.fov,
                          aspect=args.width / args.height,
                          aperture=args.aperture)
        scene = dataclasses.replace(scene, camera=cam)
    else:
        c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
        dist = float(np.linalg.norm(
            np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin))) * 1.2
        cam = Camera.make(c + np.array([0.0, dist * 0.15, dist]), c,
                          vfov=args.fov, aspect=args.width / args.height,
                          aperture=args.aperture)
        scene = dataclasses.replace(scene, camera=cam)

    env_name = args.env_type or ("hdri" if (args.env or args.scene.endswith(
        ".hdr")) else "atmosphere")
    env_type = dict(atmosphere=Environment.ATMOSPHERE, hdri=Environment.HDRI,
                    black=Environment.BLACK,
                    constant=Environment.CONSTANT)[env_name]

    if args.atmosphere and env_name == "atmosphere":
        import os as _os
        from vpt_tpu.scene.scene import attach_atmosphere
        from vpt_tpu.sky.runtime import make_atmosphere
        _os.makedirs(_os.path.dirname(args.atmosphere_cache) or ".",
                     exist_ok=True)
        t1 = time.time()
        atm = make_atmosphere(cache_path=args.atmosphere_cache,
                              luminance_mode=args.luminance,
                              do_white_balance=args.white_balance)
        scene = attach_atmosphere(scene, atmosphere=atm)
        log(f"atmosphere LUTs ready in {time.time()-t1:.1f}s "
            f"(luminance={args.luminance})")
        if getattr(args, "bake_sky", False):
            from vpt_tpu.scene.scene import attach_sky_cache
            scene = attach_sky_cache(scene, azimuth=args.azimuth,
                                     elevation=args.elevation)
            log("sky cache baked")

    params = RenderParams(
        width=args.width, height=args.height, ray_depth=args.ray_depth,
        volume_depth=args.volume_depth,
        integrator=int(Integrator.DIRECT if args.integrator == "direct"
                       else Integrator.VOLUMETRIC),
        environment_type=int(env_type), engine=args.engine, seed=args.seed,
        shadow_mode=getattr(args, "shadow_mode", "tracked"),
    ).replace(
        exposure_scale=args.exposure, azimuth=args.azimuth,
        elevation=args.elevation, sun_mult=args.sun_mult,
        sky_mult=args.sky_mult, phase_g1=args.phase_g,
        density_mult=args.density_mult, emission_scale=args.emission_scale,
    )

    if getattr(args, "shadow_mode", "tracked") == "cached":
        from vpt_tpu.accel.shadow import attach_shadow_cache
        t1 = time.time()
        scene = attach_shadow_cache(scene, azimuth=args.azimuth,
                                    elevation=args.elevation)
        log(f"shadow cache baked in {time.time()-t1:.1f}s")

    ckpt_every = getattr(args, "checkpoint_every", 0)
    resume = getattr(args, "resume", None)
    if (ckpt_every or resume) and args.sharded:
        raise SystemExit("--checkpoint-every/--resume apply to the "
                         "single-device progressive path (use "
                         "--sharded without checkpointing)")

    t0 = time.time()
    if args.sharded and jax.device_count() > 1:
        from vpt_tpu.parallel.shard import (make_mesh, render_sharded,
                                            replicate_scene)
        mesh = make_mesh(1, 0)
        film = render_sharded(replicate_scene(scene, mesh), params,
                              args.spp, mesh)
        from vpt_tpu.render.film import to_display
        img = np.asarray(to_display(film, params.exposure_scale))[::-1]
    else:
        r = ProgressiveRenderer(scene, params)
        if resume:
            from vpt_tpu.render.film import load_film
            r.film, r.iteration = load_film(resume)
            if r.film.accum.shape[:2] != (args.height, args.width):
                raise SystemExit(
                    f"--resume: checkpoint is "
                    f"{r.film.accum.shape[1]}x{r.film.accum.shape[0]}, "
                    f"render is {args.width}x{args.height}")
            log(f"resumed at {r.iteration} spp from {resume}")
        if ckpt_every:
            import os as _os
            ckpt = (getattr(args, "checkpoint_path", None)
                    or f"{_os.path.splitext(args.output)[0]}.ckpt.npz")
            _os.makedirs(_os.path.dirname(ckpt) or ".", exist_ok=True)
            from vpt_tpu.render.film import save_film
            while r.iteration < args.spp:
                n = min(ckpt_every, args.spp - r.iteration)
                r.step(n)
                save_film(ckpt, r.film, r.iteration)
                log(f"checkpoint at {r.iteration}/{args.spp} spp -> {ckpt}")
            film = r.film
        else:
            film = r.render(max(args.spp - r.iteration, 0))
        img = r.display_image()[::-1]
    dt = time.time() - t0
    rays = args.width * args.height * args.spp
    log(f"{args.spp} spp in {dt:.1f}s ({rays/dt/1e6:.2f} Mrays/s)")

    if args.denoise != "none":
        import dataclasses as _dc
        if args.denoise == "nn":
            from vpt_tpu.render.denoise_nn import denoise_film
            den = denoise_film(film)
        else:
            from vpt_tpu.render.denoise import denoise_image
            den = denoise_image(film.accum, film.alpha)
        film = _dc.replace(film, accum=den)
        from vpt_tpu.render.film import to_display
        img = np.asarray(to_display(film, params.exposure_scale))[::-1]

    from vpt_tpu.utils.io import save_image
    save_image(args.output, img, accum=np.asarray(film.accum)[::-1],
               save_exr=args.save_exr)
    if args.aov == "dof":
        import os as _os

        from PIL import Image

        from vpt_tpu.render.film import dof_overlay
        viz = np.asarray(dof_overlay(film, scene.camera,
                                     params.exposure_scale))[::-1]
        stem = _os.path.splitext(args.output)[0]
        Image.fromarray(viz).save(f"{stem}_dof.png")
    elif args.aov in ("occupancy", "bvh"):
        from vpt_tpu.render.debugviz import render_structure_aov
        from vpt_tpu.utils.io import save_aov
        viz = np.asarray(render_structure_aov(scene, params,
                                              args.aov))[::-1]
        save_aov(args.output, args.aov, viz)
    elif args.aov != "none":
        aov = np.asarray(getattr(film, args.aov))[::-1]
        from vpt_tpu.utils.io import save_aov
        save_aov(args.output, args.aov, aov)
    log(f"wrote {args.output}")


def cmd_earth(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import os

    import numpy as np
    from PIL import Image

    from vpt_tpu.sky.runtime import make_atmosphere, render_earth

    os.makedirs(os.path.dirname(args.atmosphere_cache) or ".",
                exist_ok=True)
    t0 = time.time()
    atm = make_atmosphere(cache_path=args.atmosphere_cache)
    log(f"atmosphere LUTs ready in {time.time()-t0:.1f}s")
    img = np.asarray(render_earth(atm, args.width, args.height,
                                  azimuth=args.azimuth,
                                  elevation=args.elevation,
                                  altitude_factor=args.altitude))
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    Image.fromarray((np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
                    ).save(args.output)
    log(f"wrote {args.output}")


def cmd_view(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vpt_tpu.core.camera import Camera
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.render.params import Environment, RenderParams

    lights = PointLights.empty()
    if args.light:
        arr = np.array(args.light)
        lights = PointLights.make(arr[:, 0:3], arr[:, 3:6], arr[:, 6])
    scene = _load_scene(args, lights)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    dist = float(np.linalg.norm(
        np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin))) * 1.2
    cam = Camera.make(c + np.array([0.0, dist * 0.15, dist]), c, vfov=40.0,
                      aspect=args.width / args.height)
    scene = dataclasses.replace(scene, camera=cam)
    env_name = args.env_type or ("hdri" if (args.env or args.scene.endswith(
        ".hdr")) else "atmosphere")
    env_type = dict(atmosphere=Environment.ATMOSPHERE, hdri=Environment.HDRI,
                    black=Environment.BLACK,
                    constant=Environment.CONSTANT)[env_name]
    params = RenderParams(width=args.width, height=args.height,
                          ray_depth=args.ray_depth,
                          environment_type=int(env_type),
                          shadow_mode=getattr(args, "shadow_mode",
                                              "tracked"))
    if params.shadow_mode == "cached":
        from vpt_tpu.accel.shadow import attach_shadow_cache
        scene = attach_shadow_cache(scene, azimuth=params.azimuth,
                                    elevation=params.elevation)

    atmo_dims = None
    if getattr(args, "atmosphere", False) and env_name == "atmosphere":
        from vpt_tpu.scene.scene import attach_atmosphere
        from vpt_tpu.sky.bruneton import LutDims
        from vpt_tpu.sky.runtime import make_atmosphere
        # interactive recomputes want half-res LUTs (seconds, not
        # minutes — the reference recomputes its full LUT set on a
        # GPU, main.cpp:1709-1732)
        atmo_dims = LutDims(transmittance_w=128, transmittance_h=32,
                            r=16, mu=64, mu_s=16, nu=4,
                            irradiance_w=32, irradiance_h=8)
        scene = attach_atmosphere(scene, atmosphere=make_atmosphere(
            dims=atmo_dims))

    procedural_rebuild = None
    if args.scene == "procedural":
        from vpt_tpu.scene.scene import build_scene
        from vpt_tpu.volume.procedural import create_procedural_grid

        def procedural_rebuild(noise_type, scale, res):
            # live regen (main.cpp:1671-1682): same [-100,100]^3 box,
            # resolution = box / res voxels per side
            grid = create_procedural_grid(
                vmin=(-100.0,) * 3, vmax=(100.0,) * 3,
                res=200.0 / max(res, 8), noise_type=noise_type,
                scale=scale)
            return build_scene([grid], lights=lights)

    from vpt_tpu.app.viewer import serve
    serve(scene, params, port=args.port, open_browser=args.open,
          procedural_rebuild=procedural_rebuild, atmo_dims=atmo_dims)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cmd == "render":
        cmd_render(args)
    elif args.cmd == "earth":
        cmd_earth(args)
    elif args.cmd == "view":
        cmd_view(args)


if __name__ == "__main__":
    main()
