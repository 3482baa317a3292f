"""Train the kernel-predicting denoiser (render/denoise_nn.py) on
rendered noisy/clean pairs from the framework's own engines.

Renders a small multi-scene corpus (dragon/point-light, emissive blob,
colored blob + HDRI, instanced blobs) at several seeds and cameras:
inputs at LOW_SPP with alpha/depth AOVs, targets at HIGH_SPP.  Loss is
relative L1 on log-tonemapped radiance (stable across exposure ranges).

Run (TPU preferred, CPU works):
    python tools/train_denoiser.py [--steps 1200] [--res 96]
Writes vpt_tpu/assets/denoiser.npz.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp


def build_corpus(res, low_spp, high_spp, n_views):
    from tests.golden_scenes import _blob
    from vpt_tpu.core.camera import Camera
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.render.params import Environment, RenderParams
    from vpt_tpu.render.renderer import ProgressiveRenderer
    from vpt_tpu.scene.scene import (attach_env_map, build_scene,
                                     load_vdb_scene)

    kw = dict(width=res, height=res, ray_depth=8, max_track_steps=128,
              max_fused_steps=384)
    scenes = []
    dragon = "/root/reference/assets/dragon.vdb"
    if os.path.exists(dragon):
        s = load_vdb_scene(dragon, lights=PointLights.make(
            [[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0]))
        scenes.append((s, RenderParams(
            environment_type=int(Environment.BLACK), **kw)))
    s = build_scene([_blob(n=24, emission=True)])
    scenes.append((s, RenderParams(
        environment_type=int(Environment.BLACK),
        **kw).replace(emission_scale=2.0)))
    eh, ew = 32, 64
    ty = np.linspace(1.0, 0.0, eh, dtype=np.float32)[:, None, None]
    env = (np.array([0.3, 0.5, 1.0], np.float32) * ty
           + np.array([0.9, 0.6, 0.3], np.float32) * (1.0 - ty))
    env = np.broadcast_to(env, (eh, ew, 3)).copy()
    env[eh // 4, ew // 3] = [40.0, 38.0, 30.0]
    s = attach_env_map(build_scene([_blob(n=24, color=True)]), env)
    scenes.append((s, RenderParams(
        environment_type=int(Environment.HDRI), **kw)))
    rng = np.random.RandomState(3)
    ids, xforms = [], []
    for i in range(16):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = rng.uniform(0, 7, 3)
        ids.append(0)
        xforms.append(xf)
    s = build_scene([_blob(n=16)], instance_grid_ids=ids,
                    instance_xforms=xforms)
    scenes.append((s, RenderParams(
        environment_type=int(Environment.CONSTANT), **kw)))

    samples = []
    view_rng = np.random.RandomState(11)
    for si, (scene, params) in enumerate(scenes):
        c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
        d = float(np.linalg.norm(np.asarray(scene.root_pmax)
                                 - np.asarray(scene.root_pmin)))
        for v in range(n_views):
            ang = view_rng.uniform(0, 2 * np.pi)
            el = view_rng.uniform(0.0, 0.5)
            eye = c + d * 1.1 * np.array([np.sin(ang) * np.cos(el),
                                          np.sin(el),
                                          np.cos(ang) * np.cos(el)])
            cam = Camera.make(eye, c, vfov=45.0, aspect=1.0)
            sc = dataclasses.replace(scene, camera=cam)
            p_lo = params.replace(seed=100 + v)
            p_hi = params.replace(seed=500 + v)
            t0 = time.time()
            f_lo = ProgressiveRenderer(sc, p_lo).render(low_spp)
            f_hi = ProgressiveRenderer(sc, p_hi).render(high_spp)
            samples.append((np.asarray(f_lo.accum),
                            np.asarray(f_lo.alpha),
                            np.asarray(f_lo.depth),
                            np.asarray(f_hi.accum)))
            print(f"scene {si} view {v}: {time.time()-t0:.1f}s",
                  flush=True)
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--low-spp", type=int, default=8)
    ap.add_argument("--high-spp", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vpt_tpu.render.denoise_nn import (_WEIGHTS_PATH, apply_denoiser,
                                           init_params, save_params)

    samples = build_corpus(args.res, args.low_spp, args.high_spp,
                           args.views)
    print(f"corpus: {len(samples)} pairs", flush=True)

    params = init_params(jax.random.PRNGKey(0))

    def loss_fn(params, rgb, alpha, depth, target):
        out = apply_denoiser(params, rgb, alpha, depth)
        lo = jnp.log1p(jnp.maximum(out, 0.0))
        lt = jnp.log1p(jnp.maximum(target, 0.0))
        return jnp.mean(jnp.abs(lo - lt))

    import optax
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rgb, alpha, depth, target):
        l, g = jax.value_and_grad(loss_fn)(params, rgb, alpha, depth,
                                           target)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    order = np.random.RandomState(0)
    t0 = time.time()
    for it in range(args.steps):
        rgb, alpha, depth, tgt = samples[order.randint(len(samples))]
        params, opt_state, l = step(params, opt_state, jnp.asarray(rgb),
                                    jnp.asarray(alpha), jnp.asarray(depth),
                                    jnp.asarray(tgt))
        if it % 100 == 0:
            print(f"step {it}: loss {float(l):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = args.out or _WEIGHTS_PATH
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_params(out, params)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
