"""Multi-chip rendering via `jax.sharding.Mesh` + `shard_map`.

The reference is strictly single-GPU (SURVEY.md §2.9); the TPU-native
scaling axes for this workload are:

* **spp sharding** — every device renders the full frame with an
  independent RNG stream; radiance is `pmean`-reduced over ICI.  One
  sharded step adds `n_spp_devices` samples per pixel.
* **tile sharding** — the ray batch (flattened pixels) is sharded
  across devices; each device traces its rows, the film is gathered.
  The volume atlas and LUTs are replicated (they are small relative
  to HBM; instance-sharded atlases are the planned path for giant
  scenes).

Both compose on a 2-D ('tile', 'spp') mesh.  All collectives ride ICI
(mean over 'spp', all-gather over 'tile' implicit in the output spec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vpt_tpu.core.rng import render_key
from vpt_tpu.render.film import Film, accumulate
from vpt_tpu.render.params import RenderParams
from vpt_tpu.render.renderer import trace_rays
from vpt_tpu.scene.scene import Scene


def make_mesh(n_tile: int = 1, n_spp: int = 0, devices=None) -> Mesh:
    """('tile', 'spp') mesh; n_spp=0 -> use all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_spp == 0:
        n_spp = n // n_tile
    if n_tile * n_spp > n:
        raise ValueError(f"mesh {n_tile}x{n_spp} needs {n_tile*n_spp} devices, "
                         f"have {n}")
    import numpy as np
    dev_array = np.array(devices[: n_tile * n_spp]).reshape(n_tile, n_spp)
    return Mesh(dev_array, ("tile", "spp"))


def _sharded_sample(scene: Scene, params: RenderParams, key, u, v):
    """Body run per device: trace the local slice of pixels with a
    per-spp-shard RNG stream using the CONFIGURED engine (fused by
    default — the performance path), then mean over the 'spp' axis."""
    spp_idx = jax.lax.axis_index("spp")
    key = jax.random.fold_in(key, spp_idx)
    kl, ki = jax.random.split(key)
    origin, direction = scene.camera.get_rays(u, v, kl)
    L, alpha, aux = trace_rays(scene, params, ki, origin, direction)
    L = jax.lax.pmean(L, "spp")
    alpha = jax.lax.pmean(alpha, "spp")
    B = u.shape[0]
    cost = aux.get("cost", jnp.zeros(B, jnp.float32))
    depth = aux.get("depth", jnp.zeros(B, jnp.float32))
    cost = jax.lax.pmean(cost, "spp")
    depth = jax.lax.pmean(depth, "spp")
    return L, alpha, cost, depth


def render_step_sharded(scene: Scene, params: RenderParams, film: Film,
                        iteration, mesh: Mesh):
    """One progressive super-iteration over the mesh.

    Adds `mesh.shape['spp']` samples per pixel.  Returns the updated
    (replicated) film.
    """
    H, W = params.height, params.width
    n_tile = mesh.shape["tile"]
    if (H * W) % n_tile:
        raise ValueError(f"pixel count {H*W} not divisible by tile axis "
                         f"{n_tile}")

    key = render_key(params.seed, iteration)
    kj = jax.random.fold_in(key, 17)
    jit_uv = jax.random.uniform(kj, (H, W, 2), jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = ((xs + jit_uv[..., 0]) / W).reshape(-1)
    v = ((ys + jit_uv[..., 1]) / H).reshape(-1)

    fn = jax.shard_map(
        functools.partial(_sharded_sample, scene, params, key),
        mesh=mesh,
        in_specs=(P("tile"), P("tile")),
        out_specs=P("tile"),
        check_vma=False,
    )
    L, alpha, cost, depth = fn(u, v)
    value = L.reshape(H, W, 3)
    alpha = alpha.reshape(H, W)
    return accumulate(film, value, alpha, iteration,
                      depth=depth.reshape(H, W), cost=cost.reshape(H, W))


def render_sharded(scene: Scene, params: RenderParams, spp: int, mesh: Mesh
                   ) -> Film:
    """Render `spp` total samples per pixel over the mesh."""
    n_spp = mesh.shape["spp"]
    iters = max(1, spp // n_spp)
    film = Film.zeros(params.height, params.width)
    step = jax.jit(render_step_sharded, static_argnames=("mesh",))
    for it in range(iters):
        film = step(scene, params, film, jnp.uint32(it), mesh=mesh)
    jax.block_until_ready(film.accum)
    return film


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place the scene replicated over the mesh (explicit device_put so
    the first sharded step doesn't re-shard on the fly)."""
    spec = NamedSharding(mesh, P())
    return jax.device_put(scene, spec)
