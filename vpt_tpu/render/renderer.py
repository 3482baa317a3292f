"""Render orchestration: pixel jitter, ray generation, engine dispatch
with ray tiling + cost-ordered scheduling, the jitted progressive step,
and the ProgressiveRenderer host loop.

This is the TPU-native analog of the reference's kernel entry + display
loop (render_kernel.cu:2216-2326, main.cpp:1527-1860): one
``render_step`` = one progressive sample per pixel.

Tiling design (docs/ARCHITECTURE.md): the fused engine renders in
``fused_tile``-ray tiles whose while-loop exits as soon as every lane
in the tile is done.  At large resolutions most of the frame is cheap
(empty sky), so rays are regrouped by a per-4096-ray-chunk cost proxy
(primary-ray root-box hits) before tiling — cheap chunks share tiles
that exit after a couple of iterations (~5x at 1080p, measured r2).
The chunk permutation moves whole contiguous rows, so it costs two
~500-index gathers, not per-ray ones.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.rng import render_key
from vpt_tpu.core.vecmath import aabb_intersect
from vpt_tpu.render.film import Film, accumulate, to_display
from vpt_tpu.render.params import Integrator, RenderParams

_CHUNK = 4096  # rays per scheduling chunk (= one 64^2 pixel block)
_GOLDEN_FRAC = float((1.0 + np.sqrt(5.0)) / 2.0) % 1.0


def _pixel_jitter(params, key, height, width, iteration):
    """Sub-pixel jitter (render_kernel.cu:2238-2247): threefry white
    noise by default, or the generated blue-noise texture advanced by
    the golden ratio per iteration (QUIRKS #12 — the same scalar is
    added to both channels, as the reference does)."""
    if params.jitter == "bluenoise":
        from vpt_tpu.scene.assets import load_blue_noise
        bn = jnp.asarray(load_blue_noise())  # (128, 128, 2)
        n = bn.shape[0]
        yy = jnp.arange(height) % n
        xx = jnp.arange(width) % n
        tiled = bn[yy][:, xx]
        adv = jnp.mod(jnp.asarray(iteration, jnp.float32) * _GOLDEN_FRAC,
                      1.0)
        return jnp.mod(tiled + adv, 1.0)
    return jax.random.uniform(key, (height, width, 2), jnp.float32)


def _pad_to(x, size):
    b = x.shape[0]
    if b % size == 0:
        return x, b
    pad = size - b % size
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, mode="edge"), b


def _engine_fn(scene, params):
    if params.integrator == int(Integrator.VOLUMETRIC):
        from vpt_tpu.render.vol_integrator import vol_integrator

        def run(key, o, d):
            return vol_integrator(scene, params, key, o, d)
        return run, params.fused_tile
    if params.engine == "reference":
        from vpt_tpu.render.integrator import direct_integrator

        def run(key, o, d):
            return direct_integrator(scene, params, key, o, d)
        return run, params.fused_tile
    if params.engine == "march":
        from vpt_tpu.render.march import march_single_scatter

        def run(key, o, d):
            return march_single_scatter(scene, params, key, o, d)
        return run, params.march_tile
    from vpt_tpu.render.fused import fused_direct

    def run(key, o, d):
        L, alpha, cost, unfinished, depth = fused_direct(scene, params, key,
                                                         o, d)
        return L, alpha, dict(cost=cost, depth=depth, trunc=unfinished)
    return run, params.fused_tile


# measured on config 1 (tools/probe_queues.py, v5e): per-tile
# iterations approach Q x mean ray cost instead of Q x max, so the
# whole frame in ONE tile with Q=16 lanes-queues beats 16 separate
# 16k tiles by ~1.5x (14.4 vs 21.5 ms/spp at 512^2)
_AUTO_Q = 16
_AUTO_TILE = 262144


def _resolve_auto_queue(params, B):
    """rays_per_lane=0 = AUTO: turn on fused ray queues when the batch
    is big enough that idle-lane waste dominates (BLACK/CONSTANT envs
    apply inline at retire; HDRI/ATMOSPHERE defer (beta, dir, env_pos)
    and bulk-evaluate after the loop).  Small batches (tests, viewer
    previews) keep the plain path."""
    if params.rays_per_lane != 0:
        return params
    if (params.engine == "fused"
            and params.integrator == int(Integrator.DIRECT)
            and B >= _AUTO_TILE // 2):
        tile = min(_AUTO_TILE, -(-B // _CHUNK) * _CHUNK)
        return params.replace(rays_per_lane=_AUTO_Q, fused_tile=tile)
    return params.replace(rays_per_lane=1)


def _tiled2d_split(Q, H, W):
    """Factor Q into an (Sy, Sx) subtile grid of the (H, W) frame,
    preferring near-square subtiles.  None when Q doesn't divide."""
    best = None
    for sy in range(1, Q + 1):
        if Q % sy or H % sy:
            continue
        sx = Q // sy
        if W % sx:
            continue
        score = abs((H // sy) - (W // sx))
        if best is None or score < best[0]:
            best = (score, sy, sx)
    return best[1:] if best else None


def _tiled2d_rolls(Q, hh, ww):
    """Fixed per-slot 2D roll offsets (golden-ratio lattice) so a
    lane's Q rays don't align across subtiles."""
    return [(int((q * 0.61803399) % 1.0 * hh),
             (int((q * 0.38196601) % 1.0 * ww)))
            for q in range(Q)]


def _tiled2d_fwd(arr, H, W, sy, sx, rolls):
    """Pixel-order (H*W, ...) -> slot-major queue order: slot q =
    subtile (iy, ix) of an (sy, sx) grid, lane = in-subtile pixel
    (rolled per slot).  Pure reshape/roll/concat — no gathers (the
    whole point: the stratified argsort permutation cost more than its
    loop-trip win; see params.queue_tiled2d)."""
    c = arr.shape[1:]
    a = arr.reshape(sy, H // sy, sx, W // sx, *c)
    parts = []
    for iy in range(sy):
        for ix in range(sx):
            sub = a[iy, :, ix]
            ry, rx = rolls[iy * sx + ix]
            sub = jnp.roll(sub, (ry, rx), axis=(0, 1))
            parts.append(sub.reshape(-1, *c))
    return jnp.concatenate(parts, axis=0)


def _tiled2d_inv(arr, H, W, sy, sx, rolls):
    """Inverse of _tiled2d_fwd for (H*W, ...) outputs."""
    c = arr.shape[1:]
    hh, ww = H // sy, W // sx
    a = arr.reshape(sy * sx, hh, ww, *c)
    rows = []
    for iy in range(sy):
        row = []
        for ix in range(sx):
            ry, rx = rolls[iy * sx + ix]
            row.append(jnp.roll(a[iy * sx + ix], (-ry, -rx), axis=(0, 1)))
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0).reshape((H * W,) + c)


def trace_rays(scene, params, key, origin, direction, cost_hint=None):
    """Trace a flat ray batch with the configured engine.

    ``cost_hint``: optional (B,) expected per-ray cost (e.g. the film's
    accumulated cost AOV) — per-pixel tracking cost is stable across
    iterations, so grouping rays by it lets cheap tiles exit their
    while-loop after a few steps instead of running to the global max.
    Without a hint, the primary-ray root-box hit is the proxy.

    Returns (L (B,3), alpha (B,), aux dict of (B,) AOVs).
    """
    B = origin.shape[0]
    params = _resolve_auto_queue(params, B)
    run, tile = _engine_fn(scene, params)
    tile = min(tile, max(B, 1))

    # cost-STRATIFIED lane assignment (queue tiles): the while-loop
    # runs until the slowest LANE drains its Q-ray queue, and with
    # pixel-order assignment the lane queue-sums vary ~3x around the
    # mean (measured: config1 cached ran 70 loop trips where the mean
    # queue-sum was 24).  Rank-sorting rays by the film's per-pixel
    # cost AOV and dealing rank r to lane r % n_lanes gives every lane
    # one ray from each cost stratum — queue sums concentrate at the
    # mean, so per-tile trips approach Q x mean instead of Q x max.
    # Iteration 0 (all-zero hint) is the identity permutation.
    Q = params.rays_per_lane
    use_strat = (params.engine == "fused"
                 and params.integrator == int(Integrator.DIRECT)
                 and params.strat_schedule and Q > 1
                 and tile % Q == 0 and cost_hint is not None)

    use_blocks = (not use_strat and params.engine == "fused"
                  and params.integrator == int(Integrator.DIRECT)
                  and params.block_tiles > 0 and B > tile
                  and tile % _CHUNK == 0)

    origin_p, b_orig = _pad_to(origin, tile if not use_blocks else _CHUNK)
    direction_p, _ = _pad_to(direction, tile if not use_blocks else _CHUNK)
    # after chunk padding, also pad to a whole number of tiles
    if origin_p.shape[0] % tile:
        origin_p, _ = _pad_to(origin_p, tile)
        direction_p, _ = _pad_to(direction_p, tile)
    bp = origin_p.shape[0]

    inv_perm = None   # chunk-level inverse (block scheduling)
    ray_inv = None    # per-ray inverse (stratified lane assignment)
    if use_strat:
        hint_p, _ = _pad_to(cost_hint, tile)
        bt = tile // Q     # lanes per tile
        ltot = bp // Q     # lanes across all tiles
        # rank -> ray id (stable: an all-zero hint is the identity)
        order = jnp.argsort(hint_p).astype(jnp.int32)
        k = jnp.arange(bp, dtype=jnp.int32)
        lane_g = k % ltot
        # rank k lands in tile lane_g//bt, slot k//ltot, lane lane_g%bt
        # (fused_direct reads slot q of a tile at offset q*bt)
        dest = (lane_g // bt) * tile + (k // ltot) * bt + (lane_g % bt)
        perm = jnp.zeros(bp, jnp.int32).at[dest].set(order)
        ray_inv = jnp.zeros(bp, jnp.int32).at[perm].set(k)
        origin_p = jnp.take(origin_p, perm, axis=0)
        direction_p = jnp.take(direction_p, perm, axis=0)
    # 2D-TILED slot assignment (full-frame single-tile queue path):
    # with the plain reshape(Q, -1) deal, a lane's Q rays form a same-
    # column vertical stripe; re-dealing so slot q = subtile (sy, sx)
    # and lane = rolled in-subtile pixel spreads every lane's rays
    # across the whole frame.  Reshape/roll only (no gathers).
    # Measured (tools/probe_seek.py / probe_trips.py, config1 cached):
    # a small win (9.5 -> 9.1 ms/spp) — the while-loop tail is mostly
    # per-ray RNG variance (48 trips vs a 37-trip mean at Q=16), which
    # stratification can't remove, so this is kept as a free ~4%.
    t2d = None
    if (params.engine == "fused" and params.integrator == int(
            Integrator.DIRECT) and Q > 1 and params.queue_tiled2d
            and not use_strat and bp == tile
            and params.width * params.height == bp):
        split = _tiled2d_split(Q, params.height, params.width)
        if split is not None:
            sy2, sx2 = split
            rolls = _tiled2d_rolls(Q, params.height // sy2,
                                   params.width // sx2)
            t2d = (params.height, params.width, sy2, sx2, rolls)
            origin_p = _tiled2d_fwd(origin_p, *t2d)
            direction_p = _tiled2d_fwd(direction_p, *t2d)
    if use_blocks:
        nc = bp // _CHUNK
        if cost_hint is not None:
            hint_p, _ = _pad_to(cost_hint, _CHUNK)
            if hint_p.shape[0] % tile:
                hint_p, _ = _pad_to(hint_p, tile)
            chunk_cost = hint_p.reshape(nc, _CHUNK).max(axis=1)
        else:
            hit, _, _ = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                       origin_p, direction_p)
            chunk_cost = hit.reshape(nc, _CHUNK).sum(axis=1).astype(
                jnp.float32)
        perm = jnp.argsort(chunk_cost)
        inv_perm = jnp.argsort(perm)
        origin_p = jnp.take(origin_p.reshape(nc, _CHUNK, 3), perm,
                            axis=0).reshape(bp, 3)
        direction_p = jnp.take(direction_p.reshape(nc, _CHUNK, 3), perm,
                               axis=0).reshape(bp, 3)

    outs = []
    n_tiles = bp // tile
    for ti in range(n_tiles):
        sl = slice(ti * tile, (ti + 1) * tile)
        kt = jax.random.fold_in(key, 1000 + ti)
        L, alpha, aux = run(kt, origin_p[sl], direction_p[sl])
        outs.append((L, alpha, aux))

    L = jnp.concatenate([o[0] for o in outs], axis=0)
    alpha = jnp.concatenate([o[1] for o in outs], axis=0)
    aux_keys = outs[0][2].keys()
    aux = {k: jnp.concatenate([o[2].get(k, jnp.zeros(tile)) for o in outs])
           for k in aux_keys}

    if t2d is not None:
        L = _tiled2d_inv(L, *t2d)
        alpha = _tiled2d_inv(alpha, *t2d)
        aux = {k2: _tiled2d_inv(v, *t2d) for k2, v in aux.items()}
    if ray_inv is not None:
        L = jnp.take(L, ray_inv, axis=0)
        alpha = jnp.take(alpha, ray_inv, axis=0)
        aux = {k2: jnp.take(v, ray_inv, axis=0) for k2, v in aux.items()}
    if inv_perm is not None:
        nc = bp // _CHUNK
        L = jnp.take(L.reshape(nc, _CHUNK, 3), inv_perm,
                     axis=0).reshape(bp, 3)
        alpha = jnp.take(alpha.reshape(nc, _CHUNK), inv_perm,
                         axis=0).reshape(bp)
        aux = {k: jnp.take(v.reshape(nc, _CHUNK), inv_perm,
                           axis=0).reshape(bp) for k, v in aux.items()}
    return L[:B], alpha[:B], {k: v[:B] for k, v in aux.items()}


def render_rays(scene, params, key, iteration=0, cost_hint=None):
    """One full-frame sample: jittered primary rays -> traced radiance.

    Returns (value (H,W,3), alpha (H,W), aux dict of (H,W) AOVs).
    """
    H, W = params.height, params.width
    jit_uv = _pixel_jitter(params, jax.random.fold_in(key, 17), H, W,
                           iteration)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = ((xs + jit_uv[..., 0]) / W).reshape(-1)
    v = ((ys + jit_uv[..., 1]) / H).reshape(-1)
    kl, ki = jax.random.split(key)
    origin, direction = scene.camera.get_rays(u, v, kl)
    if cost_hint is not None:
        cost_hint = cost_hint.reshape(-1)
    L, alpha, aux = trace_rays(scene, params, ki, origin, direction,
                               cost_hint=cost_hint)
    return (L.reshape(H, W, 3), alpha.reshape(H, W),
            {k: val.reshape(H, W) for k, val in aux.items()})


def _render_step(scene, params, film, iteration):
    key = render_key(params.seed, iteration)
    # the film's accumulated cost AOV schedules this iteration's tiles
    # (all-zero on iteration 0 -> identity order)
    value, alpha, aux = render_rays(scene, params, key, iteration,
                                    cost_hint=film.cost)
    return accumulate(film, value, alpha, iteration, depth=aux["depth"],
                      cost=aux["cost"], trunc=aux.get("trunc"))


render_step = jax.jit(_render_step)


@functools.partial(jax.jit, static_argnums=(3,))
def render_chunk(scene, params, film, n, iteration0):
    """``n`` progressive samples folded into ONE dispatch
    (lax.fori_loop over _render_step).  Each remote-TPU dispatch is an
    RPC through the axon tunnel; folding k spp per call amortizes that
    latency for long accumulation runs (bench, north-star 1024 spp).
    Estimator-identical to n render_step calls: the loop body derives
    each sample's key from the absolute iteration index."""
    def body(i, f):
        return _render_step(scene, params, f,
                            iteration0 + i.astype(jnp.uint32))
    return jax.lax.fori_loop(0, n, body, film)


class ProgressiveRenderer:
    """Host-side progressive accumulation loop — the render side of the
    reference's display loop (main.cpp:1823-1829): each ``step()`` adds
    one sample per pixel; any param change + ``reset()`` restarts."""

    def __init__(self, scene, params: RenderParams):
        self.scene = scene
        self.params = params
        self.film = Film.zeros(params.height, params.width)
        self.iteration = 0

    def step(self, n: int = 1) -> Film:
        for _ in range(n):
            self.film = render_step(self.scene, self.params, self.film,
                                    jnp.uint32(self.iteration))
            self.iteration += 1
        return self.film

    def render(self, spp: int) -> Film:
        self.step(spp)
        jax.block_until_ready(self.film.accum)
        return self.film

    def reset(self):
        self.film = Film.zeros(self.params.height, self.params.width)
        self.iteration = 0

    def display_image(self) -> np.ndarray:
        return np.asarray(to_display(self.film, self.params.exposure_scale))
