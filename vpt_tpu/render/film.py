"""Progressive film: accumulation buffers + display conversion.

The TPU-native equivalent of the reference's accum/cost/depth/raw
buffers and display path (render_kernel.cu:2263-2316): the film is a
pytree, progressive accumulation is the running mean
``accum += (value - accum) / (iteration + 1)`` (render_kernel.cu:2278),
NaN/Inf radiance reuses the previous accumulation (QUIRKS #18,
render_kernel.cu:2263-2264), and ACES+gamma produce the display image.

The cost AOV accumulates ADDITIVELY (total tracking steps over all
iterations) so ``cost / iterations`` reads as steps-per-spp — the
perf-tuning view the reference's cost heat map serves
(render_kernel.cu:1907-2047).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.tonemap import aces_tonemap, gamma_encode


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Film:
    accum: jax.Array  # (H, W, 3) running-mean radiance
    alpha: jax.Array  # (H, W) running-mean alpha (the reference's raw.w)
    depth: jax.Array  # (H, W) running-mean first-collision depth
    cost: jax.Array   # (H, W) TOTAL tracking steps (additive)
    trunc: jax.Array  # (H, W) TOTAL step-budget truncation flags (additive)

    @staticmethod
    def zeros(height: int, width: int) -> "Film":
        return Film(
            accum=jnp.zeros((height, width, 3), jnp.float32),
            alpha=jnp.zeros((height, width), jnp.float32),
            depth=jnp.zeros((height, width), jnp.float32),
            cost=jnp.zeros((height, width), jnp.float32),
            trunc=jnp.zeros((height, width), jnp.float32),
        )


def scrub_nan(value, fallback):
    """Replace non-finite pixels with the fallback (QUIRKS #18).

    Any non-finite component invalidates the whole pixel, matching
    ``isNan(value) || isInf(value)`` (render_kernel.cu:2263).
    """
    ok = jnp.all(jnp.isfinite(value), axis=-1, keepdims=True)
    return jnp.where(ok, value, fallback)


def accumulate(film: Film, value, alpha, iteration,
               depth: Optional[jax.Array] = None,
               cost: Optional[jax.Array] = None,
               trunc: Optional[jax.Array] = None) -> Film:
    """One progressive step (render_kernel.cu:2278-2287)."""
    it = jnp.asarray(iteration, jnp.float32)
    inv = 1.0 / (it + 1.0)
    value = scrub_nan(value, film.accum)
    alpha = jnp.where(jnp.isfinite(alpha), alpha, 1.0)
    new_accum = film.accum + (value - film.accum) * inv
    new_alpha = film.alpha + (alpha - film.alpha) * inv
    new_depth = film.depth
    if depth is not None:
        new_depth = film.depth + (depth - film.depth) * inv
    new_cost = film.cost
    if cost is not None:
        new_cost = film.cost + cost
    new_trunc = film.trunc
    if trunc is not None:
        new_trunc = film.trunc + trunc
    return Film(accum=new_accum, alpha=new_alpha, depth=new_depth,
                cost=new_cost, trunc=new_trunc)


def to_display(film: Film, exposure_scale=1.0):
    """Radiance film -> uint8 RGB (the reference's BGRA display path,
    render_kernel.cu:2292-2312)."""
    val = aces_tonemap(film.accum, exposure_scale)
    return (gamma_encode(val) * 255.0).astype(jnp.uint8)


def dof_overlay(film: Film, camera, exposure_scale=1.0):
    """Depth-of-field visualization (render_kernel.cu:2266-2275):
    lerp the display value 50% toward blue before the focus band,
    green inside it, red beyond it.  Band half-width ``aof`` is the
    reference's ``1 / lens_radius``."""
    base = gamma_encode(aces_tonemap(film.accum, exposure_scale))
    aof = jnp.clip(1.0 / jnp.maximum(camera.lens_radius, 1e-12), 0.0, 3.4e38)
    lo = camera.focus_dist - aof
    hi = camera.focus_dist + aof
    d = film.depth[..., None]
    red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    green = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blue = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    out = jnp.where(d > hi, (base + red) * 0.5, base)
    out = jnp.where(d < lo, (base + blue) * 0.5, out)
    out = jnp.where((d >= lo) & (d <= hi), (base + green) * 0.5, out)
    return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def save_film(path: str, film: Film, iteration: int):
    """Checkpoint the progressive state (resume-at-spp for long batch
    renders — SURVEY §5 checkpoint/resume)."""
    np.savez_compressed(
        path,
        accum=np.asarray(film.accum), alpha=np.asarray(film.alpha),
        depth=np.asarray(film.depth), cost=np.asarray(film.cost),
        trunc=np.asarray(film.trunc),
        iteration=np.int64(iteration))


def load_film(path: str):
    """Returns (film, iteration).  Pre-trunc checkpoints load with a
    zero truncation buffer."""
    z = np.load(path)
    trunc = (jnp.asarray(z["trunc"]) if "trunc" in z.files
             else jnp.zeros_like(jnp.asarray(z["cost"])))
    film = Film(accum=jnp.asarray(z["accum"]), alpha=jnp.asarray(z["alpha"]),
                depth=jnp.asarray(z["depth"]), cost=jnp.asarray(z["cost"]),
                trunc=trunc)
    return film, int(z["iteration"])
