"""Verify fori-mode correctness vs while-mode, then tune budget/tile."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.profile_fused import P, bench, scene  # noqa: E402  (inits TPU)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vpt_tpu.render.film import Film  # noqa: E402
from vpt_tpu.render.renderer import render_step  # noqa: E402


def render_n(params, n=4):
    film = Film.zeros(params.height, params.width)
    for it in range(n):
        film = render_step(scene, params, film, jnp.uint32(it))
    jax.block_until_ready(film.accum)
    return np.asarray(film.accum), np.asarray(film.cost)


a_while, c_while = render_n(P)
a_fori, c_fori = render_n(P.replace(fused_loop_mode="fori"))
print("while mean:", a_while.mean(), "fori mean:", a_fori.mean())
print("max |diff|:", np.abs(a_while - a_fori).max())
print("cost max |diff|:", np.abs(c_while - c_fori).max())
print("cost per-spp max:", c_fori.max(), "mean:", c_fori.mean())

F = P.replace(fused_loop_mode="fori")
for steps in (32, 48, 64, 96, 128):
    a, c = render_n(F.replace(max_fused_steps=steps), n=2)
    print(f"steps={steps}: mean={a.mean():.6f} costmax={c.max():.1f}")

for steps in (48, 64, 128):
    bench(F.replace(max_fused_steps=steps), f"fori/{steps}/tile=65536")
for tile in (8192, 16384, 32768, 131072, 262144):
    bench(F.replace(fused_tile=tile, max_fused_steps=64),
          f"fori/64/tile={tile}")
