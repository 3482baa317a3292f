"""ACES tonemapping + gamma, and display-buffer quantization.

Port of the reference's tonemap path (render_kernel.cu:2208-2312,
matrices from MJP's BakingLab ACES fit).  Operates on (..., 3) float32
radiance images.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# render_kernel.cu:2295-2303 (rows act on column vec in the reference's
# mat3*vec; we keep the same numbers and apply as matvec).
ACES_INPUT = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=np.float32,
)

ACES_OUTPUT = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=np.float32,
)


def rtt_and_odt_fit(v):
    """render_kernel.cu:2209-2214."""
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_tonemap(rgb, exposure_scale=1.0):
    """ACES fit + exposure (render_kernel.cu:2305-2307)."""
    val = jnp.einsum("ij,...j->...i", ACES_INPUT, rgb)
    val = rtt_and_odt_fit(val)
    return jnp.einsum("ij,...j->...i", ACES_OUTPUT, val) * exposure_scale


def gamma_encode(rgb, gamma=2.2):
    """pow(max(v,0), 1/gamma) clamped to [0,1] (render_kernel.cu:2309-2311)."""
    return jnp.minimum(jnp.power(jnp.maximum(rgb, 0.0), 1.0 / gamma), 1.0)


def to_display(accum_rgb, exposure_scale=1.0):
    """Radiance -> uint8 display image (the reference's BGRA path as RGB)."""
    val = aces_tonemap(accum_rgb, exposure_scale)
    val = gamma_encode(val)
    return (val * 255.0).astype(jnp.uint8)
