"""Edge-aware denoiser for the accumulated radiance.

The reference runs Intel OIDN 2.1 on the accumulation buffer
(main.cpp:1508-1520); OIDN has no TPU port, so the substitute is an
edge-avoiding à-trous wavelet filter (Dammertz et al. 2010) — a few
dilated 5x5 bilateral passes guided by color distance and the alpha
channel.  Pure jnp (shift-and-accumulate), runs on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# B3-spline 5-tap kernel
_K1 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _shift2(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


def denoise_image(rgb, alpha, strength: float = 0.8, passes: int = 3):
    """rgb (H,W,3), alpha (H,W) -> filtered (H,W,3).

    ``strength`` in (0,1]: larger = more smoothing (wider color
    tolerance), 0 disables.
    """
    if strength <= 0.0:
        return rgb
    sigma_c = 0.35 * strength + 1e-6
    sigma_a = 0.5 * strength + 1e-6
    img = jnp.asarray(rgb, jnp.float32)
    a = jnp.asarray(alpha, jnp.float32)

    for p in range(passes):
        step = 1 << p
        acc = jnp.zeros_like(img)
        wsum = jnp.zeros(img.shape[:2], jnp.float32)
        for iy in range(5):
            for ix in range(5):
                dy = (iy - 2) * step
                dx = (ix - 2) * step
                k = _K1[iy] * _K1[ix]
                nb = _shift2(img, dy, dx)
                na = _shift2(a, dy, dx)
                dc = jnp.sum((img - nb) ** 2, axis=-1)
                da = (a - na) ** 2
                w = k * jnp.exp(-dc / (2.0 * sigma_c ** 2)
                                - da / (2.0 * sigma_a ** 2))
                acc = acc + nb * w[..., None]
                wsum = wsum + w
        img = acc / jnp.maximum(wsum, 1e-12)[..., None]
    return img
