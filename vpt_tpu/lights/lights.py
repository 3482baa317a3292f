"""Point lights (the reference's only runtime light primitive).

Port of light.h:91-153.  Lights enter scenes through `.ins` files with
a ``light`` header (main.cpp:989-1018) or programmatically.

QUIRK preserved (docs/QUIRKS.md): point_light::Le computes falloff as
``1 / length(pos*pos - ray_pos*ray_pos)`` (light.h:116-117) —
component-wise squares, not the squared distance.  We implement both
and select via ``falloff_mode``; default matches the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core.phase import henyey_greenstein
from vpt_tpu.core.vecmath import length, normalize


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PointLights:
    pos: jax.Array    # (L, 3)
    color: jax.Array  # (L, 3)
    power: jax.Array  # (L,)

    @property
    def count(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def make(pos, color, power) -> "PointLights":
        return PointLights(
            pos=jnp.asarray(np.atleast_2d(pos), jnp.float32),
            color=jnp.asarray(np.atleast_2d(color), jnp.float32),
            power=jnp.asarray(np.atleast_1d(power), jnp.float32),
        )

    @staticmethod
    def empty() -> "PointLights":
        return PointLights(
            pos=jnp.zeros((0, 3), jnp.float32),
            color=jnp.zeros((0, 3), jnp.float32),
            power=jnp.zeros((0,), jnp.float32),
        )


def point_light_Le(light_pos, light_color, light_power, ray_pos, ray_dir,
                  phase_g1, tr, reference_falloff: bool = True):
    """light.h:104-121: Li = color * power * Tr * HG(cosθ) * falloff."""
    wi = normalize(light_pos - ray_pos)
    cos_theta = jnp.sum(ray_dir * wi, axis=-1)
    phase_pdf = henyey_greenstein(cos_theta, phase_g1)
    if reference_falloff:
        sqr_dist = length(light_pos * light_pos - ray_pos * ray_pos)
    else:
        sqr_dist = jnp.sum((light_pos - ray_pos) ** 2, axis=-1)
    falloff = 1.0 / jnp.maximum(sqr_dist, 1e-12)
    return light_color * (light_power * phase_pdf * falloff)[..., None] * tr
