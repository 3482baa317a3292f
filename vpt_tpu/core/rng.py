"""Functional RNG utilities.

The reference seeds a curand Philox stream per pixel with
``curand_init(idx, 0, iteration*4096)`` (render_kernel.cu:2234-2235).
The TPU-native equivalent is counter-based threefry keyed by
(base_seed, iteration, draw-site): inside vectorized tracking loops we
derive ONE subkey per loop step (``fold_in(key, step)``) and generate a
whole batch of lane-iid uniforms from it — a single bulk threefry per
step instead of per-lane key state.

Statistical (not bitwise) equivalence with curand is expected; see
SURVEY.md §7 hard-part 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_key(seed: int, iteration) -> jax.Array:
    """Key for one progressive iteration (= one sample per pixel)."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), iteration)


def stream_key(key: jax.Array, stream_id: int) -> jax.Array:
    """Stable per-call-site subkey (stream_id = static int)."""
    return jax.random.fold_in(key, stream_id)


def step_uniform(key: jax.Array, step, shape) -> jax.Array:
    """Batch of uniforms for loop step ``step`` (traced int32).

    Every lane gets an independent value; successive steps are
    independent.  uniform() returns values in [0, 1).
    """
    return jax.random.uniform(jax.random.fold_in(key, step), shape, jnp.float32)


def exp_step(u, inv_sigma):
    """Woodcock free-flight step: -log(1-u) * inv_sigma.

    u in [0,1) so 1-u in (0,1] and the log is finite.
    """
    return -jnp.log1p(-u) * inv_sigma
