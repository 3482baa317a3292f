"""Retry Pallas taa axis=0 (column-batched dynamic_gather) across
shapes/dtypes — the first attempt crashed the backend compiler."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        s = float(np.asarray(out).ravel()[0])
        print(f"{name}: OK ({s:.3f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:120]
        print(f"{name}: REJECTED: {msg}", flush=True)
        return False


def make(axis, N, C, dtype=jnp.int32, single=False):
    def kern(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    def run():
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (N, C), jnp.float32)
        hi = N if axis == 0 else C
        idx = jax.random.randint(jax.random.PRNGKey(1), (N, C), 0,
                                 hi).astype(dtype)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    return run


for N in (8, 128, 256, 1024):
    probe(f"axis0 ({N},128) i32", make(0, N, 128))
probe("axis0 (256,128) u32", make(0, 256, 128, jnp.uint32))
probe("axis0 (256,256) i32", make(0, 256, 256))
probe("axis0 (8,128) via lax.gather", make(0, 8, 128))
# roll-based butterfly availability
def kern_roll(x_ref, out_ref):
    out_ref[:] = pltpu.roll(x_ref[:], shift=3, axis=1)
probe("pltpu.roll axis1", lambda: pl.pallas_call(
    kern_roll,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)))
