"""Probe tpu.dynamic_gather cost via take_along_axis (Pallas and XLA).

Supported Mosaic pattern: operand (N,128), indices (N,128), gather
along axis 0 (within column) or axis 1 (within row).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 64


def bench_loop(name, fn, x, idx, n=8):
    try:
        s = float(fn(x, idx))
    except Exception as e:
        msg = str(e).replace("\n", " ")[:150]
        print(f"{name}: REJECTED: {msg}", flush=True)
        return
    t0 = time.time()
    for _ in range(n):
        s += float(fn(x, idx))
    dt = (time.time() - t0) / n
    nel = x.shape[0] * x.shape[1] * ITERS
    print(f"{name}: {dt*1000:.3f} ms/call  {dt/nel*1e9:.3f} ns/elem "
          f"(s={s:.0f})", flush=True)


def make_xla(axis):
    @jax.jit
    def run(x, idx):
        N, C = idx.shape
        def body(i, carry):
            acc, idx = carry
            r = jnp.take_along_axis(x, idx, axis=axis)
            acc = acc + r
            idx = (idx + acc.astype(jnp.int32) + i) % x.shape[axis]
            return acc, idx
        acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros_like(x), idx))
        return acc.sum()
    return run


def make_pallas(axis):
    def kern(x_ref, idx_ref, out_ref):
        x = x_ref[:]
        def body(i, carry):
            acc, idx = carry
            r = jnp.take_along_axis(x, idx, axis=axis)
            acc = acc + r
            idx = (idx + acc.astype(jnp.int32) + i) % x.shape[axis]
            return acc, idx
        acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros_like(x), idx_ref[:]))
        out_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx).sum()
    return run


key = jax.random.PRNGKey(0)
for N in (512, 832, 4096):
    x = jax.random.uniform(key, (N, 128), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N, 128), 0, N)
    idx1 = jax.random.randint(jax.random.PRNGKey(2), (N, 128), 0, 128)
    bench_loop(f"XLA taa axis0 N={N}", make_xla(0), x, idx0)
    bench_loop(f"XLA taa axis1 N={N}", make_xla(1), x, idx1)
    bench_loop(f"PAL taa axis0 N={N}", make_pallas(0), x, idx0)
    bench_loop(f"PAL taa axis1 N={N}", make_pallas(1), x, idx1)

# reference point: XLA row gather (B,) from (V,10), B = N*128 equivalent
B = 65536
V = 106330
tab = jax.random.uniform(key, (V, 10), jnp.float32)
flat_idx = jax.random.randint(jax.random.PRNGKey(3), (B,), 0, V)


@jax.jit
def xla_row(tab, idx):
    def body(i, carry):
        acc, idx = carry
        r = jnp.take(tab, idx, axis=0).sum(-1)
        acc = acc + r
        idx = (idx + acc.astype(jnp.int32) + i) % V
        return acc, idx
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros(B, jnp.float32), idx))
    return acc.sum()


s = float(xla_row(tab, flat_idx))
t0 = time.time()
for _ in range(8):
    s += float(xla_row(tab, flat_idx))
dt = (time.time() - t0) / 8
print(f"XLA row-gather B=65536: {dt*1000:.3f} ms/call  "
      f"{dt/(B*ITERS)*1e9:.3f} ns/index", flush=True)
