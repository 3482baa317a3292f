"""Probe Mosaic's '2D gather' support + timing of a Pallas row-gather."""

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

B = 65536
V = 106330
V128 = 106368  # pad to a multiple of 8 sublanes
ITERS = 24

key = jax.random.PRNGKey(0)
tab128 = jax.random.uniform(key, (V128, 128), jnp.float32)
tab8 = jax.random.uniform(key, (V128, 8), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, V)


def probe(name, fn):
    try:
        out = fn()
        s = float(np.asarray(out).ravel()[0])
        print(f"PALLAS {name}: OK ({s:.3f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"PALLAS {name}: REJECTED: {msg}", flush=True)
        return False


# (a) take_along_axis row gather, width 128
def k_taa128(tab_ref, idx_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (B, 128))
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)


probe("taa (V,128) bcast idx", lambda: pl.pallas_call(
    k_taa128,
    out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab128, idx0))


# (b) width 8
def k_taa8(tab_ref, idx_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (B, 8))
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)


probe("taa (V,8) bcast idx", lambda: pl.pallas_call(
    k_taa8,
    out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab8, idx0))


# (c) per-column independent 2D gather (idx varies per column)
def k_taa_var(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


probe("taa (V,128) varying idx", lambda: pl.pallas_call(
    k_taa_var,
    out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab128, (idx0.reshape(B // 128, 128) % V)))


# (d) jnp.take with 2D table, 1D idx
def k_take2d(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


probe("take (V,8) 1d idx", lambda: pl.pallas_call(
    k_take2d,
    out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab8, idx0))


# timing helper: loop with data-dependent idx inside one pallas call
def time_loop(name, tab, width):
    Vp = tab.shape[0]

    def k_loop(tab_ref, idx_ref, out_ref):
        def body(i, carry):
            acc, idx = carry
            idx2 = jnp.broadcast_to(idx[:, None], (B, width))
            r = jnp.take_along_axis(tab_ref[:], idx2, axis=0)
            acc = acc + r.sum(-1)
            idx = (idx + acc.astype(jnp.int32) + i) % Vp
            return acc, idx
        acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros(B, jnp.float32), idx_ref[:]))
        out_ref[:] = acc

    try:
        f = jax.jit(lambda t, i: pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i).sum())
        s = float(f(tab, idx0))
    except Exception as e:
        print(f"PALLAS {name}: REJECTED: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return
    t0 = time.time()
    n = 8
    for _ in range(n):
        s += float(f(tab, idx0))
    dt = (time.time() - t0) / n
    print(f"PALLAS {name}: {dt*1000:.2f} ms/call  "
          f"{dt/(B*ITERS)*1e9:.2f} ns/index (s={s:.0f})", flush=True)


time_loop("loop taa (V,8)", tab8, 8)
time_loop("loop taa (V,128)", tab128, 128)

# XLA reference for the same dependent loop, width 8
@jax.jit
def xla_loop(tab, idx):
    def body(i, carry):
        acc, idx = carry
        r = jnp.take(tab, idx, axis=0)
        acc = acc + r.sum(-1)
        idx = (idx + acc.astype(jnp.int32) + i) % V128
        return acc, idx
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros(B, jnp.float32), idx0))
    return acc.sum()


s = float(xla_loop(tab8, idx0))
t0 = time.time()
for _ in range(8):
    s += float(xla_loop(tab8, idx0))
dt = (time.time() - t0) / 8
print(f"XLA loop take (V,8): {dt*1000:.2f} ms/call  "
      f"{dt/(B*ITERS)*1e9:.2f} ns/index", flush=True)
