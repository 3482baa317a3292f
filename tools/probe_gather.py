"""Probe TPU gather costs: in-loop vs barrier vs Pallas formulations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

B = 65536
V = 106330
ITERS = 24  # loop iterations inside the jitted fn

key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (V, 10), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, V)


def timeit(fn, *args, n=8, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    per_index = dt / (B * ITERS) * 1e9
    print(f"{label}: {dt*1000:.2f} ms/call  {per_index:.2f} ns/index")
    return dt


def make_loop(gather_fn):
    @jax.jit
    def run(table, idx):
        def body(i, carry):
            acc, idx = carry
            rows = gather_fn(table, idx)
            acc = acc + rows.sum(-1)
            idx = (idx + jnp.int32(12345) + i) % V
            return acc, idx
        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(B, jnp.float32), idx))
        return acc
    return run


def g_take(t, i):
    return jnp.take(t, i, axis=0)


def g_take_barrier(t, i):
    (i,) = jax.lax.optimization_barrier((i,))
    r = jnp.take(t, i, axis=0)
    (r,) = jax.lax.optimization_barrier((r,))
    return r


timeit(make_loop(g_take), table, idx0, label="in-loop take (V,10)")
timeit(make_loop(g_take_barrier), table, idx0, label="in-loop take+barrier")

# width sweep
for w in (1, 2, 4, 8, 16, 32, 128):
    t = jax.random.uniform(key, (V, w), jnp.float32)
    timeit(make_loop(g_take_barrier), t, idx0, label=f"take+barrier (V,{w})")

# small-table sweep (does table size matter? VMEM residency)
for v in (4096, 16384, 65536, 1 << 20):
    t = jax.random.uniform(key, (v, 10), jnp.float32)
    i = idx0 % v
    timeit(make_loop(g_take_barrier), t, i, label=f"take+barrier V={v}")

# Pallas probes --------------------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PALLAS {name}: OK, {np.asarray(out).ravel()[:2]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"PALLAS {name}: REJECTED: {msg}")
        return False


def k_take(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


def k_index(table_ref, idx_ref, out_ref):
    out_ref[:] = table_ref[idx_ref[:]]


def k_take_along(table_ref, idx_ref, out_ref):
    i = idx_ref[:][:, None]
    out_ref[:] = jnp.take_along_axis(
        table_ref[:], jnp.broadcast_to(i, (B, 10)), axis=0)


def k_onedim(table_ref, idx_ref, out_ref):
    # gather on a 1-D table (column 0 only)
    out_ref[:] = jnp.take(table_ref[:, 0], idx_ref[:], axis=0)


def k_dynslice_loop(table_ref, idx_ref, out_ref):
    # serial per-index dynamic slice, 8 lanes unrolled (expected slow,
    # but does it compile?)
    def body(j, _):
        r = table_ref[pl.ds(idx_ref[j], 1), :]
        out_ref[pl.ds(j, 1), :] = r
        return 0
    jax.lax.fori_loop(0, B, body, 0)


for name, kern in [("take", k_take), ("index", k_index),
                   ("take_along", k_take_along), ("onedim", k_onedim)]:
    probe(name, lambda kern=kern: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 10), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx0))

probe("onedim_small", lambda: pl.pallas_call(
    k_onedim,
    out_shape=jax.ShapeDtypeStruct((B, 10), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table[:4096], idx0 % 4096))
