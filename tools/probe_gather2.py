"""Honest gather probe: force real device execution via scalar fetch.

Findings from probe 1: block_until_ready through the axon tunnel does
NOT reliably block; use float(...) scalar fetches to force.
"""

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
ITERS = 24

key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (V, 10), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, V)


def timeit(fn, *args, n=8, label=""):
    s = float(fn(*args))  # compile + force
    t0 = time.time()
    for _ in range(n):
        s += float(fn(*args))
    dt = (time.time() - t0) / n
    per_index = dt / (B * ITERS) * 1e9
    print(f"{label}: {dt*1000:.2f} ms/call  {per_index:.2f} ns/index "
          f"(sum={s:.1f})", flush=True)
    return dt


def make_loop(gather_fn, iters=ITERS):
    @jax.jit
    def run(table, idx):
        def body(i, carry):
            acc, idx = carry
            rows = gather_fn(table, idx)
            acc = acc + rows.reshape(B, -1).sum(-1)
            # next indices depend on gathered data (defeats elision
            # and hoisting, like real tracking steps)
            idx = (idx + acc.astype(jnp.int32) + i) % V
            return acc, idx
        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros(B, jnp.float32), idx))
        return acc.sum()
    return run


def g_take(t, i):
    return jnp.take(t, i, axis=0)


def g_take_barrier(t, i):
    (i,) = jax.lax.optimization_barrier((i,))
    r = jnp.take(t, i, axis=0)
    (r,) = jax.lax.optimization_barrier((r,))
    return r


# RTT floor: empty scalar fetch
z = jnp.float32(0)
t0 = time.time()
for _ in range(8):
    float(z + 1)
print(f"scalar-fetch RTT floor: {(time.time()-t0)/8*1000:.2f} ms", flush=True)

timeit(make_loop(g_take), table, idx0, label="in-loop take (V,10)")
timeit(make_loop(g_take_barrier), table, idx0, label="in-loop take+barrier")

for w in (1, 4, 8, 16, 64, 128):
    t = jax.random.uniform(key, (V, w), jnp.float32)
    timeit(make_loop(g_take_barrier), t, idx0, label=f"take+barrier (V,{w})")

for v in (4096, 65536, 1 << 20, 1 << 23):
    t = jax.random.uniform(key, (v, 10), jnp.float32)
    timeit(make_loop(g_take_barrier), t, idx0 % v,
           label=f"take+barrier V={v}")

# batch-size scaling at fixed total work
for b in (8192, 32768, 131072):
    i = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, V)
    fn = make_loop(g_take_barrier)

    @jax.jit
    def runb(table, idx, b=b):
        def body(i_, carry):
            acc, idx = carry
            (idx,) = jax.lax.optimization_barrier((idx,))
            rows = jnp.take(table, idx, axis=0)
            (rows,) = jax.lax.optimization_barrier((rows,))
            acc = acc + rows.sum(-1)
            idx = (idx + acc.astype(jnp.int32) + i_) % V
            return acc, idx
        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(b, jnp.float32), idx))
        return acc.sum()

    s = float(runb(table, i))
    t0 = time.time()
    for _ in range(8):
        s += float(runb(table, i))
    dt = (time.time() - t0) / 8
    print(f"B={b}: {dt*1000:.2f} ms/call  {dt/(b*ITERS)*1e9:.2f} ns/index",
          flush=True)

# Pallas 1-D gather (fixed out shape) ---------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        s = float(np.asarray(out).ravel()[0])
        print(f"PALLAS {name}: OK ({s:.3f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"PALLAS {name}: REJECTED: {msg}", flush=True)
        return False


def k_onedim(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


ok1d = probe("take-1d (V,)->(B,)", lambda: pl.pallas_call(
    k_onedim,
    out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table[:, 0].copy(), idx0))


def k_onedim2d(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


probe("take-1d 2dshape (V,)->(B/128,128)", lambda: pl.pallas_call(
    k_onedim2d,
    out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table[:, 0].copy(), (idx0 % V).reshape(B // 128, 128)))

if ok1d:
    # time it in a loop-with-dependency inside ONE pallas call
    def k_loop(tab_ref, idx_ref, out_ref):
        def body(i, carry):
            acc, idx = carry
            r = jnp.take(tab_ref[:], idx, axis=0)
            acc = acc + r
            idx = (idx + acc.astype(jnp.int32) + i) % V
            return acc, idx
        acc, _ = jax.lax.fori_loop(
            0, ITERS, body,
            (jnp.zeros_like(out_ref), idx_ref[:]))
        out_ref[:] = acc

    def run_pallas():
        return pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table[:, 0].copy(), idx0)

    if probe("loop-take-1d", run_pallas):
        tab1 = table[:, 0].copy()
        f = jax.jit(lambda t, i: pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i).sum())
        s = float(f(tab1, idx0))
        t0 = time.time()
        for _ in range(8):
            s += float(f(tab1, idx0))
        dt = (time.time() - t0) / 8
        print(f"PALLAS loop-take-1d: {dt*1000:.2f} ms/call "
              f"{dt/(B*ITERS)*1e9:.2f} ns/index", flush=True)
