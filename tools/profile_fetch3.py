"""Gather lowering variants: row width, batch size, index mode."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

N = 64
V = 106496  # ~dragon-size, multiple of 128
key = jax.random.PRNGKey(0)

rng = np.random.RandomState(0)


def timeit(fn, label, B, iters=4):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:8.2f} ms  {dt/N/B*1e9:7.2f} ns/lane/iter",
          flush=True)


def gather_loop(tbl, B, take):
    @jax.jit
    def run():
        def body(i, s):
            t, acc = s
            uu = jax.random.uniform(jax.random.fold_in(key, i), (B,))
            t = t + uu
            flat = (t * 977.0).astype(jnp.int32) % V
            (flat,) = jax.lax.optimization_barrier((flat,))
            rows = take(tbl, flat)
            (rows,) = jax.lax.optimization_barrier((rows,))
            acc = acc + (rows if rows.ndim == 1 else rows.sum(-1))
            return (t, acc)
        return jax.lax.fori_loop(
            0, N, body, (jnp.arange(B, dtype=jnp.float32) * 0.37,
                         jnp.zeros(B)))
    return run


def t_take(tbl, flat):
    return jnp.take(tbl, flat, axis=0)


def t_index(tbl, flat):
    return tbl[flat]


def t_unsafe(tbl, flat):
    from jax import lax
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    return lax.gather(tbl, flat[:, None], dnums,
                      slice_sizes=(1, tbl.shape[1]),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


tbl10 = jnp.asarray(rng.standard_normal((V, 10)).astype(np.float32))
timeit(gather_loop(tbl10, 16384, t_unsafe), "unsafe w= 10 B=16k", 16384)
for B in (4096, 65536, 262144):
    timeit(gather_loop(tbl10, B, t_take), f"take  w= 10 B={B//1024}k", B)

# bf16 table
tblb = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32)).astype(
    jnp.bfloat16)
timeit(gather_loop(tblb, 16384,
                   lambda t, f: jnp.take(t, f, axis=0).astype(jnp.float32)),
       "take bf16 w=16 B=16k", 16384)
