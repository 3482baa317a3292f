"""Do consecutive row gathers pipeline?  Compare N iterations of 1
gather vs N/2 iterations of 2 (speculatively independent) gathers vs
N/4 iterations of 4."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

B = 16384
V = 106496
TOTAL = 64  # total gathers per lane in every variant
key = jax.random.PRNGKey(0)
tbl = jnp.asarray(np.random.RandomState(0).standard_normal(
    (V, 10)).astype(np.float32))


def timeit(fn, label, iters=6):
    out = jax.block_until_ready(fn())
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:8.2f} ms  "
          f"{best/TOTAL/B*1e9:6.2f} ns/lane/gather", flush=True)


def variant(k):
    """TOTAL/k iterations, k gathers each.  Within an iteration the k
    positions are computed up-front (speculative steps), so the k
    gathers have no data dependence on each other."""
    n_it = TOTAL // k

    @jax.jit
    def run():
        def body(i, s):
            t, acc = s
            uu = jax.random.uniform(jax.random.fold_in(key, i), (B, k))
            rows_sum = jnp.zeros(B)
            flats = []
            for j in range(k):
                t = t + uu[:, j]
                flats.append((t * 977.0).astype(jnp.int32) % V)
            flats = jax.lax.optimization_barrier(tuple(flats))
            for j in range(k):
                rows = jnp.take(tbl, flats[j], axis=0)
                rows_sum = rows_sum + rows.sum(-1)
            (rows_sum,) = jax.lax.optimization_barrier((rows_sum,))
            return (t + rows_sum * 1e-12, acc + rows_sum)
        return jax.lax.fori_loop(0, n_it, body,
                                 (jnp.arange(B, dtype=jnp.float32) * 0.37,
                                  jnp.zeros(B)))
    return run


for k in (1, 2, 4, 8):
    timeit(variant(k), f"{TOTAL//k:3d} iters x {k} gathers")
