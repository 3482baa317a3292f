"""Full-resolution (256x64 / 32x128x256x8) Bruneton precompute on the
real TPU — round-1 reported a fault through the axon tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

from vpt_tpu.sky import bruneton as br

dims = br.LutDims()  # full production sizes (constants.h:50-62)
print("dims:", dims, flush=True)
p = br.default_model()
t0 = time.time()
luts = jax.jit(br.precompute,
               static_argnames=("dims", "num_scattering_orders"))(
    p, dims=dims, num_scattering_orders=4)
jax.block_until_ready(luts.transmittance)
s = float(np.asarray(luts.scattering).mean())
print(f"full-res precompute OK in {time.time()-t0:.1f}s, "
      f"scat mean={s:.6g}", flush=True)
print("finite:", all(bool(np.isfinite(np.asarray(t)).all())
                     for t in (luts.transmittance, luts.scattering,
                               luts.single_mie, luts.irradiance)))
out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "out", "atmo_fullres_cache.npz")
os.makedirs(os.path.dirname(out), exist_ok=True)
br.save_luts(out, luts)
print("cached to", out, flush=True)
