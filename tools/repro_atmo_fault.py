"""Minimal repro for the monolithic Bruneton precompute kernel fault
on the remote axon TPU runtime (docs/ISSUES.md #1, VERDICT r4 weak #7).

The full-resolution scattering-density stage
(sky/bruneton.py compute_scattering_density_lut — the 5-D
(r, mu, mu_s, nu) x 16-direction spherical quadrature,
atmosphere_kernels.cu:461-556 semantics) compiles fine but FAULTS the
remote TPU runtime when executed as ONE program over all r-slices at
production dims (constants.h:50-62: scattering texture 256x128x32).
Executed one r-slice per program (fz_values=(1,)), the identical math
runs to completion — that is what precompute_chunked does.

This script bisects the failing slice count on the real device:

    python tools/repro_atmo_fault.py            # full dims, bisect
    REPRO_DIMS=half python tools/repro_atmo_fault.py

Record the outcome in docs/ISSUES.md next to issue #1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import jax.numpy as jnp

from vpt_tpu.sky import bruneton as br

if os.environ.get("REPRO_DIMS") == "half":
    dims = br.LutDims(transmittance_w=128, transmittance_h=32, r=16,
                      mu=64, mu_s=16, nu=4, irradiance_w=32,
                      irradiance_h=8)
else:
    dims = br.LutDims()  # full production sizes (constants.h:50-62)

params = br.default_model()
print(f"dims: r={dims.r} mu={dims.mu} mu_s={dims.mu_s} nu={dims.nu}",
      flush=True)

t0 = time.time()
ttex = jax.jit(br.compute_transmittance_lut,
               static_argnames=("dims",))(params, dims=dims)
jax.block_until_ready(ttex)
direct_irr = br.compute_direct_irradiance_lut(params, ttex, dims)
ray_tex, mie_tex = br.compute_single_scattering_lut(params, ttex, dims)
jax.block_until_ready(ray_tex)
print(f"stage-1 LUTs ready in {time.time()-t0:.1f}s", flush=True)

multi = jnp.zeros_like(ray_tex)
sd_fn = jax.jit(br.compute_scattering_density_lut,
                static_argnames=("order", "dims"))

# bisect: how many r-slices can ONE program integrate before the
# runtime faults?  (1 is precompute_chunked's working mode; dims.r is
# the monolithic mode that faults.)
for n_slices in (1, 2, 4, 8, dims.r, None):
    fz = (None if n_slices is None
          else jnp.arange(n_slices, dtype=jnp.float32))
    label = "monolithic (fz=None)" if n_slices is None else f"{n_slices:3d}"
    t0 = time.time()
    try:
        out = sd_fn(params, ttex, ray_tex, mie_tex, multi, direct_irr,
                    order=2, dims=dims, fz_values=fz)
        jax.block_until_ready(out)
        print(f"n_slices={label}: OK   ({time.time()-t0:.1f}s, "
              f"out {out.shape})", flush=True)
    except Exception as e:  # noqa: BLE001 — the fault class varies
        print(f"n_slices={label}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        break
