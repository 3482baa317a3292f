"""Measure the march engine on config 1 + mean agreement vs fused."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PROFILE_BASELINE"] = "0"
import numpy as np  # noqa: E402

from tools.profile_fused import P, bench, scene  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vpt_tpu.render.film import Film  # noqa: E402
from vpt_tpu.render.renderer import render_step  # noqa: E402

M = P.replace(engine="march")
_, film_m = bench(M, "march/160/96", iters=16)
_, film_f = bench(P.replace(block_tiles=0), "fused/16384", iters=16)
a, b = np.asarray(film_m.accum), np.asarray(film_f.accum)
print("march mean:", a.mean(), "fused mean:", b.mean(),
      "rel:", abs(a.mean() - b.mean()) / b.mean())
for ms, ss in ((96, 64), (128, 64), (224, 128)):
    bench(M.replace(march_samples=ms, shadow_samples=ss),
          f"march/{ms}/{ss}", iters=16)
for tile in (16384, 65536):
    bench(M.replace(march_tile=tile), f"march/tile={tile}", iters=16)
