"""Backend-drift check: render the golden corpus scenes on the REAL
TPU and compare against the committed CPU goldens with the same
MC-aware tolerances as tests/test_golden.py.

The corpus realizations are CPU-generated; TPU float behavior
(fusions, transcendental approximations) makes renders only
STATISTICALLY equal, so this uses the mean/tile tolerances, not
bitwise comparison.  Run: python tools/run_golden_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")

import numpy as np

from tests.golden_scenes import ENGINES, render, scenes
from tests.test_golden import _compare


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          flush=True)
    gold_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    sc = scenes()
    failures = []
    for engine, names in ENGINES.items():
        for name in names:
            path = os.path.join(gold_dir, f"{name}__{engine}.npz")
            if not os.path.exists(path):
                continue
            want = np.load(path)["accum"]
            scene, params = sc[name]
            got = np.asarray(render(scene, params, engine))
            try:
                _compare(got, want, tol_scale=20.0, label=f"{name}/{engine}")
                print(f"ok   {name}/{engine}  mean {got.mean():.5f} "
                      f"(cpu {want.mean():.5f})", flush=True)
            except AssertionError as e:
                failures.append((name, engine, str(e)))
                print(f"FAIL {name}/{engine}: {e}", flush=True)
    print(f"# {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
