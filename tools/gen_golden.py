"""Generate the golden-image regression corpus (tests/golden/*.npz).

Run on CPU:  python tools/gen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.golden_scenes import ENGINES, render, scenes  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    sc = scenes()
    for engine, names in ENGINES.items():
        for name in names:
            scene, params = sc[name]
            img = render(scene, params, engine)
            path = os.path.join(out_dir, f"{name}__{engine}.npz")
            np.savez_compressed(path, accum=img.astype(np.float32))
            print(f"wrote {path}  mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
