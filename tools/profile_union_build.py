"""Profile the union-grid scene build (volume/union.py + build_scene):
the host-side build rides bench.py's driver-timeout budget, so its
wall matters almost as much as the render rate."""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid
from vpt_tpu.volume.union import resample_union_grid

RES = int(os.environ.get("PROBE_RES", 320))
N_INST = int(os.environ.get("PROBE_INSTANCES", 1024))


def blob(n=24):
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    base = np.clip(1.0 - r / (n / 3.2), 0.0, 1.0)
    ang = np.sin(x * 0.4) * np.sin(y * 0.35) * np.sin(z * 0.3)
    dens = np.clip(base * (0.5 + 0.8 * ang), 0.0, 1.0).astype(np.float32)
    return HostGrid(density_zyx=dens, emission_zyx=None, color_zyx=None,
                    bbox_min=np.zeros(3, np.int32),
                    dim=np.array([n, n, n], np.int32),
                    transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
                    max_density=float(dens.max()), min_density=1e-6)


def cloud_xforms(n_inst, seed=7):
    rng = np.random.RandomState(seed)
    ids, xforms = [], []
    for _ in range(n_inst):
        t = np.array([rng.uniform(0, 120), rng.uniform(0, 14),
                      rng.uniform(0, 120)])
        s = rng.uniform(0.7, 1.6)
        xf = np.diag([0.1 * s, 0.1 * s, 0.1 * s, 1.0])
        xf[3, :3] = t
        ids.append(0)
        xforms.append(xf)
    return ids, xforms


if __name__ == "__main__":
    cloud = blob()
    ids, xforms = cloud_xforms(N_INST)
    t0 = time.time()
    u = resample_union_grid([cloud], ids, xforms, resolution=RES)
    t1 = time.time()
    print(f"resample {t1 - t0:.1f}s  dim {u.dim}  "
          f"occ {(u.density_zyx > 0).mean():.3f}", flush=True)
    pr = cProfile.Profile()
    pr.enable()
    s = build_scene([u], corner_dtype="bfloat16")
    pr.disable()
    print(f"build_scene {time.time() - t1:.1f}s", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(22)
