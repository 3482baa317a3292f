"""Golden-image regression corpus: fixed-seed tiny renders of all five
BASELINE config analogs x engines, compared with MC-aware tolerances
(SURVEY §4 — the test layer the reference never had).

Goldens are produced by tools/gen_golden.py on the CPU backend; the
comparison tolerance is tight enough to catch estimator perturbations
(see test_golden_catches_perturbation) but loose enough for cross-
jaxlib fusion-rounding drift.
"""

import os

import numpy as np
import pytest

from tests.golden_scenes import ENGINES, SPP, render, scenes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# (mean-abs-error ceiling, correlation floor): identical RNG keys make
# renders near-deterministic; only cross-version fusion rounding drifts
MAE_TOL = 5e-3
CORR_MIN = 0.995


@pytest.fixture(scope="module")
def scene_table():
    return scenes()


def _cases():
    for engine, names in ENGINES.items():
        for name in names:
            yield engine, name


def _compare(img, golden, tol_scale: float = 1.0, label=""):
    """MC-aware comparison shared with tools/run_golden_tpu.py;
    tol_scale loosens for cross-backend runs (different float rounding
    can flip a collision accept and decorrelate the realization)."""
    img = np.asarray(img)
    mae = float(np.abs(img - golden).mean())
    denom = np.linalg.norm(img - img.mean()) * np.linalg.norm(
        golden - golden.mean())
    corr = float(((img - img.mean()) * (golden - golden.mean())).sum()
                 / max(denom, 1e-12))
    scale = max(float(golden.mean()), 1e-3)
    assert mae / scale < MAE_TOL * tol_scale, (label, mae, scale)
    assert corr > 1.0 - (1.0 - CORR_MIN) * tol_scale, (label, corr)


@pytest.mark.parametrize("engine,name", list(_cases()))
def test_golden(engine, name, scene_table):
    path = os.path.join(GOLDEN_DIR, f"{name}__{engine}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run tools/gen_golden.py ({path})")
    golden = np.load(path)["accum"]
    img = render(*scene_table[name], engine)
    _compare(img, golden, label=f"{engine}/{name}")


def test_golden_catches_perturbation(scene_table):
    """The tolerance actually rejects a deliberately perturbed
    estimator (a 5% density change)."""
    name = "c2_emission"
    path = os.path.join(GOLDEN_DIR, f"{name}__fused.npz")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    golden = np.load(path)["accum"]
    scene, params = scene_table[name]
    img = render(scene, params.replace(density_mult=1.05), "fused")
    mae = float(np.abs(img - golden).mean())
    scale = max(float(golden.mean()), 1e-3)
    assert mae / scale > MAE_TOL, "perturbation not detected; tighten tol"
