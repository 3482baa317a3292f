"""Union-grid resampling (volume/union.py): field accuracy against the
exact multi-instance fetch, and render-level agreement of the
collapsed scene with the exact instanced path."""

import dataclasses

import numpy as np
import pytest

from tests.golden_scenes import _blob
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.union import build_union_scene, resample_union_grid


def _instanced(n_side=3, n=16, seed=3):
    rng = np.random.RandomState(seed)
    ids, xforms = [], []
    for i in range(n_side ** 3):
        iz, iy, ix = np.unravel_index(i, (n_side,) * 3)
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = (np.array([ix, iy, iz], np.float64) * 3.0
                     + rng.uniform(-0.8, 0.8, 3))
        ids.append(0)
        xforms.append(xf)
    return [_blob(n=n)], ids, xforms


def test_union_density_matches_exact_fetch():
    grids, ids, xforms = _instanced()
    union = resample_union_grid(grids, ids, xforms, resolution=192)
    scene = build_scene(grids, instance_grid_ids=ids,
                        instance_xforms=xforms)

    from vpt_tpu.render.tracking import scene_density
    rng = np.random.RandomState(0)
    lo = np.asarray(scene.root_pmin)
    hi = np.asarray(scene.root_pmax)
    pts = rng.uniform(lo, hi, size=(4000, 3)).astype(np.float32)
    exact = np.asarray(scene_density(scene, pts))

    uscene = build_scene([union], corner_dtype="float32")
    u = np.asarray(scene_density(uscene, pts))
    # smooth blobs at ~2x instance-voxel pitch: small pointwise error
    err = np.abs(u - exact).mean()
    assert err < 0.02 * max(exact.max(), 1e-6), (err, exact.max())
    # integral (mean) agreement is tighter
    assert abs(u.mean() - exact.mean()) / max(exact.mean(), 1e-9) < 0.02


@pytest.mark.parametrize("cached", [False, True])
def test_union_render_matches_exact(cached):
    grids, ids, xforms = _instanced()
    kw = dict(width=32, height=32, ray_depth=4, max_track_steps=64,
              max_fused_steps=256,
              environment_type=int(Environment.CONSTANT))
    scene = build_scene(grids, instance_grid_ids=ids,
                        instance_xforms=xforms)
    uscene = build_union_scene(grids, ids, xforms, resolution=192)
    from tests.golden_scenes import _camera
    scene = _camera(scene)
    uscene = dataclasses.replace(uscene, camera=scene.camera)

    params = RenderParams(**kw)
    uparams = params
    if cached:
        from vpt_tpu.accel.shadow import attach_shadow_cache
        uscene = attach_shadow_cache(uscene, azimuth=150.0, elevation=30.0)
        uparams = params.replace(shadow_mode="cached")

    a = np.asarray(ProgressiveRenderer(scene, params).render(8).accum)
    b = np.asarray(ProgressiveRenderer(uscene, uparams).render(8).accum)
    assert np.isfinite(b).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.08, (a.mean(), b.mean())


def test_union_error_estimators_and_auto_resolution():
    """union_field_error (built grid) and union_error_at_resolution
    (build-free estimate) agree with each other and shrink with
    resolution; choose_union_resolution picks the coarsest candidate
    inside the budget (VERDICT r4 #3: the approximation's error is
    measured per run, not assumed)."""
    from vpt_tpu.volume.union import (choose_union_resolution,
                                     resample_union_grid,
                                     union_error_at_resolution,
                                     union_field_error)
    grids, ids, xforms = _instanced()
    union = resample_union_grid(grids, ids, xforms, resolution=160)
    err_built = union_field_error(union, grids, ids, xforms, n=1500,
                                  seed=1)
    err_est = union_error_at_resolution(grids, ids, xforms, 160,
                                        n=1500, seed=1)
    assert err_built < 0.2
    # same quantity, same points: the estimator tracks the built grid
    assert abs(err_built - err_est) < 0.3 * max(err_built, err_est, 1e-3)

    err_coarse = union_error_at_resolution(grids, ids, xforms, 48,
                                           n=1500, seed=1)
    assert err_coarse > err_est  # finer grids resample tighter

    res, err = choose_union_resolution(
        grids, ids, xforms, error_budget=max(err_est * 1.5, 1e-3),
        candidates=(48, 160, 224), n=1500, seed=1)
    assert res in (48, 160)
    assert err <= max(err_est * 1.5, 1e-3)


def test_union_render_mean_at_bench_coarseness():
    """The bench cloudscape runs the union at cell ~4x the instance
    voxel, where POINTWISE field error reaches ~0.35 (QUIRKS #30).
    This pins what actually matters at that coarseness: the RENDER
    mean (ray line integrals average the blur) stays within 10% of
    the exact instanced path."""
    grids, ids, xforms = _instanced()
    kw = dict(width=32, height=32, ray_depth=4, max_track_steps=64,
              max_fused_steps=256,
              environment_type=int(Environment.CONSTANT))
    scene = build_scene(grids, instance_grid_ids=ids,
                        instance_xforms=xforms)
    # resolution 12 over a ~9.6-unit extent = 0.8-unit cells vs the
    # 0.2-unit instance voxels: the bench's 4x coarseness ratio
    uscene = build_union_scene(grids, ids, xforms, resolution=12)
    from vpt_tpu.volume.union import union_field_error, resample_union_grid
    ferr = union_field_error(resample_union_grid(grids, ids, xforms, 12),
                             grids, ids, xforms, n=1500, seed=2)
    p = RenderParams(**kw)
    f_exact = ProgressiveRenderer(scene, p).render(24)
    f_union = ProgressiveRenderer(uscene, p).render(24)
    a = float(np.asarray(f_union.accum).mean())
    b = float(np.asarray(f_exact.accum).mean())
    assert b > 0
    rel = abs(a - b) / b
    assert rel < 0.10, (rel, ferr)
    # the pointwise error at this coarseness is genuinely large —
    # the render-mean bound is the meaningful one (QUIRKS #30)
    assert ferr > 0.1, ferr
