"""Config-5 instance scale: per-cell instance lists in the majorant
grid (the flat analog of OCTNode.vol_indices[600], AABB.h:217-234) and
the gather-over-candidates density sum (render_kernel.cu:1003-1014)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.core.camera import Camera
from vpt_tpu.core.vecmath import transform_point
from vpt_tpu.ops import trilinear
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.tracking import (_scene_density_cells, scene_density,
                                     scene_emission)
from vpt_tpu.scene.scene import build_scene

from tests.test_scenarios import _blob_grid


def _instanced_scene(n_side=3, spacing=6.0, jitter=0.0, seed=0,
                     emission=False, threshold=8, scale=1.0):
    """n_side^3 instances of one blob grid on a jittered lattice."""
    rng = np.random.RandomState(seed)
    grid = _blob_grid(n=12, emission=emission)
    ids, xforms = [], []
    for i in range(n_side ** 3):
        iz, iy, ix = np.unravel_index(i, (n_side,) * 3)
        t = (np.array([ix, iy, iz], np.float64) * spacing
             + rng.uniform(-jitter, jitter, 3))
        xf = np.diag([0.2 * scale, 0.2 * scale, 0.2 * scale, 1.0])
        xf[3, :3] = t
        ids.append(0)
        xforms.append(xf)
    return build_scene([grid], instance_grid_ids=ids, instance_xforms=xforms,
                       instance_list_threshold=threshold)


def _loop_density(scene, pos):
    """The reference static-loop density sum (bypasses dispatch)."""
    total = jnp.zeros(pos.shape[:-1], jnp.float32)
    for i in range(scene.instances.count):
        ipos = transform_point(scene.instances.inv_xform[i], pos)
        total = total + trilinear.sample_density(
            scene.atlas, scene.instances.grid_id[i], ipos)
    return total


def _sample_points(scene, n=4096, seed=1):
    rng = np.random.RandomState(seed)
    lo = np.asarray(scene.root_pmin)
    hi = np.asarray(scene.root_pmax)
    return jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))


def test_cell_lists_built_above_threshold():
    s_small = _instanced_scene(n_side=2)          # 8 <= threshold
    s_big = _instanced_scene(n_side=3)            # 27 > threshold
    assert s_small.majorant.cell_instances is None
    assert s_big.majorant.cell_instances is not None
    K = s_big.majorant.cell_instances.shape[-1]
    assert 1 <= K <= 27


def test_cell_list_density_matches_static_loop():
    """Gather-over-candidates == sum over ALL instances, everywhere
    (overlapping instances included via jitter)."""
    scene = _instanced_scene(n_side=3, spacing=3.0, jitter=2.0)
    assert scene.majorant.cell_instances is not None
    pos = _sample_points(scene)
    d_cells = np.asarray(_scene_density_cells(scene, pos))
    d_loop = np.asarray(_loop_density(scene, pos))
    assert (d_loop > 0).sum() > 50  # the probe actually hits volumes
    np.testing.assert_allclose(d_cells, d_loop, rtol=1e-5, atol=1e-6)


def test_cell_list_emission_matches_static_loop():
    scene = _instanced_scene(n_side=3, spacing=3.0, jitter=1.0,
                             emission=True)
    params = RenderParams(emission_scale=1.0)
    pos = _sample_points(scene, n=1024)
    e_cells = np.asarray(scene_emission(scene, pos, params))
    scene_loop = dataclasses.replace(
        scene, majorant=dataclasses.replace(scene.majorant,
                                            cell_instances=None))
    e_loop = np.asarray(scene_emission(scene_loop, pos, params))
    np.testing.assert_allclose(e_cells, e_loop, rtol=1e-5, atol=1e-6)


def test_step_cost_independent_of_instance_count():
    """The jaxpr of one density fetch has the same gather count for 27
    and 125 instances (same K): per-step work is bounded by the
    per-cell overlap, not the scene size."""
    def gather_count(scene, pos):
        jaxpr = jax.make_jaxpr(lambda p: scene_density(scene, p))(pos)
        return sum(1 for eqn in jaxpr.eqns for _ in [0]
                   if eqn.primitive.name == "gather") + str(
                       jaxpr).count("gather[")

    s27 = _instanced_scene(n_side=3, spacing=8.0)
    s125 = _instanced_scene(n_side=5, spacing=8.0)
    K27 = s27.majorant.cell_instances.shape[-1]
    K125 = s125.majorant.cell_instances.shape[-1]
    assert K27 == K125, "lattice spacing should bound overlap identically"
    pos = _sample_points(s27, n=256)
    assert gather_count(s27, pos) == gather_count(s125, pos)


def test_instanced_render_matches_loop_render():
    """End-to-end fused render with cell lists ≈ static-loop render
    (same RNG; only the density-fetch path differs)."""
    scene = _instanced_scene(n_side=3, spacing=4.0, jitter=1.0)
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    d = float(np.linalg.norm(np.asarray(scene.root_pmax)
                             - np.asarray(scene.root_pmin)))
    cam = Camera.make(c + np.array([0.0, 0.2 * d, 1.2 * d]), c, vfov=45.0,
                      aspect=1.0)
    scene = dataclasses.replace(scene, camera=cam)
    scene_loop = dataclasses.replace(
        scene, majorant=dataclasses.replace(scene.majorant,
                                            cell_instances=None))
    params = RenderParams(width=24, height=24, ray_depth=4,
                          max_track_steps=96, max_fused_steps=256,
                          environment_type=int(Environment.CONSTANT))
    from vpt_tpu.render.renderer import ProgressiveRenderer
    f_cells = ProgressiveRenderer(scene, params).render(4)
    f_loop = ProgressiveRenderer(scene_loop, params).render(4)
    a, b = np.asarray(f_cells.accum), np.asarray(f_loop.accum)
    assert np.isfinite(a).all()
    assert a.mean() > 0
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_drop_raw_density_renders_identically():
    """keep_raw_density=False (memory flag for production volumes):
    the corner table alone serves the engines bit-identically."""
    from tests.test_scenarios import _blob_grid
    grid = _blob_grid()
    s1 = build_scene([grid])
    s2 = build_scene([grid], keep_raw_density=False)
    assert s2.atlas.density.shape[0] == 1  # placeholder only
    c = (np.asarray(s1.root_pmin) + np.asarray(s1.root_pmax)) / 2
    d = float(np.linalg.norm(np.asarray(s1.root_pmax)
                             - np.asarray(s1.root_pmin)))
    cam = Camera.make(c + np.array([0.0, 0.2 * d, 1.2 * d]), c, vfov=45.0,
                      aspect=1.0)
    s1 = dataclasses.replace(s1, camera=cam)
    s2 = dataclasses.replace(s2, camera=cam)
    params = RenderParams(width=16, height=16, ray_depth=3,
                          max_track_steps=48, max_fused_steps=128,
                          environment_type=int(Environment.CONSTANT))
    from vpt_tpu.render.renderer import ProgressiveRenderer
    a = np.asarray(ProgressiveRenderer(s1, params).render(2).accum)
    b = np.asarray(ProgressiveRenderer(s2, params).render(2).accum)
    np.testing.assert_array_equal(a, b)
