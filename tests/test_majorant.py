"""Majorant/occupancy grid: construction invariants and estimator
equivalence (SURVEY.md §7 hard part 5: skipping must not change the
radiance distribution)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.accel.majorant import cell_exit_t
from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import load_vdb_scene

DRAGON = "/root/reference/assets/dragon.vdb"


@pytest.fixture(scope="module")
def scene():
    lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
    s = load_vdb_scene(DRAGON, lights=lights, majorant_resolution=48)
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
    return dataclasses.replace(s, camera=cam)


def test_majorant_is_conservative(scene):
    """Every nonzero density voxel must land in an occupied cell whose
    majorant >= the voxel value."""
    from vpt_tpu.volume.grid import load_vdb_grid
    g = load_vdb_grid(DRAGON)
    d = g.density_zyx
    zz, yy, xx = np.nonzero(d > 0)
    ipos = np.stack([xx, yy, zz], -1).astype(np.float64) + g.bbox_min + 0.5
    wpos = ipos @ g.transform[:3, :3] + g.transform[3, :3]
    R = scene.majorant.occupied.shape[0]
    pmin = np.asarray(scene.root_pmin, np.float64)
    pmax = np.asarray(scene.root_pmax, np.float64)
    ci = np.clip(((wpos - pmin) / (pmax - pmin) * R).astype(int), 0, R - 1)
    occ = np.asarray(scene.majorant.occupied)
    cmax = np.asarray(scene.majorant.max_density)
    assert occ[ci[:, 2], ci[:, 1], ci[:, 0]].all()
    assert (cmax[ci[:, 2], ci[:, 1], ci[:, 0]] >= d[zz, yy, xx] - 1e-6).all()


def test_cell_exit_advances(scene):
    R = scene.majorant.occupied.shape[0]
    pos = jnp.asarray(((np.asarray(scene.root_pmin)
                        + np.asarray(scene.root_pmax)) / 2)[None], jnp.float32)
    d = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    t = cell_exit_t(scene.root_pmin, scene.root_pmax, R, pos, d)
    cell_x = float((scene.root_pmax[0] - scene.root_pmin[0]) / R)
    assert 0.0 < float(t[0]) <= cell_x + 1e-5


def test_skipping_preserves_estimator(scene):
    """Mean image with occupancy skipping ≈ without (same distribution)."""
    p = RenderParams(width=24, height=24, ray_depth=6, max_track_steps=128,
                     environment_type=int(Environment.BLACK))
    f_on = ProgressiveRenderer(scene, p).render(24)
    f_off = ProgressiveRenderer(
        scene, dataclasses.replace(p, use_majorant=False)).render(24)
    m_on = float(np.asarray(f_on.accum).mean())
    m_off = float(np.asarray(f_off.accum).mean())
    assert m_off > 0
    assert abs(m_on - m_off) / m_off < 0.15, (m_on, m_off)


def test_octant_boxes_anchored_empty():
    """Per-(octant x major) anchored boxes contain no occupied voxel
    (grid._octant_box_extents; native sweep and numpy fallback agree —
    the native path is exercised when native/build exists)."""
    from vpt_tpu.volume.grid import _octant_box_extents
    rng = np.random.RandomState(3)
    occ = rng.rand(18, 22, 15) > 0.9
    ext = _octant_box_extents(occ)
    zz, yy, xx = np.nonzero(~occ)
    sel = rng.choice(zz.size, size=min(60, zz.size), replace=False)
    for i in sel:
        v = (int(xx[i]), int(yy[i]), int(zz[i]))
        for o in range(8):
            for m in range(3):
                e = ext[9 * o + 3 * m:9 * o + 3 * m + 3,
                        v[2], v[1], v[0]].astype(int)
                sx, sy, sz = o & 1, (o >> 1) & 1, (o >> 2) & 1
                x0, x1 = (v[0], v[0] + e[0]) if sx else (v[0] - e[0], v[0])
                y0, y1 = (v[1], v[1] + e[1]) if sy else (v[1] - e[1], v[1])
                z0, z1 = (v[2], v[2] + e[2]) if sz else (v[2] - e[2], v[2])
                box = occ[max(z0, 0):z1 + 1, max(y0, 0):y1 + 1,
                          max(x0, 0):x1 + 1]
                assert not box.any(), (v, o, m, e)


def test_octant_boxes_preserve_estimator(scene):
    """Octant skip jumps only cross provably-empty space: the mean
    image with/without them agrees.  Atlas octant boxes default OFF
    (wall break-even vs their build/HBM cost — tools/probe_octant_ab),
    so the "on" scene requests them explicitly; the module fixture is
    the control."""
    assert scene.atlas.octant_cols == 0  # auto keeps them off
    p = RenderParams(width=24, height=24, ray_depth=6, max_track_steps=128,
                     environment_type=int(Environment.BLACK))
    lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]],
                              [300.0])
    s_on = load_vdb_scene("/root/reference/assets/dragon.vdb",
                          lights=lights, octant_boxes=True)
    s_on = dataclasses.replace(s_on, camera=scene.camera)
    assert s_on.atlas.octant_cols > 0
    f_on = ProgressiveRenderer(s_on, p).render(24)
    f_off = ProgressiveRenderer(scene, p).render(24)
    m_on = float(np.asarray(f_on.accum).mean())
    m_off = float(np.asarray(f_off.accum).mean())
    assert m_off > 0
    assert abs(m_on - m_off) / m_off < 0.15, (m_on, m_off)
