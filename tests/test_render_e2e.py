"""End-to-end render tests (CPU, small resolutions).

These are the BASELINE config-1 style integration scenarios: dragon.vdb
+ one point light, no atmosphere (SURVEY.md §4: golden tests with fixed
RNG keys and MC-noise-aware tolerances).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer, render_step
from vpt_tpu.render.film import Film
from vpt_tpu.scene.geometry import Sphere
from vpt_tpu.scene.scene import load_vdb_scene

DRAGON = "/root/reference/assets/dragon.vdb"


@pytest.fixture(scope="module")
def dragon_scene():
    lights = PointLights.make([[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0])
    scene = load_vdb_scene(DRAGON, lights=lights, sphere=Sphere.make())
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
    return dataclasses.replace(scene, camera=cam)


def _params(**kw):
    base = dict(width=32, height=32, ray_depth=8, max_track_steps=96,
                environment_type=int(Environment.BLACK))
    base.update(kw)
    return RenderParams(**base)


def test_render_nonzero_and_finite(dragon_scene):
    r = ProgressiveRenderer(dragon_scene, _params())
    film = r.render(4)
    a = np.asarray(film.accum)
    assert np.isfinite(a).all()
    assert a.min() >= 0.0
    # the dragon silhouette must light up some pixels
    assert (a.sum(-1) > 0).mean() > 0.05
    assert np.asarray(film.alpha).max() > 0.5


def test_deterministic_given_seed(dragon_scene):
    p = _params(seed=7)
    f1 = ProgressiveRenderer(dragon_scene, p).render(2)
    f2 = ProgressiveRenderer(dragon_scene, p).render(2)
    np.testing.assert_array_equal(np.asarray(f1.accum), np.asarray(f2.accum))


def test_different_seeds_differ(dragon_scene):
    f1 = ProgressiveRenderer(dragon_scene, _params(seed=1)).render(1)
    f2 = ProgressiveRenderer(dragon_scene, _params(seed=2)).render(1)
    assert np.abs(np.asarray(f1.accum) - np.asarray(f2.accum)).max() > 0


def test_progressive_accumulation_is_mean(dragon_scene):
    """accum after n iters == mean of the n per-iter values."""
    p = _params(width=16, height=16, ray_depth=4, max_track_steps=64)
    film = Film.zeros(16, 16)
    vals = []
    from vpt_tpu.core.rng import render_key
    from vpt_tpu.render.renderer import render_rays
    for it in range(3):
        v, _, _aux = render_rays(dragon_scene, p,
                                 render_key(p.seed, jnp.uint32(it)))
        vals.append(np.asarray(v))
        film = render_step(dragon_scene, p, film, jnp.uint32(it))
    np.testing.assert_allclose(np.asarray(film.accum),
                               np.mean(vals, axis=0), rtol=2e-4, atol=1e-5)


def test_no_light_no_env_is_black(dragon_scene):
    scene = dataclasses.replace(dragon_scene, lights=PointLights.empty())
    # sun NEE is always evaluated (direct_integrator, r_k.cu:1798);
    # a fully dark scene also needs sun_mult = 0
    p = _params(width=16, height=16).replace(sun_mult=0.0)
    film = ProgressiveRenderer(scene, p).render(2)
    np.testing.assert_allclose(np.asarray(film.accum), 0.0, atol=1e-6)


def test_constant_env_background(dragon_scene):
    """Pixels missing the volume see exactly sky_color * sky_mult."""
    p = _params(width=16, height=16,
                environment_type=int(Environment.CONSTANT))
    p = p.replace(sky_color=jnp.array([0.2, 0.4, 0.8]), sky_mult=1.0)
    film = ProgressiveRenderer(dragon_scene, p).render(1)
    a = np.asarray(film.accum)
    corner = a[0, 0]  # corner rays miss the volume bbox
    np.testing.assert_allclose(corner, [0.2, 0.4, 0.8], atol=1e-5)


def test_emission_off_adds_nothing(dragon_scene):
    """emission_scale=0 must early-out (render_kernel.cu:1286)."""
    p = _params(width=16, height=16)
    f0 = ProgressiveRenderer(dragon_scene, p).render(1)
    p2 = p.replace(emission_scale=0.0)
    f1 = ProgressiveRenderer(dragon_scene, p2).render(1)
    np.testing.assert_array_equal(np.asarray(f0.accum), np.asarray(f1.accum))


def test_bfloat16_corner_table():
    """corner_dtype='bfloat16' halves the unified corner table while
    keeping the safety guarantees (T_box rounds up, box extents round
    down) — render means agree with the f32 table within bf16's ~0.4%
    data precision + MC noise."""
    import dataclasses

    import ml_dtypes

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.render.renderer import ProgressiveRenderer
    from vpt_tpu.scene.scene import build_scene

    g = _blob_grid()
    base = dict(width=32, height=32, ray_depth=4, max_track_steps=64,
                max_fused_steps=512,
                environment_type=int(Environment.CONSTANT))
    means = {}
    for dt in ("float32", "bfloat16"):
        s = build_scene([g], corner_dtype=dt)
        s = dataclasses.replace(s, camera=_cam_for(s, 32, 32))
        if dt == "bfloat16":
            assert s.atlas.density_corners.dtype == ml_dtypes.bfloat16
            # conservative rounding: T_box never below, extents never
            # above their f32 counterparts
            f32 = np.asarray(build_scene([g]).atlas.density_corners)
            b = np.asarray(s.atlas.density_corners).astype(np.float32)
            assert (b[:, 8] >= f32[:, 8] - 1e-12).all()
            assert (b[:, 9:15] <= f32[:, 9:15] + 1e-12).all()
        film = ProgressiveRenderer(
            s, RenderParams(engine="fused", **base)).render(16)
        means[dt] = float(np.asarray(film.accum).mean())
    rel = abs(means["bfloat16"] - means["float32"]) / means["float32"]
    assert rel < 0.03, means
