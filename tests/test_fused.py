"""Fused state-machine engine vs the reference-structured engine:
statistical equivalence within the MC noise floor."""

import dataclasses

import numpy as np
import pytest

from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.renderer import ProgressiveRenderer
from vpt_tpu.scene.scene import load_vdb_scene

DRAGON = "/root/reference/assets/dragon.vdb"


@pytest.fixture(scope="module")
def scene():
    s = load_vdb_scene(DRAGON, lights=PointLights.make(
        [[5.0, 8.0, 12.0]], [[1.0, 1.0, 1.0]], [300.0]))
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 10.0]), c, vfov=40.0, aspect=1.0)
    return dataclasses.replace(s, camera=cam)


BASE = dict(width=32, height=32, ray_depth=6, max_track_steps=96,
            max_fused_steps=768, environment_type=int(Environment.BLACK))


def test_fused_matches_reference_mean(scene):
    f_ref = ProgressiveRenderer(
        scene, RenderParams(engine="reference", **BASE)).render(16)
    f_fus = ProgressiveRenderer(
        scene, RenderParams(engine="fused", **BASE)).render(16)
    a = np.asarray(f_ref.accum)
    b = np.asarray(f_fus.accum)
    assert np.isfinite(b).all()
    assert (b >= 0).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_fused_volume_depth2_matches_reference(scene):
    """volume_depth is wired through the fused engine (VERDICT r2 #6):
    intermediate medium events scatter and re-march with NEE only at
    the loop-final interaction (render_kernel.cu:1786)."""
    kw = dict(BASE, volume_depth=2)
    f_ref = ProgressiveRenderer(
        scene, RenderParams(engine="reference", **kw)).render(16)
    f_fus = ProgressiveRenderer(
        scene, RenderParams(engine="fused", **kw)).render(16)
    a = np.asarray(f_ref.accum)
    b = np.asarray(f_fus.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_fused_deterministic(scene):
    p = RenderParams(engine="fused", seed=5, **BASE)
    f1 = ProgressiveRenderer(scene, p).render(2)
    f2 = ProgressiveRenderer(scene, p).render(2)
    np.testing.assert_array_equal(np.asarray(f1.accum), np.asarray(f2.accum))


def test_fused_dark_scene_black(scene):
    s = dataclasses.replace(scene, lights=PointLights.empty())
    p = RenderParams(engine="fused", **BASE).replace(sun_mult=0.0)
    film = ProgressiveRenderer(s, p).render(2)
    np.testing.assert_allclose(np.asarray(film.accum), 0.0, atol=1e-6)


def test_fused_alpha_matches(scene):
    f_ref = ProgressiveRenderer(
        scene, RenderParams(engine="reference", **BASE)).render(8)
    f_fus = ProgressiveRenderer(
        scene, RenderParams(engine="fused", **BASE)).render(8)
    a = np.asarray(f_ref.alpha)
    b = np.asarray(f_fus.alpha)
    assert abs(b.mean() - a.mean()) / max(a.mean(), 1e-9) < 0.1


def test_fused_ray_queues_match(scene):
    """rays_per_lane=4 (per-lane ray queues) is the same estimator as
    Q=1: each lane traces 4 rays sequentially, retiring and reloading
    inside the loop (round-3 utilization lever)."""
    f1 = ProgressiveRenderer(
        scene, RenderParams(engine="fused", **BASE)).render(16)
    f4 = ProgressiveRenderer(
        scene, RenderParams(engine="fused", rays_per_lane=4,
                            **BASE)).render(16)
    a = np.asarray(f1.accum)
    b = np.asarray(f4.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())
    aa = np.asarray(f1.alpha)
    ba = np.asarray(f4.alpha)
    assert abs(ba.mean() - aa.mean()) / max(aa.mean(), 1e-9) < 0.1


def test_fused_ray_queues_deterministic_and_guarded(scene):
    p = RenderParams(engine="fused", rays_per_lane=4, seed=3, **BASE)
    f1 = ProgressiveRenderer(scene, p).render(2)
    f2 = ProgressiveRenderer(scene, p).render(2)
    np.testing.assert_array_equal(np.asarray(f1.accum), np.asarray(f2.accum))
    # phase_counts/return_state stay unsupported under queues
    with pytest.raises(ValueError):
        from vpt_tpu.render.fused import fused_direct
        import jax.numpy as jnp
        fused_direct(scene, p, __import__("jax").random.PRNGKey(0),
                     jnp.zeros((8, 3)), jnp.ones((8, 3)), phase_counts=True)


def test_fused_ray_queues_hdri_deferred_env(scene):
    """Q>1 with an HDRI environment: terminal env light is retire-
    DEFERRED (beta/dir/pos out-arrays) and bulk-evaluated after the
    loop — must match the Q=1 estimator."""
    from vpt_tpu.scene.scene import attach_env_map
    H, W = 16, 32
    v = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    env = np.exp(-((v - 0.4) / 0.2) ** 2) * np.ones((H, W), np.float32)
    env_rgb = np.stack([env * 2.0, env * 1.2, env * 0.7], -1)
    s = attach_env_map(scene, env_rgb)
    kw = dict(BASE, environment_type=int(Environment.HDRI))
    f1 = ProgressiveRenderer(
        s, RenderParams(engine="fused", **kw)).render(16)
    f4 = ProgressiveRenderer(
        s, RenderParams(engine="fused", rays_per_lane=4, **kw)).render(16)
    a = np.asarray(f1.accum)
    b = np.asarray(f4.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_fused_emit_skip_halo_agreement():
    """EMIT empty-box jumping (emission-safe zero band): an emission
    SHELL living entirely where density == 0 is the adversarial case —
    if the skip field ignored emission support, the EMIT walk would
    jump straight over the glow and lose its energy.  _corner_pack
    folds the emission 3^3-majorant into the t==0 occupancy, so the
    fused estimator must still match the reference engine's mean
    (reference emission estimator: render_kernel.cu:1275-1339)."""
    from vpt_tpu.scene.scene import build_scene
    from vpt_tpu.volume.grid import HostGrid

    n = 32
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    dens = np.clip(1.0 - r / (n / 5.0), 0.0, 1.0).astype(np.float32)
    em = np.clip(1.0 - np.abs(r - n / 3.0) / (n / 10.0),
                 0.0, 1.0).astype(np.float32) * 0.8
    assert ((em > 0) & (dens == 0)).sum() > 1000  # the shell IS a halo
    g = HostGrid(density_zyx=dens, emission_zyx=em, color_zyx=None,
                 bbox_min=np.zeros(3, np.int32),
                 dim=np.array([n, n, n], np.int32),
                 transform=np.diag([0.2, 0.2, 0.2, 1.0]), voxel_size=0.2,
                 max_density=float(dens.max()), min_density=1e-6)
    s = build_scene([g])
    c = (np.asarray(s.root_pmin) + np.asarray(s.root_pmax)) / 2
    cam = Camera.make(c + np.array([0.0, 1.0, 8.0]), c, vfov=40.0,
                      aspect=1.0)
    s = dataclasses.replace(s, camera=cam)
    kw = dict(BASE, emission_scale=2.0, emission_pivot=1.0)
    f_ref = ProgressiveRenderer(
        s, RenderParams(engine="reference", **kw)).render(16)
    f_fus = ProgressiveRenderer(
        s, RenderParams(engine="fused", **kw)).render(16)
    a = np.asarray(f_ref.accum)
    b = np.asarray(f_fus.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert a.mean() > 0
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_strat_schedule_exact_permutation(scene):
    """Cost-stratified lane assignment (renderer.trace_rays) is a pure
    ray permutation: with density_mult=0 every ray's radiance is the
    deterministic HDRI lookup of its direction, so per-ray outputs must
    match the unstratified trace EXACTLY for any cost hint."""
    import jax
    import jax.numpy as jnp
    from vpt_tpu.render.renderer import trace_rays
    from vpt_tpu.scene.scene import attach_env_map
    H, W = 16, 32
    v = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    env = v * np.linspace(0.2, 1.0, W, dtype=np.float32)[None, :]
    env_rgb = np.stack([env, env * 0.5, env * 2.0], -1).astype(np.float32)
    s = attach_env_map(scene, env_rgb)
    B = 512
    key = jax.random.PRNGKey(5)
    d = jax.random.normal(key, (B, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(np.asarray(s.root_pmin) - 5.0,
                                     np.float32), (B, 3))
    kw = dict(BASE, environment_type=int(Environment.HDRI))
    hint = jax.random.uniform(jax.random.PRNGKey(9), (B,)) * 100.0
    p_on = RenderParams(engine="fused", rays_per_lane=4, fused_tile=256,
                        density_mult=0.0, **kw)
    p_off = p_on.replace(strat_schedule=False)
    L1, a1, _ = trace_rays(s, p_off, key, o, d, cost_hint=hint)
    L2, a2, _ = trace_rays(s, p_on, key, o, d, cost_hint=hint)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-7)


def test_strat_schedule_progressive_match(scene):
    """Stratified scheduling through the progressive loop (film cost
    AOV as the hint) is the same estimator as unstratified queues."""
    p = RenderParams(engine="fused", rays_per_lane=4, **BASE)
    f_on = ProgressiveRenderer(scene, p).render(16)
    f_off = ProgressiveRenderer(
        scene, p.replace(strat_schedule=False)).render(16)
    a = np.asarray(f_off.accum)
    b = np.asarray(f_on.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())


def test_tiled2d_deal_roundtrip():
    """The 2D-tiled queue deal (renderer._tiled2d_fwd/_inv) is an
    exact permutation + inverse for both (N, 3) and (N,) arrays."""
    import jax.numpy as jnp
    from vpt_tpu.render.renderer import (_tiled2d_fwd, _tiled2d_inv,
                                         _tiled2d_rolls, _tiled2d_split)
    H, W, Q = 24, 40, 8
    sy, sx = _tiled2d_split(Q, H, W)
    assert sy * sx == Q and H % sy == 0 and W % sx == 0
    rolls = _tiled2d_rolls(Q, H // sy, W // sx)
    x = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H * W, 3)
    y = _tiled2d_fwd(x, H, W, sy, sx, rolls)
    assert sorted(np.asarray(y[:, 0]).tolist()) == \
        sorted(np.asarray(x[:, 0]).tolist())
    np.testing.assert_array_equal(
        np.asarray(_tiled2d_inv(y, H, W, sy, sx, rolls)), np.asarray(x))
    a = jnp.arange(H * W, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_tiled2d_inv(_tiled2d_fwd(a, H, W, sy, sx, rolls),
                                H, W, sy, sx, rolls)), np.asarray(a))


def test_queue_tiled2d_and_seek_passes_match(scene):
    """The 2D-tiled slot deal + multi-pass retire/seek (the round-4
    trip-overhead levers) are the same estimator as the plain deal
    with one pass."""
    p_plain = RenderParams(engine="fused", rays_per_lane=4,
                           queue_tiled2d=False, seek_passes=1, **BASE)
    p_new = RenderParams(engine="fused", rays_per_lane=4,
                         queue_tiled2d=True, seek_passes=4, **BASE)
    f_a = ProgressiveRenderer(scene, p_plain).render(16)
    f_b = ProgressiveRenderer(scene, p_new).render(16)
    a = np.asarray(f_a.accum)
    b = np.asarray(f_b.accum)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(b.mean() - a.mean()) / a.mean() < 0.1, (a.mean(), b.mean())
    aa = np.asarray(f_a.alpha)
    ba = np.asarray(f_b.alpha)
    assert abs(ba.mean() - aa.mean()) / max(aa.mean(), 1e-9) < 0.1
