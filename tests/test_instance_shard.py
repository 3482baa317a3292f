"""Instance-set sharding (parallel/instance_shard.py) on the virtual
8-device CPU mesh: exactness of the superposition free-path walk and
the factorized transmittance against the single-device combined scene,
plus end-to-end render agreement with the reference engine."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.golden_scenes import _blob
from vpt_tpu.core.camera import Camera
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.parallel.instance_shard import (build_instance_sharded_scene,
                                             delta_track_sharded,
                                             make_inst_mesh,
                                             render_instance_sharded,
                                             shard_scene,
                                             transmittance_sharded)
from vpt_tpu.render.params import Environment, RenderParams
from vpt_tpu.render.tracking import delta_track, transmittance
from vpt_tpu.scene.scene import build_scene

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

N_SHARDS = 4


def _layout(n_inst=8, seed=7):
    """n_inst jittered blob instances in a row (overlapping pairs)."""
    rng = np.random.RandomState(seed)
    ids, xforms = [], []
    for i in range(n_inst):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = (np.array([i * 2.0, 0.0, 0.0])
                     + rng.uniform(-0.6, 0.6, 3))
        ids.append(0)
        xforms.append(xf)
    return [_blob(n=16)], ids, xforms


def _combined_and_stacked(n_inst=8, **kw):
    grids, ids, xforms = _layout(n_inst)
    combined = build_scene(grids, instance_grid_ids=ids,
                           instance_xforms=xforms, **kw)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           **kw)
    return combined, stacked


def _params(**kw):
    base = dict(width=16, height=16, ray_depth=3, max_track_steps=48,
                environment_type=int(Environment.BLACK))
    base.update(kw)
    return RenderParams(**base)


def _probe_rays(combined, b=128):
    """Rays crossing the whole instance row at varied heights."""
    lo = np.asarray(combined.root_pmin)
    hi = np.asarray(combined.root_pmax)
    ys = np.linspace(lo[1] + 0.2, hi[1] - 0.2, b)
    zs = np.linspace(lo[2] + 0.2, hi[2] - 0.2, b)
    pos = np.stack([np.full(b, lo[0] + 1e-3), ys, zs], -1).astype(np.float32)
    dirn = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (b, 1))
    return jnp.asarray(pos), jnp.asarray(dirn)


def _run_sharded(stacked, mesh, fn):
    """Run fn(local_scene) under shard_map with replicated outputs."""
    body = lambda ss: fn(jax.tree.map(lambda x: x[0], ss))
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("inst"),),
                                 out_specs=P(), check_vma=False))(stacked)


def test_builder_validation():
    grids, ids, xforms = _layout(8)
    with pytest.raises(ValueError, match="divisible"):
        build_instance_sharded_scene(grids, ids, xforms, 3)
    # mixed channel presence across shards misaligns the padded
    # corner-row layout: all or none
    mixed = [_blob(n=16, emission=True), _blob(n=16)]
    mixed_ids = [0, 0, 0, 0, 1, 1, 1, 1]  # shards 0-1 emissive, 2-3 not
    with pytest.raises(ValueError, match="ALL shards or"):
        build_instance_sharded_scene(mixed, mixed_ids, xforms, 4)


def test_transmittance_product_matches_single():
    """E[prod_d Tr_d] = Tr through the summed medium: the sharded
    product and the single-scene walk agree in expectation."""
    combined, stacked = _combined_and_stacked()
    mesh = make_inst_mesh(N_SHARDS)
    stacked = shard_scene(stacked, mesh)
    p = _params()
    pos, dirn = _probe_rays(combined, b=96)
    keys = [jax.random.PRNGKey(k) for k in range(24)]

    single = np.mean([np.asarray(transmittance(combined, p, k, pos, dirn))
                      for k in keys], axis=0)
    sharded = np.mean([np.asarray(_run_sharded(
        stacked, mesh,
        functools.partial(lambda s, k: transmittance_sharded(s, p, k, pos,
                                                             dirn), k=k)))
        for k in keys], axis=0)

    # same expectation: per-ray gap within MC noise at 24 keys, and the
    # aggregate mean (errors can't cancel systematically) much tighter
    assert np.isfinite(sharded).all()
    assert np.abs(sharded - single).mean() < 0.06, (
        float(np.abs(sharded - single).mean()))
    assert abs(sharded.mean() - single.mean()) < 0.02, (
        float(sharded.mean()), float(single.mean()))
    # and the medium actually attenuates (non-trivial test)
    assert single.min() < 0.7


def test_superposition_walk_matches_single():
    """The elected superposition walk reproduces the single-scene
    delta-tracking law: P(interaction) and E[t | interaction] agree."""
    combined, stacked = _combined_and_stacked()
    mesh = make_inst_mesh(N_SHARDS)
    stacked = shard_scene(stacked, mesh)
    p = _params()
    pos, dirn = _probe_rays(combined, b=96)
    act = jnp.ones(96, bool)
    keys = [jax.random.PRNGKey(1000 + k) for k in range(32)]

    def single_stats(k):
        new_pos, inter, _v, _h, _a, _s = delta_track(combined, p, k, pos,
                                                     dirn, act)
        t = jnp.linalg.norm(new_pos - pos, axis=-1)
        return np.asarray(inter), np.asarray(jnp.where(inter, t, 0.0))

    def sharded_stats(k):
        def fn(s):
            new_pos, inter, _v, _h, _a, _s = delta_track_sharded(
                s, p, k, pos, dirn, act)
            t = jnp.linalg.norm(new_pos - pos, axis=-1)
            return inter, jnp.where(inter, t, 0.0)
        inter, t = _run_sharded(stacked, mesh, fn)
        return np.asarray(inter), np.asarray(t)

    s_i, s_t = zip(*[single_stats(k) for k in keys])
    h_i, h_t = zip(*[sharded_stats(k) for k in keys])
    p_single = np.mean(s_i)
    p_sharded = np.mean(h_i)
    assert 0.05 < p_single < 0.95  # non-degenerate medium
    assert abs(p_sharded - p_single) < 0.05, (p_sharded, p_single)
    t_single = np.sum(s_t) / max(np.sum(s_i), 1)
    t_sharded = np.sum(h_t) / max(np.sum(h_i), 1)
    assert abs(t_sharded - t_single) / t_single < 0.10, (t_sharded, t_single)


def _camera_for(scene):
    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    ext = float(np.max(np.asarray(scene.root_pmax)
                       - np.asarray(scene.root_pmin)))
    return Camera.make(c + np.array([0.0, 0.7 * ext, 1.4 * ext]), c,
                       vfov=45.0, aspect=1.0)


@pytest.mark.parametrize("with_cells", [False, True])
def test_render_matches_reference_engine(with_cells):
    """End-to-end: the instance-sharded render agrees in expectation
    with the single-device reference engine on the combined scene
    (the sharded estimator mirrors integrator.direct_integrator).
    with_cells also exercises the per-shard cell-list K padding."""
    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights,
              instance_list_threshold=(1 if with_cells else 10 ** 6),
              majorant_resolution=32)
    combined, _ = _combined_and_stacked(**kw)
    cam = _camera_for(combined)
    combined = dataclasses.replace(combined, camera=cam)
    grids, ids, xforms = _layout(8)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           camera=cam, **kw)

    p = _params(engine="reference", ray_depth=3,
                environment_type=int(Environment.CONSTANT))
    mesh = make_inst_mesh(N_SHARDS)
    film_sh = render_instance_sharded(shard_scene(stacked, mesh), p,
                                      spp=8, mesh=mesh)
    from vpt_tpu.render.renderer import ProgressiveRenderer
    film_1 = ProgressiveRenderer(combined, p).render(8)
    a = np.asarray(film_sh.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all()
    assert a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())


def test_cell_list_padding_shapes():
    """Shards with different per-cell overlap K pad to a common table."""
    grids, ids, xforms = _layout(8)
    stacked = build_instance_sharded_scene(
        grids, ids, xforms, N_SHARDS, instance_list_threshold=1,
        majorant_resolution=32)
    ci = stacked.majorant.cell_instances
    assert ci.shape[0] == N_SHARDS
    # padded slots are the -1 sentinel tracking._cell_rows masks out
    assert int(jnp.min(ci)) == -1


def test_composed_inst_tile_mesh():
    """The 2-D ('inst', 'tile') mesh (make_inst_tile_mesh): rays shard
    over 'tile' while each column holds one instance subset.  Same
    estimator as the 1-D ('inst',) mesh — agreement in expectation —
    and the ray count must divide the tile axis."""
    from vpt_tpu.parallel.instance_shard import make_inst_tile_mesh

    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights, majorant_resolution=32)
    combined, _ = _combined_and_stacked(**kw)
    cam = _camera_for(combined)
    grids, ids, xforms = _layout(8)
    stacked = build_instance_sharded_scene(grids, ids, xforms, 2,
                                           camera=cam, **kw)
    p = _params(environment_type=int(Environment.CONSTANT))

    mesh2 = make_inst_tile_mesh(2, 4)
    assert dict(mesh2.shape) == {"inst": 2, "tile": 4}
    film_c = render_instance_sharded(shard_scene(stacked, mesh2), p,
                                     spp=8, mesh=mesh2)
    mesh1 = make_inst_mesh(2)
    film_1 = render_instance_sharded(shard_scene(stacked, mesh1), p,
                                     spp=8, mesh=mesh1)
    a = np.asarray(film_c.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())

    # 16x16 = 256 rays do not divide a 3-wide tile axis
    mesh_bad = make_inst_tile_mesh(2, 3)
    with pytest.raises(ValueError, match="divisible"):
        render_instance_sharded(shard_scene(stacked, mesh_bad), p,
                                spp=1, mesh=mesh_bad)


def test_grid_sharded_beyond_hbm():
    """build_grid_sharded_scene: ONE monolithic grid split spatially
    over the 'inst' axis.  (a) per-shard atlases hold ~1/n of the
    voxel data (the pruned builder packs only each shard's slab), and
    (b) the sharded render agrees in expectation with the single-
    device render of the unsplit grid — the slab decomposition is
    exact and the superposition walk handles the halo overlap."""
    from tests.golden_scenes import _blob
    from vpt_tpu.parallel.instance_shard import build_grid_sharded_scene

    g = _blob(n=24)
    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights, majorant_resolution=32)
    combined = build_scene([g], **kw)
    cam = _camera_for(combined)
    combined = dataclasses.replace(combined, camera=cam)

    stacked = build_grid_sharded_scene(g, N_SHARDS, camera=cam, **kw)
    # HBM claim: per-shard corner-table rows ~ V/n (+ one halo plane)
    v_total = int(combined.atlas.density_corners.shape[0])
    v_shard = int(stacked.atlas.density_corners.shape[1])
    assert v_shard < v_total / N_SHARDS * 1.5, (v_shard, v_total)

    p = _params(environment_type=int(Environment.CONSTANT))
    mesh = make_inst_mesh(N_SHARDS)
    film_sh = render_instance_sharded(shard_scene(stacked, mesh), p,
                                      spp=8, mesh=mesh)
    from vpt_tpu.render.renderer import ProgressiveRenderer
    film_1 = ProgressiveRenderer(
        combined, dataclasses.replace(p, engine="reference")).render(8)
    a = np.asarray(film_sh.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())


def test_emission_sharded_matches_single():
    """The union-rate sharded emission walk agrees in expectation with
    the combined scene's estimate_emission (the estimator's value
    CARRIES the sampling rate, QUIRKS #21, so every shard must walk at
    the union's rate), and the end-to-end emissive render agrees with
    the reference engine."""
    from vpt_tpu.render.tracking import estimate_emission
    from vpt_tpu.parallel.instance_shard import estimate_emission_sharded

    grids = [_blob(n=16, emission=True)]
    _, ids, xforms = _layout(8)
    kw = dict(majorant_resolution=32)
    combined = build_scene(grids, instance_grid_ids=ids,
                           instance_xforms=xforms, **kw)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           **kw)
    mesh = make_inst_mesh(N_SHARDS)
    stacked_p = shard_scene(stacked, mesh)
    p = _params().replace(emission_scale=1.5)
    pos, dirn = _probe_rays(combined, b=96)
    act = jnp.ones(96, bool)
    keys = [jax.random.PRNGKey(500 + k) for k in range(24)]

    single = np.mean([np.asarray(estimate_emission(
        combined, p, k, pos, dirn, active=act)) for k in keys], axis=0)
    sharded = np.mean([np.asarray(_run_sharded(
        stacked_p, mesh,
        functools.partial(lambda s, k: estimate_emission_sharded(
            s, p, k, pos, dirn, act), k=k))) for k in keys], axis=0)
    assert np.isfinite(sharded).all()
    assert single.mean() > 1e-3  # non-trivial emission along the rays
    assert abs(sharded.mean() - single.mean()) / single.mean() < 0.15, (
        sharded.mean(), single.mean())

    # end-to-end emissive render vs the reference engine
    cam = _camera_for(combined)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           camera=cam, **kw)
    pr = _params(environment_type=int(Environment.BLACK),
                 ).replace(emission_scale=1.5)
    film_sh = render_instance_sharded(shard_scene(stacked, mesh), pr,
                                      spp=8, mesh=mesh)
    from vpt_tpu.render.renderer import ProgressiveRenderer
    combined_cam = dataclasses.replace(combined, camera=cam)
    film_1 = ProgressiveRenderer(
        combined_cam, dataclasses.replace(pr, engine="reference")).render(8)
    a = np.asarray(film_sh.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())


def test_pruned_shards_remap_unique_grids():
    """Shards referencing DIFFERENT unique grids build pruned atlases
    (ids remapped per shard, mismatched tables zero-padded) and still
    agree with the combined scene."""
    sizes = [16, 18, 20, 22]
    grids = [_blob(n=s) for s in sizes]
    rng = np.random.RandomState(11)
    ids, xforms = [], []
    for i in range(2 * N_SHARDS):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = (np.array([i * 2.0, 0.0, 0.0])
                     + rng.uniform(-0.4, 0.4, 3))
        ids.append(i // 2)  # shard s references ONLY grid s
        xforms.append(xf)
    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights, majorant_resolution=32)
    combined = build_scene(grids, instance_grid_ids=ids,
                           instance_xforms=xforms, **kw)
    cam = _camera_for(combined)
    combined = dataclasses.replace(combined, camera=cam)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           camera=cam, **kw)
    # pruned: the per-shard table is the LARGEST single grid (22^3
    # corner rows), not the sum of all four
    v_all = int(combined.atlas.density_corners.shape[0])
    v_shard = int(stacked.atlas.density_corners.shape[1])
    assert v_shard == max(s ** 3 for s in sizes) < v_all / 2

    p = _params(environment_type=int(Environment.CONSTANT))
    mesh = make_inst_mesh(N_SHARDS)
    film_sh = render_instance_sharded(shard_scene(stacked, mesh), p,
                                      spp=8, mesh=mesh)
    from vpt_tpu.render.renderer import ProgressiveRenderer
    film_1 = ProgressiveRenderer(
        combined, dataclasses.replace(p, engine="reference")).render(8)
    a = np.asarray(film_sh.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())


def test_grid_sharded_cached_shadows():
    """Lifted v1 exclusion (VERDICT r4 #7): per-shard cached tau bakes.
    Each slab bakes optical depths against its LOCAL density; the
    cached per-shard E[Tr] factors multiply across the mesh (the same
    factorization as transmittance_sharded), so the cached render
    agrees in expectation with the tracked sharded render."""
    from tests.golden_scenes import _blob
    from vpt_tpu.parallel.instance_shard import build_grid_sharded_scene

    g = _blob(n=24)
    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights, majorant_resolution=32)
    combined = build_scene([g], **kw)
    cam = _camera_for(combined)

    stacked = build_grid_sharded_scene(g, N_SHARDS, camera=cam,
                                       shadow_cache=(150.0, 30.0), **kw)
    # per-shard corner rows carry 1 sun + 1 light tau channel beyond
    # the 15 density/accel cols (tau_base computed on a LOCAL slice —
    # the stacked atlas' stacked placeholder leaves fake has_emission)
    assert stacked.atlas.density_corners.shape[-1] == 15 + 8 * 2

    mesh = make_inst_mesh(N_SHARDS)
    p_tracked = _params(environment_type=int(Environment.CONSTANT))
    p_cached = p_tracked.replace(shadow_mode="cached")
    film_c = render_instance_sharded(shard_scene(stacked, mesh), p_cached,
                                     spp=8, mesh=mesh)
    film_t = render_instance_sharded(shard_scene(stacked, mesh), p_tracked,
                                     spp=8, mesh=mesh)
    a = np.asarray(film_c.accum)
    b = np.asarray(film_t.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())

    # requesting cached without a bake is a clear error
    stacked_nb = build_grid_sharded_scene(g, N_SHARDS, camera=cam, **kw)
    with pytest.raises(ValueError, match="tau cache"):
        render_instance_sharded(shard_scene(stacked_nb, mesh), p_cached,
                                spp=1, mesh=mesh)


def test_instance_sharded_atmosphere_env():
    """Lifted v1 exclusion (VERDICT r4 #7): ATMOSPHERE environments on
    the ('inst',) mesh — the LUT set rides every shard as a replicated
    leaf and the sharded render agrees with the single-device
    reference engine on the combined scene."""
    from vpt_tpu.scene.scene import attach_atmosphere
    from vpt_tpu.sky.bruneton import LutDims
    from vpt_tpu.sky.runtime import make_atmosphere

    tiny = LutDims(transmittance_w=16, transmittance_h=8, r=4, mu=8,
                   mu_s=4, nu=2, irradiance_w=8, irradiance_h=4)
    atm = make_atmosphere(dims=tiny)
    lights = PointLights.make([[4.0, 6.0, 8.0]], [[1.0, 1.0, 1.0]], [200.0])
    kw = dict(lights=lights, majorant_resolution=32)
    combined, _ = _combined_and_stacked(**kw)
    cam = _camera_for(combined)
    combined = dataclasses.replace(
        attach_atmosphere(combined, atmosphere=atm), camera=cam)
    grids, ids, xforms = _layout(8)
    stacked = build_instance_sharded_scene(grids, ids, xforms, N_SHARDS,
                                           camera=cam, atmosphere=atm,
                                           **kw)
    p = _params(environment_type=int(Environment.ATMOSPHERE))
    mesh = make_inst_mesh(N_SHARDS)
    film_sh = render_instance_sharded(shard_scene(stacked, mesh), p,
                                      spp=6, mesh=mesh)
    from vpt_tpu.render.renderer import ProgressiveRenderer
    film_1 = ProgressiveRenderer(
        combined, p.replace(engine="reference")).render(6)
    a = np.asarray(film_sh.accum)
    b = np.asarray(film_1.accum)
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.25, (
        a.mean(), b.mean())
