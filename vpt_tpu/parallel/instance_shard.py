"""Instance-set sharding: scenes whose instance set is PARTITIONED
across devices (docs/SCALING.md "beyond-HBM" path).

The reference renderer is strictly single-GPU (SURVEY.md §2.9) and its
scene size is capped by one GPU's VRAM.  This module is the TPU-native
answer for instanced scenes too large to replicate: each device of an
``('inst',)`` mesh holds ONLY its instance subset — packed instance
rows, per-subset majorant/skip grids, per-subset root box — and the
devices jointly simulate transport through the SUM medium *exactly*:

* **Free-path sampling by superposition.**  Delta tracking of a sum of
  media (density = Σ_d density_d, the multi-instance sum of
  render_kernel.cu:1003-1014) is simulated by running an independent
  tracking walk per device against ITS OWN majorant field
  (render_kernel.cu:1556-1681 semantics, as in tracking.delta_track),
  electing the earliest tentative collision with a ``pmin`` over the
  mesh, and broadcasting the winner's density/majorant ratio with a
  one-hot ``psum`` to drive a SHARED accept/reject draw.  Each
  device's tentative-collision stream is a Poisson process with rate
  majorant_d(x); their union has rate Σ majorant_d(x), and thinning
  the elected candidate by density_w/majorant_w reproduces collisions
  at the exact summed density.  Discarding the losers' later
  candidates and restarting everyone after every event is valid by
  memorylessness (a Poisson process restarted at a stopping time is
  again a Poisson process with the same rate), so the walk is
  statistically EXACT — not a resampling approximation like
  volume.union.
* **Transmittance factorizes.**  Optical depth adds over subsets, so
  Tr = Π_d Tr_d exactly.  Each device runs its own residual-ratio walk
  (tracking.transmittance, render_kernel.cu:1138-1273) with an
  independent key; independence makes the product estimator unbiased
  (E[Π Tr_d] = Π E[Tr_d]).

Per-event communication is O(lanes) scalars (one ``pmin`` + two
``psum``) over ICI against a full tracking walk of local compute, so
the scheme is compute-bound on real hardware.  Compute is replicated
over the 'inst' axis (every device advances every ray): the axis buys
MEMORY capacity — the per-device HBM footprint is 1/n of the instance
data — not ray throughput.  For throughput, compose it with a ray
axis: ``make_inst_tile_mesh`` builds the 2-D ('inst', 'tile') mesh
where rays are sharded over 'tile' and the tracking collectives
reduce per tile column (render_step_instance_sharded handles both
mesh shapes).

Scope (validated in tests/test_instance_shard.py on the 8-virtual-
device CPU mesh): volume transport + sun/point-light NEE + emission
(union-rate walk, estimate_emission_sharded) + environment terminal
(incl. ATMOSPHERE via per-shard replicated LUTs) + per-shard CACHED
shadows (attach_sharded_caches / _cached_nee_sharded — the round-5
lift of the v1 exclusions), mirroring render/integrator.py's
reference estimator.  The debug sphere is not wired (instanced
production scenes never use it); the emission/color channels must be
present on ALL shards or NONE (the builder raises on mixed subsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vpt_tpu.core.phase import phase_sample
from vpt_tpu.core.vecmath import EPS, aabb_contains, aabb_intersect
from vpt_tpu.core.rng import render_key
from vpt_tpu.render.film import Film, accumulate
from vpt_tpu.render.integrator import environment_radiance
from vpt_tpu.render.nee import estimate_point_lights, estimate_sun
from vpt_tpu.render.params import RenderParams
from vpt_tpu.render.tracking import (density_color_lut, scene_color,
                                     scene_density, transmittance,
                                     unified_fetch, vec3_param)
from vpt_tpu.scene.scene import Scene, build_scene

AXIS = "inst"
_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# mesh + host-side scene partitioning
# ---------------------------------------------------------------------------

def make_inst_mesh(n_inst: int, devices=None) -> Mesh:
    """1-D ('inst',) mesh over the first n_inst devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_inst > len(devices):
        raise ValueError(f"mesh needs {n_inst} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_inst]), (AXIS,))


def make_inst_tile_mesh(n_inst: int, n_tile: int, devices=None) -> Mesh:
    """2-D ('inst', 'tile') mesh: the memory axis composed with a ray-
    throughput axis.  Each of the n_inst rows holds one instance
    subset, replicated across its n_tile columns; rays are sharded
    over 'tile', so one step costs each device only 1/n_tile of the
    tracking walks while HBM still holds only 1/n_inst of the scene."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_inst * n_tile
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_inst, n_tile),
                (AXIS, "tile"))


def _pad_cell_lists(scenes):
    """Pad per-subset cell-instance tables to a common K so the
    sub-scene pytrees stack.

    MajorantGrid.cell_instances is (R^3, K) int32 with -1 empty slots
    (tracking._cell_rows treats ids<0 as invalid) and cell_rows is
    [t_box, ext 6, (octant 72,) ids K, ...] — the K slice is padded
    with -1.0 in place.  Tau columns (attach_shadow_cache) must be
    baked AFTER sharding, not before, so their presence here raises.
    """
    import dataclasses

    ks = [s.majorant.cell_instances.shape[-1] for s in scenes]
    kmax = max(ks)
    out = []
    for s in scenes:
        m = s.majorant
        k = m.cell_instances.shape[-1]
        ids_off = m.packed.shape[-1]
        if m.cell_rows is not None and m.cell_rows.shape[-1] != ids_off + k:
            raise ValueError("cell rows carry extra (tau) columns; attach "
                             "shadow caches after sharding, not before")
        if k == kmax:
            out.append(s)
            continue
        pad = kmax - k
        ci = np.concatenate(
            [np.asarray(m.cell_instances),
             np.full((m.cell_instances.shape[0], pad), -1, np.int32)], -1)
        cr = m.cell_rows
        if cr is not None:
            cr = np.concatenate(
                [np.asarray(cr),
                 np.full((cr.shape[0], pad), -1.0, np.float32)], -1)
        out.append(dataclasses.replace(
            s, majorant=dataclasses.replace(
                m, cell_instances=jnp.asarray(ci),
                cell_rows=None if cr is None else jnp.asarray(cr))))
    return out


def attach_sharded_caches(scenes, shadow_cache=None, atmosphere=None):
    """Per-shard attachments lifted from the v1 exclusions (VERDICT r4
    #7), applied to the LIST of sub-scenes before stacking:

    * ``shadow_cache=(azimuth, elevation)`` bakes each shard's cached
      optical-depth fields against its LOCAL instance subset
      (accel.shadow.attach_shadow_cache).  Optical depth adds over
      subsets, so the cached per-shard factors multiply to the exact
      union E[Tr] the tracked product walk estimates
      (transmittance_sharded's factorization argument verbatim);
      render with ``shadow_mode="cached"``.
    * ``atmosphere`` attaches the SAME Atmosphere LUT set to every
      shard (a shard-invariant replicated leaf, like the camera) so
      ATMOSPHERE environments work on the ('inst',) mesh.
    """
    import dataclasses

    if shadow_cache is not None:
        az, el = shadow_cache
        from vpt_tpu.accel.shadow import attach_shadow_cache
        scenes = [attach_shadow_cache(s, azimuth=az, elevation=el)
                  for s in scenes]
        wt_shapes = {None if s.world_tau is None else s.world_tau.shape
                     for s in scenes}
        if len(wt_shapes) > 1 or (wt_shapes != {None} and any(
                s.world_tau is None for s in scenes)):
            raise ValueError(
                "per-shard world-tau grids have mismatched shapes "
                f"({wt_shapes}): zero-padding them would fake empty "
                "shadows.  Use shards above the cell-list threshold "
                "(taus fold into the majorant cell rows) or "
                "single-grid slabs (taus ride the corner rows)")
    if atmosphere is not None:
        scenes = [dataclasses.replace(s, atmosphere=atmosphere)
                  for s in scenes]
    return scenes


def build_instance_sharded_scene(host_grids, instance_grid_ids,
                                 instance_xforms, n_shards: int,
                                 shadow_cache=None, atmosphere=None,
                                 **build_kw):
    """Build one sub-scene per shard (contiguous even partition of the
    instance list) and stack the pytrees with a leading 'inst' axis.

    Every leaf of the result is (n_shards, ...); place it with
    ``shard_scene`` and render with ``render_instance_sharded``.
    Shard-invariant inputs (camera, lights, LUTs, majorant resolution)
    are shared, so those stacked leaves are replicated copies; each
    shard's atlas packs ONLY the unique grids its own instances
    reference (ids remapped), so the dominant leaves — the voxel
    corner tables — genuinely scale as 1/n when the instance subsets
    partition the grid set.  Atlas leaves whose row counts differ
    across shards are zero-padded to the max before stacking; padded
    rows are unreachable because every table index originates from
    the same shard's offsets/ids.
    """
    ids = np.asarray(instance_grid_ids)
    xf = np.asarray(instance_xforms)
    n = ids.shape[0]
    if n % n_shards:
        raise ValueError(f"{n} instances not divisible by {n_shards} shards")
    per = n // n_shards
    subs = []
    for s in range(n_shards):
        sl = slice(s * per, (s + 1) * per)
        sub_ids = [int(i) for i in ids[sl]]
        uniq = sorted(set(sub_ids))
        remap = {g: k for k, g in enumerate(uniq)}
        subs.append(build_scene([host_grids[g] for g in uniq],
                                [remap[g] for g in sub_ids],
                                list(xf[sl]), **build_kw))
    for ch in ("has_emission", "has_color"):
        if len({bool(getattr(s.atlas, ch)) for s in subs}) > 1:
            raise ValueError(
                f"instance sharding needs {ch[4:]} on ALL shards or "
                f"NONE: mixed shards would misalign the padded "
                f"corner-row layout (and, for color, let the absent-"
                f"channel WHITE dominate the cross-shard max) — "
                f"regroup the instances or drop the channel")
    if subs[0].majorant is not None and \
            subs[0].majorant.cell_instances is not None:
        subs = _pad_cell_lists(subs)
    subs = attach_sharded_caches(subs, shadow_cache=shadow_cache,
                                 atmosphere=atmosphere)
    return jax.tree.map(_stack_padded, *subs)


def _stack_padded(*xs):
    """Stack one leaf across shards, zero-padding trailing rows where
    per-shard shapes differ (pruned atlases of unequal grid subsets)."""
    xs = [np.asarray(x) for x in xs]
    if len({x.shape for x in xs}) > 1:
        if len({x.ndim for x in xs}) > 1:
            raise ValueError(f"leaf rank mismatch across shards: "
                             f"{[x.shape for x in xs]}")
        tgt = tuple(max(x.shape[d] for x in xs)
                    for d in range(xs[0].ndim))
        xs = [np.pad(x, [(0, t - s) for s, t in zip(x.shape, tgt)])
              for x in xs]
    return jnp.asarray(np.stack(xs))


def build_grid_sharded_scene(host_grid, n_shards: int,
                             axis: int | None = None,
                             shadow_cache=None, atmosphere=None,
                             **build_kw):
    """Beyond-HBM path for ONE monolithic grid: split it spatially
    into ``n_shards`` exact-sum parts (volume.grid.split_host_grid)
    and give each shard of the ('inst',) mesh one part — per-device
    HBM holds ~1/n of the voxel data and the superposition tracking
    reconstructs the original medium exactly (disjoint slabs overlap
    only in the shared halo cells, which the election handles like
    any other overlap).  Returns the stacked scene for ``shard_scene``
    + ``render_instance_sharded``."""
    from vpt_tpu.volume.grid import split_host_grid
    parts = split_host_grid(host_grid, n_shards, axis=axis)
    return build_instance_sharded_scene(
        parts, list(range(n_shards)), [p.transform for p in parts],
        n_shards, shadow_cache=shadow_cache, atmosphere=atmosphere,
        **build_kw)


def shard_scene(scene_stack, mesh: Mesh):
    """Place the stacked scene with its leading axis sharded over
    'inst' (explicit device_put so the first step doesn't re-shard)."""
    from jax.sharding import NamedSharding
    spec = NamedSharding(mesh, P(AXIS))
    return jax.device_put(scene_stack, spec)


# ---------------------------------------------------------------------------
# sharded tracking primitives (run inside shard_map, scene = LOCAL subset)
# ---------------------------------------------------------------------------

def _next_candidate(scene, params, key, pos, direction, active):
    """Walk the LOCAL medium from ``pos`` to its first tentative
    collision (the non-skip, non-exit sample of tracking.delta_track's
    body).  Returns (t_cand, ratio, density, steps): t_cand is +inf
    when the ray misses/exits the local root box without a candidate;
    ratio is the winner-side accept probability density/max_extinction
    (the exact expression delta_track thins with)."""
    B = pos.shape[0]
    sigma_max = scene.max_extinction * params.density_mult
    inv_rate = 1.0 / jnp.maximum(sigma_max, 1e-12)

    hit, t_enter, t_exit = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                          pos, direction)
    inside = aabb_contains(scene.root_pmin, scene.root_pmax, pos)
    reach = active & (inside | hit)
    t0 = jnp.where(inside, 0.0, t_enter + EPS)
    t_end = jnp.where(reach, t_exit, 0.0)

    p0 = pos + direction * t0[..., None]
    _, skip0 = unified_fetch(scene, params, p0, direction)

    def body(state):
        t, skip, searching, cand, dens, steps, i = state
        u = jax.random.uniform(jax.random.fold_in(key, i), (B,))
        do_skip = searching & (skip > 0.0)
        dt = jnp.where(do_skip, skip, -jnp.log1p(-u) * inv_rate)
        t_new = jnp.where(searching, t + dt, t)
        exited = searching & (t_new >= t_end)
        p_new = pos + direction * t_new[..., None]
        d_new, skip_new = unified_fetch(scene, params, p_new, direction)
        sampled = searching & ~do_skip & ~exited
        cand = cand | sampled
        dens = jnp.where(sampled, d_new, dens)
        searching = searching & ~exited & ~sampled
        steps = steps + searching.astype(jnp.int32)
        return (t_new, skip_new, searching, cand, dens, steps, i + 1)

    def cond(state):
        return jnp.any(state[2]) & (state[6] < params.max_track_steps)

    state = (t0, skip0, reach, jnp.zeros(B, bool),
             jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
             jnp.int32(0))
    t, _, _, cand, dens, steps, _ = jax.lax.while_loop(cond, body, state)

    t_cand = jnp.where(cand, t, _INF)
    ratio = dens / jnp.maximum(scene.max_extinction, 1e-12)
    return t_cand, ratio, dens, steps


def delta_track_sharded(scene, params, key, pos, direction, active,
                        axis: str = AXIS):
    """Free-path sampling through the UNION of all shards' media via
    thinned-superposition election (module docstring).  Signature and
    return contract mirror tracking.delta_track (minus the debug
    sphere): (new_pos, interaction, value, hit_sphere, alpha_add,
    steps), with ``steps`` the psum of per-device walk work."""
    B = pos.shape[0]
    idx = jax.lax.axis_index(axis)
    n = jax.lax.psum(1, axis)

    def body(state):
        t, act, inter, alpha, steps, it = state
        p = pos + direction * t[..., None]
        kc = jax.random.fold_in(jax.random.fold_in(
            jax.random.fold_in(key, it), 1), idx)
        t_c, ratio, d_c, st = _next_candidate(scene, params, kc, p,
                                              direction, act)
        steps = steps + jax.lax.psum(st, axis)
        t_min = jax.lax.pmin(jnp.where(act, t_c, _INF), axis)
        have = act & jnp.isfinite(t_min)
        is_min = have & (t_c == t_min)
        w_idx = jax.lax.pmin(jnp.where(is_min, idx, n), axis)
        win = is_min & (idx == w_idx)
        r = jax.lax.psum(jnp.where(win, ratio, 0.0), axis)
        d_w = jax.lax.psum(jnp.where(win, d_c, 0.0), axis)
        u = jax.random.uniform(jax.random.fold_in(
            jax.random.fold_in(key, it), 2), (B,))
        accept = have & (r > u)
        alpha = alpha + jnp.where(have, d_w, 0.0)
        inter = inter | accept
        t = jnp.where(have, t + t_min, t)
        act = act & have & ~accept
        return (t, act, inter, alpha, steps, it + 1)

    def cond(state):
        return jnp.any(state[1]) & (state[5] < params.max_track_steps)

    state = (jnp.zeros(B, jnp.float32), active, jnp.zeros(B, bool),
             jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
             jnp.int32(0))
    t, _, inter, alpha, steps, _ = jax.lax.while_loop(cond, body, state)

    new_pos = pos + direction * t[..., None]
    # collision value (delta_track's coll_val): density summed with a
    # psum, Cd combined with a pmax (sum_color is a component-wise max
    # over instances, render_kernel.cu:931-943 — the cross-shard max of
    # per-shard maxes is the max over all instances)
    d_tot = jax.lax.psum(scene_density(scene, new_pos), axis)
    cd = jax.lax.pmax(scene_color(scene, new_pos), axis)
    lut = density_color_lut(scene, params, d_tot)
    coll_val = (vec3_param(params.albedo) * cd * lut
                / vec3_param(params.extinction)) * params.energy_inject
    value = jnp.where(inter[..., None], coll_val, jnp.ones_like(coll_val))
    hit_sphere = jnp.zeros(B, bool)
    return new_pos, inter, value, hit_sphere, alpha, steps


def transmittance_sharded(scene, params, key, pos, direction,
                          axis: str = AXIS):
    """Tr through the union medium: exact product of per-shard
    residual-ratio walks (optical depths add, so Tr = Π_d Tr_d; each
    shard's walk uses an independent key)."""
    idx = jax.lax.axis_index(axis)
    tr = transmittance(scene, params, jax.random.fold_in(key, idx), pos,
                       direction)
    log_tr = jnp.log(jnp.maximum(tr, 1e-37))
    return jnp.exp(jax.lax.psum(log_tr, axis))


def _shard_has_tau(scene) -> bool:
    """Static: does this (local) sub-scene carry a baked tau cache?"""
    from vpt_tpu.accel.shadow import _tau_base
    from vpt_tpu.render.tracking import _use_cells
    if scene.world_tau is not None:
        return True
    if scene.instances.count == 1 and not _use_cells(scene):
        return scene.atlas.density_corners.shape[-1] > _tau_base(
            scene.atlas)
    m = scene.majorant
    if m is not None and m.cell_rows is not None \
            and m.cell_instances is not None:
        base = m.packed.shape[-1] + m.cell_instances.shape[-1]
        return m.cell_rows.shape[-1] > base
    return False


def _fetch_tau_point(scene, params, pos, w):
    """(..., 1+L) cached optical depths at ``pos`` from whichever tau
    storage this shard carries (corner rows / cell rows / world grid).
    One row gather per medium event — replacing 1+L tracked walks."""
    from vpt_tpu.render.tracking import _use_cells
    if scene.world_tau is not None:
        from vpt_tpu.accel.shadow import world_tau_fetch
        return world_tau_fetch(scene, pos)
    if scene.instances.count == 1 and not _use_cells(scene):
        _, _, tau = unified_fetch(scene, params, pos, w, with_tau=True)
        return tau
    from vpt_tpu.accel.shadow import cell_tau_fetch
    return cell_tau_fetch(scene, pos)


def _cached_tr_sharded(scene, params, pos, w, tau_c, axis: str = AXIS):
    """E[Tr] through the union medium from per-shard cached optical
    depths: each shard evaluates the cached expectation of ITS tracked
    residual-ratio walk (fused.cached_tr semantics against the LOCAL
    root box), and independence makes the cross-shard product exact —
    the same factorization transmittance_sharded uses, minus the
    variance."""
    _, _, d = aabb_intersect(scene.root_pmin, scene.root_pmax, pos, w)
    d = jnp.maximum(d, 0.0)
    sigma_c = scene.min_extinction
    tr = jnp.exp(-sigma_c * d - (tau_c - sigma_c * d) / params.tr_depth)
    tr = jnp.clip(tr, 0.0, 1.0)
    return jnp.exp(jax.lax.psum(
        jnp.log(jnp.maximum(tr, 1e-37)), axis))


def _cached_nee_sharded(scene, params, pos, direction, axis: str = AXIS):
    """Whole NEE (sun + every point light) from the per-shard tau
    caches — zero walk iterations (the sharded analog of the fused
    engine's cached branch, fused.py:556-580: the random light budget
    becomes the explicit n_walks/L-weighted sum, a pure variance
    reduction with identical expectation)."""
    from vpt_tpu.core.phase import phase_eval
    from vpt_tpu.core.vecmath import degree_to_cartesian, length, normalize
    from vpt_tpu.render.nee import LIGHT_BUDGET

    sun_dir = degree_to_cartesian(params.azimuth, params.elevation)
    taus = _fetch_tau_point(scene, params, pos,
                            jnp.broadcast_to(sun_dir, pos.shape))
    n_lights = int(scene.lights.count)
    n_ch = taus.shape[-1]
    if n_ch != 1 + n_lights:
        raise ValueError(f"shard tau cache has {n_ch - 1} light channels "
                         f"but the scene has {n_lights} point lights — "
                         "re-bake with shadow_cache=(az, el)")
    cos_sun = jnp.sum(direction * sun_dir, axis=-1)
    tr_sun = _cached_tr_sharded(scene, params, pos,
                                jnp.broadcast_to(sun_dir, pos.shape),
                                taus[..., 0], axis)
    nee = (vec3_param(params.sun_color) * params.sun_mult
           * (phase_eval(params, cos_sun) * tr_sun)[..., None])
    pt_w = min(n_lights, LIGHT_BUDGET) / max(n_lights, 1)
    for i in range(n_lights):
        lp = scene.lights.pos[i]
        wi = normalize(lp - pos)
        cos_pt = jnp.sum(direction * wi, axis=-1)
        if params.reference_falloff:  # QUIRKS #2
            sqr = length(lp * lp - pos * pos)
        else:
            sqr = jnp.sum((lp - pos) ** 2, axis=-1)
        falloff = 1.0 / jnp.maximum(sqr, 1e-12)
        tr_i = _cached_tr_sharded(scene, params, pos, wi,
                                  taus[..., 1 + i], axis)
        nee = nee + scene.lights.color[i] * (
            scene.lights.power[i] * phase_eval(params, cos_pt)
            * falloff * tr_i * pt_w)[..., None]
    return nee


def estimate_emission_sharded(scene, params, key, pos, direction, active,
                              axis: str = AXIS):
    """Rate-weighted emission line integral through the union medium:
    emission is ADDITIVE over instances (render_kernel.cu:970-982), so
    each shard walks its OWN sub-box with an independent key and the
    partial sums ``psum``.  Every shard samples at the UNION's rate
    (pmax of max_extinction): the estimator's expectation carries the
    rate factor (QUIRKS #21), so per-shard rates would weight each
    component differently from the combined scene."""
    from vpt_tpu.render.tracking import estimate_emission

    idx = jax.lax.axis_index(axis)
    sig_u = jax.lax.pmax(scene.max_extinction, axis)
    em = estimate_emission(scene, params, jax.random.fold_in(key, idx),
                           pos, direction, active=active,
                           max_extinction=sig_u)
    return jax.lax.psum(em, axis)


# ---------------------------------------------------------------------------
# sharded estimator (mirror of integrator.direct_integrator, v1 scope)
# ---------------------------------------------------------------------------

def _trace_instance_sharded(scene, params, key, origin, direction,
                            axis: str = AXIS):
    """Lane-masked direct integrator over the sharded medium: the
    control flow of integrator.direct_integrator with the tracking,
    every shadow walk, and the emission walk replaced by their
    sharded-exact forms; the debug sphere is dropped.  The 'volume
    root box' is the union of the shards' boxes (pmin/pmax
    collectives)."""
    B = origin.shape[0]
    gmin = jax.lax.pmin(scene.root_pmin, axis)
    gmax = jax.lax.pmax(scene.root_pmax, axis)
    # STATIC switch (like fused.py's cached_shadows): per-shard baked
    # tau caches replace every NEE shadow walk with one row gather +
    # a psum'd log product
    cached = params.shadow_mode == "cached" and _shard_has_tau(scene)
    if params.shadow_mode == "cached" and not cached:
        raise ValueError("shadow_mode='cached' but the shards carry no "
                         "tau cache — build with shadow_cache=(azimuth, "
                         "elevation) (attach_sharded_caches)")

    def tr_fn(s, p, k, x, w):
        return transmittance_sharded(s, p, k, x, w, axis)

    def body(state):
        pos, dirn, beta, L, alpha, depth_aov, cost, done, depth_i = state
        kd = jax.random.fold_in(key, depth_i)

        hit, t_min, _ = aabb_intersect(gmin, gmax, pos, dirn)
        in_vol = hit & ~done
        entry = jnp.where(in_vol[..., None],
                          pos + dirn * (t_min + EPS)[..., None], pos)

        pos_v = entry
        mi = jnp.zeros(B, bool)
        for vd in range(params.volume_depth):
            kv = jax.random.fold_in(kd, 100 + vd)
            new_pos, mi_v, val, _hs, alpha_add, steps = delta_track_sharded(
                scene, params, kv, pos_v, dirn, in_vol, axis)
            beta = jnp.where(in_vol[..., None], beta * val, beta)
            alpha = alpha + jnp.where(in_vol, alpha_add, 0.0)
            cost = cost + jnp.where(in_vol, steps, 0)
            pos_v = jnp.where(in_vol[..., None], new_pos, pos_v)
            mi = jnp.where(in_vol, mi_v, mi)
            sdir, _ = phase_sample(params, dirn, jax.random.fold_in(kv, 1))
            dirn = jnp.where((mi_v & in_vol)[..., None], sdir, dirn)
            in_vol = in_vol & mi_v
        pos = jnp.where(hit[..., None] & ~done[..., None], pos_v, pos)

        first = (depth_i == 0)
        d_mi = jnp.linalg.norm(origin - pos, axis=-1)
        depth_aov = jnp.where(first & mi, d_mi, depth_aov)

        if cached:
            nee = _cached_nee_sharded(scene, params, pos, dirn, axis)
            L = L + jnp.where(mi[..., None], nee * beta, 0.0)
        else:
            sun = estimate_sun(scene, params, jax.random.fold_in(kd, 2),
                               pos, dirn, tr_fn=tr_fn)
            L = L + jnp.where(mi[..., None], sun * beta, 0.0)
            if scene.lights.count > 0:
                pl = estimate_point_lights(scene, params,
                                           jax.random.fold_in(kd, 3), pos,
                                           dirn, tr_fn=tr_fn)
                L = L + jnp.where(mi[..., None], pl * beta, 0.0)
        if scene.atlas.has_emission:
            em = estimate_emission_sharded(scene, params,
                                           jax.random.fold_in(kd, 4), pos,
                                           dirn, mi, axis)
            # QUIRKS #5: emission is NOT scaled by beta
            L = L + jnp.where(mi[..., None], em, 0.0)

        done = done | ~hit
        return (pos, dirn, beta, L, alpha, depth_aov, cost, done,
                depth_i + 1)

    def cond(state):
        return (state[8] < params.ray_depth) & jnp.any(~state[7])

    state = (origin, direction, jnp.ones((B, 3), jnp.float32),
             jnp.zeros((B, 3), jnp.float32), jnp.zeros(B, jnp.float32),
             jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
             jnp.zeros(B, bool), jnp.int32(0))
    (pos, dirn, beta, L, alpha, depth_aov, cost, _done,
     _d) = jax.lax.while_loop(cond, body, state)

    # env_pos stays the camera origin (integrator.py only moves it on
    # sphere events, which v1 does not wire)
    L = L + environment_radiance(scene, params, origin, dirn) * beta
    alpha = jnp.minimum(alpha, 1.0)
    return L, alpha, cost.astype(jnp.float32), depth_aov


# ---------------------------------------------------------------------------
# progressive rendering over the mesh
# ---------------------------------------------------------------------------

def _sharded_sample(params: RenderParams, key, has_tile, scene_slice, u, v):
    scene = jax.tree.map(lambda x: x[0], scene_slice)
    if has_tile:
        # one independent stream per ray block — folded INSIDE the
        # shard_map so every device of an 'inst' column sees the SAME
        # key (the election/thinning draws must be shared across the
        # instance axis)
        key = jax.random.fold_in(key, jax.lax.axis_index("tile"))
    kl, ki = jax.random.split(key)
    origin, direction = scene.camera.get_rays(u, v, kl)
    return _trace_instance_sharded(scene, params, ki, origin, direction)


def render_step_instance_sharded(scene_stack, params: RenderParams,
                                 film: Film, iteration, mesh: Mesh):
    """One progressive step (ONE spp — the 'inst' axis buys memory, not
    samples).  On a 1-D ('inst',) mesh rays and film are replicated:
    every device advances ALL rays through its instance subset.  On a
    2-D ('inst', 'tile') mesh (make_inst_tile_mesh) the ray batch is
    additionally sharded over 'tile' — each device walks only its ray
    block, so the composed mesh buys throughput AND memory (the
    tracking collectives name only the 'inst' axis, so they reduce
    per tile column)."""
    H, W = params.height, params.width
    has_tile = "tile" in mesh.shape and mesh.shape["tile"] > 1
    if has_tile and (H * W) % mesh.shape["tile"]:
        raise ValueError(f"pixel count {H*W} not divisible by tile axis "
                         f"{mesh.shape['tile']}")
    key = render_key(params.seed, iteration)
    kj = jax.random.fold_in(key, 17)
    jit_uv = jax.random.uniform(kj, (H, W, 2), jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = ((xs + jit_uv[..., 0]) / W).reshape(-1)
    v = ((ys + jit_uv[..., 1]) / H).reshape(-1)

    ray_spec = P("tile") if has_tile else P()
    fn = jax.shard_map(
        functools.partial(_sharded_sample, params, key, has_tile),
        mesh=mesh,
        in_specs=(P(AXIS), ray_spec, ray_spec),
        out_specs=ray_spec,
        check_vma=False,
    )
    L, alpha, cost, depth = fn(scene_stack, u, v)
    return accumulate(film, L.reshape(H, W, 3), alpha.reshape(H, W),
                      iteration, depth=depth.reshape(H, W),
                      cost=cost.reshape(H, W))


def render_instance_sharded(scene_stack, params: RenderParams, spp: int,
                            mesh: Mesh) -> Film:
    """Render ``spp`` samples per pixel with the instance set sharded
    over ``mesh`` ('inst' axis)."""
    film = Film.zeros(params.height, params.width)
    step = jax.jit(render_step_instance_sharded,
                   static_argnames=("mesh",))
    for it in range(spp):
        film = step(scene_stack, params, film, jnp.uint32(it), mesh=mesh)
    jax.block_until_ready(film.accum)
    return film
