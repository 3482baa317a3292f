"""The fused engine: the whole direct-integrator path trace as ONE
lane-masked loop state machine.

TPU rationale (docs/ARCHITECTURE.md): the reference nests unbounded
stochastic loops (ray depth -> volume walk -> per-light shadow walks,
render_kernel.cu:1760-1857) — on a SIMD machine each nested masked
loop multiplies idle-lane waste, and every loop body pays its own
serialized gathers.  Here every lane is in exactly one phase of the
walk it is currently running:

    SEEK   — classify the next segment (volume box / sphere / done)
    MARCH  — primary delta tracking        (``sample``,   :1556-1681)
    SHADOW — residual-ratio transmittance  (``Tr``,       :1138-1273)
             for sun NEE, point-light NEE and sphere sun shading
    EMIT   — rate-weighted emission walk   (:1275-1339)
    DONE   — terminal (environment applied after the loop)

and ONE iteration advances every lane one step of whatever walk it is
in, with ONE unified corner-row gather serving density + local
majorant + empty-space skip (ops/trilinear.py, tracking.unified_fetch).
Secondary channels (emission / color / LUTs / light rows) are either
corner-packed rows behind shape-derived static gates or one-hot MXU
lookups — no additional serialized gather sites on density-only
scenes.

The estimator is IDENTICAL to render/integrator.py (same quirks #5/
#6/#7/#19/#21); tests/test_fused.py checks statistical agreement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core.phase import phase_eval, phase_sample
from vpt_tpu.core.vecmath import (EPS, aabb_contains, aabb_intersect, cross,
                                  degree_to_cartesian, length, normalize,
                                  reflect, vec3)
from vpt_tpu.render.tracking import (_emission_lut, _sphere_block,
                                     _use_cells, density_color_lut,
                                     scene_color, scene_emission,
                                     unified_fetch, unified_fetch_full,
                                     vec3_param)

P_SEEK, P_MARCH, P_SHADOW, P_EMIT, P_DONE = 0, 1, 2, 3, 4
AS_SUN, AS_PT, AS_SPHERE = 0, 1, 2


def _walk_box(scene):
    """Bounds a MARCH/EMIT walk must cover: the instance's own box on
    single-instance scenes (the ±1 root pad is provably density- and
    emission-free, so walking it only burns iterations — estimator-
    identical, unlike SHADOW whose tr_depth-residual expectation
    depends on the walk length and keeps root-box parity)."""
    if scene.instances.count == 1:
        return scene.instances.pmin[0], scene.instances.pmax[0]
    return scene.root_pmin, scene.root_pmax


def _march_init(scene, pos, direction):
    """(dist, sphere_limited, skip0) for a primary walk starting at
    pos: dist ends at the walk box's exit, and skip0 pre-seeds the
    walk's `skip` with the provably-empty gap from pos to the box
    entry (outside starts cross it in the FIRST step instead of
    burning a blind hop on it)."""
    bmin, bmax = _walk_box(scene)
    hit, t_in, t_out = aabb_intersect(bmin, bmax, pos, direction)
    t_box = jnp.where(hit, jnp.maximum(t_out, 0.0), 0.0)
    inside = aabb_contains(bmin, bmax, pos)
    skip0 = jnp.where(hit & ~inside, jnp.maximum(t_in, 0.0), 0.0)
    sph_hit, t_sph = _sphere_block(scene, pos, direction)
    lim = sph_hit & (t_sph < t_box)
    dist = jnp.where(lim, t_sph, t_box)
    # never jump past the walk end (sphere inside the entry gap)
    skip0 = jnp.minimum(skip0, dist)
    return dist, lim, skip0


def _shadow_init(scene, params, start, w):
    """Shadow-walk setup (Tr preamble, render_kernel.cu:1148-1167):
    push outside starts to the box, sphere hit -> BLACK (QUIRKS #7),
    premultiply the control-variate T_c.  Returns (spos, dist, tr0):
    dist = 0 makes degenerate walks resolve on their first step."""
    inside = aabb_contains(scene.root_pmin, scene.root_pmax, start)
    hit, t_entry, _ = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                     start, w)
    miss = ~inside & ~hit
    spos = jnp.where((~inside & hit)[..., None],
                     start + w * (t_entry + EPS)[..., None], start)
    _, _, dist = aabb_intersect(scene.root_pmin, scene.root_pmax, spos, w)
    dist = jnp.maximum(dist, 0.0)
    sph_hit, _ = _sphere_block(scene, spos, w)
    sigma_c = scene.min_extinction
    tr0 = jnp.exp(-sigma_c * dist)
    tr0 = jnp.where(miss, 1.0, jnp.where(sph_hit, 0.0, tr0))
    dist = jnp.where(miss | sph_hit, 0.0, dist)
    return spos, dist, tr0


def fused_direct(scene, params, key, origin, direction,
                 return_state: bool = False, phase_counts: bool = False,
                 return_trips: bool = False):
    """Trace one tile of rays.  Returns (L, alpha, cost, unfinished,
    depth) — cost = loop iterations spent walking per ray, unfinished =
    step-budget truncation flag (the bench's honesty audit).

    phase_counts=True additionally returns a (B, 7) int32 array of
    per-ray step-kind counters — the diagnostic that motivated the
    free-flight merge and the cached-shadow mode (accel/shadow.py).

    params.rays_per_lane = Q > 1 runs per-lane RAY QUEUES: the batch
    is split into Q slots of B = len/Q lanes; each lane traces its Q
    rays sequentially, retiring a finished ray and loading the next
    inside the SAME loop iteration.  Idle-lane waste (~65% of gather
    cost at Q=1 — a tile runs to its slowest ray) drops to the
    variance of per-lane SUMS, so per-tile iterations approach
    Q x mean instead of Q x max.  Terminal environment light:
    BLACK/CONSTANT apply inline at retire (position-independent);
    HDRI/ATMOSPHERE retire-DEFER (beta, direction, env_pos) into
    per-slot out-arrays and evaluate environment_radiance once, in
    bulk, after the loop — the per-ray env gather count is identical
    to the Q=1 path, so queues stay a pure utilization win."""
    Q = max(int(params.rays_per_lane), 1)
    defer_env = False
    if Q > 1:
        from vpt_tpu.render.params import Environment
        defer_env = params.environment_type in (int(Environment.HDRI),
                                                int(Environment.ATMOSPHERE))
        if phase_counts or return_state:
            raise ValueError("rays_per_lane > 1 does not support "
                             "phase_counts/return_state")
        if origin.shape[0] % Q:
            raise ValueError(f"ray count {origin.shape[0]} not divisible "
                             f"by rays_per_lane {Q}")
        origins_q = origin.reshape(Q, -1, 3)
        dirs_q = direction.reshape(Q, -1, 3)
        origin = origins_q[0]
        direction = dirs_q[0]
    B = origin.shape[0]
    sigma_max = scene.max_extinction
    sigma_c = scene.min_extinction
    sigma_r = jnp.maximum(sigma_max - sigma_c, 1e-12)
    inv_rate_march = 1.0 / jnp.maximum(sigma_max * params.density_mult,
                                       1e-12)
    rate_inv_shadow = params.tr_depth / sigma_r
    ext = vec3_param(params.extinction)
    rate_inv_emit = params.tr_depth / jnp.maximum(sigma_max * ext[0], 1e-12)
    sun_dir = degree_to_cartesian(params.azimuth, params.elevation)
    n_lights = scene.lights.count
    n_pt_walks = min(n_lights, 11)  # QUIRKS #3 budget
    if n_lights > 0:
        light_rows = jnp.concatenate(
            [scene.lights.pos, scene.lights.color,
             scene.lights.power[:, None]], axis=1)  # (L, 7)

    # cached-shadow mode (accel/shadow.py): NEE transmittances come
    # from optical-depth channels riding the density corner row
    # (single-instance) or a world-space tau grid fetched with one
    # extra row gather (multi-instance) — the medium event's whole
    # light loop costs ZERO walk iterations.  STATIC switch: it
    # reshapes the trace.
    # instanced tau channels folded into the majorant cell rows
    # (accel.shadow._fold_cell_taus) ride the step's existing row
    # gather; the separate world_tau table (below-threshold scenes)
    # costs one extra gather per step
    cells_tau = 0
    if (scene.majorant is not None
            and scene.majorant.cell_rows is not None
            and scene.majorant.cell_instances is not None):
        base = (scene.majorant.packed.shape[-1]
                + scene.majorant.cell_instances.shape[-1])
        cells_tau = (scene.majorant.cell_rows.shape[-1] - base) // 8
    world_cached = (params.shadow_mode == "cached"
                    and scene.instances.count != 1
                    and (scene.world_tau is not None or cells_tau > 0))
    cached_shadows = (params.shadow_mode == "cached"
                      and scene.instances.count == 1) or world_cached
    # single-instance scenes fetch EVERY channel from the unified
    # corner row (unified_fetch_full); multi-instance scenes get the
    # same banded (density, s_box, T_box) contract from the majorant
    # cell grid's packed rows
    full_fetch = scene.instances.count == 1 and not _use_cells(scene)
    # EMIT walks may jump/exit-fold t_box==0 boxes ONLY on the unified
    # corner-row path: _corner_pack folds the emission 3^3-majorant
    # into the zero band there (emission-safe by construction), while
    # the instanced majorant-cell/world-tau skip fields are built from
    # density alone.  Jumping an emission-free span adds exactly 0 to
    # the Poisson-sampled emission sum (memoryless restart past the
    # span), so the estimator is unchanged.
    emit_skip = full_fetch and scene.atlas.has_emission
    if cached_shadows:
        if world_cached:
            n_ch = (cells_tau - 1 if cells_tau
                    else scene.world_tau.shape[-1] // 8 - 1)
        else:
            from vpt_tpu.accel.shadow import n_cached_lights
            n_ch = n_cached_lights(scene.atlas)
        if n_ch != n_lights:
            raise ValueError(
                f"shadow cache has {n_ch} light channels but the scene "
                f"has {n_lights} point lights — re-run "
                "accel.shadow.attach_shadow_cache on this scene")

    def cached_tr(tau, point, w):
        """E[residual-ratio Tr] of a walk from `point` along `w`
        (_shadow_init semantics): exp(-sigma_c*d) * the residual
        expectation exp(-(tau - sigma_c*d)/tr_depth), 0 on sphere hit
        (QUIRKS #7)."""
        _, _, d = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                 point, w)
        d = jnp.maximum(d, 0.0)
        sph_occ, _ = _sphere_block(scene, point, w)
        tr = jnp.exp(-sigma_c * d - (tau - sigma_c * d) / params.tr_depth)
        return jnp.where(sph_occ, 0.0, jnp.clip(tr, 0.0, 1.0))

    def sphere_event(kd, u, pos, dirn, beta, L):
        """Sphere shading (render_kernel.cu:1807-1834) minus the sun Tr
        walk (run by the SHADOW machinery).  Returns (anchor, sdir,
        beta, contrib)."""
        sph = scene.sphere
        normal = normalize((pos - sph.center) / sph.radius)
        facing = jnp.sum(normal * dirn, axis=-1) < 0.0
        nl = jnp.where(facing[..., None], normal, -normal)
        phi = 2.0 * jnp.pi * u[:, 2]
        r2 = u[:, 3]
        r2s = jnp.sqrt(r2)
        w = normalize(nl)
        pick = jnp.abs(w[..., 0]) > 0.1
        ref_axis = jnp.where(pick[..., None], vec3(0.0, 1.0, 0.0),
                             vec3(1.0, 0.0, 0.0))
        uax = normalize(cross(ref_axis, w))
        vax = cross(w, uax)
        hemi = normalize(uax * (jnp.cos(phi) * r2s)[..., None]
                         + vax * (jnp.sin(phi) * r2s)[..., None]
                         + w * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[..., None])
        mirror = reflect(dirn, nl)
        new_dir = mirror + (hemi - mirror) * sph.roughness
        anchor = pos + normal * EPS
        beta = beta * sph.color
        cos_l = jnp.maximum(jnp.sum(sun_dir * normal, axis=-1), 0.0)
        contrib = (vec3_param(params.sun_color) * params.sun_mult
                   * cos_l[..., None])
        return anchor, new_dir, beta, contrib

    def seek_block(kstep, u, state23):
        """The SEEK classification (pure math, no gathers): route
        P_SEEK lanes into MARCH / sphere-SHADOW / DONE.  Called inside
        the loop body AND once before the loop (pre-classifying the
        camera segment saves one full-loop iteration per tile)."""
        (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr, contrib,
         dist, t, skip, tbox, sphere_lim, phase, ascode, nshadow, depth_n,
         depth_aov, cost, step, vd) = state23

        seeking = phase == P_SEEK
        hit1, t1, _tmax1 = aabb_intersect(scene.root_pmin, scene.root_pmax,
                                          pos, dirn)
        hit2, t2 = _sphere_block(scene, pos, dirn)
        entry = pos + dirn * (t1 + EPS)[..., None]
        m_dist, m_lim, m_skip = _march_init(scene, entry, dirn)
        # a zero-length walk (box behind / seek-from-inside, where the
        # tmin<0 -> tmax rule lands entry on the box EXIT — the QUIRKS
        # #19 teleport) contributes nothing: classify past it instead
        # of burning 3 iterations on a degenerate march
        hit1_eff = hit1 & (m_dist > 0.0)
        obj = jnp.where(hit1_eff & (~hit2 | (t1 < t2)), 1,
                        jnp.where(hit2, 2, 0))
        budget_ok = depth_n < params.ray_depth
        go_done = seeking & ((obj == 0) | ~budget_ok)
        go_march = seeking & (obj == 1) & budget_ok
        go_sphere = seeking & (obj == 2) & budget_ok

        phase = jnp.where(go_done, P_DONE, phase)

        # volume branch: advance to entry, start the primary walk
        pos = jnp.where(go_march[..., None], entry, pos)
        dist = jnp.where(go_march, m_dist, dist)
        sphere_lim = jnp.where(go_march, m_lim, sphere_lim)
        t = jnp.where(go_march, 0.0, t)
        skip = jnp.where(go_march, m_skip, skip)
        tbox = jnp.where(go_march, 0.0, tbox)
        phase = jnp.where(go_march, P_MARCH, phase)
        vd = jnp.where(go_march, 0, vd)
        depth_n = depth_n + go_march.astype(jnp.int32)

        # sphere branch
        sp_hit_pos = pos + dirn * t2[..., None]
        s_anchor, s_dir, s_beta, s_contrib = sphere_event(
            kstep, u, sp_hit_pos, dirn, beta, L)
        depth_aov = jnp.where(go_sphere & (depth_aov == 0.0), t2, depth_aov)
        anchor = jnp.where(go_sphere[..., None], s_anchor, anchor)
        sdir = jnp.where(go_sphere[..., None], s_dir, sdir)
        beta = jnp.where(go_sphere[..., None], s_beta, beta)
        env_pos = jnp.where(go_sphere[..., None], s_anchor, env_pos)
        contrib = jnp.where(go_sphere[..., None], s_contrib, contrib)
        w_pos, w_dist, w_tr0 = _shadow_init(scene, params, s_anchor,
                                            jnp.broadcast_to(sun_dir,
                                                             pos.shape))
        pos = jnp.where(go_sphere[..., None], w_pos, pos)
        dirn = jnp.where(go_sphere[..., None],
                         jnp.broadcast_to(sun_dir, pos.shape), dirn)
        dist = jnp.where(go_sphere, w_dist, dist)
        tr = jnp.where(go_sphere, w_tr0, tr)
        t = jnp.where(go_sphere, 0.0, t)
        skip = jnp.where(go_sphere, 0.0, skip)
        tbox = jnp.where(go_sphere, 0.0, tbox)
        ascode = jnp.where(go_sphere, AS_SPHERE, ascode)
        phase = jnp.where(go_sphere, P_SHADOW, phase)
        depth_n = depth_n + go_sphere.astype(jnp.int32)
        return (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr,
                contrib, dist, t, skip, tbox, sphere_lim, phase, ascode,
                nshadow, depth_n, depth_aov, cost, step, vd)

    def _const_env(beta):
        """Inline terminal env for the queue path (BLACK/CONSTANT:
        position-independent, so no env_pos deferral is needed)."""
        from vpt_tpu.render.params import Environment
        if params.environment_type == int(Environment.CONSTANT):
            return vec3_param(params.sky_color) * params.sky_mult * beta
        return jnp.zeros_like(beta)

    def _slot_select(slot, table_q):
        """Per-lane row from a (Q, B, 3) table by slot — a Q-way
        where-chain (pure VPU, no gather)."""
        out = table_q[0]
        for q in range(1, Q):
            out = jnp.where((slot == q)[..., None], table_q[q], out)
        return out

    def retire_reload(state):
        """Queue bookkeeping, run at the top of every iteration:
        finished lanes write their ray's outputs into their slot and
        load the next ray as P_SEEK (classified by seek_block in the
        SAME iteration — a retire costs zero extra loop trips)."""
        (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr, contrib,
         dist, t, skip, tbox, sphere_lim, phase, ascode, nshadow, depth_n,
         depth_aov, cost, step, vd, slot, o_l, o_a, o_c, o_d,
         o_done) = state[:29]
        fin = (phase == P_DONE) & (slot < Q)
        l_fin = L if defer_env else L + _const_env(beta)
        m = (jnp.arange(Q)[:, None] == slot[None, :]) & fin[None, :]
        o_l = jnp.where(m[..., None], l_fin[None], o_l)
        o_a = jnp.where(m, jnp.minimum(alpha, 1.0)[None], o_a)
        o_c = jnp.where(m, cost.astype(jnp.float32)[None], o_c)
        o_d = jnp.where(m, depth_aov[None], o_d)
        o_done = o_done | m
        if defer_env:
            o_beta, o_dir, o_epos = state[29:32]
            m3 = m[..., None]
            o_beta = jnp.where(m3, beta[None], o_beta)
            o_dir = jnp.where(m3, dirn[None], o_dir)
            o_epos = jnp.where(m3, env_pos[None], o_epos)
        slot = slot + fin.astype(jnp.int32)
        more = fin & (slot < Q)
        new_o = _slot_select(slot, origins_q)
        new_d = _slot_select(slot, dirs_q)
        mm = more[..., None]
        pos = jnp.where(mm, new_o, pos)
        dirn = jnp.where(mm, new_d, dirn)
        anchor = jnp.where(mm, new_o, anchor)
        sdir = jnp.where(mm, new_d, sdir)
        env_pos = jnp.where(mm, new_o, env_pos)
        beta = jnp.where(mm, 1.0, beta)
        L = jnp.where(mm, 0.0, L)
        alpha = jnp.where(more, 0.0, alpha)
        tr = jnp.where(more, 1.0, tr)
        contrib = jnp.where(mm, 0.0, contrib)
        dist = jnp.where(more, 0.0, dist)
        t = jnp.where(more, 0.0, t)
        skip = jnp.where(more, 0.0, skip)
        tbox = jnp.where(more, 0.0, tbox)
        sphere_lim = jnp.where(more, False, sphere_lim)
        ascode = jnp.where(more, 0, ascode)
        nshadow = jnp.where(more, 0, nshadow)
        depth_n = jnp.where(more, 0, depth_n)
        depth_aov = jnp.where(more, 0.0, depth_aov)
        cost = jnp.where(more, 0, cost)
        vd = jnp.where(more, 0, vd)
        phase = jnp.where(more, P_SEEK, phase)
        out = (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr,
               contrib, dist, t, skip, tbox, sphere_lim, phase, ascode,
               nshadow, depth_n, depth_aov, cost, step, vd, slot, o_l,
               o_a, o_c, o_d, o_done)
        return out + ((o_beta, o_dir, o_epos) if defer_env else ())

    # retire+seek passes per trip (probe knob, AUTO=1): k passes let a
    # lane chain through k terminal rays (env misses) in one trip, but
    # the while loop runs to the slowest LANE, and measured max-lanes
    # are walking-heavy, not miss-heavy — extra passes cut the MEAN
    # lane sum, not the max, so they pay ~1 ms/spp of pure VPU for no
    # trip reduction (tools/probe_seek.py: 9.5 -> 12.6 ms/spp at k=4).
    seek_k = max(params.seek_passes, 1)

    def body(state):
        kstep = jax.random.fold_in(key, state[21])
        u = jax.random.uniform(kstep, (B, 5))

        if Q > 1:
            for p in range(seek_k - 1):
                state = retire_reload(state)
                kp = jax.random.fold_in(kstep, 1 + p)
                up = jax.random.uniform(kp, (B, 5))
                state = seek_block(kp, up, state[:23]) + state[23:]
            state = retire_reload(state)
        qstate = state[23:] if Q > 1 else ()

        (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr, contrib,
         dist, t, skip, tbox, sphere_lim, phase, ascode, nshadow, depth_n,
         depth_aov, cost, step, vd) = seek_block(kstep, u, state[:23])

        # --------------------------------------------- WALK step -----
        marching = phase == P_MARCH
        shadowing = phase == P_SHADOW
        emitting = phase == P_EMIT
        walking = marching | shadowing | emitting

        # banded free-flight step.  The previous fetch left (skip,
        # tbox): the exit distance and density bound of the current
        # bounded-density box (tbox = 0 -> guaranteed empty).  MARCH
        # draws the tentative collision at the LOCAL bound while it
        # stays inside the box; past the box (or through an empty box)
        # it continues at the global majorant — thinning at the landing
        # keeps the estimator exact (spatially-varying-majorant delta
        # tracking; null fraction at the global rate measured 95% on
        # dragon.vdb).  SHADOW jumps empty boxes and steps globally
        # (residual ratio); EMIT integrates everywhere.
        rate_inv = jnp.where(marching, inv_rate_march,
                             jnp.where(shadowing, rate_inv_shadow,
                                       rate_inv_emit))
        e_glob = -jnp.log1p(-u[:, 0]) * rate_inv
        e_loc = -jnp.log1p(-u[:, 4]) / jnp.maximum(
            tbox * params.density_mult, 1e-12)
        in_box = marching & (tbox > 0.0) & (e_loc <= skip)
        # SHADOW always jumps guaranteed-empty boxes; EMIT joins it on
        # emission-safe tables (emit_skip, see the static gate above)
        can_jump = (shadowing | emitting) if emit_skip else shadowing
        jumped = (skip > 0.0) & ((marching & ~in_box)
                                 | (can_jump & (tbox <= 0.0)))
        dt = jnp.where(marching,
                       jnp.where(in_box, e_loc, skip + e_glob),
                       jnp.where(can_jump,
                                 jnp.where(tbox <= 0.0, skip, 0.0) + e_glob,
                                 e_glob))
        t_new = jnp.where(walking, t + dt, t)
        exited = walking & (t_new >= dist)
        cursor = pos + dirn * t_new[..., None]

        if full_fetch:
            fr = unified_fetch_full(scene, params, cursor, dirn,
                                    with_tau=cached_shadows)
            density, s_new, tbox_new = fr.density, fr.s_box, fr.t_box
            if cached_shadows:
                taus = fr.tau
        elif world_cached and cells_tau:
            density, s_new, tbox_new, taus = unified_fetch(
                scene, params, cursor, dirn, with_tau=True, banded=True)
        else:
            density, s_new, tbox_new = unified_fetch(scene, params, cursor,
                                                     dirn, banded=True)
            if world_cached:
                from vpt_tpu.accel.shadow import world_tau_fetch
                taus = world_tau_fetch(scene, cursor)
        s_old, t_old = skip, tbox   # the box the step was DRAWN in
        skip = jnp.where(walking, jnp.where(exited, 0.0, s_new), skip)
        tbox = jnp.where(walking, jnp.where(exited, 0.0, tbox_new), tbox)
        # only commit the advance for steps that stay inside the walk
        t = jnp.where(walking & ~exited, t_new, t)

        sampled = walking & ~exited
        # exit folding: when the landing's empty box provably covers
        # the rest of the walk, end it THIS iteration instead of
        # discovering the exit with one more gather next iteration
        cov_lanes = sampled if emit_skip else (sampled & ~emitting)
        covers = cov_lanes & (tbox_new <= 0.0) & (s_new > 0.0) \
            & (t_new + s_new >= dist)
        if phase_counts:
            # chained: landed in ANOTHER empty box mid-walk — the next
            # iteration will jump again (per-octant box-growth target)
            chained = (cov_lanes & (tbox_new <= 0.0)
                       & (s_new > 0.0) & ~covers)
            pcnt_new = jnp.stack(
                [jumped & ~exited,
                 marching & sampled, marching & exited, shadowing,
                 emitting, covers, chained], axis=-1).astype(jnp.int32)

        # MARCH: collision test thinned at the bound the tentative
        # event was DRAWN at (t_old, NOT the landing's box — exact
        # spatially-varying-majorant delta tracking), and the
        # reference's alpha heuristic (+= density per sample,
        # render_kernel.cu:1670) importance-corrected by sigma_max/
        # bound so its expectation matches the global-rate walk.
        bound = jnp.where(in_box, t_old, sigma_max)
        m_sampled = sampled & marching
        # alpha integrates density over the traversed span (the
        # expected value of the reference's per-global-sample
        # accumulation, render_kernel.cu:1670) by trapezoid, with the
        # crossed box's interior clamped to its density bound T (the
        # endpoints belong to ADJACENT regions and can both exceed it;
        # T = 0 makes jumped-empty spans contribute exactly 0)
        alpha = alpha + jnp.where(m_sampled,
                                  density * (sigma_max / bound), 0.0)
        accept = m_sampled & (density / bound > u[:, 1])
        if phase_counts:
            pcnt = state[23] + jnp.concatenate(
                [pcnt_new, accept.astype(jnp.int32)[:, None]], axis=-1)
        # volume_depth > 1 (render_kernel.cu:1786, integrator.py inner
        # loop): all but the LAST sub-walk's interaction scatter (HG)
        # and keep marching with NO NEE — only the loop-final medium
        # event estimates lights/emission.  Static gate: the common
        # volume_depth == 1 trace is unchanged.
        if params.volume_depth > 1:
            nee_now = accept & (vd >= params.volume_depth - 1)
            accept_more = accept & ~nee_now
        else:
            nee_now = accept

        # SHADOW: residual ratio factor
        s_sampled = sampled & shadowing
        factor = 1.0 - (density - sigma_c) / sigma_r
        tr = jnp.where(s_sampled, tr * factor, tr)
        tr_dead = shadowing & (jnp.abs(tr) < EPS)

        # EMIT: accumulate emission (unscaled by beta, QUIRKS #5/#21).
        # Single-instance scenes read the channel from THIS step's row
        # (unified_fetch_full) — no second gather site.
        if scene.atlas.has_emission:
            e_sampled = sampled & emitting
            if full_fetch:
                em = _emission_lut(scene, params, fr.emission_raw,
                                   fr.emission_valid)
            else:
                em = scene_emission(scene, cursor, params)
            L = L + jnp.where(e_sampled[..., None], em, 0.0)

        cost = cost + walking.astype(jnp.int32)

        # ------------------------------------------ MARCH events -----
        # collision: shade + scatter, then chain into the sun shadow walk
        if full_fetch:
            cd = fr.color if fr.color is not None else 1.0
        else:
            cd = scene_color(scene, cursor)
        lut = density_color_lut(scene, params, density)
        coll_val = (vec3_param(params.albedo) * cd * lut / ext
                    * params.energy_inject)
        beta = jnp.where(accept[..., None], beta * coll_val, beta)
        hg_dir, _ = phase_sample(params, dirn, jax.random.fold_in(kstep, 7))
        anchor = jnp.where(accept[..., None], cursor, anchor)
        sdir = jnp.where(accept[..., None], hg_dir, sdir)
        cur_origin = _slot_select(qstate[0], origins_q) if Q > 1 else origin
        depth_aov = jnp.where(accept & (depth_aov == 0.0),
                              length(cursor - cur_origin), depth_aov)

        cos_sun = jnp.sum(sdir * sun_dir, axis=-1)
        sun_contrib = (vec3_param(params.sun_color) * params.sun_mult
                       * phase_eval(params, cos_sun)[..., None])
        if cached_shadows:
            # whole NEE (sun + every point light) evaluated from the
            # cached optical depths riding this step's row gather —
            # zero walk iterations; same expectation as the tracked
            # walks (the random-light budget becomes the explicit
            # n_pt_walks/n_lights-weighted sum, a variance reduction)
            nee = sun_contrib * cached_tr(
                taus[..., 0], cursor,
                jnp.broadcast_to(sun_dir, pos.shape))[..., None]
            pt_w = n_pt_walks / max(n_lights, 1)
            for i in range(n_lights):
                lp = scene.lights.pos[i]
                wi = normalize(lp - cursor)
                cos_pt = jnp.sum(sdir * wi, axis=-1)
                if params.reference_falloff:  # QUIRKS #2
                    sqr = length(lp * lp - cursor * cursor)
                else:
                    sqr = jnp.sum((lp - cursor) ** 2, axis=-1)
                falloff = 1.0 / jnp.maximum(sqr, 1e-12)
                pt_contrib = scene.lights.color[i] * (
                    scene.lights.power[i] * phase_eval(params, cos_pt)
                    * falloff * pt_w)[..., None]
                nee = nee + pt_contrib * cached_tr(taus[..., 1 + i],
                                                   cursor, wi)[..., None]
            L = L + jnp.where(nee_now[..., None], nee * beta, 0.0)
        else:
            nshadow = jnp.where(nee_now, n_pt_walks, nshadow)
            w_pos, w_dist, w_tr0 = _shadow_init(
                scene, params, anchor, jnp.broadcast_to(sun_dir, pos.shape))
            pos = jnp.where(nee_now[..., None], w_pos, pos)
            dirn = jnp.where(nee_now[..., None],
                             jnp.broadcast_to(sun_dir, pos.shape), dirn)
            dist = jnp.where(nee_now, w_dist, dist)
            tr = jnp.where(nee_now, w_tr0, tr)
            t = jnp.where(nee_now, 0.0, t)
            skip = jnp.where(nee_now, 0.0, skip)
            tbox = jnp.where(nee_now, 0.0, tbox)
            contrib = jnp.where(nee_now[..., None], sun_contrib, contrib)
            ascode = jnp.where(nee_now, AS_SUN, ascode)
            phase = jnp.where(nee_now, P_SHADOW, phase)

        if params.volume_depth > 1:
            # intermediate interaction: restart the primary walk from
            # the collision point along the scattered direction
            vm_dist, vm_lim, _vm_skip = _march_init(scene, cursor, hg_dir)
            pos = jnp.where(accept_more[..., None], cursor, pos)
            dirn = jnp.where(accept_more[..., None], hg_dir, dirn)
            dist = jnp.where(accept_more, vm_dist, dist)
            sphere_lim = jnp.where(accept_more, vm_lim, sphere_lim)
            t = jnp.where(accept_more, 0.0, t)
            skip = jnp.where(accept_more, 0.0, skip)
            tbox = jnp.where(accept_more, 0.0, tbox)
            vd = jnp.where(accept_more, vd + 1, vd)

        # primary walk exit without interaction -> classify the
        # continuation HERE (pure math): DONE unless the sphere lies
        # ahead (the reference's post-volume closest-object check; the
        # QUIRKS #19 teleport + box convexity mean the box itself is
        # never re-entered) — saves the SEEK iteration per exit
        m_exit = (exited | (covers & ~accept)) & marching
        exit_pos = pos + dirn * t[..., None]
        sph_ahead, _ = _sphere_block(scene, exit_pos, dirn)
        pos = jnp.where(m_exit[..., None], exit_pos, pos)
        phase = jnp.where(m_exit, jnp.where(sph_ahead, P_SEEK, P_DONE),
                          phase)

        # --------------------------------------- SHADOW walk end -----
        s_end = shadowing & (exited | tr_dead | covers) & ~accept
        tr_fin = jnp.clip(tr, 0.0, 1.0)
        L = L + jnp.where(s_end[..., None], contrib * tr_fin[..., None]
                          * beta, 0.0)

        start_pt = s_end & (nshadow > 0)
        # decided BEFORE the decrement below: a lane either chains into
        # the next point-light walk or finishes its shadow sequence
        walks_done = s_end & ~start_pt
        if n_lights > 0:
            idx = jnp.minimum((u[:, 2] * n_lights).astype(jnp.int32),
                              n_lights - 1)
            oh = jax.nn.one_hot(idx, n_lights, dtype=jnp.float32)
            lrow = oh @ light_rows  # (B, 7) one-hot MXU pick
            lpos, lcol, lpow = lrow[:, 0:3], lrow[:, 3:6], lrow[:, 6]
            wi = normalize(lpos - anchor)
            cos_pt = jnp.sum(sdir * wi, axis=-1)
            if params.reference_falloff:  # QUIRKS #2
                sqr = length(lpos * lpos - anchor * anchor)
            else:
                sqr = jnp.sum((lpos - anchor) ** 2, axis=-1)
            falloff = 1.0 / jnp.maximum(sqr, 1e-12)
            pt_contrib = lcol * (lpow * phase_eval(params, cos_pt)
                                 * falloff)[..., None]
            w_pos, w_dist, w_tr0 = _shadow_init(scene, params, anchor, wi)
            pos = jnp.where(start_pt[..., None], w_pos, pos)
            dirn = jnp.where(start_pt[..., None], wi, dirn)
            dist = jnp.where(start_pt, w_dist, dist)
            tr = jnp.where(start_pt, w_tr0, tr)
            t = jnp.where(start_pt, 0.0, t)
            skip = jnp.where(start_pt, 0.0, skip)
            tbox = jnp.where(start_pt, 0.0, tbox)
            contrib = jnp.where(start_pt[..., None], pt_contrib, contrib)
            nshadow = jnp.where(start_pt, nshadow - 1, nshadow)
            ascode = jnp.where(start_pt, AS_PT, ascode)

        # all shadow walks done -> emission walk (if the scene has the
        # channel) or resume the path from the collision point.  The
        # collision anchor is inside the box, so the QUIRKS #19
        # teleport means the scattered segment can only end at the
        # sphere or the environment — classify that HERE (pure math)
        # instead of spending a SEEK iteration on it.
        resume_emit = walks_done & (ascode != AS_SPHERE)
        if cached_shadows:
            # cached medium events resume directly (their NEE is done)
            resume_emit = resume_emit | nee_now
        resume_seek = walks_done & (ascode == AS_SPHERE)
        sph_res, _ = _sphere_block(scene, anchor, sdir)
        if scene.atlas.has_emission:
            wbmin, wbmax = _walk_box(scene)
            _, _, e_dist = aabb_intersect(wbmin, wbmax, anchor, sdir)
            pos = jnp.where(resume_emit[..., None], anchor, pos)
            dirn = jnp.where(resume_emit[..., None], sdir, dirn)
            dist = jnp.where(resume_emit, jnp.maximum(e_dist, 0.0), dist)
            t = jnp.where(resume_emit, 0.0, t)
            skip = jnp.where(resume_emit, 0.0, skip)
            tbox = jnp.where(resume_emit, 0.0, tbox)
            phase = jnp.where(resume_emit, P_EMIT, phase)
        else:
            pos = jnp.where(resume_emit[..., None], anchor, pos)
            dirn = jnp.where(resume_emit[..., None], sdir, dirn)
            phase = jnp.where(resume_emit,
                              jnp.where(sph_res, P_SEEK, P_DONE), phase)
        # sphere-bounce resumes may genuinely re-enter the box (the
        # sphere anchor can sit outside it) — full SEEK next iteration
        pos = jnp.where(resume_seek[..., None], anchor, pos)
        dirn = jnp.where(resume_seek[..., None], sdir, dirn)
        phase = jnp.where(resume_seek, P_SEEK, phase)

        # ----------------------------------------- EMIT walk end -----
        # covers & emitting is only reachable when emit_skip (the box
        # is then provably emission-free to the walk's end: exact)
        e_end = emitting & (exited | covers)
        pos = jnp.where(e_end[..., None], anchor, pos)
        dirn = jnp.where(e_end[..., None], sdir, dirn)
        phase = jnp.where(e_end, jnp.where(sph_res, P_SEEK, P_DONE), phase)

        ret = (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr,
               contrib, dist, t, skip, tbox, sphere_lim, phase, ascode,
               nshadow, depth_n, depth_aov, cost, step + 1, vd) + qstate
        return ret + (pcnt,) if phase_counts else ret

    zf = jnp.zeros(B, jnp.float32)
    zi = jnp.zeros(B, jnp.int32)
    state = (origin, direction, origin, direction, origin,
             jnp.ones((B, 3), jnp.float32), jnp.zeros((B, 3), jnp.float32),
             zf, jnp.ones(B, jnp.float32), jnp.zeros((B, 3), jnp.float32),
             zf, zf, zf, zf, jnp.zeros(B, bool),
             jnp.full(B, P_SEEK, jnp.int32),
             zi, zi, zi, zf, zi, jnp.int32(0), zi)
    # pre-classify the camera segment (gather-free math): rays start
    # the loop already MARCHing / in the sphere's sun walk / DONE
    k0 = jax.random.fold_in(key, 1 << 20)
    state = seek_block(k0, jax.random.uniform(k0, (B, 5)), state)
    if Q > 1:
        state = state + (zi,                                # slot
                         jnp.zeros((Q, B, 3), jnp.float32),  # out L
                         jnp.zeros((Q, B), jnp.float32),     # out alpha
                         jnp.zeros((Q, B), jnp.float32),     # out cost
                         jnp.zeros((Q, B), jnp.float32),     # out depth
                         jnp.zeros((Q, B), bool))            # out done
        if defer_env:
            # beta=0 zeroes unretired slots' env term; dir/pos init
            # with REAL ray values (a zero direction could make the
            # atmosphere eval non-finite, and NaN * 0 = NaN)
            state = state + (jnp.zeros((Q, B, 3), jnp.float32),  # beta
                             dirs_q.astype(jnp.float32),          # dir
                             origins_q.astype(jnp.float32))       # env_pos
    if phase_counts:
        state = state + (jnp.zeros((B, 8), jnp.int32),)

    budget = params.max_fused_steps * Q
    if params.fused_loop_mode == "fori":
        state = jax.lax.fori_loop(0, budget, lambda i, s: body(s), state)
    else:
        if Q > 1:
            def cond(s):
                phase, step, slot = s[15], s[21], s[23]
                live = ~((phase == P_DONE) & (slot >= Q))
                return (step < budget) & jnp.any(live)
        else:
            def cond(s):
                phase, step = s[15], s[21]
                return (step < budget) & jnp.any(phase != P_DONE)
        state = jax.lax.while_loop(cond, body, state)

    if Q > 1:
        # rays finishing exactly at the last iteration still need their
        # retire write; unfinished slots stay o_done=False (truncated)
        state = retire_reload(state)
        _slot, o_l, o_a, o_c, o_d, o_done = state[23:29]
        L = o_l.reshape(Q * B, 3)
        if defer_env:
            # bulk terminal env over every retired ray (truncated
            # slots carry beta=0): same per-ray env gather count as
            # the Q=1 post-loop application
            o_beta, o_dir, o_epos = state[29:32]
            from vpt_tpu.render.integrator import environment_radiance
            L = L + environment_radiance(
                scene, params, o_epos.reshape(Q * B, 3),
                o_dir.reshape(Q * B, 3)) * o_beta.reshape(Q * B, 3)
        alpha = o_a.reshape(Q * B)
        cost = o_c.reshape(Q * B)
        depth_aov = o_d.reshape(Q * B)
        unfinished = 1.0 - o_done.reshape(Q * B).astype(jnp.float32)
        if return_trips:
            # total while-loop trips (state[21]) — the probe diagnostic
            # for the wall = trips x B x per-trip-cost model
            return L, alpha, cost, unfinished, depth_aov, state[21]
        return L, alpha, cost, unfinished, depth_aov

    (pos, dirn, anchor, sdir, env_pos, beta, L, alpha, tr, contrib, dist,
     t, skip, tbox, sphere_lim, phase, ascode, nshadow, depth_n, depth_aov,
     cost, _step, _vd) = state[:23]

    from vpt_tpu.render.integrator import environment_radiance
    L = L + environment_radiance(scene, params, env_pos, dirn) * beta
    alpha = jnp.minimum(alpha, 1.0)
    unfinished = (phase != P_DONE).astype(jnp.float32)
    if phase_counts:
        return L, alpha, cost.astype(jnp.float32), unfinished, depth_aov, \
            state[23]
    if return_state:
        return L, alpha, cost.astype(jnp.float32), unfinished, depth_aov, \
            state
    if return_trips:
        return L, alpha, cost.astype(jnp.float32), unfinished, depth_aov, \
            _step
    return L, alpha, cost.astype(jnp.float32), unfinished, depth_aov
