"""Render configuration — the TPU-native replacement for the
reference's ``Kernel_params`` struct (source/kernel_params.h:39-109)
plus its compile-time ``#define`` forks (SURVEY.md §5 config tiers).

Design: ONE frozen dataclass registered as a pytree with a
static/dynamic split:

* **meta fields** (static) — anything that changes the traced program:
  resolutions, loop budgets, engine/integrator/environment selection,
  feature switches.  Changing one re-specializes the jit.
* **data fields** (dynamic) — continuously tweakable quantities
  (exposure, sun angles, densities...).  They are traced jit inputs, so
  the interactive viewer can slide them with ZERO recompiles
  (main.cpp:1666-1780 restart logic without the 1-frame kernel stall).

Defaults mirror the reference's (main.cpp:1350-1376), with
``energy_inject`` at its GUI-effective value 1.0 (main.cpp:1543 maps
the energy slider's 0 to 1.0 before the first frame).
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass

import jax


class Environment(enum.IntEnum):
    """environment_type (kernel_params.h: 0 = procedural atmosphere,
    else HDRI env texture) + two debug/test extensions."""

    ATMOSPHERE = 0
    HDRI = 1
    BLACK = 2      # extension: no environment light
    CONSTANT = 3   # extension: uniform sky_color * sky_mult


class Integrator(enum.IntEnum):
    """kernel_params.integrator (render_kernel.cu:2254-2260)."""

    DIRECT = 0       # Ray Tracing Gems ch.28 (render_kernel.cu:1760)
    VOLUMETRIC = 1   # PBRT-style (render_kernel.cu:1712)


_STATIC = dict(static=True)


@dataclass(frozen=True)
class RenderParams:
    # ---- static (trace-shaping) ----------------------------------------
    width: int = 512
    height: int = 512
    ray_depth: int = 50            # main.cpp:1358
    volume_depth: int = 1          # main.cpp:1359
    max_track_steps: int = 256     # bound for one tracking walk (reference
    #                                walks are unbounded whiles; SURVEY §7#1)
    max_fused_steps: int = 128     # fused-engine loop budget per tile
    integrator: int = int(Integrator.DIRECT)
    environment_type: int = int(Environment.ATMOSPHERE)
    engine: str = "fused"          # fused | reference | march
    seed: int = 0
    jitter: str = "white"          # white | bluenoise (QUIRKS #12)
    fused_loop_mode: str = "while"  # while (early tile exit) | fori
    fused_tile: int = 16384        # rays per fused tile (16384 measured
    #                                optimal on v5e, ROADMAP)
    rays_per_lane: int = 0         # fused-engine ray queues: each lane
    #                                processes Q rays sequentially,
    #                                retiring finished rays and loading
    #                                the next in the SAME loop — per-tile
    #                                iterations approach Q x mean ray
    #                                cost instead of Q x max (idle-lane
    #                                waste was ~65% of gather cost).
    #                                BLACK/CONSTANT environments only
    #                                (terminal env applied inline).
    #                                0 = AUTO (renderer._resolve_auto_
    #                                queue picks Q/tile on big batches;
    #                                1 disables).
    block_tiles: int = 64          # cost-ordered scheduling block edge in
    #                                pixels (~5x at 1080p); 0 disables
    seek_passes: int = 0           # retire+seek passes per fused loop
    #                                trip (queue path; 0 = AUTO = 1).
    #                                Probe knob: extra passes chain a
    #                                lane through several terminal rays
    #                                per trip, but the while loop runs
    #                                to the slowest lane and measured
    #                                max-lanes are walking-heavy — k=4
    #                                cost +33% wall for zero trip
    #                                reduction (tools/probe_seek.py /
    #                                probe_trips.py, config1 cached).
    queue_tiled2d: bool = True     # 2D-TILED slot assignment for full-
    #                                frame queue tiles: slot q = subtile
    #                                (sy, sx) of an Sy x Sx grid, lane =
    #                                in-subtile pixel, plus a per-slot
    #                                2D roll — each lane's Q rays spread
    #                                across the whole frame, so lane
    #                                queue-sums concentrate at the mean.
    #                                Pure reshape/transpose/roll (NO
    #                                gathers — the round-3 stratified
    #                                argsort cost more than it saved).
    strat_schedule: bool = False   # cost-STRATIFIED lane assignment for
    #                                queue tiles (rays_per_lane > 1): rays
    #                                are rank-sorted by the film's cost
    #                                AOV and dealt round-robin into lanes
    #                                so every lane's queue-sum lands near
    #                                the mean (renderer.trace_rays).
    #                                DEFAULT OFF: the permutation costs
    #                                an argsort + 6 full-batch takes per
    #                                step — measured +20 ms/spp on
    #                                config1 cached q16/256k (30.2 vs
    #                                10.6, tools/probe_octant_strat.py),
    #                                dwarfing the loop-trip win; same
    #                                verdict as round 2's per-ray argsort
    #                                (ARCHITECTURE "never worth it").
    march_tile: int = 65536
    march_samples: int = 160       # march-engine ray quadrature points
    shadow_samples: int = 96       # march-engine shadow quadrature points
    use_double_hg: bool = False    # QUIRKS #22 (dead code in the reference)
    use_majorant: bool = True      # empty-space skipping on/off
    shadow_mode: str = "tracked"   # tracked | cached — cached reads
    #                                NEE transmittance from precomputed
    #                                optical-depth corner channels
    #                                (accel/shadow.attach_shadow_cache)
    hdri_importance: bool = False  # QUIRKS #24 (reference: uniform sphere)
    reference_hg_constant: bool = True  # QUIRKS #1 (pi/4 HG constant)
    reference_falloff: bool = True      # QUIRKS #2 (point-light falloff)

    # ---- dynamic (traced; free to change without recompiling) ----------
    exposure_scale: float = 1.0
    azimuth: float = 150.0
    elevation: float = 30.0
    sun_color: object = 1.0        # scalar or (3,)
    sun_mult: float = 1.0
    sky_color: object = 1.0        # scalar or (3,)
    sky_mult: float = 1.0
    phase_g1: float = 0.0
    phase_g2: float = 0.0
    phase_f: float = 1.0
    tr_depth: float = 1.0
    density_mult: float = 1.0
    albedo: object = 1.0           # scalar or (3,)
    extinction: object = 1.0       # scalar or (3,); .x used by emission
    energy_inject: float = 1.0     # GUI-effective default (main.cpp:1543)
    emission_scale: float = 0.0
    emission_pivot: float = 1.0

    def replace(self, **kw) -> "RenderParams":
        return dataclasses.replace(self, **kw)


_FIELDS = [f.name for f in dataclasses.fields(RenderParams)]
_DYNAMIC = ["exposure_scale", "azimuth", "elevation", "sun_color",
            "sun_mult", "sky_color", "sky_mult", "phase_g1", "phase_g2",
            "phase_f", "tr_depth", "density_mult", "albedo", "extinction",
            "energy_inject", "emission_scale", "emission_pivot"]

jax.tree_util.register_dataclass(
    RenderParams,
    data_fields=_DYNAMIC,
    meta_fields=[n for n in _FIELDS if n not in _DYNAMIC],
)
