"""Telemetry-driven static-capacity sizing (shared by Trainer and bench).

The reference adapts its per-step sample budget from a running mean of
measured sample counts (raymarching.py:224-229 ``mean_count``). The TPU
design needs *static* capacities (ray compaction slots, sample buffer,
march-orbit length, sample-lattice width) — this module is the one place
that turns measured occupancy telemetry (``n_hit`` / ``n_samples_needed`` /
``n_max_count`` / ``n_torso_mask`` from render results) into a resized
RenderConfig, bucketed so recompiles stay bounded while capacities stay
tight AND safe (undersized capacities silently drop work)."""

from __future__ import annotations

import dataclasses
from typing import Optional


from ..models.renderer import RenderConfig

ray_capacity = RenderConfig.ray_capacity
sample_capacity = RenderConfig.sample_capacity


def adapt_render_config(
    rc,
    n_hit: int,
    n_needed: int,
    n_max: int,
    n_rays: int,
    occ_radius: float,
    n_torso: Optional[int] = None,
    n_groups: Optional[int] = None,
    n_group_max: Optional[int] = None,
    n_k_span: Optional[int] = None,
    headroom: float = 1.35,
    fresh: bool = False,
):
    """Return a resized RenderConfig, or None if no change is needed.

    - ray capacity: keep hits within [40%, 85%] of capacity (1/8 buckets,
      rounded UP so growth is immediate, shrink only on big slack),
    - sample capacity: quarter-step mult covering needed samples with
      headroom (shrink only past a half-step of slack),
    - march orbit length: cover the occupied-sphere diameter (+margin) only,
      in buckets of 8,
    - sample-lattice width: grow when the marcher saturates it, shrink on
      >= 4 slots of slack (buckets of 4; dt semantics derive from max_steps
      alone and are untouched),
    - torso pixel capacity: same 1/8-bucket rule on the torso mask count.

    ``fresh=True`` snaps every capacity straight to the measured want (for a
    one-shot sizing pass from exhaustive telemetry, e.g. bench.py); the
    default hysteresis exists to bound recompile churn DURING training.
    """
    frac = rc.ray_capacity_frac
    R = ray_capacity(n_rays, frac)
    want = min(1.0, (n_hit / n_rays) * headroom if n_rays else 1.0)
    want = max(0.125, -(-want * 8 // 1) / 8)  # round UP to 1/8
    if fresh or want > frac or (want < frac and n_hit < 0.4 * R):
        frac = want

    mult = rc.sample_capacity_mult
    r_for_mult = ray_capacity(n_rays, frac)
    used = n_needed / max(r_for_mult, 1)
    # quarter-step granularity: integer mults waste up to R slots of
    # encoder gathers per frame; shrink only past a half-step of slack.
    # fresh (one-shot sizing from exhaustive telemetry): 1/16 steps — the
    # encoder gathers scale linearly with this capacity and there is no
    # recompile churn to bound
    step = 0.0625 if fresh else 0.25
    want_mult = max(step, -(-used * headroom / step // 1) * step)
    if fresh or want_mult > mult or want_mult < mult - 0.5:
        mult = want_mult

    march_iters = rc.march_iters
    dt_min = rc.march_config().dt_min
    k_step = 2 if fresh else 8  # fine buckets when there is no churn to bound
    if n_k_span is not None and n_k_span > 0:
        # EXACT need: the widest per-ray marched window, measured
        # (results["n_k_span"]). For a frontal camera the occupied-bbox
        # depth binds this far below the sphere-diameter estimate.
        want_k = int(-(-(n_k_span + 2) // k_step)) * k_step
    else:
        # no telemetry: conservative bound from the occupied-sphere
        # diameter (a window chord can never exceed it)
        want_k = int(-(-(2.0 * occ_radius / dt_min + 2) // 8)) * 8
    full_k = dataclasses.replace(rc, march_iters=None).march_config().n_march_iters
    want_k = min(want_k, full_k)
    # grow IMMEDIATELY (an orbit shorter than the span silently truncates
    # marched windows); shrink only past a WIDE band — per-pose span
    # variation would otherwise churn grow/shrink recompiles against the
    # adaptive-recompile cap
    if (fresh or march_iters is None or want_k > march_iters
            or want_k < march_iters - 16):
        march_iters = want_k

    slots = rc.sample_slots if rc.sample_slots is not None else rc.max_steps
    if fresh:
        # +1 safety slot, buckets of 2 (the return-trip slab gathers, the
        # marcher's slot selection, and compositing all scale with this)
        slots = min(rc.max_steps, max(4, int(-(-(n_max + 1) // 2)) * 2))
    elif n_max >= slots and slots < rc.max_steps:
        slots = min(rc.max_steps, slots + 4)
    elif n_max + 1 <= slots - 4:
        slots = max(4, int(-(-(n_max + 1) // 4)) * 4)

    # two-level march capacities (only when enabled and measured)
    g_mult = rc.march_group_mult
    g_slots = rc.march_group_slots
    if rc.march_group and n_groups is not None:
        used_g = n_groups / max(r_for_mult, 1)
        want_g = max(0.5, -(-used_g * headroom / 0.25 // 1) * 0.25)
        if fresh or want_g > g_mult or want_g < g_mult - 0.5:
            g_mult = want_g
    if rc.march_group and n_group_max is not None:
        # n_group_max is the TRUE per-ray need (counted pre-truncation in
        # march_rays_grouped), so size to it directly (buckets of 2)
        from ..models.renderer import RendererState

        kg = -(-(march_iters if march_iters is not None
                 else rc.march_config().n_march_iters)
               // RendererState.MARCH_GROUP)
        cur_gs = g_slots if g_slots is not None else kg
        want_gs = min(kg, max(2, int(-(-(n_group_max + 1) // 2)) * 2))
        if fresh or want_gs > cur_gs or want_gs < cur_gs - 2:
            g_slots = want_gs

    t_frac = rc.torso_capacity_frac
    if n_torso is not None and rc.torso:
        cur = t_frac if t_frac is not None else frac
        want_t = min(1.0, (n_torso / n_rays) * headroom if n_rays else 1.0)
        want_t = max(0.125, -(-want_t * 8 // 1) / 8)
        T_cap = ray_capacity(n_rays, cur)
        if fresh or want_t > cur or (want_t < cur and n_torso < 0.4 * T_cap):
            t_frac = want_t

    if (frac != rc.ray_capacity_frac or mult != rc.sample_capacity_mult
            or march_iters != rc.march_iters or slots != rc.sample_slots
            or t_frac != rc.torso_capacity_frac
            or g_mult != rc.march_group_mult
            or g_slots != rc.march_group_slots):
        return dataclasses.replace(
            rc, ray_capacity_frac=frac, sample_capacity_mult=mult,
            march_iters=march_iters, sample_slots=slots,
            torso_capacity_frac=t_frac,
            march_group_mult=g_mult, march_group_slots=g_slots,
        )
    return None
