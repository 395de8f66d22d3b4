"""Rendering engine: occupancy-grid state + the whole-frame render pipeline.

Reference: nerf/renderer.py (NeRFRenderer). The reference mixes mutable
buffers (density_grid, bitfield, step counters, smoothed audio code) into an
nn.Module and drives an irregular CUDA pipeline (run_cuda, renderer.py:158-316)
plus a Python alive-ray loop at inference (:239-262). Here:

- All mutable state is an explicit ``RendererState`` pytree threaded through
  pure functions (TPU-functional style).
- One jit-able ``render_rays`` covers train AND inference: fixed-lattice
  marching (ops.marching), optional prefix-sum compaction for the hot field
  evaluation, closed-form masked compositing, torso 2-D layer, background
  blending. The mean_count/step_counter machinery (renderer.py:126-129,
  :495-499) disappears — capacity is a static config knob.
- Grid maintenance (update_extra_state, renderer.py:383-501;
  mark_untrained_grid, :318-381) are pure state-update functions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import (
    MarchConfig,
    composite_rays,
    march_rays,
    morton3d,
    morton3d_invert,
    morton_dilate,
    near_far_from_aabb,
    packbits,
)
from ..ops.marching import (
    build_coarse_rows,
    build_sigma_bytes,
    march_rays_grouped,
    pack_sigma_byte_rows,
)
from ..ops.rowgather import take_rows
from .network import (
    NetworkConfig,
    encode_audio,
    field_density,
    field_forward,
    forward_torso,
)

GRID_SIZE = 128  # renderer.py:70
SQRT3 = 1.7320508075688772


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (derived from Options)."""

    bound: float = 1.0
    min_near: float = 0.05
    density_thresh: float = 10.0
    density_thresh_torso: float = 0.01
    max_steps: int = 16
    dt_gamma: float = 1.0 / 256
    grid_size: int = GRID_SIZE
    torso: bool = False
    exp_eye: bool = True
    smooth_lips: bool = False
    density_scale: float = 1.0
    T_thresh: float = 1e-4
    # TPU: static field-eval buffer size as a multiple of the (compacted)
    # ray count; fractional values are allowed (the buffer is bucketed to
    # 128 rows) — integer-only mults waste up to R unused slots of encoder
    # gathers per frame
    sample_capacity_mult: float = 4.0
    march_iters: Optional[int] = None
    # TPU: static capacity for occupied-bbox ray compaction, as a fraction of
    # the ray count; >= 1.0 disables ray compaction (all rays marched).
    ray_capacity_frac: float = 1.0
    # TPU: width of the per-ray sample lattice (a capacity, NOT a semantic
    # knob — dt derives from max_steps alone). None -> max_steps. The
    # density-prior cull bounds real counts far below max_steps on converged
    # scenes (telemetry n_max_count); a tight lattice halves the marcher's
    # selection, the compacted return trip, and compositing.
    sample_slots: Optional[int] = None
    # TPU: static capacity for torso pixel compaction (fraction of pixels);
    # None -> follow ray_capacity_frac.
    torso_capacity_frac: Optional[float] = None
    # TPU: density-prior sample culling (see ops.marching.march_rays): drop
    # selected samples whose conservative transmittance bound from the EMA
    # density grid is already < cull_T (<< T_thresh, so the compositor's
    # early-termination chain would never process them). 0 disables.
    cull_T: float = 1e-6
    # TPU: two-level marching (ops.marching.march_rays_grouped). True
    # enables it when the config qualifies (affine orbit, cascade 1);
    # march_group_mult sizes the global kept-group buffer as a multiple of
    # the compacted ray count (overflow drops groups — telemetry
    # n_groups_needed; sized like the other capacities); march_group_slots
    # caps kept groups PER RAY (None -> ceil(K/group): never truncates).
    march_group: bool = False
    march_group_mult: float = 4.0
    march_group_slots: Optional[int] = None

    @property
    def cascade(self) -> int:
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))  # renderer.py:69

    @staticmethod
    def ray_capacity(n_rays: int, frac: float) -> int:
        """Static compacted-ray count for a capacity fraction (x128 rows)."""
        return max(128, int(-(-n_rays * min(frac, 1.0) // 128)) * 128)

    @staticmethod
    def sample_capacity(n_rays_cap: int, mult: float) -> int:
        """Static field-eval buffer rows for a compacted ray count (x128)."""
        return max(128, int(-(-n_rays_cap * mult // 128)) * 128)

    @property
    def aabb(self) -> tuple:
        b = self.bound
        return (-b, -b / 2, -b, b, b / 2, b)  # renderer.py:86

    def march_config(self) -> MarchConfig:
        return MarchConfig(
            bound=self.bound,
            cascade=self.cascade,
            grid_size=self.grid_size,
            max_steps=self.max_steps,
            dt_gamma=self.dt_gamma,
            march_iters=self.march_iters,
            sample_slots=self.sample_slots,
        )

    @staticmethod
    def from_options(opt) -> "RenderConfig":
        return RenderConfig(
            bound=opt.bound,
            min_near=opt.min_near,
            density_thresh=opt.density_thresh,
            density_thresh_torso=opt.density_thresh_torso,
            max_steps=opt.max_steps,
            dt_gamma=opt.dt_gamma,
            torso=opt.torso,
            exp_eye=opt.exp_eye,
            smooth_lips=opt.smooth_lips,
            sample_capacity_mult=opt.sample_capacity_mult,
            march_iters=opt.march_iters,
            ray_capacity_frac=getattr(opt, "ray_capacity_frac", 1.0),
            cull_T=getattr(opt, "cull_T", 1e-6),
        )


@struct.dataclass
class RendererState:
    """Explicit mutable renderer state (reference: registered buffers,
    renderer.py:109-133)."""

    density_grid: jax.Array  # [cascade, H^3] float32; -1 marks untrained cells
    density_bitfield: jax.Array  # [cascade*H^3//8] uint8
    mean_density: jax.Array  # [] float32
    density_grid_torso: jax.Array  # [H^2] float32 (zeros if torso off)
    mean_density_torso: jax.Array  # [] float32
    enc_a_smooth: jax.Array  # [1, audio_dim] smoothed audio code
    enc_a_initialized: jax.Array  # [] bool
    occ_bbox: jax.Array  # [6] world-space bounds of occupied cells
    occ_sphere: jax.Array  # [4] (cx, cy, cz, radius) bounding sphere
    sigma_bytes: jax.Array  # [cascade*H^3] uint8 occ|log-sigma byte field
    # derived: pack_sigma_byte_rows(sigma_bytes), cached in state because
    # re-packing in-frame cost 1.9 ms/frame (PERFORMANCE.md). NEVER set
    # sigma_bytes with a bare .replace() — use with_sigma_bytes() so the
    # two stay in sync.
    sigma_rows: jax.Array  # [cascade*H^3/4, 4] uint8 row view
    # derived: build_coarse_rows(sigma_bytes) — 4^3-supercell dilated-occ /
    # eroded-min byte field for two-level marching (same invariant)
    coarse_rows: jax.Array  # [cascade*(H/4)^3/4, 4] uint8

    MARCH_GROUP = 4  # fine steps per coarse supercell group

    def with_sigma_bytes(self, sigma_bytes: jax.Array) -> "RendererState":
        """Set the byte field AND its packed derived views (the invariant).

        coarse_rows is built unconditionally even though grouped marching
        defaults off: the build is tiny (32^3 per cascade, ~32 KB state)
        and a conditional derived field would make the pytree STRUCTURE
        depend on a config flag — breaking checkpoint/jit-cache
        compatibility between configs for a sub-ms saving."""
        cas, ncells = self.density_grid.shape
        H = round(ncells ** (1.0 / 3.0))
        return self.replace(
            sigma_bytes=sigma_bytes,
            sigma_rows=pack_sigma_byte_rows(sigma_bytes),
            coarse_rows=build_coarse_rows(
                sigma_bytes, cas, H, RendererState.MARCH_GROUP),
        )

    @staticmethod
    def create(cfg: RenderConfig, audio_dim: int = 64) -> "RendererState":
        H = cfg.grid_size
        cas = cfg.cascade
        b = cfg.bound
        return RendererState(
            density_grid=jnp.zeros((cas, H**3), jnp.float32),
            density_bitfield=jnp.zeros((cas * H**3 // 8,), jnp.uint8),
            mean_density=jnp.zeros((), jnp.float32),
            density_grid_torso=jnp.zeros((H * H,), jnp.float32),
            mean_density_torso=jnp.zeros((), jnp.float32),
            enc_a_smooth=jnp.zeros((1, audio_dim), jnp.float32),
            enc_a_initialized=jnp.zeros((), jnp.bool_),
            occ_bbox=jnp.asarray([-b, -b, -b, b, b, b], jnp.float32),
            occ_sphere=jnp.asarray([0.0, 0.0, 0.0, b * SQRT3], jnp.float32),
            sigma_bytes=jnp.zeros((cas * H**3,), jnp.uint8),
            sigma_rows=jnp.zeros((cas * H**3 // 4, 4), jnp.uint8),
            coarse_rows=jnp.zeros(
                (cas * (H // RendererState.MARCH_GROUP) ** 3 // 4, 4),
                jnp.uint8,
            ),
        )


def reset_extra_state(cfg: RenderConfig, state: RendererState) -> RendererState:
    """Zero the density grid/bitfield and counters (renderer.py:145-155)."""
    fresh = RendererState.create(cfg, audio_dim=state.enc_a_smooth.shape[-1])
    return fresh.replace(
        density_grid_torso=state.density_grid_torso,
        mean_density_torso=state.mean_density_torso,
    )


def compute_occ_bbox(cfg: RenderConfig, density_grid: jax.Array, thresh) -> jax.Array:
    """World-space bounding box of occupied cells (union over cascades).

    TPU-native acceleration structure: rays are clipped to this box before
    marching so the static orbit length covers only the occupied region
    instead of the whole AABB. Empty grid -> full box (safe fallback).
    """
    H = cfg.grid_size
    _, indices, _ = _grid_points(cfg)
    coords = morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)).astype(jnp.float32)

    lo = jnp.full((3,), jnp.inf)
    hi = jnp.full((3,), -jnp.inf)
    for cas in range(cfg.cascade):
        mip_bound = min(2.0**cas, cfg.bound)
        occ = density_grid[cas] > thresh  # morton order
        big = jnp.where(occ[:, None], coords, jnp.inf)
        small = jnp.where(occ[:, None], coords, -jnp.inf)
        cmin = jnp.min(big, axis=0)
        cmax = jnp.max(small, axis=0)
        lo = jnp.minimum(lo, (2.0 * cmin / H - 1.0) * mip_bound)
        hi = jnp.maximum(hi, (2.0 * (cmax + 1.0) / H - 1.0) * mip_bound)
    any_occ = jnp.isfinite(lo).all()
    b = cfg.bound
    lo = jnp.where(any_occ, lo, jnp.asarray([-b, -b, -b]))
    hi = jnp.where(any_occ, hi, jnp.asarray([b, b, b]))
    return jnp.concatenate([lo, hi]).astype(jnp.float32)


def compute_occ_sphere(cfg: RenderConfig, density_grid: jax.Array, thresh) -> jax.Array:
    """Bounding sphere of occupied cells: a tighter ray-clip than the bbox
    for blob-shaped occupancy (a head). Returns [cx, cy, cz, radius]."""
    H = cfg.grid_size
    coords = morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)).astype(jnp.float32)
    r = jnp.zeros((), jnp.float32)
    # center from the bbox; radius = max distance of any occupied cell corner
    bbox = compute_occ_bbox(cfg, density_grid, thresh)
    center = 0.5 * (bbox[:3] + bbox[3:])
    for cas in range(cfg.cascade):
        mip_bound = min(2.0**cas, cfg.bound)
        occ = density_grid[cas] > thresh
        world = (2.0 * (coords + 0.5) / H - 1.0) * mip_bound
        dist = jnp.linalg.norm(world - center, axis=-1) + SQRT3 * mip_bound / H
        r = jnp.maximum(r, jnp.max(jnp.where(occ, dist, 0.0)))
    any_occ = r > 0
    r = jnp.where(any_occ, r, cfg.bound * SQRT3)
    return jnp.concatenate([center, r[None]]).astype(jnp.float32)


def bilinear_sample_2d(grid_flat: jax.Array, coords: jax.Array, H: int) -> jax.Array:
    """Sample a flat [H*H] grid at coords [..., 2] in [-1, 1].

    Matches F.grid_sample(grid.view(1,1,H,H), coords.view(1,-1,1,2),
    align_corners=True) with the reference's flat layout
    ``flat[c1*H + c0]`` (renderer.py:282, :472).
    """
    a = (coords[..., 0] + 1.0) * 0.5 * (H - 1)  # "x" -> minor axis
    b = (coords[..., 1] + 1.0) * 0.5 * (H - 1)  # "y" -> major axis
    a0 = jnp.clip(jnp.floor(a), 0, H - 1)
    b0 = jnp.clip(jnp.floor(b), 0, H - 1)
    b1 = jnp.clip(b0 + 1, 0, H - 1)
    wa = jnp.clip(a - a0, 0.0, 1.0)
    wb = jnp.clip(b - b0, 0.0, 1.0)
    a0i, b0i, b1i = (v.astype(jnp.int32) for v in (a0, b0, b1))

    # TPU: width-1 gathers run ~3x slower than wide rows, so fetch the two
    # minor-axis neighbours as ONE paired row (pair table = grid, shifted
    # grid). At the a0 == H-1 edge wa == 0, so the wrapped second lane never
    # contributes.
    pairs = jnp.stack([grid_flat, jnp.roll(grid_flat, -1)], axis=1)  # [H*H, 2]
    row0 = take_rows(pairs, b0i * H + a0i)  # [..., 2]
    row1 = take_rows(pairs, b1i * H + a0i)
    top = row0[..., 0] * (1 - wa) + row0[..., 1] * wa
    bot = row1[..., 0] * (1 - wa) + row1[..., 1] * wa
    return top * (1 - wb) + bot * wb


def smooth_audio_code(state: RendererState, enc_a: jax.Array, enabled: bool):
    """enc_a EMA: 0.35*prev + 0.65*new (renderer.py:190-194)."""
    if not enabled:
        return enc_a, state
    lam = 0.35
    smoothed = jnp.where(
        state.enc_a_initialized, lam * state.enc_a_smooth + (1 - lam) * enc_a, enc_a
    )
    state = state.replace(
        enc_a_smooth=smoothed, enc_a_initialized=jnp.ones((), jnp.bool_)
    )
    return smoothed, state


def _eval_field_compacted(params, net_cfg, march, rays_d, enc_a, ind_code, eye, capacity):
    """Evaluate the field on compacted valid samples only.

    The TPU analogue of evaluating only generated points (the reference's M
    buffer, raymarching.cu:446 slot reservation + raymarching.py:224-229
    mean_count sizing; overflow drops samples just like an underestimated
    mean_count). Built entirely from scans and slab gathers — no per-sample
    scatters:

    - a ray's valid samples occupy its first count(n) lattice slots, so the
      compacted buffer is per-ray CONTIGUOUS: buffer[base_n + s] = (n, s);
    - the buffer->lattice map (r, s) comes from a cumsum/cummax over a base
      marker (one small scatter of N rows);
    - samples are fetched with one wide-row gather; results return to the
      [N, S] lattice with one slab gather (lax.gather with slice_sizes) of N
      rows, exploiting that TPU gather cost is per row, not per byte.
    """
    N, S = march["valid"].shape
    valid = march["valid"]
    counts = jnp.sum(valid.astype(jnp.int32), axis=1)  # [N]
    ends = jnp.cumsum(counts)
    base = ends - counts  # exclusive prefix

    # buffer index -> (ray, slot)
    marker = jnp.zeros((capacity,), jnp.int32).at[base].add(1, mode="drop")
    r_of = jnp.cumsum(marker) - 1  # [capacity] ray id
    iota = jnp.arange(capacity, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(marker > 0, iota, -1))
    s_of = iota - seg_start
    in_range = (r_of >= 0) & (s_of < S)
    flat_idx = jnp.where(in_range, r_of * S + jnp.clip(s_of, 0, S - 1), 0)

    pts = jnp.concatenate(
        [march["xyz"], jnp.broadcast_to(rays_d[:, None, :], march["xyz"].shape)],
        axis=-1,
    ).reshape(N * S, 6)[flat_idx]
    xyz_flat, dirs_flat = pts[:, :3], pts[:, 3:]

    sigma_c, color_c, ambient_c = field_forward(
        params, net_cfg, xyz_flat, dirs_flat, enc_a, ind_code, eye
    )
    amb_dim = ambient_c.shape[-1]
    width = 1 + 3 + amb_dim
    packed = jnp.concatenate([sigma_c[:, None], color_c, ambient_c], axis=-1)
    packed = jnp.where(in_range[:, None], packed, 0.0)
    # under the bf16 policy halve the return-trip row bytes (the values are
    # field outputs the reference computes in fp16 AMP anyway)
    if net_cfg.dtype == jnp.bfloat16:
        packed = packed.astype(jnp.bfloat16)
    # pad S rows so every slab read stays in bounds
    packed = jnp.concatenate(
        [packed, jnp.zeros((S, width), packed.dtype)], axis=0
    )

    # Return trip lattice[n, s] = packed[base_n + s]: the S needed rows are
    # CONSECUTIVE buffer rows, and TPU gather cost is per row with width
    # nearly free up to ~64 B — so pack G consecutive buffer rows into one
    # wide row (4 x 6 bf16 lanes = 48 B) and fetch S/G rows per ray instead
    # of S. (A slice_sizes gather would express this directly but lowers to
    # a per-element path ~25x slower than row gathers.)
    G_ret = 4 if S % 4 == 0 else (2 if S % 2 == 0 else 1)
    base_c = jnp.clip(base, 0, capacity)
    if G_ret > 1:
        ext = jnp.concatenate(
            [packed, jnp.zeros((G_ret - 1, width), packed.dtype)], axis=0
        )
        n_ext = packed.shape[0]
        wide = jnp.concatenate(
            [ext[g: g + n_ext] for g in range(G_ret)], axis=1
        )  # [capacity + S, G_ret * width]
        back = jnp.stack(
            [wide[base_c + s] for s in range(0, S, G_ret)], axis=1
        ).astype(jnp.float32).reshape(N, S, width)
    else:
        back = jnp.stack(
            [packed[base_c + s] for s in range(S)], axis=1
        ).astype(jnp.float32)  # [N, S, width]

    kept = valid & ((base[:, None] + jnp.arange(S)[None, :]) < capacity)
    back = jnp.where(kept[..., None], back, 0.0)
    return back[..., 0], back[..., 1:4], back[..., 4: 4 + amb_dim], kept


def render_rays(
    params: dict,
    net_cfg: NetworkConfig,
    cfg: RenderConfig,
    state: RendererState,
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    auds: Optional[jax.Array],  # [seq, audio_in_dim, 16] or None
    bg_coords: jax.Array,  # [N, 2]
    pose6: jax.Array,  # [1, 6]
    eye: Optional[jax.Array],  # [1, 1] or None
    index: jax.Array,  # [] int32 frame index (for individual codes)
    bg_color: jax.Array,  # [N, 3]
    noises: Optional[jax.Array] = None,  # [N] perturbation or None
    training: bool = False,
    compact: bool = True,
):
    """Render a batch of rays (run_cuda equivalent, renderer.py:158-316).

    Returns (results dict, new RendererState). Image is composited over the
    torso layer + background exactly like the reference (:265-311).
    """
    N = rays_o.shape[0]
    mcfg = cfg.march_config()
    aabb = jnp.asarray(cfg.aabb, jnp.float32)

    # learnable camera offsets, applied at training (renderer.py:169-175)
    if net_cfg.train_camera and training and "camera_dR" in params:
        dT = params["camera_dT"][index]
        ang = params["camera_dR"][index] / 180.0 * jnp.pi + 1e-8
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        rx = jnp.array(
            [[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]]
        )
        ry = jnp.array(
            [[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]]
        )
        rz = jnp.array(
            [[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]]
        )
        dR = rx @ ry @ rz
        rays_o = rays_o + dT
        rays_d = rays_d @ dR

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    nears = jax.lax.stop_gradient(nears)
    fars = jax.lax.stop_gradient(fars)

    enc_a = encode_audio(params, net_cfg, auds)
    if enc_a is not None and cfg.smooth_lips:
        enc_a, state = smooth_audio_code(state, enc_a, True)

    if net_cfg.ind_dim > 0:
        ind_index = index if training else jnp.zeros_like(index)
        ind_code = params["individual_codes"][ind_index]
    else:
        ind_code = None

    results = {}
    sigma_rows = state.sigma_rows  # packed once per grid update, not per frame

    # clip marching to the occupied-cell bounding box (pure math; bits
    # outside it are guaranteed zero, so the skipped orbit points are
    # exactly the reference's empty-space skips)
    def march_window(o, d, nr, fr):
        """Marched interval = occupied bbox AND bounding sphere (pure ray
        math — cheap enough to recompute on compacted rays instead of
        gathering the scalars; the 12-column concat+gather cost ~3 ms)."""
        bb = state.occ_bbox
        tb0 = (bb[:3] - o) / d
        tb1 = (bb[3:] - o) / d
        lo = jnp.maximum(jnp.max(jnp.minimum(tb0, tb1), axis=-1), nr)
        hi = jnp.minimum(jnp.min(jnp.maximum(tb0, tb1), axis=-1), fr)
        oc = o - state.occ_sphere[:3]
        b_half = jnp.sum(oc * d, axis=-1)
        disc = b_half * b_half - (
            jnp.sum(oc * oc, axis=-1) - state.occ_sphere[3] ** 2
        )
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        lo = jnp.maximum(lo, -b_half - sq)
        hi = jnp.minimum(hi, jnp.where(disc > 0, -b_half + sq, -jnp.inf))
        return lo, hi

    # clip marching to the occupied-cell bounding box (pure math; bits
    # outside it are guaranteed zero, so the skipped orbit points are
    # exactly the reference's empty-space skips), intersected with the
    # occupied bounding sphere (caps the span at the chord <= 2*radius)
    t_lo, t_hi = march_window(rays_o, rays_d, nears, fars)
    hit = t_lo < t_hi

    def run_head(o, d, nr, fr, lo, hi, nz):
        g = RendererState.MARCH_GROUP
        use_grouped = (
            cfg.march_group
            and mcfg.cascade == 1
            and (mcfg.dt_gamma == 0.0 or mcfg.dt_min == mcfg.dt_max)
            and -(-mcfg.n_march_iters // g) <= 24
        )
        if use_grouped:
            Kg = -(-mcfg.n_march_iters // g)
            march = march_rays_grouped(
                o, d, nr, fr, mcfg, sigma_rows, state.coarse_rows,
                (lo, hi), g,
                RenderConfig.sample_capacity(o.shape[0], cfg.march_group_mult),
                min(cfg.march_group_slots or Kg, Kg),
                noises=nz, cull_T=cfg.cull_T,
            )
        else:
            march = march_rays(
                o, d, nr, fr, state.density_bitfield, mcfg,
                noises=nz, t_window=(lo, hi), sigma_rows=sigma_rows,
                cull_T=cfg.cull_T,
            )
        if compact:
            capacity = RenderConfig.sample_capacity(
                o.shape[0], cfg.sample_capacity_mult)
            sig, col, amb, val = _eval_field_compacted(
                params, net_cfg, march, d, enc_a, ind_code, eye, capacity
            )
        else:
            dirs = jnp.broadcast_to(d[:, None, :], march["xyz"].shape)
            sig, col, amb = field_forward(
                params, net_cfg, march["xyz"], dirs, enc_a, ind_code, eye
            )
            val = march["valid"]
        comp = composite_rays(
            sig * cfg.density_scale, col, march["dt"], march["t"], val,
            ambient=jnp.sum(jnp.abs(amb), axis=-1), T_thresh=cfg.T_thresh,
        )
        # samples the marcher wanted (pre-capacity), for adaptive sizing
        comp["n_samples_needed"] = jnp.sum(march["valid"].astype(jnp.int32))
        comp["max_count"] = march["max_count"]
        zero = jnp.zeros((), jnp.int32)
        comp["n_groups_needed"] = march.get("n_groups_needed", zero)
        comp["n_group_max"] = march.get("n_group_max", zero)
        return comp

    # capacity telemetry (the reference's step_counter/mean_count stats,
    # renderer.py:126-129): consumed by the Trainer's adaptive resizing
    results["n_hit"] = jnp.sum(hit.astype(jnp.int32))
    # max marched-window span in orbit steps: the EXACT march_iters need
    # (every orbit point beyond t_hi is masked, so K only has to cover the
    # widest per-ray bbox-and-sphere window — for a frontal camera the
    # bbox depth binds this far below the sphere-diameter estimate)
    results["n_k_span"] = jnp.max(
        jnp.where(hit, jnp.ceil((t_hi - t_lo) / mcfg.dt_min), 0.0)
    ).astype(jnp.int32)

    if cfg.ray_capacity_frac >= 1.0:
        comp = run_head(rays_o, rays_d, nears, fars, t_lo, t_hi, noises)
        weights_sum = jnp.where(hit, comp["weights_sum"], 0.0)
        depth_raw = jnp.where(hit, comp["depth"], 0.0)
        image = jnp.where(hit[:, None], comp["image"], 0.0)
        ambient_sum = jnp.where(hit, comp["ambient_sum"], 0.0)
        results["n_samples_needed"] = comp["n_samples_needed"]
        results["n_max_count"] = comp["max_count"]
        results["n_groups_needed"] = comp["n_groups_needed"]
        results["n_group_max"] = comp["n_group_max"]
    else:
        # ray compaction: march/evaluate only rays whose interval intersects
        # the occupied bbox (the TPU analogue of the reference's alive-ray
        # list, renderer.py:233-262), at a static capacity.
        R = RenderConfig.ray_capacity(N, cfg.ray_capacity_frac)
        pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
        slot = jnp.where(hit & (pos < R), pos, R)
        ray_idx = jnp.zeros((R,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        # gather ONLY the ray geometry (plus the per-ray noise when
        # training) and RECOMPUTE nears/window on the compacted rays —
        # the window is pure ray math, cheaper than the 12-column
        # concat+gather of precomputed scalars it replaces (~3 ms)
        cols = [rays_o, rays_d]
        if noises is not None:
            cols.append(noises[:, None])
        wide = jnp.concatenate(cols, axis=-1)
        # BIT-EXACT f32 fetch via two u16[N,8] gathers: the (2,1) 16-bit
        # lane packing + <=4MB operands gather ~1.5x faster than the
        # single f32[N,6] row gather (scripts/bench_compact.py B5 0.99 ms
        # vs B0 1.48 at N=262144/R=163840); f32 word = (hi16 << 16) | lo16
        w8 = jnp.pad(wide, ((0, 0), (0, 8 - wide.shape[1])))
        bits = jax.lax.bitcast_convert_type(w8, jnp.uint32)
        h = take_rows((bits >> 16).astype(jnp.uint16), ray_idx)
        l = take_rows(bits.astype(jnp.uint16), ray_idx)
        packed_rays = jax.lax.bitcast_convert_type(
            (h.astype(jnp.uint32) << 16) | l.astype(jnp.uint32), jnp.float32)
        o_c = packed_rays[:, :3]
        d_c = packed_rays[:, 3:6]
        nz_c = packed_rays[:, 6] if noises is not None else None
        nr_c, fr_c = near_far_from_aabb(o_c, d_c, aabb, cfg.min_near)
        nr_c = jax.lax.stop_gradient(nr_c)
        fr_c = jax.lax.stop_gradient(fr_c)
        lo_c, hi_c = march_window(o_c, d_c, nr_c, fr_c)
        c_hit = lo_c < hi_c
        comp_c = run_head(o_c, d_c, nr_c, fr_c, lo_c, hi_c, nz_c)
        out_c = jnp.concatenate(
            [
                comp_c["image"], comp_c["depth"][:, None],
                comp_c["weights_sum"][:, None], comp_c["ambient_sum"][:, None],
            ],
            axis=-1,
        )
        out_c = jnp.where(c_hit[:, None], out_c, 0.0)
        out_c = jnp.concatenate([out_c, jnp.zeros((1, 6))], axis=0)
        back = out_c[jnp.where(hit & (pos < R), pos, R)]  # [N, 6]
        image = back[:, 0:3]
        depth_raw = back[:, 3]
        weights_sum = back[:, 4]
        ambient_sum = back[:, 5]
        results["n_samples_needed"] = comp_c["n_samples_needed"]
        results["n_max_count"] = comp_c["max_count"]
        results["n_groups_needed"] = comp_c["n_groups_needed"]
        results["n_group_max"] = comp_c["n_group_max"]

    comp = {"weights_sum": weights_sum, "depth": depth_raw,
            "image": image, "ambient_sum": ambient_sum}

    if training:
        results["weights_sum"] = weights_sum
        results["ambient"] = comp["ambient_sum"]

    # ---- torso layer over background (renderer.py:269-302)
    if cfg.torso:
        if net_cfg.ind_dim_torso > 0:
            tors_index = index if training else jnp.zeros_like(index)
            ind_code_torso = params["individual_codes_torso"][tors_index]
        else:
            ind_code_torso = None

        thresh_t = jnp.minimum(cfg.density_thresh_torso, state.mean_density_torso)
        occupancy = bilinear_sample_2d(state.density_grid_torso, bg_coords, cfg.grid_size)
        mask = occupancy > thresh_t
        results["n_torso_mask"] = jnp.sum(mask.astype(jnp.int32))

        t_frac = (cfg.torso_capacity_frac if cfg.torso_capacity_frac is not None
                  else cfg.ray_capacity_frac)
        if t_frac >= 1.0:
            # evaluate the (tiny) torso MLPs on all pixels, mask the result —
            # masked-out pixels get alpha 0 either way (see SURVEY.md §7).
            t_alpha, t_color, deform = forward_torso(
                params, net_cfg, bg_coords, pose6, ind_code_torso
            )
            t_alpha = jnp.where(mask[..., None], t_alpha, 0.0)
            t_color = jnp.where(mask[..., None], t_color, 0.0)
            results["deform"] = deform
        else:
            # compact masked pixels (the reference's masked torso query,
            # renderer.py:285-293) at a static capacity
            Rt = RenderConfig.ray_capacity(N, t_frac)
            pos_t = jnp.cumsum(mask.astype(jnp.int32)) - 1
            ok_t = mask & (pos_t < Rt)
            slot_t = jnp.where(ok_t, pos_t, Rt)
            pix_idx = jnp.zeros((Rt,), jnp.int32).at[slot_t].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop"
            )
            # pad the 2-col coord operand to 8 lanes (micro-measured
            # fastest: scripts/bench_compact.py C0 [N,2] 3.2 ms, C1 [N,4]
            # 2.1, C2 [N,8] 1.26 at N=262144/Rt=98304; in-frame XLA
            # narrows the sliced gather so the win is bounded by context)
            coords_c = jnp.pad(bg_coords, ((0, 0), (0, 6)))[pix_idx][:, :2]
            a_c, c_c, deform = forward_torso(
                params, net_cfg, coords_c, pose6, ind_code_torso
            )
            packed_t = jnp.concatenate([a_c, c_c], axis=-1)
            packed_t = jnp.concatenate([packed_t, jnp.zeros((1, 4))], axis=0)
            back_t = packed_t[slot_t]  # [N, 4]; misses hit the zero row
            t_alpha = back_t[:, :1]
            t_color = back_t[:, 1:4]
            results["deform"] = deform

        bg_color = t_color * t_alpha + bg_color * (1.0 - t_alpha)
        results["torso_alpha"] = t_alpha
        results["torso_color"] = bg_color

    image = image + (1.0 - weights_sum)[..., None] * bg_color
    image = jnp.clip(image, 0.0, 1.0)
    depth = jnp.clip(depth_raw - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-8)

    results["image"] = image
    results["depth"] = depth
    return results, state


# --------------------------------------------------------------------------
# grid maintenance
# --------------------------------------------------------------------------

def _grid_points(cfg: RenderConfig):
    """All 128^3 cell centers + their Morton indices (static)."""
    H = cfg.grid_size
    lin = jnp.arange(H, dtype=jnp.int32)
    xx, yy, zz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1)
    indices = morton3d(coords)
    xyzs01 = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0  # [-1, 1]
    return coords, indices, xyzs01


def update_density_grid(
    params: dict,
    net_cfg: NetworkConfig,
    cfg: RenderConfig,
    state: RendererState,
    enc_a: Optional[jax.Array],
    eye: Optional[jax.Array],
    key: jax.Array,
    decay: float = 0.95,
    chunk: int = 128**3 // 4,
) -> RendererState:
    """Head density-grid maintenance (update_extra_state, renderer.py:397-448).

    Re-queries sigma at jittered cell centers over all cascades, Morton-
    scatters, dilates, EMA-max updates, re-packs the bitfield.
    """
    H = cfg.grid_size
    _, indices, xyzs01 = _grid_points(cfg)

    tmp = jnp.zeros_like(state.density_grid)
    n_pts = H**3
    for cas in range(cfg.cascade):
        bound = min(2**cas, cfg.bound)
        half = bound / H
        cas_xyz = xyzs01 * (bound - half)
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, cas_xyz.shape, minval=-half, maxval=half)
        pts = cas_xyz + noise
        sig_parts = []
        for head in range(0, n_pts, chunk):
            part = jax.lax.dynamic_slice_in_dim(pts, head, min(chunk, n_pts - head), 0)
            sig = field_density(params, net_cfg, part, enc_a, eye)["sigma"]
            sig_parts.append(sig * cfg.density_scale)
        sigmas = jnp.concatenate(sig_parts)
        tmp = tmp.at[cas, indices].set(sigmas)

    tmp = morton_dilate(tmp, H)

    valid = (state.density_grid >= 0) & (tmp >= 0)
    new_grid = jnp.where(
        valid, jnp.maximum(state.density_grid * decay, tmp), state.density_grid
    )
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    bitfield = packbits(new_grid, thresh)
    return state.replace(
        density_grid=new_grid,
        density_bitfield=bitfield,
        mean_density=mean_density,
        occ_bbox=compute_occ_bbox(cfg, new_grid, thresh),
        occ_sphere=compute_occ_sphere(cfg, new_grid, thresh),
    ).with_sigma_bytes(build_sigma_bytes(new_grid, thresh))


def update_torso_grid(
    params: dict,
    net_cfg: NetworkConfig,
    cfg: RenderConfig,
    state: RendererState,
    pose6: jax.Array,
    ind_code_torso: Optional[jax.Array],
    key: jax.Array,
    decay: float = 0.95,
) -> RendererState:
    """Torso 2-D alpha-grid maintenance (renderer.py:451-490)."""
    H = cfg.grid_size
    lin = jnp.arange(H, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(lin, lin, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    indices = coords[:, 1] * H + coords[:, 0]  # NOTE: xy transposed (:472)
    half = 1.0 / H
    xys = (2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0) * (1.0 - half)
    noise = jax.random.uniform(key, xys.shape, minval=-half, maxval=half)
    xys = xys + noise

    alphas, _, _ = forward_torso(params, net_cfg, xys, pose6, ind_code_torso)
    tmp = jnp.zeros_like(state.density_grid_torso).at[indices].set(alphas[..., 0])

    # max_pool2d k5 s1 p2 dilation (renderer.py:486)
    img = tmp.reshape(1, H, H, 1)
    pooled = jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    tmp = pooled.reshape(-1)

    new_grid = jnp.maximum(state.density_grid_torso * decay, tmp)
    return state.replace(
        density_grid_torso=new_grid, mean_density_torso=jnp.mean(new_grid)
    )


def mark_untrained_grid(
    cfg: RenderConfig, state: RendererState, poses: jax.Array, intrinsics
) -> RendererState:
    """Mark cells not visible from any training camera as -1
    (renderer.py:318-381).

    poses: [B, 4, 4] cam2world; intrinsics: (fx, fy, cx, cy).
    """
    H = cfg.grid_size
    fx, fy, cx, cy = intrinsics
    _, indices, world01 = _grid_points(cfg)

    count = jnp.zeros_like(state.density_grid)
    for cas in range(cfg.cascade):
        bound = min(2**cas, cfg.bound)
        half = bound / H
        pts = world01 * (bound - half)  # [P, 3]

        def per_camera(carry, pose):
            # world -> cam: subtract origin, project on R (c2w rows)
            cam = (pts - pose[:3, 3]) @ pose[:3, :3]
            mask_z = cam[..., 2] > 0
            mask_x = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            mask_y = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            return carry + (mask_z & mask_x & mask_y).astype(jnp.int32), None

        seen, _ = jax.lax.scan(
            per_camera, jnp.zeros((pts.shape[0],), jnp.int32), poses
        )
        count = count.at[cas, indices].add(seen.astype(count.dtype))

    new_grid = jnp.where(count == 0, -1.0, state.density_grid)
    return state.replace(density_grid=new_grid)
