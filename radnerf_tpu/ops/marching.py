"""Occupancy-grid ray marching + volume compositing, TPU-native.

Replaces the reference CUDA marcher/compositor family (reference
raymarching/src/raymarching.cu): kernel_march_rays_train (:352-528),
kernel_march_rays (:827-939), kernel_composite_rays_train_forward/backward
(:603-820), kernel_composite_rays (:942-1038), and the Python alive-ray
compaction loop (reference nerf/renderer.py:239-262).

Design (why this is NOT a port)
-------------------------------
The CUDA marcher is a per-ray sequential walk: advance
``t += clamp(t*dt_gamma, dt_min, dt_max)`` through occupied voxels, DDA-skip
through empty ones, early-terminate on transmittance. The key observation
that makes a fully parallel TPU formulation possible: *the t-advance
recurrence is the same for occupied and empty steps*, and the DDA skip's
do-while sub-steps (raymarching.cu:437-439) follow that same recurrence — so
the set of t values a ray can ever visit is a single occupancy-independent
orbit ``t_{k+1} = t_k + clamp(t_k * dt_gamma, dt_min, dt_max)`` from
``t_0 = near (+ perturbation)``. The reference's emitted samples are exactly
the first ``max_steps`` *occupied* points of that orbit (empty-voxel points
are skipped without being emitted; points the DDA jumps over lie in the same
empty voxel and would not be emitted either).

So the TPU marcher is three dense, static-shape steps:
  1. compute the orbit ``ts[N, K]`` (closed form when dt is pinned, scan
     otherwise),
  2. gather occupancy bits for all N*K points at once,
  3. rank occupied points per ray with a cumsum and scatter the first S
     into a fixed ``[N, S]`` sample lattice.

Compositing is then a masked cumprod over the lattice — the training and
inference compositors collapse into one function (they compute the same
math; the reference only split them to manage the CUDA alive-list).
Early termination (``T < T_thresh``) becomes a mask. Gradients for
sigma/rgb/ambient fall out of autodiff of this closed-form expression and
match the hand-derived backward in raymarching.cu:711-809 (grad_depth is not
used by any reference loss; here it simply also exists).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .morton import morton3d, morton3d_invert
from .rowgather import take_rows

SQRT3 = 1.7320508075688772


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Static marching configuration (mirrors reference renderer/bitfield state).

    Attributes:
      bound: scene half-extent; grid/hash always cubic (renderer.py:84-89).
      cascade: number of mip levels = 1 + ceil(log2(bound)) (renderer.py:69).
      grid_size: H, occupancy grid resolution per cascade (128).
      max_steps: S, max emitted samples per ray (main.py:28 default 16).
      dt_gamma: cone-angle-style step growth (main.py:55 default 1/256).
      march_iters: K, orbit length. None -> safe bound ceil(2*sqrt(3)*bound /
        dt_min)+1 (every orbit step advances >= dt_min and a ray's AABB span
        is <= the box diagonal).
      sample_slots: width of the emitted [N, S] sample lattice. None ->
        max_steps. A static CAPACITY (like sample_capacity_mult), NOT a
        semantic change: dt derives from max_steps alone, and the density-
        prior cull bounds real per-ray counts far below max_steps on
        converged scenes (telemetry: ``max_count``), so a tight lattice is
        lossless and halves selection/return-trip/compositing work.
    """

    bound: float = 1.0
    cascade: int = 1
    grid_size: int = 128
    max_steps: int = 16
    dt_gamma: float = 0.0
    march_iters: int | None = None
    sample_slots: int | None = None

    @property
    def dt_max(self) -> float:
        return 2.0 * SQRT3 * (1 << (self.cascade - 1)) / self.grid_size

    @property
    def dt_min(self) -> float:
        return min(self.dt_max, 2.0 * SQRT3 / self.max_steps)

    @property
    def n_march_iters(self) -> int:
        if self.march_iters is not None:
            return self.march_iters
        return int(math.ceil(2.0 * SQRT3 * self.bound / self.dt_min)) + 1

    @property
    def n_sample_slots(self) -> int:
        if self.sample_slots is None:
            return self.max_steps
        return min(self.max_steps, self.sample_slots)


def _clamp_dt(t: jnp.ndarray, cfg: MarchConfig) -> jnp.ndarray:
    return jnp.clip(t * cfg.dt_gamma, cfg.dt_min, cfg.dt_max)


def _orbit(t0: jnp.ndarray, cfg: MarchConfig):
    """Visited t-sequence [N, K] and its step sizes [N, K] from t0 [N]."""
    K = cfg.n_march_iters
    if cfg.dt_gamma == 0.0:
        # dt == dt_min everywhere: closed form, no scan.
        k = jnp.arange(K, dtype=jnp.float32)
        ts = t0[:, None] + k[None, :] * cfg.dt_min
        dts = jnp.full_like(ts, cfg.dt_min)
        return ts, dts

    def step(t, _):
        dt = _clamp_dt(t, cfg)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(step, t0, None, length=K)
    return ts.T, dts.T  # [N, K]


def _mip_level(x: jnp.ndarray, dt: jnp.ndarray, cfg: MarchConfig) -> jnp.ndarray:
    """Cascade level per point: max(mip_from_pos, mip_from_dt)
    (raymarching.cu:42-54). Level e satisfies mx in [2^(e-1), 2^e)."""
    C = cfg.cascade

    def frexp_exponent(v):
        # C frexpf semantics, bit-exact: for a normal fp32 v = m * 2^e with
        # m in [0.5, 1), the exponent is (biased_exponent - 126). Extracting
        # the exponent bits avoids the log2-rounding corner cases at exact
        # powers of two that a floor(log2(v))+1 emulation has. Subnormals
        # map to e <= -126, which the final clip sends to level 0 (same as
        # frexpf would after the max(0, e) in raymarching.cu:46).
        bits = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
        e = ((bits >> 23) & 0xFF) - 126
        return jnp.where(v > 0, e, 0)

    mx = jnp.max(jnp.abs(x), axis=-1)
    level = jnp.maximum(frexp_exponent(mx), frexp_exponent(dt * cfg.grid_size * 0.5))
    return jnp.clip(level, 0, C - 1)


def occupancy_lookup(
    xyz: jnp.ndarray, dt: jnp.ndarray, bitfield: jnp.ndarray, cfg: MarchConfig
) -> jnp.ndarray:
    """Test the density bitfield at points xyz [..., 3] with step sizes dt [...].

    bitfield: uint8 [cascade * H^3 // 8], bit k of byte b = Morton cell b*8+k
    (as produced by ops.morton.packbits).
    """
    H = cfg.grid_size
    if cfg.cascade == 1:
        level = jnp.zeros(xyz.shape[:-1], jnp.int32)
        mip_bound = jnp.float32(min(1.0, cfg.bound))
    else:
        level = _mip_level(xyz, dt, cfg)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)

    nxyz = jnp.clip(
        jnp.floor(0.5 * (xyz / mip_bound[..., None] + 1.0) * H), 0.0, H - 1
    ).astype(jnp.int32)
    index = level * (H * H * H) + morton3d(nxyz)
    byte = take_rows(bitfield, index >> 3)
    return ((byte >> (index & 7).astype(jnp.uint8)) & 1).astype(jnp.bool_)


def _select_first_s(ts, dts, occ, S):
    """Compact the first S occupied orbit points into [N, S] slots.

    TPU note: implemented as a tiny batched one-hot contraction (VPU/MXU
    friendly) rather than a scatter — XLA/TPU scatters cost ~20ns/row while
    this contraction is pure dense math.
    """
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    keep = occ & (rank <= S)
    slot = jnp.where(keep, rank - 1, S)  # S = "dropped"
    oh = (slot[..., None] == jnp.arange(S)[None, None, :]).astype(jnp.float32)
    t_out = jnp.einsum("nk,nks->ns", ts, oh)
    dt_out = jnp.einsum("nk,nks->ns", dts, oh)
    valid = jnp.any(slot[..., None] == jnp.arange(S)[None, None, :], axis=1)
    return t_out, dt_out, valid


def occupancy_lookup_wide(
    xyz: jnp.ndarray, dt: jnp.ndarray, bitrows: jnp.ndarray, cfg: MarchConfig
) -> jnp.ndarray:
    """Occupancy test via WIDE row fetches.

    TPU note: XLA/TPU gather cost is per row with width up to ~128 bytes
    free, so the bitfield is pre-viewed as [rows, 4] uint32 (one row = 128
    Morton-consecutive cells) and the byte/bit extraction happens as dense
    VPU math on the fetched row — 1/1 gather per point instead of XLA's
    1-byte rows, and ~3x cheaper rows than W=1 gathers.

    bitrows: uint32 [cascade*H^3/128, 4] (see pack_bitfield_rows).
    """
    H = cfg.grid_size
    if cfg.cascade == 1:
        level = jnp.zeros(xyz.shape[:-1], jnp.int32)
        mip_bound = jnp.float32(min(1.0, cfg.bound))
    else:
        level = _mip_level(xyz, dt, cfg)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)

    nxyz = jnp.clip(
        jnp.floor(0.5 * (xyz / mip_bound[..., None] + 1.0) * H), 0.0, H - 1
    ).astype(jnp.int32)
    index = level * (H * H * H) + morton3d(nxyz)

    row = take_rows(bitrows, index >> 7)  # [..., 4] uint32 = 128 cells
    word_sel = (index >> 5) & 3
    word = jnp.sum(
        jnp.where(
            word_sel[..., None] == jnp.arange(4, dtype=jnp.int32), row, jnp.uint32(0)
        ),
        axis=-1,
        dtype=jnp.uint32,
    )
    return ((word >> (index & 31).astype(jnp.uint32)) & 1).astype(jnp.bool_)


def build_sigma_bytes(density_grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Combined occupancy + density-estimate byte field.

    One byte per Morton cell: bit 7 = occupied (grid > thresh, the packbits
    rule), bits 0-6 = quantized floor(4*log2(sigma)) + 40 (sigma_lo covers
    2^-10 .. 2^21 in 2^(1/4) steps; 0 = empty/untrained). The marcher fetches
    ONE wide row per orbit point and gets both the skip decision and the
    conservative density bound for transmittance culling.
    """
    grid = density_grid.reshape(-1)
    occ = grid > thresh
    q = jnp.clip(
        jnp.floor(4.0 * jnp.log2(jnp.maximum(grid, 1e-30))) + 40.0, 1.0, 127.0
    ).astype(jnp.uint8)
    return jnp.where(occ, q | jnp.uint8(128), jnp.uint8(0))


def _dequant_sigma(q: jnp.ndarray) -> jnp.ndarray:
    """Lower-bound dequantization of build_sigma_bytes' 7-bit code."""
    s = jnp.exp2((q.astype(jnp.float32) - 40.0) * 0.25)
    return jnp.where(q > 0, s, 0.0)


def pack_sigma_byte_rows(sigma_bytes: jnp.ndarray) -> jnp.ndarray:
    """uint8 byte field [cas*H^3] -> uint8 row view [cas*H^3/4, 4]
    (one row = 4 Morton-consecutive cells; a pure reshape — free).

    Round-4 measured (scripts/bench_march_extract.py, 4.9M lookups, v5e):
    u8[4] rows + 2-level lane select = 14.0 ms vs the round-2/3 u32[8]
    rows + 3-level select = 19.4 ms. The u32 gather's padded-lane output
    ({1,0:T(8,128)}: 4 B/lane over 8 of 128 lanes) materializes 2.5 GB and
    XLA then relayouts it through a copy + 8-step while-loop transpose
    (~10 ms of churn at frame scale); u8 output pads at 1 B/lane (629 MB)
    and skips the final byte shift. u8[32]/u8[8] measure 14.9/14.8 ms,
    u8[16] oddly 19.6, u8[2]'s remote compile never returns. The u32-era
    numbers (u32[2] 126 ms, one-hot lane sum 18.5 ms) are recorded in
    PERFORMANCE.md — re-run the A/B before changing this layout again.
    """
    return sigma_bytes.reshape(-1, 4)


def sigma_byte_lookup(
    xyz: jnp.ndarray, dt: jnp.ndarray, sigma_rows: jnp.ndarray, cfg: MarchConfig
):
    """Fetch (occupied, sigma_lower_bound) for points xyz [..., 3].

    sigma_rows: uint8 [cas*H^3/4, 4] from pack_sigma_byte_rows. One row
    gather per point; byte extraction is a 2-level dense lane select.
    """
    H = cfg.grid_size
    if cfg.cascade == 1:
        level = jnp.zeros(xyz.shape[:-1], jnp.int32)
        mip_bound = jnp.float32(min(1.0, cfg.bound))
    else:
        level = _mip_level(xyz, dt, cfg)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)
    nxyz = jnp.clip(
        jnp.floor(0.5 * (xyz / mip_bound[..., None] + 1.0) * H), 0.0, H - 1
    ).astype(jnp.int32)
    cell = level * (H * H * H) + morton3d(nxyz)

    row = take_rows(sigma_rows, cell >> 2)  # [..., 4] uint8 = 4 cells
    # byte extraction: bitcast the 4 fetched lanes to ONE u32 and variable-
    # shift the wanted byte out (little-endian lane order, XLA-defined).
    # Pure VPU ops — no lane-select tree, so XLA generates no relayout
    # copy/while around the gather. Measured optimum at 4.9M frame-scale
    # lookups: 12.97 ms vs 13.80 (u8[4] select tree) vs 19.31 (u32[8] tree)
    # (scripts/bench_march_extract.py) — re-time before changing.
    word = jax.lax.bitcast_convert_type(row, jnp.uint32)  # [...]
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    occ = (byte & 128) > 0
    sigma_lo = _dequant_sigma(byte & 127)
    return occ, sigma_lo


def build_coarse_rows(
    sigma_bytes: jnp.ndarray, cascade: int, grid_size: int, group: int = 4
) -> jnp.ndarray:
    """Supercell byte field for two-level marching, packed as u32 rows.

    One byte per ``group^3``-cell supercell (grid ``(H/group)^3`` per
    cascade):
      bit 7  : box-DILATED occupancy — set iff ANY fine cell in the 3^3
               supercell neighborhood is occupied. Conservative for a
               coarse sample within half a supercell of any fine sample
               (the two-level marcher's skip test can then never miss an
               occupied fine cell).
      bits0-6: box-ERODED minimum sigma code — min of build_sigma_bytes'
               7-bit code over the neighborhood, which is > 0 only when
               EVERY fine cell in the neighborhood is occupied. Then every
               fine sample of a group centered here has sigma >= the
               dequantized code, so accumulating ``group*dt*sigma*safety``
               per such group is a valid LOWER bound on optical depth —
               the coarse transmittance cull is conservative w.r.t. the
               fine path's per-sample cull.

    Morton property used: cells of a ``group^3`` block are contiguous in
    Morton order (supercell Morton index = cell Morton index >> 3*log2(g)),
    so the pooling is a plain reshape.
    """
    H = grid_size
    Hc = H // group
    assert H % group == 0 and (group & (group - 1)) == 0
    per = group**3
    b = sigma_bytes.reshape(cascade, Hc**3, per)
    occ_sup = jnp.max(b, axis=-1) >= 128  # any occupied cell
    min_code = jnp.min(b & 0x7F, axis=-1)  # 0 iff any cell empty

    # dense (x, y, z) view for the 3^3 box dilate/erode
    coords = morton3d_invert(jnp.arange(Hc**3, dtype=jnp.int32))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    flat = (x * Hc + y) * Hc + z

    def to_dense(v_morton, fill):
        d = jnp.full((Hc * Hc * Hc,), fill, v_morton.dtype)
        return d.at[flat].set(v_morton).reshape(Hc, Hc, Hc)

    def window(d, init, op):
        return jax.lax.reduce_window(
            d, init, op, (3, 3, 3), (1, 1, 1), "SAME"
        )

    out = []
    for cas in range(cascade):
        occ_d = to_dense(occ_sup[cas].astype(jnp.int32), jnp.int32(0))
        # outside the grid is empty: max-window 'SAME' pads with the init 0
        dil = window(occ_d, jnp.int32(0), jax.lax.max)
        code_d = to_dense(min_code[cas].astype(jnp.int32), jnp.int32(0))
        # outside the grid is unreachable (samples are clipped to the
        # bound), so +inf padding = "no constraint" is correct for the min
        ero = window(code_d, jnp.int32(127), jax.lax.min)
        byte = jnp.where(
            dil.reshape(-1)[flat] > 0,
            jnp.uint8(128) | jnp.clip(ero.reshape(-1)[flat], 0, 127).astype(jnp.uint8),
            jnp.uint8(0),
        )
        out.append(byte)
    return pack_sigma_byte_rows(jnp.concatenate(out))


def pack_bitfield_rows(bitfield: jnp.ndarray) -> jnp.ndarray:
    """uint8 bitfield [B] -> uint32 row view [B//16, 4] (little-endian bytes,
    so bit k of the packed uint32 row covers cell (row*128 + word*32 + k))."""
    b = bitfield.reshape(-1, 4, 4).astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def march_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    bitfield: jnp.ndarray,
    cfg: MarchConfig,
    noises: jnp.ndarray | None = None,
    t_window: tuple | None = None,
    bitrows: jnp.ndarray | None = None,
    sigma_grid: jnp.ndarray | None = None,
    sigma_rows: jnp.ndarray | None = None,
    cull_T: float = 0.0,
    cull_safety: float = 0.5,
):
    """Fixed-lattice batched marcher.

    Args:
      rays_o, rays_d: [N, 3] float32 (dirs normalized).
      nears, fars: [N] from near_far_from_aabb.
      bitfield: uint8 [cascade*H^3//8] occupancy bits.
      cfg: static MarchConfig.
      noises: optional [N] U[0,1) perturbation (reference
        raymarching.py:239-242; t0 += dt(t0) * noise).
      t_window: optional ([N] t_lo, [N] t_hi) restriction of the marched
        interval (e.g. the ray's intersection with the occupied-cell bounding
        box). The orbit ORIGIN stays at the perturbed near so sample
        positions stay on the reference lattice; the window only skips
        guaranteed-empty orbit points. When set, cfg.march_iters bounds the
        windowed span instead of the full AABB span.
      bitrows: optional packed row view (pack_bitfield_rows(bitfield));
        computed on the fly if absent.
      sigma_grid: optional [cascade*H^3] float32 density grid (Morton order,
        the EMA density estimate the bitfield was packed from). When given
        with cull_T > 0, enables density-prior sample culling: selected
        samples whose CONSERVATIVE transmittance bound (0.25x the grid
        estimate, clipped >= 0) has already fallen below cull_T are dropped.
        With cull_T << T_thresh (default 1e-6 vs 1e-4) the dropped samples
        are ones the compositor's early-termination chain
        (raymarching.cu:662-665) would never process, so outputs match while
        the field-evaluation budget shrinks to the surface thickness.
      cull_T: transmittance bound for the prior cull (0 disables).

    Returns dict with static shapes (S = cfg.max_steps):
      t:     [N, S] sample distance (0 where invalid).
      dt:    [N, S] step size (0 where invalid).
      valid: [N, S] bool sample mask.
      xyz:   [N, S, 3] sample positions, clamped to [-bound, bound].
    """
    N = rays_o.shape[0]
    S = cfg.n_sample_slots
    K = cfg.n_march_iters

    t0 = nears
    if noises is not None:
        t0 = t0 + _clamp_dt(t0, cfg) * noises

    affine = cfg.dt_gamma == 0.0 or cfg.dt_min == cfg.dt_max
    if affine:
        # dt == dt_min everywhere (always true for the reference config:
        # max_steps=16, H=128 gives dt_min == dt_max == 2*sqrt(3)/128, so
        # clamp(t*dt_gamma, dt_min, dt_max) is constant). Orbit is affine:
        # t_k = t0 + k*dt, enabling windowed marching with a per-ray integer
        # lattice offset.
        dt = cfg.dt_min
        if t_window is not None:
            t_lo, t_hi = t_window
            k0 = jnp.clip(jnp.floor((t_lo - t0) / dt), 0.0, None)
        else:
            t_hi = fars
            k0 = jnp.zeros_like(t0)
        k = k0[:, None] + jnp.arange(K, dtype=jnp.float32)[None, :]
        ts = t0[:, None] + k * dt
        dts = jnp.full_like(ts, dt)
        t_end = jnp.minimum(fars, t_hi if t_window is not None else fars)
    else:
        ts, dts = _orbit(t0, cfg)  # [N, K] general recurrence
        t_end = fars
        if t_window is not None:
            t_end = jnp.minimum(fars, t_window[1])

    xyz = jnp.clip(
        rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :], -cfg.bound, cfg.bound
    )
    if sigma_rows is not None:
        # one fetch serves both the skip decision and the density bound
        occ, sig_lo = sigma_byte_lookup(xyz, dts, sigma_rows, cfg)
        occ = occ & (ts < t_end[:, None])
        if cull_T > 0.0:
            est = jnp.where(occ, sig_lo * dts * cull_safety, 0.0)
            cum_prev = jnp.cumsum(est, axis=1) - est
            occ = occ & (cum_prev <= -math.log(cull_T))
    else:
        if bitrows is None:
            bitrows = pack_bitfield_rows(bitfield)
        occ = occupancy_lookup_wide(xyz, dts, bitrows, cfg)
        occ = occ & (ts < t_end[:, None])

    if affine:
        # t is affine in the orbit index, so selection needs ONE contraction
        # (k_sel) instead of separate t/dt contractions; dt is constant.
        rank = jnp.cumsum(occ.astype(jnp.int32), axis=1)
        keep = occ & (rank <= S)
        slot = jnp.where(keep, rank - 1, S)
        oh = slot[..., None] == jnp.arange(S)[None, None, :]
        k_rel = jnp.broadcast_to(jnp.arange(K, dtype=jnp.float32)[None, :], occ.shape)
        k_sel = jnp.einsum("nk,nks->ns", k_rel, oh.astype(jnp.float32))
        valid = jnp.any(oh, axis=1)
        t_out = jnp.where(valid, t0[:, None] + (k0[:, None] + k_sel) * dt, 0.0)
        dt_out = jnp.where(valid, dt, 0.0)
    else:
        t_out, dt_out, valid = _select_first_s(ts, dts, occ, S)
    xyz_out = jnp.clip(
        rays_o[:, None, :] + t_out[..., None] * rays_d[:, None, :], -cfg.bound, cfg.bound
    )

    if sigma_grid is not None and sigma_rows is None and cull_T > 0.0:
        H = cfg.grid_size
        if cfg.cascade == 1:
            level = jnp.zeros(xyz_out.shape[:-1], jnp.int32)
            mip_bound = jnp.float32(min(1.0, cfg.bound))
        else:
            level = _mip_level(xyz_out, dt_out, cfg)
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)
        n = jnp.clip(
            jnp.floor(0.5 * (xyz_out / mip_bound[..., None] + 1.0) * H), 0.0, H - 1
        ).astype(jnp.int32)
        cell = level * (H * H * H) + morton3d(n)
        # wide-row fetch of the fp32 grid (16 cells/row), lane-extracted
        grid_rows = sigma_grid.reshape(-1, 16)
        rows = take_rows(grid_rows, cell >> 4)  # [N, S, 16]
        lane = (cell & 15)[..., None] == jnp.arange(16, dtype=jnp.int32)
        sig_hat = jnp.sum(jnp.where(lane, rows, 0.0), axis=-1)
        sig_hat = jnp.clip(sig_hat, 0.0, None) * 0.25  # conservative lower bound
        cum_prev = jnp.cumsum(sig_hat * dt_out, axis=-1) - sig_hat * dt_out
        valid = valid & (cum_prev <= -math.log(cull_T))

    xyz_out = jnp.where(valid[..., None], xyz_out, 0.0)
    return {
        "t": jnp.where(valid, t_out, 0.0),
        "dt": jnp.where(valid, dt_out, 0.0),
        "valid": valid,
        "xyz": xyz_out,
        # capacity telemetry: the largest per-ray occupied count the orbit
        # produced (pre-lattice-clip) — the Trainer sizes sample_slots off it
        "max_count": jnp.max(jnp.sum(occ.astype(jnp.int32), axis=1)),
    }


def march_rays_grouped(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    cfg: MarchConfig,
    sigma_rows: jnp.ndarray,
    coarse_rows: jnp.ndarray,
    t_window: tuple,
    group: int,
    group_capacity: int,
    group_slots: int,
    noises: jnp.ndarray | None = None,
    cull_T: float = 0.0,
    cull_safety: float = 0.5,
):
    """Two-level (coarse supercell -> compacted fine) marcher.

    The dense marcher fetches one occupancy row per orbit point: N * K
    rows. With K sized to the occupied-sphere DIAMETER, most fetches land
    in guaranteed-empty space — static shapes make every ray pay the
    worst-case orbit. This variant pays the MEAN instead:

      1. COARSE: one fetch per ``group`` fine steps against the dilated/
         eroded supercell field (build_coarse_rows): N * ceil(K/group)
         rows from a table ``group^3``-fold smaller. Groups that are
         coarse-unoccupied (dilated bit clear) contain NO occupied fine
         cell — provably skippable. Groups whose eroded-min optical-depth
         prefix already exceeds -log(cull_T) are a suffix the fine cull
         would also drop (the eroded bound is a lower bound of the fine
         path's per-sample estimate, and the kept prefix reproduces the
         dense path's cumsum exactly — see the parity test).
      2. COMPACT: surviving (ray, group) pairs are globally compacted into
         a static ``group_capacity`` buffer (scatter-free: one N-row
         marker scatter + cumsum/cummax maps, the _eval_field_compacted
         pattern), so the fine stage pays sum-of-kept-groups, not
         N * max-kept-per-ray.
      3. FINE: ``group`` sigma-byte fetches per buffer entry, returned to
         a per-ray ``[N, group_slots * group]`` lattice with one N-row
         slab gather, then the SAME first-S selection/cull as the dense
         path.

    EXACTNESS: for ample capacities the emitted sample set is identical
    to march_rays' (tests/test_ops.py::test_march_grouped_matches_dense).
    ``group_capacity`` / ``group_slots`` overflow DROPS groups (telemetry:
    n_groups_needed / n_group_max; the Trainer adapts, bench sizes fresh).

    Requires: affine orbit (dt_min == dt_max), cascade == 1, a t_window,
    and ceil(K/group) <= 24 (group ids ride an exact-f32 bitmask).
    """
    N = rays_o.shape[0]
    S = cfg.n_sample_slots
    K = cfg.n_march_iters
    g = group
    Kg = -(-K // g)
    assert cfg.cascade == 1, "grouped marching requires cascade == 1"
    assert cfg.dt_gamma == 0.0 or cfg.dt_min == cfg.dt_max
    assert Kg <= 24, "group-id bitmask needs Kg <= 24 (exact f32)"
    dt = cfg.dt_min
    log_cull = -math.log(cull_T) if cull_T > 0.0 else None

    t0 = nears
    if noises is not None:
        t0 = t0 + _clamp_dt(t0, cfg) * noises
    t_lo, t_hi = t_window
    k0 = jnp.clip(jnp.floor((t_lo - t0) / dt), 0.0, None)
    t_end = jnp.minimum(fars, t_hi)

    cfg_c = dataclasses.replace(cfg, grid_size=cfg.grid_size // g)

    # ---- 1. coarse pass over group centers -----------------------------
    j = jnp.arange(Kg, dtype=jnp.float32)[None, :]
    kc = k0[:, None] + j * g + (g - 1) * 0.5
    tc = t0[:, None] + kc * dt
    xyz_c = jnp.clip(
        rays_o[:, None, :] + tc[..., None] * rays_d[:, None, :],
        -cfg.bound, cfg.bound,
    )
    occ_c, sig_c = sigma_byte_lookup(
        xyz_c, jnp.full_like(tc, dt * g), coarse_rows, cfg_c
    )
    # a group whose START is beyond the window has every fine t beyond it
    t_start = t0[:, None] + (k0[:, None] + j * g) * dt
    m = occ_c & (t_start < t_end[:, None])
    if log_cull is not None:
        est_c = jnp.where(m, sig_c * (g * dt) * cull_safety, 0.0)
        cum_c = jnp.cumsum(est_c, axis=1) - est_c
        m = m & (cum_c <= log_cull)

    counts = jnp.sum(m.astype(jnp.int32), axis=1)  # kept groups / ray
    base = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)

    # ---- 2. global (ray, group) compaction -----------------------------
    Cg = group_capacity
    marker = jnp.zeros((Cg,), jnp.int32).at[jnp.minimum(base, Cg)].add(
        1, mode="drop"
    )
    r_of = jnp.cumsum(marker) - 1
    iota = jnp.arange(Cg, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(marker > 0, iota, -1))
    s_of = iota - seg_start
    live = (r_of >= 0) & (iota < jnp.minimum(total, Cg))
    r_of = jnp.clip(r_of, 0, N - 1)

    # per-ray row: [group bitmask, t0, k0, t_end, o, d] — ONE wide gather
    bits = jnp.sum(
        m.astype(jnp.float32) * jnp.exp2(j), axis=1
    )  # exact for Kg <= 24
    ray_rows = jnp.concatenate(
        [
            jnp.stack([bits, t0, k0, t_end], axis=-1),
            rays_o, rays_d,
        ],
        axis=-1,
    )  # [N, 10]
    e = ray_rows[r_of]  # [Cg, 10]
    e_bits, e_t0, e_k0, e_tend = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    e_o, e_d = e[:, 4:7], e[:, 7:10]

    # decode this entry's group id: position of the (s_of+1)-th set bit
    gid = jnp.full((Cg,), 0, jnp.int32)
    cum_bits = jnp.zeros((Cg,), jnp.int32)
    found = jnp.zeros((Cg,), jnp.bool_)
    for jj in range(Kg):
        bit = (jnp.floor(e_bits * (0.5**jj)) % 2.0) >= 1.0
        cum_bits = cum_bits + bit.astype(jnp.int32)
        hit_now = bit & (~found) & (cum_bits == s_of + 1)
        gid = jnp.where(hit_now, jj, gid)
        found = found | hit_now

    # ---- 3. fine pass on compacted groups ------------------------------
    i = jnp.arange(g, dtype=jnp.float32)[None, :]
    kf = e_k0[:, None] + gid.astype(jnp.float32)[:, None] * g + i
    tf = e_t0[:, None] + kf * dt  # [Cg, g]
    xyz_f = jnp.clip(
        e_o[:, None, :] + tf[..., None] * e_d[:, None, :],
        -cfg.bound, cfg.bound,
    )
    occ_f, sig_f = sigma_byte_lookup(
        xyz_f, jnp.full_like(tf, dt), sigma_rows, cfg
    )
    # kf - e_k0 < K: the last group of a ray whose K is not a multiple of
    # ``group`` otherwise marches up to group-1 fine steps past the dense
    # marcher's K-step truncation (live since capacity sizing buckets K to
    # multiples of 2, not of ``group``)
    occ_f = (
        occ_f
        & (tf < e_tend[:, None])
        & (kf - e_k0[:, None] < K)
        & live[:, None]
        & found[:, None]
    )

    # pack (k_rel+1 | 0) and sigma planes; slab-return to per-ray lattice
    k_plane = jnp.where(occ_f, kf - e_k0[:, None] + 1.0, 0.0)
    payload = jnp.concatenate([k_plane, sig_f], axis=-1)  # [Cg, 2g]
    Gs = group_slots
    # per-(ray, ordinal) ROW gather — N*Gs rows of 2g floats. (A multi-dim
    # slice lax.gather slab here lowered as a SEQUENTIAL while loop on TPU:
    # 235 ms/frame at bench scale. Row gathers are the primitive that
    # lowers well; never slab-gather with slice_sizes > 1 on dim 0.)
    ord_i = jnp.arange(Gs, dtype=jnp.int32)[None, :]
    pos = base[:, None] + ord_i  # [N, Gs]
    ord_ok = (ord_i < jnp.minimum(counts, Gs)[:, None]) & (
        pos < jnp.minimum(total, Cg)
    )
    slab = take_rows(
        payload, jnp.clip(pos, 0, Cg - 1).reshape(-1)
    ).reshape(N, Gs, 2 * g)
    k_l = jnp.where(ord_ok[..., None], slab[..., :g], 0.0).reshape(N, Gs * g)
    sig_l = jnp.where(ord_ok[..., None], slab[..., g:], 0.0).reshape(N, Gs * g)
    occ_l = k_l > 0.0
    k_rel = jnp.maximum(k_l - 1.0, 0.0)

    # fine cull — identical formula to the dense path; the lattice holds
    # the kept groups in orbit order, and dropped groups contribute 0
    if log_cull is not None:
        est = jnp.where(occ_l, sig_l * dt * cull_safety, 0.0)
        cum_prev = jnp.cumsum(est, axis=1) - est
        occ_l = occ_l & (cum_prev <= log_cull)

    # ---- first-S selection (same contraction as the dense affine path) -
    rank = jnp.cumsum(occ_l.astype(jnp.int32), axis=1)
    keep = occ_l & (rank <= S)
    slot = jnp.where(keep, rank - 1, S)
    oh = slot[..., None] == jnp.arange(S)[None, None, :]
    k_sel = jnp.einsum("nk,nks->ns", k_rel, oh.astype(jnp.float32))
    valid = jnp.any(oh, axis=1)
    t_out = jnp.where(valid, t0[:, None] + (k0[:, None] + k_sel) * dt, 0.0)
    dt_out = jnp.where(valid, dt, 0.0)
    xyz_out = jnp.clip(
        rays_o[:, None, :] + t_out[..., None] * rays_d[:, None, :],
        -cfg.bound, cfg.bound,
    )
    xyz_out = jnp.where(valid[..., None], xyz_out, 0.0)
    return {
        "t": t_out,
        "dt": dt_out,
        "valid": valid,
        "xyz": xyz_out,
        "max_count": jnp.max(jnp.sum(occ_l.astype(jnp.int32), axis=1)),
        # two-level capacity telemetry (adaptive sizing)
        "n_groups_needed": total,
        "n_group_max": jnp.max(counts),
    }


def composite_rays(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    dts: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    ambient: jnp.ndarray | None = None,
    T_thresh: float = 1e-4,
):
    """Alpha-composite a [N, S] sample lattice (train & inference unified).

    Args:
      sigmas: [N, S] densities.
      rgbs: [N, S, 3] colors.
      dts: [N, S] step sizes (0 -> no-op slot).
      ts: [N, S] sample distances; depth accumulates t + dt, matching
        deltas[1] = "t after advance" in raymarching.cu:499-500.
      valid: [N, S] sample mask.
      ambient: optional [N, S] per-sample |ambient| sums; accumulated
        *unweighted* over processed steps (raymarching.cu:660).
      T_thresh: early-termination transmittance; steps after T drops below
        are excluded, the crossing step included (raymarching.cu:662-665).

    Returns dict: image [N,3] (premultiplied, no background), depth [N],
      weights_sum [N], ambient_sum [N] (zeros if ambient is None).
    """
    sigmas = jnp.where(valid, sigmas, 0.0)
    alpha = 1.0 - jnp.exp(-sigmas * dts)
    one_minus = 1.0 - alpha
    T_incl = jnp.cumprod(one_minus, axis=-1)  # T after step i
    # exclusive cumprod via shift (T before step i; robust when alpha == 1)
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1
    )

    processed = jnp.concatenate(
        [jnp.ones_like(T_incl[..., :1], jnp.bool_), T_incl[..., :-1] >= T_thresh],
        axis=-1,
    )
    weight = alpha * T_excl * processed

    weights_sum = jnp.sum(weight, axis=-1)
    depth = jnp.sum(weight * (ts + dts), axis=-1)
    image = jnp.sum(weight[..., None] * rgbs, axis=-2)
    if ambient is not None:
        ambient_sum = jnp.sum(
            jnp.where(processed & valid, ambient, 0.0), axis=-1
        )
    else:
        ambient_sum = jnp.zeros_like(weights_sum)
    return {
        "image": image,
        "depth": depth,
        "weights_sum": weights_sum,
        "ambient_sum": ambient_sum,
    }


def compact_samples(valid: jnp.ndarray, capacity: int):
    """Prefix-sum compaction of a [N, S] sample mask into a flat buffer.

    The TPU analogue of the reference's atomic-counter slot reservation
    (raymarching.cu:446) + mean_count buffer sizing (raymarching.py:224-229):
    field evaluation runs on a fixed-size [capacity] point buffer instead of
    the full dense lattice. Samples beyond capacity are dropped, mirroring
    the reference's behavior when mean_count underestimates.

    Returns:
      gather_idx: [capacity] flat indices into the [N*S] lattice (0-padded).
      gather_ok:  [capacity] bool, False for padding.
      scatter_pos: [N, S] position of each lattice sample in the buffer
        (== capacity for dropped/invalid -> use mode='drop').
      n_valid: [] int32 total valid count (pre-drop), for stats.
    """
    N, S = valid.shape
    flat = valid.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1  # position if valid
    ok = flat & (pos < capacity)
    scatter_pos = jnp.where(ok, pos, capacity).reshape(N, S)

    gather_idx = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(ok, pos, capacity)
    ].set(jnp.arange(N * S, dtype=jnp.int32), mode="drop")
    gather_ok = jnp.zeros((capacity,), jnp.bool_).at[
        jnp.where(ok, pos, capacity)
    ].set(True, mode="drop")
    return gather_idx, gather_ok, scatter_pos, jnp.sum(flat.astype(jnp.int32))
