"""Multiresolution tiled/hash grid encoding (Instant-NGP style), TPU-native.

Replaces the reference CUDA extension ``gridencoder`` (see reference
gridencoder/src/gridencoder.cu:87-244 ``kernel_grid`` and
gridencoder/grid.py:96-185 ``GridEncoder``) with a pure-JAX implementation:
the per-(point, level) corner gathers lower to XLA gathers, and the backward
scatter-add to embeddings / analytic input Jacobian both fall out of autodiff
(``floor`` has zero gradient, so d(frac)/d(input) == scale exactly like the
hand-written dy_dx in gridencoder.cu:198-243).

Level geometry matches the reference bit-for-bit:
- offsets table: per level ``resolution_i = ceil(base * pls**i)``,
  ``params = min(2**log2_hashmap_size, (res+1)**D)`` rounded up to a multiple
  of 8 (grid.py:117-131; align_corners=False is the only mode used).
- runtime scale: ``scale = exp2(level*S)*H - 1``, ``resolution =
  ceil(scale)+1`` (gridencoder.cu:138-139).
- index: row-major strided while ``stride <= hashmap_size`` with uint32
  wraparound; spatial hash (XOR of prime multiples, gridencoder.cu:50-63)
  only when gridtype=='hash' and the level overflows; final
  ``index % hashmap_size`` (gridencoder.cu:66-84).
- out-of-bounds inputs (outside [0,1]) encode to zeros
  (gridencoder.cu:110-135).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .rowgather import take_rows

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)
_U32 = 1 << 32
# One-hot MXU fetch beats XLA gather up to this table size. Measured twice:
# micro (scripts/bench_gather.py: 1139M rows/s at T=512, 498M at T=2048,
# 291M at T=4096 vs take's ~300-320M) and FRAME-LEVEL A/B on the realistic
# bench scene (round 4: threshold 0 -> 14.39 FPS, 2048 -> 14.96, 4096 ->
# 14.92). 2048 is the settled crossover — a constant, not a knob.
_ONEHOT_MAX_ROWS = 2048


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static description of one multiresolution grid encoder."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 16
    per_level_scale: float = 2.0
    gridtype: str = "tiled"  # 'tiled' | 'hash'
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    align_corners: bool = False

    @staticmethod
    def create(
        input_dim: int = 3,
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        log2_hashmap_size: int = 16,
        desired_resolution: float | None = None,
        per_level_scale: float = 2.0,
        gridtype: str = "tiled",
        interpolation: str = "linear",
        align_corners: bool = False,
    ) -> "GridSpec":
        # desired_resolution overrides per_level_scale (grid.py:101-102)
        if desired_resolution is not None:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        return GridSpec(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            per_level_scale=per_level_scale,
            gridtype=gridtype,
            interpolation=interpolation,
            align_corners=align_corners,
        )

    @property
    def max_params(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def offsets(self) -> tuple[int, ...]:
        """Per-level start offsets into the flat parameter table (grid.py:117-127)."""
        offs = []
        offset = 0
        for i in range(self.num_levels):
            resolution = int(np.ceil(self.base_resolution * self.per_level_scale**i))
            n = resolution if self.align_corners else resolution + 1
            params_in_level = min(self.max_params, n**self.input_dim)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)
            offs.append(offset)
            offset += params_in_level
        offs.append(offset)
        return tuple(offs)

    @property
    def n_embeddings(self) -> int:
        return self.offsets[-1]

    def level_scale(self, level: int) -> float:
        """Runtime grid scale for a level (gridencoder.cu:138).

        Computed with the same fp32 arithmetic chain as the CUDA kernel
        (``exp2f(level * S) * H - 1.0f``) so sample positions match the
        reference bit-for-bit at high levels.
        """
        s = np.float32(math.log2(self.per_level_scale))
        return float(
            np.exp2(np.float32(level) * s) * np.float32(self.base_resolution)
            - np.float32(1.0)
        )

    def level_resolution(self, level: int) -> int:
        """Runtime grid resolution for a level (gridencoder.cu:139)."""
        return int(np.ceil(self.level_scale(level))) + 1

    def init(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        """U(-1e-4, 1e-4) init as in grid.py:138-140."""
        return jax.random.uniform(
            key, (self.n_embeddings, self.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
        )


def _corner_index(spec: GridSpec, level: int, corner_grid: jax.Array) -> jax.Array:
    """uint32 parameter index for integer corner coords [B, D].

    Mirrors get_grid_index (gridencoder.cu:66-84) with explicit uint32
    wraparound of the stride accumulator.
    """
    offs = spec.offsets
    hashmap_size = offs[level + 1] - offs[level]
    resolution = spec.level_resolution(level)
    n = resolution if spec.align_corners else resolution + 1

    index = jnp.zeros(corner_grid.shape[:-1], dtype=jnp.uint32)
    stride = 1  # python int tracking uint32 value
    for d in range(spec.input_dim):
        if stride <= hashmap_size:
            index = index + corner_grid[..., d] * jnp.uint32(stride)
        stride = (stride * n) % _U32

    if spec.gridtype == "hash" and stride > hashmap_size:
        index = jnp.zeros(corner_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            index = index ^ (corner_grid[..., d] * jnp.uint32(_PRIMES[d] % _U32))

    return index % jnp.uint32(hashmap_size)


def grid_encode01(inputs01: jax.Array, embeddings: jax.Array, spec: GridSpec) -> jax.Array:
    """Encode points already normalized to [0, 1].

    Args:
      inputs01: [..., D] float32 in [0, 1] (out-of-range rows encode to 0).
      embeddings: [n_embeddings, C] parameter table.
      spec: static grid description.

    Returns:
      [..., L*C] features, ordered [level0 ch0, level0 ch1, level1 ch0, ...]
      (matches the reference's ``[B, L*C]`` layout after its L-first permute,
      grid.py:57).
    """
    if inputs01.shape[-1] != spec.input_dim:
        raise ValueError(f"expected last dim {spec.input_dim}, got {inputs01.shape}")
    D = spec.input_dim
    x = inputs01.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)

    level_outputs = []
    for level in range(spec.num_levels):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_grid = jnp.floor(pos)
        frac = pos - jax.lax.stop_gradient(pos_grid)
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = jax.lax.stop_gradient(pos_grid).astype(jnp.uint32)

        out = None
        # OOB rows ride the corner weights (w = 0 for every corner => exact
        # zero output and zero grads), replacing a per-level post-reduce
        # select over the full feature tensor (see grid_encode01_packed).
        inb = 1.0 - oob[..., 0].astype(jnp.float32)
        for corner in range(1 << D):
            bits = [(corner >> d) & 1 for d in range(D)]
            w = inb
            for d, bit in enumerate(bits):
                w = w * (frac[..., d] if bit else (1.0 - frac[..., d]))
            cg = pg + jnp.asarray(bits, dtype=jnp.uint32)
            idx = _corner_index(spec, level, cg) + jnp.uint32(spec.offsets[level])
            emb = take_rows(embeddings, idx.astype(jnp.int32))
            contrib = w[..., None] * emb
            out = contrib if out is None else out + contrib
        level_outputs.append(out)

    return jnp.concatenate(level_outputs, axis=-1)


@partial(jax.jit, static_argnames=("spec", "bound"))
def grid_encode(
    inputs: jax.Array, embeddings: jax.Array, spec: GridSpec, bound: float = 1.0
) -> jax.Array:
    """Encode points in [-bound, bound] (GridEncoder.forward, grid.py:145-161)."""
    x01 = (inputs + bound) / (2.0 * bound)
    return grid_encode01(x01, embeddings, spec)


def _active_strides(spec: GridSpec, level: int) -> list[int]:
    """Per-dim index strides with the CUDA inclusion rule (a dim stops
    contributing once the running stride exceeds the level's table size,
    gridencoder.cu:71-75)."""
    offs = spec.offsets
    hashmap_size = offs[level + 1] - offs[level]
    resolution = spec.level_resolution(level)
    n = resolution if spec.align_corners else resolution + 1
    strides = []
    stride = 1
    for _ in range(spec.input_dim):
        strides.append(stride if stride <= hashmap_size else 0)
        stride = (stride * n) % _U32
    return strides


def build_packed_table(
    embeddings: jax.Array, spec: GridSpec, dtype=None
) -> tuple:
    """Corner-packed PER-LEVEL tables: one row per cell key holding all 2^D
    corner features of that cell.

    TPU-native design notes (both measured on v5e, see PERFORMANCE.md):
    - XLA/TPU gather cost is per ROW (width up to ~32 floats is nearly
      free), so fetching a trilinear cell as one wide row instead of 2^D
      separate rows is a 2^D-fold reduction in gather work — the dominant
      cost of grid encoding on TPU. This exploits a property of TILED grids
      (gridtype='tiled', the only kind RAD-NeRF uses, network.py:133-134,
      165): the vertex index is additive mod T in the cell coordinates
      (index = (sum_d coord_d * stride_d) % T, gridencoder.cu:66-84), so
      corner c of the cell with key k lives at (k + delta_c) % T with a
      FIXED per-level offset delta_c — the packed level table is just 2^D
      circular rolls of the level's vertex table.
    - gather throughput depends on the OPERAND SIZE: a <=4 MB table gathers
      ~1.8x faster than one monolithic 58 MB table (it stays VMEM-resident).
      Hence one packed array PER LEVEL (each <=4 MB for the shipped config)
      instead of a single concatenated table.
    - ``dtype=bfloat16`` halves the row bytes again and interpolation then
      runs END-TO-END in bf16 (the consumer MLPs are bf16 anyway; f32 lerp
      of bf16-quantized corners only doubled bandwidth) — the analogue of
      the reference running its grid encoders under fp16 AMP (-O bundle,
      main.py:111-113).

    Rolls/casts are cheap, bandwidth-bound, and differentiable, so packing
    is rebuilt inside the train step and gradients flow back to the
    canonical fp32 table automatically.

    Returns a tuple of per-level arrays [T_l, C * 2^D]; rows are
    CHANNEL-MAJOR (all 2^D corners of channel 0, then channel 1, ...):
    entry k of level l is concat_ch concat_c V[offs_l + (k + delta_c^l) %
    T_l][ch]. Channel-major keeps the corner axis MINOR after the row
    fetch, so the trilinear reduction is an in-register lane reduce — the
    corner-interleaved layout forced XLA to relayout-copy every fetched
    level (~140 us x 32 levels/frame, profiled) before it could reduce the
    middle axis.
    """
    if spec.gridtype != "tiled":
        raise ValueError("corner packing requires a tiled grid (hash indices are not additive)")
    D = spec.input_dim
    offs = spec.offsets
    per_level = []
    for level in range(spec.num_levels):
        seg = embeddings[offs[level]: offs[level + 1]]
        strides = _active_strides(spec, level)
        corners = []
        for corner in range(1 << D):
            delta = sum(strides[d] for d in range(D) if (corner >> d) & 1)
            corners.append(jnp.roll(seg, -delta % seg.shape[0], axis=0))
        # [T, C, 2^D] -> [T, C * 2^D] channel-major rows
        lvl = jnp.stack(corners, axis=-1).reshape(seg.shape[0], -1)
        if dtype is not None:
            lvl = lvl.astype(dtype)
        # one ZERO row at index T: OOB points route to it THROUGH the
        # gather index (1-lane s32 math in grid_encode01_packed) — a
        # post-reduce jnp.where / w-mask both lower to a full select pass
        # over every fetched row (~20 x 246 us/frame profiled round 4)
        lvl = jnp.concatenate([lvl, jnp.zeros((1, lvl.shape[1]), lvl.dtype)])
        per_level.append(lvl)
    return tuple(per_level)


def grid_encode01_packed(
    inputs01: jax.Array, packed: tuple, spec: GridSpec
) -> jax.Array:
    """Encode via the corner-packed per-level tables: ONE gather row per
    (point, level), each from its own (VMEM-sized) level table.

    Numerically identical to grid_encode01 for tiled grids when the tables
    are fp32 (same fp32 position math, same index rule, same OOB-to-zero
    behavior); bf16 tables quantize the stored corner values AND the lerp
    itself runs in bf16 (bf16 weights x bf16 corners, bf16 output) — the
    trilinear weights are still computed from fp32 positions.
    """
    D = spec.input_dim
    C = spec.level_dim
    n_corners = 1 << D
    x = inputs01.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    # OOB routes to the per-level ZERO row (index T, build_packed_table)
    # through 1-lane index arithmetic: a row-level mask (jnp.where on the
    # output OR a {0,1} factor folded into w — XLA canonicalizes both to
    # the same select) costs a full pass over every fetched row
    # (~20 x 246 us/frame profiled round 4); the index add is free.
    oob_u = oob[..., 0].astype(jnp.uint32)

    level_outputs = []
    for level in range(spec.num_levels):
        offs = spec.offsets
        hashmap_size = offs[level + 1] - offs[level]
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_grid = jnp.floor(pos)
        frac = pos - jax.lax.stop_gradient(pos_grid)
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = jax.lax.stop_gradient(pos_grid).astype(jnp.uint32)

        strides = _active_strides(spec, level)
        key = jnp.zeros(x.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            if strides[d]:
                key = key + pg[..., d] * jnp.uint32(strides[d])
        key = key % jnp.uint32(hashmap_size)

        T = packed[level].shape[0] - 1  # last row is the OOB zero row
        key = jnp.minimum(key + oob_u * jnp.uint32(T), jnp.uint32(T))
        if T <= _ONEHOT_MAX_ROWS:
            # one-hot matmul fetch on the MXU: measured 1.6-3.8x faster
            # than XLA's gather for tables <= 2048 rows (bench_gather.py:
            # 1139M rows/s at T=512, 498M at T=2048 vs take's ~300M) —
            # only the smallest 2-D levels qualify. Exact: a single 1.0
            # per row selects the stored value bit-for-bit (the appended
            # zero row rides along as one extra einsum row).
            oh = (key.astype(jnp.int32)[..., None]
                  == jnp.arange(T + 1, dtype=jnp.int32))
            # f32 tables need HIGHEST precision: the default TPU matmul
            # precision would silently truncate them to bf16 inside the
            # einsum. bf16 tables are already exact at default precision
            # (bf16 x 1.0 with f32 accumulation) and HIGHEST would slow
            # them with multi-pass emulation.
            prec = (jax.lax.Precision.HIGHEST
                    if packed[level].dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            rows = jnp.einsum("...t,tw->...w", oh.astype(packed[level].dtype),
                              packed[level], precision=prec)
        else:
            rows = take_rows(packed[level], key.astype(jnp.int32))

        # trilinear weights, corner-major to match packing order (OOB rows
        # already fetched the zero row, so no mask is needed here)
        w = jnp.ones((*x.shape[:-1], 1), jnp.float32)
        for corner_bit in range(D):
            f = frac[..., corner_bit]
            pair = jnp.stack([1.0 - f, f], axis=-1)  # [..., 2]
            if corner_bit == 0:
                w = pair
            else:
                w = (w[..., None, :] * pair[..., :, None]).reshape(
                    *x.shape[:-1], -1
                )
        # w is ordered with corner_bit0 fastest: w[..., c] matches corner c.
        # Rows are channel-major [..., C * 2^D], so the corner axis is MINOR
        # after the (free, row-major) reshape and the reduction is an
        # in-register lane reduce — no relayout copy. bf16 tables also
        # interpolate in bf16: the consumer MLPs run in bf16 anyway, so f32
        # interpolation of bf16-quantized corners bought nothing but double
        # bandwidth through the widest tensors of the frame.
        if rows.dtype == jnp.bfloat16:
            prod = rows.reshape(*rows.shape[:-1], C, n_corners) \
                * w[..., None, :].astype(jnp.bfloat16)
        else:
            prod = rows.astype(jnp.float32).reshape(
                *rows.shape[:-1], C, n_corners) * w[..., None, :]
        out = jnp.sum(prod, axis=-1)  # [..., C] (already 0 on OOB rows:
        level_outputs.append(out)     # they fetched the zero row)

    return jnp.concatenate(level_outputs, axis=-1)


def grid_encode_packed(
    inputs: jax.Array, packed: jax.Array, spec: GridSpec, bound: float = 1.0
) -> jax.Array:
    x01 = (inputs + bound) / (2.0 * bound)
    return grid_encode01_packed(x01, packed, spec)


def grid_total_variation(
    inputs01: jax.Array, embeddings: jax.Array, spec: GridSpec, weight: float = 1e-7
) -> jax.Array:
    """Total-variation regularizer gradient surrogate.

    The reference exposes grad_total_variation (gridencoder.cu:505-644) which
    adds a TV penalty gradient directly into embeddings.grad; it is unused by
    the training loop. Here we provide the scalar TV loss at sampled points so
    it can simply be added to the training loss under autodiff.
    """
    D = spec.input_dim
    total = 0.0
    for level in range(spec.num_levels):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = jnp.floor(inputs01 * scale + shift).astype(jnp.uint32)
        base_idx = _corner_index(spec, level, pos) + jnp.uint32(spec.offsets[level])
        base = take_rows(embeddings, base_idx.astype(jnp.int32))
        for d in range(D):
            nb = pos.at[..., d].add(jnp.uint32(1))
            nb_idx = _corner_index(spec, level, nb) + jnp.uint32(spec.offsets[level])
            nbv = take_rows(embeddings, nb_idx.astype(jnp.int32))
            total = total + jnp.sum((nbv - base) ** 2)
    return weight * total
