"""Morton (Z-order) indexing, occupancy bitfield packing, and grid dilation.

Replaces the reference raymarching utility kernels (reference
raymarching/src/raymarching.cu):
- morton3D / morton3D_invert: 30-bit Morton encode/decode via bit-expansion
  tricks (raymarching.cu:56-81, 214-260).
- packbits: density grid [C, H^3] -> occupancy bitfield uint8 [C*H^3/8],
  one bit per cell, thresholded (raymarching.cu:267-300).
- morton3D_dilation: 6-neighbour max "dilation" over a Morton-ordered grid
  (raymarching.cu:303-341).

These run on the grid-maintenance path (every 16 train steps), not the hot
render path, so vectorized jnp bit tricks are the right TPU expression —
no Pallas needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each uint32 out to every 3rd bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] int coords in [0, 1024) -> [...] Morton codes (int32)."""
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """[...] Morton codes -> [..., 3] int32 coords."""
    i = indices.astype(jnp.uint32)
    x = _compact_bits(i)
    y = _compact_bits(i >> 1)
    z = _compact_bits(i >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Density grid [C, H^3] float -> bitfield uint8 [C*H^3//8].

    Bit k of byte b corresponds to flat cell index b*8+k (within the
    Morton-ordered grid), matching raymarching.cu:267-300 where the marcher
    tests ``grid[index/8] & (1 << (index%8))``.
    """
    occ = (grid.reshape(-1) > thresh).astype(jnp.uint8)
    occ = occ.reshape(-1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(occ << shifts, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray, cascade: int, grid_size: int) -> jnp.ndarray:
    """Inverse of ``packbits``: bitfield uint8 [C*H^3//8] -> occupancy
    uint8 {0,1} [C, H^3] in Morton order. Used to reconstruct render
    acceleration state from checkpoints that retain only the bitfield
    (the reference's best-style ckpts, nerf/utils.py:1353-1355)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[:, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(cascade, grid_size**3)


def morton_dilate(grid: jnp.ndarray, H: int) -> jnp.ndarray:
    """6-neighbour max over a Morton-ordered density grid [C, H^3].

    TPU expression: decode to a dense [C, H, H, H] volume (a fixed
    permutation), take axis-aligned neighbour maxima via jnp.roll with edge
    clamping, re-encode. Equivalent to kernel_morton3D_dilation
    (raymarching.cu:303-341).
    """
    C = grid.shape[0]
    codes = morton3d_invert(jnp.arange(H * H * H, dtype=jnp.int32))  # [H^3, 3]
    # scatter morton -> dense
    dense = jnp.zeros((C, H, H, H), grid.dtype)
    dense = dense.at[:, codes[:, 0], codes[:, 1], codes[:, 2]].set(grid)

    def shifted(a, axis, direction):
        rolled = jnp.roll(a, direction, axis=axis)
        # out-of-range neighbours are skipped in the reference; replacing the
        # rolled-in edge with the cell's own value is equivalent under max.
        idx = [slice(None)] * a.ndim
        idx[axis] = 0 if direction == 1 else -1
        return rolled.at[tuple(idx)].set(a[tuple(idx)])

    # 6-neighbour cross: max of self and +-1 along each axis, all taken from
    # the ORIGINAL grid (not sequentially composed, which would dilate a box).
    out = dense
    for axis in (1, 2, 3):
        out = jnp.maximum(out, shifted(dense, axis, 1))
        out = jnp.maximum(out, shifted(dense, axis, -1))

    return out[:, codes[:, 0], codes[:, 1], codes[:, 2]]
