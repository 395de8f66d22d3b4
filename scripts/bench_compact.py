#!/usr/bin/env python
"""Microbenchmarks for the render-frame compaction plumbing (TPU).

Measures variants of the three profiled below-wall gather patterns at bench
shapes (512x512 frame, sized capacities: N=262144 rays, R=163840 compacted,
S=8 slots, B=409600 sample buffer):

  A. sample fetch: lattice (xyz | broadcast d) -> [B, 6] row gather
     (profiled 3.2 ms/frame incl. two [3,R,S] broadcast materializations
     and a COLUMN-major 6-col operand gathering at ~300M rows/s)
  B. ray compaction: [N, 6] (o|d) -> [R, 6] row gather (profiled 1.47 ms
     = 111M rows/s — far below the 553M rows/s wall)
  C. torso coord compaction: [N, 2] -> [Rt, 2] gather (94M rows/s)

Timing: scalar-pull (block_until_ready lies on this backend), minus the
~27 ms tunnel roundtrip, averaged over reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

N = 262144
R = 163840
S = 8
B = 409600
RT = 98304


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = sum(
        float(jnp.sum(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(out)
    )
    dt = (time.time() - t0 - 0.027) / reps
    return dt * 1e3, s


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    o = jax.random.normal(ks[0], (R, 3), jnp.float32)
    d = jax.random.normal(ks[1], (R, 3), jnp.float32)
    t_lat = jax.random.uniform(ks[2], (R, S), jnp.float32)
    flat_idx = jax.random.randint(ks[3], (B,), 0, R * S)
    r_of = jax.random.randint(ks[4], (B,), 0, R)
    ray_idx = jax.random.randint(ks[5], (R,), 0, N)
    rays6 = jax.random.normal(ks[6], (N, 6), jnp.float32)
    bgc = jax.random.uniform(ks[7], (N, 2), jnp.float32)
    pix_idx = jax.random.randint(ks[3], (RT,), 0, N)

    # ---- A: sample fetch variants -------------------------------------
    @jax.jit
    def a0_current(o, d, t_lat, flat_idx):
        xyz = o[:, None, :] + t_lat[..., None] * d[:, None, :]  # [R,S,3]
        pts = jnp.concatenate(
            [xyz, jnp.broadcast_to(d[:, None, :], xyz.shape)], axis=-1
        ).reshape(R * S, 6)[flat_idx]
        return pts[:, :3] * 2.0 + pts[:, 3:]

    @jax.jit
    def a1_split(o, d, t_lat, flat_idx, r_of):
        xyz = (o[:, None, :] + t_lat[..., None] * d[:, None, :]).reshape(R * S, 3)
        xyz_f = xyz[flat_idx]
        d_f = d[r_of]
        return xyz_f * 2.0 + d_f

    @jax.jit
    def a2_split_pad4(o, d, t_lat, flat_idx, r_of):
        xyz4 = jnp.concatenate(
            [o[:, None, :] + t_lat[..., None] * d[:, None, :],
             jnp.zeros((R, S, 1))], axis=-1
        ).reshape(R * S, 4)
        d4 = jnp.pad(d, ((0, 0), (0, 1)))
        return xyz4[flat_idx][:, :3] * 2.0 + d4[r_of][:, :3]

    @jax.jit
    def a3_rayrow8(o, d, t_lat, flat_idx, r_of):
        # gather the RAY row (o,d,+pad to 8) once per sample and the t
        # lattice value per sample, recompute xyz on the buffer
        row8 = jnp.concatenate([o, d, jnp.zeros((R, 2))], axis=-1)  # [R,8]
        rr = row8[r_of]
        t_f = t_lat.reshape(R * S)[flat_idx]  # width-1 gather
        xyz_f = rr[:, :3] + t_f[:, None] * rr[:, 3:6]
        return xyz_f * 2.0 + rr[:, 3:6]

    @jax.jit
    def a4_lat8(o, d, t_lat, flat_idx):
        # 8-col (lane-aligned) lattice operand: xyz | d | t | pad
        lat = jnp.concatenate(
            [o[:, None, :] + t_lat[..., None] * d[:, None, :],
             jnp.broadcast_to(d[:, None, :], (R, S, 3)),
             t_lat[..., None], jnp.zeros((R, S, 1))], axis=-1
        ).reshape(R * S, 8)[flat_idx]
        return lat[:, :3] * 2.0 + lat[:, 3:6]

    @jax.jit
    def a5_u16_exact(o, d, t_lat, flat_idx):
        lat = jnp.concatenate(
            [o[:, None, :] + t_lat[..., None] * d[:, None, :],
             jnp.broadcast_to(d[:, None, :], (R, S, 3)),
             jnp.zeros((R, S, 2))], axis=-1).reshape(R * S, 8)
        bits = jax.lax.bitcast_convert_type(lat, jnp.uint32)
        hi = (bits >> 16).astype(jnp.uint16)
        lo = bits.astype(jnp.uint16)
        h = hi[flat_idx].astype(jnp.uint32)
        l = lo[flat_idx].astype(jnp.uint32)
        pts = jax.lax.bitcast_convert_type((h << 16) | l, jnp.float32)
        return pts[:, :3] * 2.0 + pts[:, 3:6]

    for name, fn, args in [
        ("A0 current (concat6, col-major op)", a0_current, (o, d, t_lat, flat_idx)),
        ("A1 split xyz3 + d3 gathers", a1_split, (o, d, t_lat, flat_idx, r_of)),
        ("A2 split xyz4 + d4 (padded)", a2_split_pad4, (o, d, t_lat, flat_idx, r_of)),
        ("A3 rayrow8 + width-1 t", a3_rayrow8, (o, d, t_lat, flat_idx, r_of)),
        ("A4 lat8 lane-aligned", a4_lat8, (o, d, t_lat, flat_idx)),
        ("A5 u16-split exact 2x lat8", a5_u16_exact, (o, d, t_lat, flat_idx)),
    ]:
        ms, chk = timed(fn, *args)
        print(f"{name:40s} {ms:7.3f} ms   (chk {chk:.1f})")

    # ---- B: ray compaction --------------------------------------------
    @jax.jit
    def b0_current(rays6, ray_idx):
        return rays6[ray_idx]

    @jax.jit
    def b1_pad8(rays6, ray_idx):
        r8 = jnp.pad(rays6, ((0, 0), (0, 2)))
        return r8[ray_idx][:, :6]

    @jax.jit
    def b2_bf16(rays6, ray_idx):
        r8 = jnp.pad(rays6, ((0, 0), (0, 2))).astype(jnp.bfloat16)
        return r8[ray_idx][:, :6].astype(jnp.float32)

    @jax.jit
    def b3_split_pad4(rays6, ray_idx):
        # two [N,4] f32 operands (4.2 MB each, near the VMEM-residency
        # knee) instead of one 6.3 MB [N,6]
        o4 = jnp.pad(rays6[:, :3], ((0, 0), (0, 1)))
        d4 = jnp.pad(rays6[:, 3:], ((0, 0), (0, 1)))
        return jnp.concatenate(
            [o4[ray_idx][:, :3], d4[ray_idx][:, :3]], axis=-1)

    @jax.jit
    def b4_split_raw3(rays6, ray_idx):
        return jnp.concatenate(
            [rays6[:, :3][ray_idx], rays6[:, 3:][ray_idx]], axis=-1)

    @jax.jit
    def b5_u16_exact(rays6, ray_idx):
        # BIT-EXACT f32 via two u16[N,8] gathers (bf16-shaped (2,1) lane
        # packing + <=4MB operands = the B2 fast path, without bf16 loss):
        # f32 word = (hi16 << 16) | lo16
        r8 = jnp.pad(rays6, ((0, 0), (0, 2)))
        bits = jax.lax.bitcast_convert_type(r8, jnp.uint32)
        hi = (bits >> 16).astype(jnp.uint16)
        lo = bits.astype(jnp.uint16)
        h = hi[ray_idx].astype(jnp.uint32)
        l = lo[ray_idx].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(
            (h << 16) | l, jnp.float32)[:, :6]

    for name, fn in [
        ("B0 current [N,6] gather", b0_current),
        ("B1 padded [N,8] gather", b1_pad8),
        ("B2 padded bf16 [N,8]", b2_bf16),
        ("B3 split 2x [N,4] f32", b3_split_pad4),
        ("B4 split 2x [N,3] f32", b4_split_raw3),
        ("B5 u16-split exact 2x [N,8]", b5_u16_exact),
    ]:
        ms, chk = timed(fn, rays6, ray_idx)
        print(f"{name:40s} {ms:7.3f} ms   (chk {chk:.1f})")

    # ---- C: torso coords ----------------------------------------------
    @jax.jit
    def c0_current(bgc, pix_idx):
        return bgc[pix_idx]

    @jax.jit
    def c1_pad4(bgc, pix_idx):
        b4 = jnp.pad(bgc, ((0, 0), (0, 2)))
        return b4[pix_idx][:, :2]

    @jax.jit
    def c2_pad8(bgc, pix_idx):
        b8 = jnp.pad(bgc, ((0, 0), (0, 6)))
        return b8[pix_idx][:, :2]

    @jax.jit
    def c3_u16_exact(bgc, pix_idx):
        b4 = jnp.pad(bgc, ((0, 0), (0, 2)))
        bits = jax.lax.bitcast_convert_type(b4, jnp.uint32)
        hi = (bits >> 16).astype(jnp.uint16)
        lo = bits.astype(jnp.uint16)
        h = hi[pix_idx].astype(jnp.uint32)
        l = lo[pix_idx].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type((h << 16) | l, jnp.float32)[:, :2]

    for name, fn in [
        ("C0 current [N,2] gather", c0_current),
        ("C1 padded [N,4] gather", c1_pad4),
        ("C2 padded [N,8] gather", c2_pad8),
        ("C3 u16-split exact 2x [N,4]", c3_u16_exact),
    ]:
        ms, chk = timed(fn, bgc, pix_idx)
        print(f"{name:40s} {ms:7.3f} ms   (chk {chk:.1f})")


if __name__ == "__main__":
    main()
