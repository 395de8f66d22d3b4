#!/usr/bin/env python
"""A/B the march sigma-byte extraction (ops/marching.py:sigma_byte_lookup)
at the CURRENT bench scale.

Round-4 motivation: the frame profile (13.67 FPS) shows the [4.9M, 8] u32
row gather itself at 8.9 ms (the ~2 cyc/row wall) but ~10.3 ms of layout
churn around it — XLA lowers the select tree's relayout as
copy{1,0->0,1} + an 8-iteration while/dynamic-update-slice transpose +
reshape (copy.2437 3.6 ms, while.1 2.7 ms, ds_reduce 1.7 ms, DUS 1.0 ms,
reshape.2010 1.3 ms). Round 2 measured the same extraction at one 6.9 ms
copy for 9.2M rows; per-row the layout cost DOUBLED. These variants try to
hand XLA an HLO shape that skips the churn.

Run (one TPU process at a time):
    python scripts/bench_march_extract.py
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

TUNNEL_MS = 27.0
N, K = 163840, 30  # bench-sized: rays x march iters
ROWS = 65536       # cascade * 128^3 / 32


def _dequant(code):
    return jnp.exp2(code.astype(jnp.float32) * (14.0 / 127.0) - 7.0) - 2.0**-7


def timed_ms(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out[1][:64]))  # warm + sync (block_until_ready lies here)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out[1][:64]))
    return (time.time() - t0) * 1e3 / reps - TUNNEL_MS / reps


# --- variants: (sigma_rows [ROWS, 8] u32, cell [N, K] i32) -> (occ, sig_lo)

def v_current(sigma_rows, cell):
    """Shipped path: row take + lane-slice select tree."""
    row = jnp.take(sigma_rows, cell >> 5, axis=0)  # [N, K, 8]
    half = jnp.where((cell[..., None] & 16) > 0, row[..., 4:8], row[..., 0:4])
    quad = jnp.where((cell[..., None] & 8) > 0, half[..., 2:4], half[..., 0:2])
    word = jnp.where((cell & 4) > 0, quad[..., 1], quad[..., 0])
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_transpose_first(sigma_rows, cell):
    """Explicit transpose to [8, N, K] BEFORE the select tree: selects then
    slice the MAJOR dim (full lanes), one materialized transpose."""
    row = jnp.take(sigma_rows, cell >> 5, axis=0)  # [N, K, 8]
    rowT = jnp.moveaxis(row, -1, 0)  # [8, N, K]
    m16 = (cell & 16) > 0
    m8 = (cell & 8) > 0
    m4 = (cell & 4) > 0
    half = jnp.where(m16[None], rowT[4:8], rowT[0:4])
    quad = jnp.where(m8[None], half[2:4], half[0:2])
    word = jnp.where(m4, quad[1], quad[0])
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_onehot_sum(sigma_rows, cell):
    """Masked lane sum instead of the select tree (kills the relayout; its
    lane reduce cost 12.2 ms at 9.2M rows in round 2 — re-time at 4.9M)."""
    row = jnp.take(sigma_rows, cell >> 5, axis=0)  # [N, K, 8]
    lane = ((cell >> 2) & 7)[..., None] == jnp.arange(8, dtype=jnp.int32)
    word = jnp.sum(jnp.where(lane, row, jnp.uint32(0)), axis=-1)
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_flat(sigma_rows, cell):
    """Shipped select tree but on FLAT [N*K] shapes (the [N, K] consumer
    shape may be what forces the while-loop transpose)."""
    c = cell.reshape(-1)
    row = jnp.take(sigma_rows, c >> 5, axis=0)  # [N*K, 8]
    half = jnp.where((c[:, None] & 16) > 0, row[:, 4:8], row[:, 0:4])
    quad = jnp.where((c[:, None] & 8) > 0, half[:, 2:4], half[:, 0:2])
    word = jnp.where((c & 4) > 0, quad[:, 1], quad[:, 0])
    byte = (word >> ((c & 3).astype(jnp.uint32) * 8)) & 255
    return ((byte & 128) > 0).reshape(cell.shape), _dequant(byte & 127).reshape(cell.shape)


def v_u8_table(sigma_bytes_u8, cell):
    """Fetch u8[32] rows from the BYTE view of the table: same 32 B/row and
    the same row index, but the padded-lane materialization is 1 B/lane
    (629 MB vs 2.5 GB) and the select tree needs no final byte shift."""
    row = jnp.take(sigma_bytes_u8, cell >> 5, axis=0)  # [N, K, 32] u8
    s16 = jnp.where((cell[..., None] & 16) > 0, row[..., 16:32], row[..., 0:16])
    s8 = jnp.where((cell[..., None] & 8) > 0, s16[..., 8:16], s16[..., 0:8])
    s4 = jnp.where((cell[..., None] & 4) > 0, s8[..., 4:8], s8[..., 0:4])
    s2 = jnp.where((cell[..., None] & 2) > 0, s4[..., 2:4], s4[..., 0:2])
    byte = jnp.where((cell & 1) > 0, s2[..., 1], s2[..., 0]).astype(jnp.uint32)
    return (byte & 128) > 0, _dequant(byte & 127)


def _make_u8_width(width):
    """u8 rows of `width` cells: same per-point row fetch, shallower select
    tree (log2(width) levels). All u8 outputs pad to 128 lanes regardless of
    width, so narrower rows cost the same materialization but less select
    work — IF the gather rate holds at narrower operand rows."""
    levels = int(np.log2(width))

    def fn(table_u8, cell):
        shift = levels  # cells per row = 2^levels
        row = jnp.take(table_u8, cell >> shift, axis=0)  # [N, K, width]
        cur = row
        for b in range(levels - 1, 0, -1):
            half = cur.shape[-1] // 2
            cur = jnp.where((cell[..., None] & (1 << b)) > 0,
                            cur[..., half:], cur[..., :half])
        byte = jnp.where((cell & 1) > 0, cur[..., 1], cur[..., 0]).astype(jnp.uint32)
        return (byte & 128) > 0, _dequant(byte & 127)

    return fn


def v_u8_bitcast_shift(table_u8_4, cell):
    """u8[4] row fetch, then bitcast the 4 lanes to ONE u32 and extract the
    byte with a variable shift — no select tree, no lane slicing, so XLA has
    no relayout/while to generate. Byte order must match the u32 table's
    little-endian lane order (parity-asserted in main)."""
    row = jnp.take(table_u8_4, cell >> 2, axis=0)  # [N, K, 4] u8
    word = jax.lax.bitcast_convert_type(row, jnp.uint32)  # [N, K]
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_u8_bitcast_shift_flat(table_u8_4, cell):
    """Same as v_u8_bitcast_shift on FLAT [N*K] shapes."""
    c = cell.reshape(-1)
    row = jnp.take(table_u8_4, c >> 2, axis=0)  # [N*K, 4] u8
    word = jax.lax.bitcast_convert_type(row, jnp.uint32)  # [N*K]
    byte = (word >> ((c & 3).astype(jnp.uint32) * 8)) & 255
    return ((byte & 128) > 0).reshape(cell.shape), \
        _dequant(byte & 127).reshape(cell.shape)


def v_u32x4_bitcast_shift(table_u32_4, cell):
    """u32[4] row fetch (16 cells/row), one lane select level via bitcast to
    u128? Not available — instead select the u32 lane with a 2-level tree,
    then shift. Middle ground: 4x fewer table rows than u8[4]."""
    row = jnp.take(table_u32_4, cell >> 4, axis=0)  # [N, K, 4] u32
    pair = jnp.where((cell[..., None] & 8) > 0, row[..., 2:4], row[..., 0:2])
    word = jnp.where((cell & 4) > 0, pair[..., 1], pair[..., 0])
    byte = (word >> ((cell & 3).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_rep1_bitcast(table_rep1, cell):
    """Stride-1 REPLICATED table: row c = bytes[c:c+4], so the wanted byte
    is ALWAYS lane 0 — no per-element select/shift at all. 4x table bytes
    (8 MB) but the extraction is a constant mask after bitcast."""
    row = jnp.take(table_rep1, cell, axis=0)  # [N, K, 4] u8
    word = jax.lax.bitcast_convert_type(row, jnp.uint32)
    byte = word & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_rep1_lane0(table_rep1, cell):
    """Stride-1 replicated table, byte = lane-0 slice (no bitcast)."""
    row = jnp.take(table_rep1, cell, axis=0)  # [N, K, 4] u8
    byte = row[..., 0].astype(jnp.uint32)
    return (byte & 128) > 0, _dequant(byte & 127)


def v_rep2_bitcast(table_rep2, cell):
    """Stride-2 replicated table: row r = bytes[2r:2r+4] (4 MB), wanted
    byte = lane (cell & 1) — a single-bit variable shift after bitcast."""
    row = jnp.take(table_rep2, cell >> 1, axis=0)  # [N, K, 4] u8
    word = jax.lax.bitcast_convert_type(row, jnp.uint32)
    byte = (word >> ((cell & 1).astype(jnp.uint32) * 8)) & 255
    return (byte & 128) > 0, _dequant(byte & 127)


def v_u8_onehot_f32(table_u8_4, cell):
    """u8[4] row fetch, lane select as an f32 one-hot multiply-sum (no
    bitcast, no select tree — pure elementwise + tiny lane reduce). u8 ->
    f32 conversion is exact for byte values; the bit tests become float
    compares/subtracts."""
    row = jnp.take(table_u8_4, cell >> 2, axis=0).astype(jnp.float32)
    oh = ((cell & 3)[..., None] == jnp.arange(4, dtype=jnp.int32))
    byte_f = jnp.sum(row * oh.astype(jnp.float32), axis=-1)  # [N, K]
    occ = byte_f >= 128.0
    code = byte_f - jnp.where(occ, 128.0, 0.0)
    sig = jnp.exp2(code * (14.0 / 127.0) - 7.0) - 2.0**-7
    return occ, sig


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, (ROWS, 8), dtype=np.uint64)
                        .astype(np.uint32))
    table_u8 = jax.lax.bitcast_convert_type(table, jnp.uint8).reshape(ROWS, 32)
    # ray-coherent-ish cells (coherence doesn't change take rates, but keep
    # it honest): random walk per ray
    base = rng.integers(0, ROWS * 32 - K * 4, N)
    steps = rng.integers(1, 4, (N, K)).cumsum(1)
    cell = jnp.asarray((base[:, None] + steps).astype(np.int32) % (ROWS * 32))

    fns = {
        "current (lane select tree)": (v_current, table),
        "transpose-first selects": (v_transpose_first, table),
        "one-hot lane sum": (v_onehot_sum, table),
        "flat [N*K] select tree": (v_flat, table),
        "u8[32] row fetch": (v_u8_table, table_u8),
        "u8[16] row fetch": (_make_u8_width(16), table_u8.reshape(ROWS * 2, 16)),
        "u8[8] row fetch": (_make_u8_width(8), table_u8.reshape(ROWS * 4, 8)),
        "u8[4] row fetch": (_make_u8_width(4), table_u8.reshape(ROWS * 8, 4)),
        "u8[4] bitcast->u32 shift": (
            v_u8_bitcast_shift, table_u8.reshape(ROWS * 8, 4)),
        "u8[4] bitcast->u32 shift (flat)": (
            v_u8_bitcast_shift_flat, table_u8.reshape(ROWS * 8, 4)),
        "u32[4] select+shift": (
            v_u32x4_bitcast_shift, table.reshape(ROWS * 2, 4)),
        "rep1 u8[4] (lane-const bitcast)": (v_rep1_bitcast, None),
        "rep1 u8[4] (lane-0 slice)": (v_rep1_lane0, None),
        "rep2 u8[4] (1-bit shift)": (v_rep2_bitcast, None),
        "u8[4] one-hot f32 lane sum": (
            v_u8_onehot_f32, table_u8.reshape(ROWS * 8, 4)),
        # u8[2] rows: the Mosaic remote compile of that gather shape never
        # returned (>10 min; killed) — not measurable on this stack.
    }
    flat_bytes = table_u8.reshape(-1)  # [ROWS*32] byte per cell
    rep1 = jnp.stack(
        [jnp.roll(flat_bytes, -k) for k in range(4)], axis=1)  # [C, 4]
    rep2 = jnp.stack(
        [jnp.roll(flat_bytes, -k) for k in range(4)], axis=1)[::2]  # [C/2, 4]
    for name in ("rep1 u8[4] (lane-const bitcast)", "rep1 u8[4] (lane-0 slice)"):
        fns[name] = (fns[name][0], rep1)
    fns["rep2 u8[4] (1-bit shift)"] = (fns["rep2 u8[4] (1-bit shift)"][0], rep2)

    ref = None
    for name, (fn, tab) in fns.items():
        jf = jax.jit(fn)
        occ, sig = jf(tab, cell)
        occ_np, sig_np = np.asarray(occ), np.asarray(sig)
        if ref is None:
            ref = (occ_np, sig_np)
        else:
            assert np.array_equal(ref[0], occ_np), f"{name}: occ mismatch"
            assert np.allclose(ref[1], sig_np, rtol=1e-6), f"{name}: sig mismatch"
        ms = timed_ms(jf, tab, cell)
        rate = N * K / ms / 1e3
        print(f"{ms:8.2f} ms  {rate:7.0f}M rows/s  {name}", flush=True)


if __name__ == "__main__":
    main()
