#!/usr/bin/env python
"""A/B the three compaction scatters of the render frame (TPU).

Profiled round 4 (19.4 FPS frame): marker scatter-add (base -> capacity)
1.43 ms, ray_idx scatter-set (slot -> R) 1.21 ms, torso pix_idx
scatter-set 1.21 ms = 3.85 ms/frame. All indices have structure (base is
SORTED; slot/slot_t are unique-or-dropped) the default lowering ignores.

Run (one TPU process at a time):
    python scripts/bench_scatter.py
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
CAP = 296960


def timed(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out))
    return (time.time() - t0 - 0.027) / reps * 1e3, s


def main():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 4, R)
    while counts.sum() > CAP - 8:
        counts = rng.integers(0, 4, R)
    counts = jnp.asarray(counts.astype(np.int32))
    hit = jnp.asarray(rng.random(N) < R / N * 0.9)

    @jax.jit
    def prep(counts, hit):
        ends = jnp.cumsum(counts)
        base = ends - counts
        pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
        slot = jnp.where(hit & (pos < R), pos, R)
        return base, slot

    base, slot = jax.block_until_ready(prep(counts, hit))

    # --- marker scatter (base -> capacity) ---
    @jax.jit
    def m0(base):
        return jnp.zeros((CAP,), jnp.int32).at[base].add(1, mode="drop")

    @jax.jit
    def m1(base):
        return jnp.zeros((CAP,), jnp.int32).at[base].add(
            1, mode="drop", indices_are_sorted=True)

    for name, fn in [("M0 marker add (default)", m0),
                     ("M1 marker add (sorted hint)", m1)]:
        ms, chk = timed(fn, base)
        print(f"{name:34s} {ms:7.3f} ms  (chk {chk:.0f})")

    # --- ray_idx scatter (slot -> R) ---
    @jax.jit
    def r0(slot):
        return jnp.zeros((R,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")

    @jax.jit
    def r1(slot):
        # kept slots are unique by construction (cumsum ranks); dropped
        # rows all collide at index R which mode="drop" discards
        return jnp.zeros((R,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop", unique_indices=True)

    @jax.jit
    def r2(slot):
        # max-combine instead of set: order-independent, so XLA needs no
        # serialization for the duplicate dropped rows
        return jnp.zeros((R,), jnp.int32).at[slot].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")

    ref = None
    for name, fn in [("R0 ray_idx set (default)", r0),
                     ("R1 ray_idx set (unique hint)", r1),
                     ("R2 ray_idx max-combine", r2)]:
        ms, chk = timed(fn, slot)
        if ref is None:
            ref = chk
        print(f"{name:34s} {ms:7.3f} ms  (chk {chk:.0f}{' MISMATCH' if chk != ref else ''})")


if __name__ == "__main__":
    main()
