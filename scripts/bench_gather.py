#!/usr/bin/env python
"""Gather-primitive microbenchmark: XLA take vs every alternative.

VERDICT round 1 asked to "prove or bury" a Mosaic gather over >1 source
vreg. This measures, on the real chip, the mechanisms available for
"fetch P rows by dynamic index from a [T, W] table":

  A) XLA ``jnp.take`` (the production path; PERFORMANCE.md's 450-560M
     rows/s small-table wall),
  B) a Pallas kernel driving per-row dynamic VMEM loads from a
     scalar-prefetched index loop (unrolled so loads pipeline) — the only
     way Mosaic expresses a multi-vreg gather today,
  C) one-hot matmul on the MXU (XLA einsum): O(P*T) compares + MACs —
     only plausible for small T, but the MXU rate is enormous.

Timing follows CLAUDE.md: pull a scalar, subtract the ~27 ms tunnel
roundtrip. CPU correctness pre-check: INTERPRET=1 python scripts/bench_gather.py --rows 8192
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

INTERPRET = os.environ.get("INTERPRET", "0") == "1"
if INTERPRET:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TUNNEL_MS = 27.0


def timed_ms(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out[:64].astype(jnp.float32)))  # warm + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out[:64].astype(jnp.float32)))  # force completion
    del s
    ms = (time.time() - t0) * 1e3 - TUNNEL_MS
    return ms / reps


# ------------------------------------------------------------------ A: XLA
def xla_take(table, idx):
    return jnp.take(table, idx, axis=0)


# ------------------------------------------------ B: Pallas row-loop gather
def _row_loop_kernel(idx_ref, table_ref, out_ref, *, chunk, unroll):
    base = pl.program_id(0) * chunk

    def body(i, carry):
        for u in range(unroll):
            j = i * unroll + u
            row = idx_ref[base + j]
            out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(row, 1), :]
        return carry

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def pallas_row_loop(table, idx, chunk=2048, unroll=8):
    P = idx.shape[0]
    T, W = table.shape
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // chunk,),
        in_specs=[pl.BlockSpec((T, W), lambda i, idx_ref: (0, 0))],
        out_specs=pl.BlockSpec((chunk, W), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_row_loop_kernel, chunk=chunk, unroll=unroll),
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((P, W), table.dtype),
        interpret=INTERPRET,
    )(idx, table)


# ------------------------------------------------ C: one-hot matmul (MXU)
def onehot_matmul(table, idx):
    T = table.shape[0]
    oh = idx[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
    return jnp.einsum("pt,tw->pw", oh.astype(jnp.bfloat16),
                      table.astype(jnp.bfloat16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--width", type=int, default=16)
    args = ap.parse_args()
    P, W = args.rows, args.width
    rng = np.random.default_rng(0)

    print(f"# P={P} rows fetched, width={W} bf16", flush=True)
    if not INTERPRET:
        for T in (4096, 16384, 65536, 262144, 2 * 1024 * 1024):
            table = jnp.asarray(rng.normal(size=(T, W)), jnp.bfloat16)
            idx = jnp.asarray(rng.integers(0, T, P), jnp.int32)
            ms = timed_ms(jax.jit(xla_take), table, idx)
            print(f"A xla_take      T={T:>8}: {ms:7.2f} ms  "
                  f"{P / ms / 1e3:6.0f}M rows/s", flush=True)

    for T in (4096, 65536):
        table = jnp.asarray(rng.normal(size=(T, W)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, T, P), jnp.int32)
        try:
            fn = jax.jit(pallas_row_loop)
            got = fn(table, idx)
            ok = bool(jnp.all(got[:1024] == jnp.take(table, idx[:1024], axis=0)))
            if INTERPRET:
                print(f"B pallas_loop   T={T:>8}: correct={ok}", flush=True)
                continue
            ms = timed_ms(fn, table, idx)
            print(f"B pallas_loop   T={T:>8}: {ms:7.2f} ms  "
                  f"{P / ms / 1e3:6.0f}M rows/s  correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B pallas_loop   T={T:>8}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    if not INTERPRET:
        for T in (512, 2048, 4096, 8192):
            table = jnp.asarray(rng.normal(size=(T, W)), jnp.bfloat16)
            idx = jnp.asarray(rng.integers(0, T, P), jnp.int32)
            fn = jax.jit(onehot_matmul)
            got = fn(table, idx)
            ok = bool(jnp.all(got[:1024] == jnp.take(table, idx[:1024], axis=0)))
            ms = timed_ms(fn, table, idx)
            print(f"C onehot_mxu    T={T:>8}: {ms:7.2f} ms  "
                  f"{P / ms / 1e3:6.0f}M rows/s  correct={ok}", flush=True)


if __name__ == "__main__":
    main()
