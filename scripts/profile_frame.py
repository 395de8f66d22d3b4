#!/usr/bin/env python
"""Profile the benchmark render frame on the TPU and print the op-time
breakdown.

The reference has no profiler integration (SURVEY.md §5: ad-hoc
torch.cuda.Event pairs, nerf/gui.py:142-154); this is the TPU-native
equivalent recipe: jax.profiler.trace -> perfetto trace -> per-op time
summary. Usage:

    python scripts/profile_frame.py [--frames 3] [--out /tmp/jax_trace]

Prints the top ops by total device time plus a category rollup
(gather / fusion / convolution / ...). NOTE: only one TPU-backed process
may run at a time on this machine (CLAUDE.md).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def summarize_trace(log_dir: str, top_k: int = 25):
    """Sum device-lane event durations by op name from the perfetto trace."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device lanes: pid whose process_name mentions TPU/device; fall back to
    # lanes that carry XLA op names
    events = trace.get("traceEvents", [])
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")

    device_pids = {
        pid for pid, name in proc_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA Ops" in name
    }

    by_op = defaultdict(float)
    op_meta = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        if not name or name.startswith(("$", "process_")):
            continue
        by_op[name] += ev["dur"]
        total += ev["dur"]
        a = ev.get("args") or {}
        meta = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        if meta and name not in op_meta:
            op_meta[name] = str(meta)[:160]

    cats = defaultdict(float)
    for name, dur in by_op.items():
        base = name.split(".")[0].split("(")[0]
        cats[base] += dur
    return by_op, cats, total, op_meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from radnerf_tpu.models import render_rays

    from radnerf_tpu.models import precompute_packed_tables

    net_cfg, rc, params, state, batch, aud_stream = B.build_scene()
    rc = B.size_capacities(net_cfg, rc, params, state, batch, aud_stream[0],
                           probe_batch=B.build_scene(256, 256)[4])
    params = precompute_packed_tables(params, net_cfg)  # match bench.py

    @jax.jit
    def render_frame(params, state, batch, auds):
        results, state2 = render_rays(
            params, net_cfg, rc, state,
            batch["rays_o"], batch["rays_d"], auds,
            batch["bg_coords"], batch["poses"], batch["eye"],
            batch["index"], batch["bg_color"], training=False,
        )
        return results["image"], results["depth"], state2

    # warm up / compile outside the trace
    img, depth, state = render_frame(params, state, batch, aud_stream[0])
    float(jnp.sum(img))  # force completion (block_until_ready lies here)

    with jax.profiler.trace(args.out):
        for i in range(args.frames):
            img, depth, state = render_frame(
                params, state, batch, aud_stream[(i + 1) % aud_stream.shape[0]]
            )
        float(jnp.sum(img))

    by_op, cats, total, op_meta = summarize_trace(args.out, args.top)
    n = args.frames
    print(f"\n== per-op device time (sum over {n} frames; us) ==")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur / n:10.0f} us/frame  {name}  {op_meta.get(name, '')}")
    print(f"\n== category rollup (us/frame) ==")
    for name, dur in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{dur / n:10.0f} us/frame  {name}")
    print(f"\ntotal device op time: {total / n / 1e3:.2f} ms/frame over {n} frames")

    # gather share: the round-3 "earned ceiling" criterion is a frame where
    # the irreducible row gathers dominate (VERDICT r2 #1). Count every op
    # whose name or HLO metadata marks it as a gather/take.
    gather = sum(
        dur for name, dur in by_op.items()
        if "gather" in name.lower() or "gather" in op_meta.get(name, "").lower()
    )
    if total > 0:
        print(f"gather ops: {gather / n / 1e3:.2f} ms/frame "
              f"({100.0 * gather / total:.1f}% of device op time)")


if __name__ == "__main__":
    main()
