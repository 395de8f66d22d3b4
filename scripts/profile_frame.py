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
            op_meta[name] = str(meta)[:320]

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
    # the irreducible row gathers dominate (VERDICT r2 #1). On this backend
    # XLA lowers row gathers as `kind=kCustom` fusions whose operand list is
    # (table array, s32[...] index vector) — the HLO "gather" opcode never
    # appears, so classify by that signature (round-4 fix: the old name
    # match reported 0%). Layout churn (copies/transposes/reshapes/DUS
    # around the gathers) is reported separately: it is the REDUCIBLE part.
    import re

    def is_gather(name, meta):
        if "gather" in name.lower() or "gather" in meta.lower():
            return True
        return "kind=kCustom" in meta and re.search(r",\s+s32\[\d+\]", meta)

    def is_layout(name):
        return name.split(".")[0] in (
            "copy", "reshape", "transpose", "while",
            "dynamic-update-slice", "dynamic-slice_reduce_fusion",
            "bitcast", "concatenate",
        )

    gather = layout = 0.0
    for name, dur in by_op.items():
        if name.startswith("jit_"):
            continue  # parent entry double-counts its children
        if is_gather(name, op_meta.get(name, "")):
            gather += dur
        elif is_layout(name):
            layout += dur
    frame = total - sum(
        d for nme, d in by_op.items() if nme.startswith("jit_"))
    if frame > 0:
        print(f"gather ops: {gather / n / 1e3:.2f} ms/frame "
              f"({100.0 * gather / frame:.1f}% of device op time); "
              f"layout churn: {layout / n / 1e3:.2f} ms/frame "
              f"({100.0 * layout / frame:.1f}%)")


if __name__ == "__main__":
    main()
