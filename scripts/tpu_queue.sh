#!/bin/bash
# Sequential TPU measurement queue (one TPU process at a time).
# Run when the tunnel is up:  bash scripts/tpu_queue.sh [stage...]
# Stages default to: bench profile quality
# Logs land in /tmp/r4_<stage>.{out,err}; bench JSON also echoed at the end.
# Quality evidence is copied into artifacts/quality/ (checked in).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

run() {
  local name="$1"; shift
  local t="$1"; shift
  echo "=== [$name] $(date): $*"
  timeout "$t" "$@" > "/tmp/r4_${name}.out" 2> "/tmp/r4_${name}.err"
  local rc=$?
  echo "=== [$name] exit=$rc $(date)"
  tail -3 "/tmp/r4_${name}.out"
  return $rc
}

for stage in "${@:-bench profile quality}"; do
 for s in $stage; do
  case "$s" in
    bench)   run bench   3600 python bench.py ;;
    profile) run profile 3600 python scripts/profile_frame.py ;;
    gather)  run gather  2400 python scripts/bench_gather.py ;;
    group)   run group   3600 python scripts/bench_march_group.py ;;
    train)   run train   3600 python scripts/bench_train.py ;;
    quality) run quality 14400 python scripts/quality_harness.py \
               --root /tmp/qh_data --workspace /tmp/qh_ws \
               --iters 3000 --lips-iters 500 --torso-iters 1500 \
               --artifacts artifacts/quality ;;
    # round-5 stages
    ambbench) run ambbench 3600 env RADNERF_AMB_GRID=8x4 python bench.py ;;
    quality-amb) run quality_amb 14400 python scripts/quality_harness.py \
               --root /tmp/qh_data --workspace /tmp/qh_ws_amb \
               --iters 3000 --lips-iters 500 --torso-iters 1500 \
               --amb-grid 8x4 ;;
    streaming) run streaming 7200 python scripts/bench_streaming.py \
               --out /tmp/streaming.json ;;
    trained) run trained 3600 python scripts/bench_trained.py \
               --workspace /tmp/qh_ws_amb --grid 16x2 --amb-grid 8x4 \
               --torso ;;
    # longer-recipe (9k/500/3k iter) 16x2 workspace — converged-field FPS
    trained16) run trained16 3600 python scripts/bench_trained.py \
               --workspace /tmp/qh_ws16 --grid 16x2 --torso ;;
    # the unmeasured fourth fast-grid variant: shrink ONLY the 3-D spatial
    # grid (the measured quality loss lives in the ambient 2-D grid)
    quality-sp8) run quality_sp8 14400 python scripts/quality_harness.py \
               --root /tmp/qh_data --workspace /tmp/qh_ws_sp8 \
               --iters 3000 --lips-iters 500 --torso-iters 1500 \
               --grid 8x4 --amb-grid 16x2 ;;
    sp8bench) run sp8bench 3600 env RADNERF_GRID=8x4 RADNERF_AMB_GRID=16x2 \
               python bench.py ;;
    # contingency for a near-miss sp8 gate: densify the 8-level spatial
    # spectrum with base 32 (per-level scale 1.81; identical 8+16 rows/
    # sample so the sp8 FPS carries) — the same recovery bought +1.7 dB
    # on the full-8x4 variant (PERFORMANCE.md round-5 table)
    quality-sp8b32) run quality_sp8b32 14400 python scripts/quality_harness.py \
               --root /tmp/qh_data --workspace /tmp/qh_ws_sp8b32 \
               --iters 3000 --lips-iters 500 --torso-iters 1500 \
               --grid 8x4 --grid-base 32 --amb-grid 16x2 ;;
    sp8b32bench) run sp8b32bench 3600 env RADNERF_GRID=8x4 RADNERF_GRID_BASE=32 \
               RADNERF_AMB_GRID=16x2 python bench.py ;;
    *) echo "unknown stage $s" ;;
  esac
 done
done
echo "=== queue done $(date)"
[ -f /tmp/r4_bench.out ] && grep -h '"metric"' /tmp/r4_bench.out | tail -1
