#!/usr/bin/env python
"""Streaming-loop benchmark (BASELINE config 5): ASR -> features -> render.

Measures the sustained streaming frame loop the reference runs in its GUI
(reference nerf/gui.py:553-565: 2 ASR steps per 25-fps video frame, audio at
50 fps) end to end on the TPU:

  StreamingASR.run_step() x2  ->  get_next_feat() [8, 44, 16]  ->
  jitted 512x512 (and 450x450, the reference's own size) head+torso render

and reports, per resolution:
  - sustained FPS over >= 10 s of frames (scalar-pull chain timing, the
    27 ms tunnel roundtrip subtracted once),
  - per-frame ASR host cost (the 2 run_step calls),
  - single-frame latency (render + pull, tunnel subtracted),
  - end-to-end latency = ASR design latency (m + r) * 20 ms
    (reference nerf/asr.py:56,112) + single-frame latency,
  - the 25-fps budget verdict (40 ms/frame).

The CTC acoustic model: tries the reference's wav2vec2 checkpoint first;
in a hermetic environment (no downloaded weights) it falls back to the
deterministic fake CTC used by the test suite and LABELS the result
`ctc_backend: fake` — the fake produces one logit frame per 20 ms chunk at
negligible cost, so the FPS number then measures the render + windowing
machinery with the acoustic model's cost excluded (stated in the output).

Usage:  python scripts/bench_streaming.py [--seconds 10] [--sizes 512,450]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))
# cache-only HF lookups: in the hermetic environment the wav2vec2 attempt
# otherwise burns minutes in network retries before the fake-CTC fallback
os.environ.setdefault("HF_HUB_OFFLINE", "1")

if os.environ.get("RADNERF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RADNERF_PLATFORM"])

TUNNEL_S = 0.027  # scalar-pull roundtrip on the axon backend (CLAUDE.md)


def make_ctc(opt):
    """Real wav2vec2 if its weights are available, else the labeled fake."""
    try:
        from radnerf_tpu.apps.asr import make_wav2vec_logits_fn

        fn = make_wav2vec_logits_fn(opt.asr_model)
        return fn, "wav2vec2"
    except Exception as e:  # hermetic env: no downloaded HF weights
        print(f"[stream] wav2vec2 unavailable ({type(e).__name__}); "
              f"using the deterministic fake CTC (labeled)", file=sys.stderr)

        def fake(frame: np.ndarray) -> np.ndarray:
            n = len(frame) // 320
            vals = frame[: n * 320].reshape(n, 320).mean(-1)
            return np.tile(vals[:, None], (1, opt.audio_in_dim)).astype(
                np.float32)

        return fake, "fake"


def write_wav(path: str, seconds: float = 60.0, sr: int = 16000):
    from scipy.io import wavfile

    t = np.arange(int(sr * seconds)) / sr
    wave = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(
        2 * np.pi * 1.3 * t))
    wavfile.write(path, sr, (wave * 32767).astype(np.int16))
    return path


def bench_size(H, n_frames, asr_opt, ctc_fn, ctc_tag):
    import jax
    import jax.numpy as jnp

    import bench as B
    from radnerf_tpu.apps.asr import StreamingASR
    from radnerf_tpu.models import precompute_packed_tables, render_rays

    net_cfg, rc, params, state, batch, _ = B.build_scene(H, H)
    probe_batch = B.build_scene(256, 256)[4]
    # one fixed window just for capacity sizing (same rules as bench.py)
    aud0 = jnp.zeros((8, asr_opt.audio_in_dim, 16), jnp.float32)
    rc = B.size_capacities(net_cfg, rc, params, state, batch, aud0,
                           probe_batch=probe_batch)
    params = precompute_packed_tables(params, net_cfg)

    @jax.jit
    def render_frame(params, state, batch, auds):
        res, st = render_rays(
            params, net_cfg, rc, state,
            batch["rays_o"], batch["rays_d"], auds,
            batch["bg_coords"], batch["poses"], batch["eye"],
            batch["index"], batch["bg_color"], training=False,
        )
        return res["image"], st

    asr = StreamingASR(asr_opt, logits_fn=ctc_fn)
    asr.warm_up()

    # compile + single-frame latency (median of 5 synced frames)
    lat = []
    for _ in range(5):
        auds = jnp.asarray(asr.get_next_feat())
        t0 = time.perf_counter()
        img, state = render_frame(params, state, batch, auds)
        float(jnp.sum(img))
        lat.append(time.perf_counter() - t0 - TUNNEL_S)
    frame_latency = float(np.median(lat))

    # sustained streaming loop: 2 ASR steps + feature window + render per
    # frame (gui.py:560-563); chain forced once at the end
    asr_host = 0.0
    t0 = time.perf_counter()
    for _ in range(n_frames):
        ta = time.perf_counter()
        asr.run_step()
        asr.run_step()
        auds = jnp.asarray(asr.get_next_feat())
        asr_host += time.perf_counter() - ta
        img, state = render_frame(params, state, batch, auds)
    float(jnp.sum(img))
    dt = time.perf_counter() - t0 - TUNNEL_S
    fps = n_frames / dt

    design_lat_ms = (asr_opt.m + asr_opt.r) * 1000.0 / asr_opt.fps
    return {
        "metric": f"streaming_fps_{H}x{H}_head_torso",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "n_frames": n_frames,
        "ctc_backend": ctc_tag,
        "asr_ms_per_frame": round(1000.0 * asr_host / n_frames, 3),
        "frame_latency_ms": round(1000.0 * frame_latency, 1),
        "asr_design_latency_ms": design_lat_ms,
        "end_to_end_latency_ms": round(
            design_lat_ms + 1000.0 * frame_latency, 1),
        "holds_25fps": fps >= 25.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="minimum wall-clock of timed frames per size")
    ap.add_argument("--sizes", default="512,450")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from radnerf_tpu.config import Options

    wav = write_wav("/tmp/stream_bench.wav", seconds=120.0)
    # the reference's streaming recipe (scripts/test_streaming.sh): wav file
    # source, l=10 m=10 r=10 -> design latency (m+r)*20 ms = 400 ms
    results = []
    for H in [int(s) for s in args.sizes.split(",")]:
        asr_opt = Options(asr=True, asr_wav=wav, l=10, m=10, r=10, fps=50)
        asr_opt.apply_O()
        ctc_fn, ctc_tag = make_ctc(asr_opt)
        # frame count: enough for >= --seconds at the measured rate; start
        # from a 25-fps assumption and let the wall clock decide
        n_frames = max(64, int(args.seconds * 25))
        r = bench_size(H, n_frames, asr_opt, ctc_fn, ctc_tag)
        results.append(r)
        print(json.dumps(r), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
