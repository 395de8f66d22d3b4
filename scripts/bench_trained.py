#!/usr/bin/env python
"""FPS of a REAL TRAINED field at 512x512 (VERDICT r4 item 6).

bench.py's headline runs on a procedural converged-head-style scene; this
script renders an actually-trained checkpoint (the quality-harness workspace,
scripts/quality_harness.py) through the same sizing rules and timing method,
so the FPS figure is anchored on trained occupancy statistics instead of
synthetic ones.

Usage (after a quality-harness run left /tmp/qh_ws*):
    python scripts/bench_trained.py [--workspace /tmp/qh_ws]
        [--root /tmp/qh_data] [--grid 8x4] [--size 512] [--torso]

Prints one JSON line per size.
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
if os.environ.get("RADNERF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RADNERF_PLATFORM"])

TUNNEL_S = 0.027


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/qh_ws")
    ap.add_argument("--root", default="/tmp/qh_data")
    ap.add_argument("--grid", default="8x4")
    ap.add_argument("--amb-grid", default="",
                    help="asymmetric 2-D (ambient+torso) grid LxC; must "
                         "match the workspace's training config (empty "
                         "inherits --grid)")
    ap.add_argument("--amb-grid-base", type=int, default=None)
    ap.add_argument("--grid-base", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--torso", action="store_true",
                    help="use the torso-stage workspace (_torso suffix)")
    ap.add_argument("--n-frames", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from radnerf_tpu.config import Options
    from radnerf_tpu.data import TalkingHeadDataset
    from radnerf_tpu.data.rays import get_audio_features, get_bg_coords, get_rays
    from radnerf_tpu.models import precompute_packed_tables, render_rays
    from radnerf_tpu.train import Trainer

    grid = tuple(int(v) for v in args.grid.split("x"))
    amb = (tuple(int(v) for v in args.amb_grid.split("x"))
           if args.amb_grid else None)
    ws = args.workspace + ("_torso" if args.torso else "")
    opt = Options(path=args.root, workspace=ws, torso=args.torso,
                  grid_levels=grid[0], grid_ch=grid[1],
                  grid_base=args.grid_base,
                  amb_grid_levels=amb[0] if amb else None,
                  amb_grid_ch=amb[1] if amb else None,
                  amb_grid_base=args.amb_grid_base)
    opt.apply_O()
    trainer = Trainer("ngp", opt, workspace=ws, use_checkpoint="best",
                      use_tensorboard=False, mute=True)
    ds = TalkingHeadDataset(opt, split="val")

    H = W = args.size
    # scale the dataset camera to the target resolution (same FoV)
    sc = H / ds.H
    fx = fy = float(ds.intrinsics[0]) * sc
    pose = np.asarray(ds.poses[0])
    rays = get_rays(pose, (fx, fy, W / 2, H / 2), H, W, -1)
    bg = ds.bg_img
    if bg.shape[0] != H:
        import cv2

        bg = cv2.resize(bg, (W, H))
    batch = {
        "rays_o": jnp.asarray(rays["rays_o"]),
        "rays_d": jnp.asarray(rays["rays_d"]),
        "bg_coords": jnp.asarray(get_bg_coords(H, W)),
        "poses": jnp.zeros((1, 6), jnp.float32),
        "eye": jnp.full((1, 1), 0.25, jnp.float32),
        "index": jnp.zeros((), jnp.int32),
        "bg_color": jnp.asarray(bg.reshape(-1, 3), jnp.float32),
    }
    # streaming audio windows from the real dataset features
    aud_stream = jnp.asarray(np.stack([
        np.asarray(get_audio_features(ds.auds, opt.att, i))
        for i in range(min(64, len(ds.auds)))
    ]))

    # trainer's eval params (EMA) + trained renderer state; size capacities
    # with the SAME rules as the headline bench
    params = trainer._eval_params()
    net_cfg, state = trainer.net_cfg, trainer.state
    rc = trainer.render_cfg
    import dataclasses

    rc = dataclasses.replace(rc, cull_T=1e-4)  # inference setting (bench.py)
    probe = B.build_scene(256, 256, grid_levels=grid[0], grid_ch=grid[1])[4]
    rc = B.size_capacities(net_cfg, rc, params, state, batch, aud_stream[0],
                           probe_batch=probe)
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

    img, state2 = render_frame(params, state, batch, aud_stream[0])
    float(jnp.sum(img))  # compile + force

    t0 = time.perf_counter()
    for i in range(args.n_frames):
        img, state2 = render_frame(params, state2, batch,
                                   aud_stream[i % aud_stream.shape[0]])
    float(jnp.sum(img))
    dt = time.perf_counter() - t0 - TUNNEL_S
    fps = args.n_frames / dt

    # occupancy context: FPS on this renderer scales with occupied rows, so
    # a trained field's number is only interpretable next to its occupancy
    # (a 3k-iter harness field is far less pruned than a converged one)
    occ_frac = float(jnp.mean(
        (jnp.unpackbits(state.density_bitfield) > 0).astype(jnp.float32)))
    print(json.dumps({
        "metric": f"trained_field_fps_{H}x{H}"
                  + ("_head_torso" if args.torso else "_head"),
        "value": round(fps, 3),
        "unit": "frames/sec",
        "grid": args.grid,
        "amb_grid": args.amb_grid or args.grid,
        "workspace": ws,
        "occupied_cell_frac": round(occ_frac, 4),
        "sized": {"ray_capacity_frac": rc.ray_capacity_frac,
                  "sample_capacity_mult": rc.sample_capacity_mult,
                  "march_iters": rc.march_iters,
                  "sample_slots": rc.sample_slots},
        "vs_baseline": round(fps / 40.0, 4),
    }))


if __name__ == "__main__":
    main()
