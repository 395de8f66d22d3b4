#!/usr/bin/env python
"""Probe the density-prior cull threshold (RenderConfig.cull_T) on the
bench scene: telemetry sample counts + image delta vs the exhaustive
cull_T=0 render.

Motivation: the shipped cull_T=1e-6 is two decades more conservative than
the reference's own early-termination threshold (T_thresh=1e-4,
/root/reference/nerf/renderer.py:158) ON TOP of the 0.5 cull_safety factor.
Every per-sample cost in the frame (30 encoder level-gathers, selects,
concats, the MLP chain) scales with n_samples_needed, so if a bolder
threshold sheds samples without moving the image, it's a straight win.

Run (one TPU process at a time):
    python scripts/probe_cull.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_scene
    from radnerf_tpu.models import precompute_packed_tables, render_rays

    net_cfg, rc, params, state, batch, aud_stream = build_scene(256, 256)
    params = precompute_packed_tables(params, net_cfg)
    auds = aud_stream[0]

    def render(cfg):
        fn = jax.jit(lambda p, s, b, a: render_rays(
            p, net_cfg, cfg, s, b["rays_o"], b["rays_d"], a,
            b["bg_coords"], b["poses"], b["eye"], b["index"], b["bg_color"],
            training=False,
        )[0])
        r = fn(params, state, batch, auds)
        img = np.asarray(r["image"], np.float32)
        return img, int(r["n_samples_needed"]), int(r["n_hit"])

    # exhaustive baseline (generous capacities, no cull)
    base_cfg = dataclasses.replace(
        rc, cull_T=0.0, ray_capacity_frac=1.0, sample_capacity_mult=16,
        march_iters=None, sample_slots=None)
    img0, n0, h0 = render(base_cfg)
    print(f"cull_T=0 (exhaustive): n_samples={n0} n_hit={h0}", flush=True)

    for cull in (1e-6, 1e-5, 1e-4, 1e-3):
        cfg = dataclasses.replace(
            rc, cull_T=cull, ray_capacity_frac=1.0, sample_capacity_mult=16,
            march_iters=None, sample_slots=None)
        img, n, _ = render(cfg)
        d = np.abs(img - img0)
        print(f"cull_T={cull:g}: n_samples={n} ({n / max(n0, 1):.3f}x) "
              f"max|dI|={d.max():.2e} mean|dI|={d.mean():.2e}", flush=True)


if __name__ == "__main__":
    main()
