#!/usr/bin/env python
"""Decision benchmark for the two-level grouped marcher (VERDICT r2 #8).

march_rays_grouped was measured NET-NEUTRAL on the realistic portrait-head
bench scene (PERFORMANCE.md): the coarse pass cuts march gather rows ~4x
but the return plumbing costs it all back. Its claimed niche is scenes with
a much larger empty-space ratio INSIDE the marched window — here we build
the most favorable case available (bound=1, cascade=1: the grouped path's
requirement): two small occupied blobs at opposite corners, so the
occupied-cell bbox spans nearly the whole cube, per-ray windows are long
chords, and ~97% of orbit points are empty.

Renders the same frame with march_group off/on (capacities telemetry-sized
for each) and prints both timings. If grouped does not win HERE, it wins
nowhere, and the implementation should be deleted.
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

import numpy as np


def build_sparse_scene(H_img=512, W_img=512):
    import jax
    import jax.numpy as jnp

    from radnerf_tpu.models import (
        NetworkConfig, RenderConfig, RendererState, init_params,
    )
    from radnerf_tpu.models import compute_occ_bbox
    from radnerf_tpu.models.renderer import compute_occ_sphere
    from radnerf_tpu.ops import morton3d_invert, packbits
    from radnerf_tpu.ops.marching import build_sigma_bytes

    net_cfg = NetworkConfig(torso=False, exp_eye=True,
                            compute_dtype="bfloat16")
    rc = RenderConfig(torso=False, exp_eye=True, max_steps=16,
                      dt_gamma=0.0, sample_capacity_mult=6,
                      ray_capacity_frac=1.0)
    params = init_params(jax.random.PRNGKey(0), net_cfg)
    state = RendererState.create(rc)

    G = rc.grid_size
    coords = np.asarray(morton3d_invert(jnp.arange(G**3, dtype=jnp.int32)))
    xyz = 2.0 * coords.astype(np.float32) / (G - 1) - 1.0
    occ = np.zeros((G**3,), np.float32)
    for c in ([-0.7, -0.35, -0.7], [0.7, 0.35, 0.7]):
        occ = np.maximum(
            occ,
            (np.linalg.norm(xyz - np.asarray(c), axis=-1) < 0.18) * 300.0,
        )
    grid = jnp.asarray(occ)[None]
    state = state.replace(
        density_grid=grid,
        density_bitfield=packbits(grid, 5.0),
        mean_density=jnp.asarray(occ.mean()),
        occ_bbox=compute_occ_bbox(rc, grid, 5.0),
        occ_sphere=compute_occ_sphere(rc, grid, 5.0),
    ).with_sigma_bytes(build_sigma_bytes(grid, 5.0))
    print(f"occupied cells: {(occ > 0).mean() * 100:.2f}%", file=sys.stderr)

    from radnerf_tpu.data.rays import get_bg_coords, get_rays

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -3.3]
    # wide FoV so rays cover both blobs and the long diagonal window
    focal = 700.0 * H_img / 450.0
    intr = (focal, focal, W_img / 2, H_img / 2)
    rays = get_rays(pose, intr, H_img, W_img, -1)
    batch = {
        "rays_o": jnp.asarray(rays["rays_o"]),
        "rays_d": jnp.asarray(rays["rays_d"]),
        "bg_coords": jnp.asarray(get_bg_coords(H_img, W_img)),
        "poses": jnp.zeros((1, 6), jnp.float32),
        "eye": jnp.full((1, 1), 0.25, jnp.float32),
        "index": jnp.zeros((), jnp.int32),
        "bg_color": jnp.full((H_img * W_img, 3), 0.5, jnp.float32),
    }
    rng = np.random.default_rng(0)
    auds = jnp.asarray(rng.normal(size=(8, 44, 16)), jnp.float32)
    return net_cfg, rc, params, state, batch, auds


def time_render(net_cfg, rc, params, state, batch, auds, n=30):
    import jax
    import jax.numpy as jnp

    from radnerf_tpu.models import precompute_packed_tables, render_rays

    p = precompute_packed_tables(params, net_cfg)

    @jax.jit
    def frame(params, state, batch, auds):
        r, s2 = render_rays(
            params, net_cfg, rc, state, batch["rays_o"], batch["rays_d"],
            auds, batch["bg_coords"], batch["poses"], batch["eye"],
            batch["index"], batch["bg_color"], training=False,
        )
        return r["image"], r["n_samples_needed"], r["n_groups_needed"]

    img, ns, ng = frame(p, state, batch, auds)
    float(jnp.sum(img))
    t0 = time.time()
    for _ in range(n):
        img, _, _ = frame(p, state, batch, auds)
    float(jnp.sum(img))
    dt = (time.time() - t0 - 0.027) / n
    return dt * 1e3, img, int(ns), int(ng)


def main():
    import dataclasses

    import bench as B

    net_cfg, rc, params, state, batch, auds = build_sparse_scene()
    probe = build_sparse_scene(256, 256)[4]
    rc_dense = B.size_capacities(net_cfg, rc, params, state, batch, auds,
                                 probe_batch=probe)
    ms_dense, img_d, ns, _ = time_render(net_cfg, rc_dense, params, state,
                                         batch, auds)
    print(f"dense marcher: {ms_dense:.2f} ms/frame "
          f"(cfg: K={rc_dense.march_iters}, frac="
          f"{rc_dense.ray_capacity_frac}, samples={ns})")

    rc_g = dataclasses.replace(rc_dense, march_group=True,
                               march_group_mult=6.0, march_group_slots=None)
    rc_g = B.size_capacities(net_cfg, rc_g, params, state, batch, auds,
                             probe_batch=probe)
    rc_g = dataclasses.replace(rc_g, march_group=True)
    ms_g, img_g, _, ng = time_render(net_cfg, rc_g, params, state, batch, auds)
    print(f"grouped marcher: {ms_g:.2f} ms/frame "
          f"(cfg: K={rc_g.march_iters}, group_mult={rc_g.march_group_mult}, "
          f"slots={rc_g.march_group_slots}, groups={ng})")

    err = float(np.abs(np.asarray(img_d) - np.asarray(img_g)).max())
    print(f"max |dense - grouped| = {err:.2e}")
    verdict = "GROUPED WINS" if ms_g < ms_dense * 0.95 else "DENSE WINS"
    print(f"{verdict}: dense {ms_dense:.2f} ms vs grouped {ms_g:.2f} ms")


if __name__ == "__main__":
    main()
