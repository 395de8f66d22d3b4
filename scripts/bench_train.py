#!/usr/bin/env python
"""Training-step throughput benchmark (secondary metric).

The reference trains 200k head iterations at 65536 rays/step on one GPU
(BASELINE.md). This measures our full jitted train step (render -> losses ->
grad -> per-group Adam update) on one TPU chip at the same ray batch.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import bench as B
    from radnerf_tpu.config import Options
    from radnerf_tpu.models import render_rays
    from radnerf_tpu.train.losses import head_loss
    from radnerf_tpu.train.trainer import build_optimizer

    net_cfg, rc, params, state, batch, aud_stream = B.build_scene()
    import dataclasses

    # size capacities from telemetry exactly as bench.py does (the scene's
    # starting capacities are deliberately generous; training at frac 1.0 /
    # full-orbit K measures buffer padding, not training)
    rc = B.size_capacities(net_cfg, rc, params, state, batch, aud_stream[0],
                           probe_batch=B.build_scene(256, 256)[4])
    # torso off (head stage) and the TRAINING cull default — build_scene
    # ships the inference threshold (1e-4, reference T_thresh) for the FPS
    # bench; training must measure at its own 1e-6 default
    rc = dataclasses.replace(rc, torso=False, cull_T=1e-6)
    opt = Options(iters=200_000)
    tx = build_optimizer(net_cfg, opt)
    opt_state = tx.init(params)

    n_rays = 65536
    rng = np.random.default_rng(0)
    sel = rng.integers(0, batch["rays_o"].shape[0], n_rays)
    tb = {
        "rays_o": batch["rays_o"][sel],
        "rays_d": batch["rays_d"][sel],
        "bg_coords": batch["bg_coords"][sel],
        "bg_color": batch["bg_color"][sel],
        "images": jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32),
        "face_mask": jnp.asarray(rng.uniform(size=n_rays) < 0.5),
        "poses": batch["poses"],
        "eye": batch["eye"],
        "index": batch["index"],
    }

    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    @jax.jit
    def train_step(params, opt_state, state, auds, step, key):
        def loss_fn(p):
            noises = jax.random.uniform(key, (n_rays,))
            res, st2 = render_rays(
                p, net_cfg, rc, state, tb["rays_o"], tb["rays_d"], auds,
                tb["bg_coords"], tb["poses"], tb["eye"], tb["index"],
                tb["bg_color"], noises=noises, training=True,
            )
            return head_loss(res, tb["images"], tb["face_mask"], step,
                             opt.iters, opt.lambda_amb), st2

        (loss, st2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, st2, loss

    params, opt_state, state, loss = train_step(
        params, opt_state, state, aud_stream[0], jnp.float32(1), keys[0]
    )
    float(loss)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, state, loss = train_step(
            params, opt_state, state, aud_stream[i % 64],
            jnp.float32(i), keys[i % 64],
        )
    print("final loss:", float(loss))  # forces completion
    dt = time.perf_counter() - t0
    sps = n / dt
    print(json.dumps({
        "metric": "train_steps_per_sec_65536rays",
        "value": round(sps, 3),
        "unit": "steps/sec",
        "hours_for_200k_iters": round(200_000 / sps / 3600, 2),
    }))


if __name__ == "__main__":
    main()
