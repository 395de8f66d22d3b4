"""Training loss assembly (pure, jittable).

Reference: Trainer.train_step (nerf/utils.py:718-808):
- per-ray MSE on predicted color (head stage: composited head image; torso
  stage: torso layer over background) (:749),
- binary-entropy regularizer on weights_sum / torso_alpha, weight 1e-4
  (:786-796),
- ambient sparsity outside the face rect, ramped from 0 to lambda_amb over
  training (:798-806),
- optional LPIPS perceptual term for lips finetune (0.01) / patch training
  (0.001) (:757-781).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def binary_entropy(alphas: jnp.ndarray) -> jnp.ndarray:
    a = jnp.clip(alphas, 1e-5, 1 - 1e-5)
    return -a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a)


def head_loss(
    results: dict,
    rgb_gt: jnp.ndarray,  # [N, 3]
    face_mask: jnp.ndarray,  # [N] bool
    global_step: jnp.ndarray,
    iters: int,
    lambda_amb: float,
    lpips_fn: Optional[Callable] = None,
    lpips_shape: Optional[tuple] = None,  # (h, w) to reshape rays for LPIPS
    lpips_weight: float = 0.01,
):
    pred = results["image"]
    loss = jnp.mean((pred - rgb_gt) ** 2)

    if lpips_fn is not None and lpips_shape is not None:
        # lips-rect mode: the whole batch is one h*w rect -> [1, h, w, 3];
        # patch mode (patch_size > 1, utils.py:757-781): the batch is
        # num_rays/(p*p) row-major p x p patches -> [B, p, p, 3]
        h, w = lpips_shape
        loss = loss + lpips_weight * jnp.mean(
            lpips_fn(pred.reshape(-1, h, w, 3), rgb_gt.reshape(-1, h, w, 3))
        )

    loss = loss + 1e-4 * jnp.mean(binary_entropy(results["weights_sum"]))

    lambda_t = jnp.minimum(global_step.astype(jnp.float32) / iters, 1.0) * lambda_amb
    loss_amb = jnp.mean(results["ambient"] * (~face_mask))
    return loss + lambda_t * loss_amb


def torso_loss(results: dict, rgb_gt: jnp.ndarray):
    pred = results["torso_color"]
    loss = jnp.mean((pred - rgb_gt) ** 2)
    return loss + 1e-4 * jnp.mean(binary_entropy(results["torso_alpha"]))
