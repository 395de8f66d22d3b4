"""Ray/AABB slab intersection (near/far per ray).

Replaces kernel_near_far_from_aabb (reference
raymarching/src/raymarching.cu:91-156): per-axis slab test, miss rays get
near = far = FLT_MAX, near clamped up to ``min_near``. Pure jnp — one fused
elementwise pass on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_FLT_MAX = jnp.float32(3.4028235e38)


def near_far_from_aabb(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray, min_near: float = 0.05
):
    """Args:
      rays_o, rays_d: [..., 3] float32.
      aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: minimum near distance.

    Returns:
      (nears, fars): [...] float32; FLT_MAX for rays that miss the box.
    """
    rd = 1.0 / rays_d  # inf on zero components is fine (IEEE slab test)
    t0 = (aabb[:3] - rays_o) * rd  # [..., 3]
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _FLT_MAX, near)
    far = jnp.where(miss, _FLT_MAX, far)
    return near, far
