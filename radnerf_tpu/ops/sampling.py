"""Auxiliary sampling ops: background-sphere coords + hierarchical PDF
sampling.

Reference: sph_from_ray (raymarching/src/raymarching.cu:162-209; unused by
the talking-head pipeline but part of the op surface) and sample_pdf
(nerf/renderer.py:13-47, the classic NeRF hierarchical sampler used by the
non-cuda-ray path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float):
    """Far intersection of rays with the background sphere -> (theta, phi)
    in [-1, 1]. Assumes origins inside the sphere (raymarching.cu:162-209)."""
    # solve |o + t d|^2 = r^2 for the positive root
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = -b + jnp.sqrt(jnp.maximum(b * b - c, 0.0))
    p = rays_o + t[..., None] * rays_d
    theta = jnp.arctan2(jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2), p[..., 1]) / jnp.pi
    phi = jnp.arctan2(p[..., 0], p[..., 2]) / jnp.pi
    return jnp.stack([2.0 * theta - 1.0, phi], axis=-1)


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = False, key: jax.Array | None = None):
    """Inverse-CDF sampling of new depths from bin weights
    (renderer.py:13-47).

    bins: [B, T], weights: [B, T-1] -> [B, n_samples]."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B, T]

    B, T = cdf.shape
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        assert key is not None, "stochastic sampling needs a PRNG key"
        u = jax.random.uniform(key, (B, n_samples))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, T - 1)

    cdf_b = jnp.take_along_axis(cdf, below, 1)
    cdf_a = jnp.take_along_axis(cdf, above, 1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), 1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), 1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
