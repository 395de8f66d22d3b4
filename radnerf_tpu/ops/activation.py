"""Density activation: truncated exponential.

Reference: activation.py:5-18 (_trunc_exp) — fp32 exp forward, backward uses
exp(clamp(x, -15, 15)) to avoid gradient explosion. Expressed as a JAX
custom_jvp so it composes with jit/grad/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x.astype(jnp.float32))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    x = x.astype(jnp.float32)
    y = jnp.exp(x)
    dy = jnp.exp(jnp.clip(x, -15.0, 15.0)) * dx.astype(jnp.float32)
    return y, dy
