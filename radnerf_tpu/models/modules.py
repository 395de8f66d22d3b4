"""Minimal functional NN primitives (parameter pytrees + apply functions).

The reference's building blocks are torch nn.Linear / nn.Conv1d stacks
(reference nerf/network.py:10-88). Here they are plain pytrees applied by
pure functions — the idiomatic JAX expression (no module framework needed at
this model scale, and everything stays trivially jit/vmap/shard-able).

Initialization matches torch defaults (kaiming_uniform(a=sqrt(5)) ==
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases) so that
training dynamics are comparable and torch checkpoints import cleanly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, dim_in: int, dim_out: int, bias: bool = True):
    bound = 1.0 / math.sqrt(dim_in)
    wk, bk = jax.random.split(key)
    p = {"w": jax.random.uniform(wk, (dim_in, dim_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (dim_out,), jnp.float32, -bound, bound)
    return p


def linear_apply(p, x, compute_dtype=None):
    w = p["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = x @ w
    if "b" in p:
        b = p["b"].astype(y.dtype)
        y = y + b
    return y


def conv1d_init(key, c_in: int, c_out: int, kernel: int, bias: bool = True):
    fan_in = c_in * kernel
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    # weight layout [c_out, c_in, k] (torch layout; imports stay trivial)
    p = {"w": jax.random.uniform(wk, (c_out, c_in, kernel), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound)
    return p


def conv1d_apply(p, x, stride: int = 1, padding: int = 0):
    """x: [B, C_in, L] -> [B, C_out, L_out]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def leaky_relu(x, negative_slope: float = 0.02):
    return jnp.where(x >= 0, x, negative_slope * x)


def mlp_init(key, dim_in: int, dim_out: int, dim_hidden: int, num_layers: int):
    """Bias-free Linear stack with ReLU between (network.py:69-88)."""
    keys = jax.random.split(key, num_layers)
    layers = []
    for l in range(num_layers):
        di = dim_in if l == 0 else dim_hidden
        do = dim_out if l == num_layers - 1 else dim_hidden
        layers.append(linear_init(keys[l], di, do, bias=False))
    return {"layers": layers}


def mlp_apply(p, x, compute_dtype=None):
    n = len(p["layers"])
    for l, layer in enumerate(p["layers"]):
        x = linear_apply(layer, x, compute_dtype)
        if l != n - 1:
            x = jax.nn.relu(x)
    return x
