"""Audio conditioning networks: per-frame feature encoder + temporal attention.

Reference: nerf/network.py:41-67 (AudioNet) and :10-37 (AudioAttNet).

AudioNet: slice the center 16 of the feature window, 4x Conv1d stride-2
(in->32->32->64->64, length 16->8->4->2->1), LeakyReLU(0.02) after each, then
Linear(64,64)+LeakyReLU+Linear(64,dim_aud).

AudioAttNet: over ``seq_len`` consecutive per-frame features [1, 8, 64]:
5x Conv1d(k3, s1, p1) 64->16->8->4->2->1 each followed by LeakyReLU(0.02),
then Linear(seq_len, seq_len) + softmax over the sequence -> attention
weights -> weighted sum -> smoothed [1, 64].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modules import conv1d_apply, conv1d_init, leaky_relu, linear_apply, linear_init


def audio_net_init(key, dim_in: int, dim_aud: int = 64):
    ks = jax.random.split(key, 6)
    return {
        "conv": [
            conv1d_init(ks[0], dim_in, 32, 3),
            conv1d_init(ks[1], 32, 32, 3),
            conv1d_init(ks[2], 32, 64, 3),
            conv1d_init(ks[3], 64, 64, 3),
        ],
        "fc": [linear_init(ks[4], 64, 64), linear_init(ks[5], 64, dim_aud)],
    }


def audio_net_apply(p, x, win_size: int = 16):
    """x: [B, dim_in, W] -> [B, dim_aud]."""
    half_w = win_size // 2
    x = x[:, :, 8 - half_w : 8 + half_w]
    for conv in p["conv"]:
        x = leaky_relu(conv1d_apply(conv, x, stride=2, padding=1))
    x = x[..., 0]  # [B, 64, 1] -> [B, 64]
    x = leaky_relu(linear_apply(p["fc"][0], x))
    return linear_apply(p["fc"][1], x)


def audio_att_net_init(key, dim_aud: int = 64, seq_len: int = 8):
    ks = jax.random.split(key, 6)
    return {
        "conv": [
            conv1d_init(ks[0], dim_aud, 16, 3),
            conv1d_init(ks[1], 16, 8, 3),
            conv1d_init(ks[2], 8, 4, 3),
            conv1d_init(ks[3], 4, 2, 3),
            conv1d_init(ks[4], 2, 1, 3),
        ],
        "fc": linear_init(ks[5], seq_len, seq_len),
    }


def audio_att_net_apply(p, x):
    """x: [1, seq_len, dim_aud] -> [1, dim_aud]."""
    seq_len = x.shape[1]
    y = jnp.transpose(x, (0, 2, 1))  # [1, dim_aud, seq_len]
    for conv in p["conv"]:
        y = leaky_relu(conv1d_apply(conv, y, stride=1, padding=1))
    y = linear_apply(p["fc"], y.reshape(1, seq_len))
    y = jax.nn.softmax(y, axis=1).reshape(1, seq_len, 1)
    return jnp.sum(y * x, axis=1)  # [1, dim_aud]
