"""Classic NeRF frequency (positional) encoding.

Replaces the reference CUDA extension ``freqencoder`` (reference
freqencoder/src/freqencoder.cu:30-58 ``kernel_freq``; wrapper
freqencoder/freq.py:55-76). Layout matches the CUDA element ordering:

  out[c] = x[c]                                  for c < D
  out[c] = sin(2^freq * x[d] + (col%2) * pi/2)   for c >= D,
           col = c//D - 1, d = c%D, freq = col//2

i.e. [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with each block
spanning all D input dims. Output dim = D + D * degree * 2 (freq.py:61).
Pure jnp: XLA fuses this into the consuming MLP; gradients via autodiff.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """[..., D] -> [..., D + 2*D*degree]."""
    parts = [x]
    for f in range(degree):
        scaled = x * (2.0**f)
        parts.append(jnp.sin(scaled))
        parts.append(jnp.cos(scaled))
    return jnp.concatenate(parts, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree
