"""Encoder factory: string name -> (encode_fn, output_dim, init_fn).

Reference: encoding.py:6-38 (get_encoder). Returns functional pieces instead
of nn.Modules: ``encode_fn(x, params=None, bound=1.0)`` plus the output dim
and an ``init_fn(key)`` for parameterized encoders (grids). 'None' returns
identity; 'frequency' and 'spherical_harmonics' are parameter-free.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax

from .freq_encode import freq_encode, freq_output_dim
from .grid_encode import GridSpec, grid_encode
from .sh_encode import sh_encode, sh_output_dim


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: float = 2048,
    interpolation: str = "linear",
    align_corners: bool = False,
) -> Tuple[Callable, int, Optional[Callable]]:
    """Build an encoder by name (encoding.py:6-38)."""
    if encoding == "None" or encoding is None:
        return (lambda x, params=None, bound=1.0: x), input_dim, None

    if encoding == "frequency":
        return (
            lambda x, params=None, bound=1.0: freq_encode(x, multires),
            freq_output_dim(input_dim, multires),
            None,
        )

    if encoding == "spherical_harmonics":
        return (
            lambda x, params=None, bound=1.0: sh_encode(x, degree),
            sh_output_dim(degree),
            None,
        )

    if encoding in ("hashgrid", "tiledgrid"):
        spec = GridSpec.create(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            interpolation=interpolation,
            align_corners=align_corners,
        )

        def encode(x, params=None, bound=1.0, _spec=spec):
            assert params is not None, "grid encoders need their table params"
            return grid_encode(x, params, _spec, bound)

        def init_fn(key: jax.Array, _spec=spec):
            return _spec.init(key)

        encode.spec = spec  # expose for callers that need the table layout
        return encode, spec.output_dim, init_fn

    raise NotImplementedError(f"unknown encoding: {encoding}")
