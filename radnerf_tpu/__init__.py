"""radnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for real-time
audio-driven talking-head neural radiance fields.

Rebuilds the complete capability surface of RAD-NeRF (reference:
Karthik-Ragunath/RAD-NeRF) as an idiomatic TPU framework:

- ``ops``      : the compute kernels (multiresolution grid encoding, spherical
                 harmonics, frequency encoding, occupancy-bitfield ray
                 marching, volume compositing, morton/packbits grid
                 maintenance). These replace the reference's four CUDA
                 extensions (gridencoder/, shencoder/, freqencoder/,
                 raymarching/) with XLA/Pallas equivalents built around
                 static shapes and masked dense math.
- ``models``   : the audio-conditioned NeRF field (AudioNet / AudioAttNet /
                 sigma-color MLPs / torso 2-D neural layer) as functional
                 parameter pytrees (reference: nerf/network.py).
- ``data``     : dataset providers for the reference's on-disk format
                 (transforms json + gt/torso images + audio feature npy)
                 and ray generation (reference: nerf/provider.py, utils.py).
- ``train``    : the training engine (optax optimizers, EMA, losses,
                 checkpointing, metrics) (reference: nerf/utils.py Trainer).
- ``parallel`` : jax.sharding mesh utilities for data-parallel training /
                 inference over TPU slices.
"""

__version__ = "0.1.0"
