"""Device-mesh utilities: data parallelism over rays / frames.

The reference's only distribution surface is dormant PyTorch DDP scaffolding
(reference nerf/utils.py:621-623: SyncBatchNorm + DistributedDataParallel
wrap, never exercised — main.py always runs world_size=1). Its TPU-native
equivalent (SURVEY.md §2.5) is jax.sharding data parallelism:

- parameters + renderer state replicated across the mesh,
- the ray batch sharded over the 'dp' axis,
- gradient reduction happens automatically: with sharded inputs and
  replicated params, XLA inserts the psum over ICI during jit of the
  train step (the NCCL-allreduce-under-DDP analogue).

Inference sharding is the same: rays of a frame split across chips
(embarrassingly parallel), composited shards gathered at the end.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / renderer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays(mesh: Mesh, array, axis_name: str = "dp"):
    """Shard the leading (ray) axis across the mesh. The ray count must be
    divisible by the mesh size — callers pad to a multiple (rays are
    padded with misses, which composite to pure background)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(array, sharding)


_RAY_KEYS = ("rays_o", "rays_d", "bg_coords", "bg_color", "images",
             "face_mask", "bg_torso_color")


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "dp") -> dict:
    """Shard the per-ray arrays of a training batch; replicate the rest
    (audio window, pose, eye, index are tiny and shared). Arrays whose ray
    count does not divide the mesh stay replicated (e.g. odd full-frame
    sizes at eval)."""
    n = mesh.shape[axis_name]
    out = {}
    for k, v in batch.items():
        if (
            k in _RAY_KEYS
            and v is not None
            and hasattr(v, "shape")
            and v.ndim >= 1
            and v.shape[0] % n == 0
        ):
            out[k] = shard_rays(mesh, v, axis_name)
        else:
            out[k] = v
    return out


def pad_to_multiple(a: np.ndarray, multiple: int, axis: int = 0, value=0):
    """Pad an array so axis length is divisible by ``multiple``."""
    n = a.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return a, n
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, rem)
    return np.pad(a, pad, constant_values=value), n


def make_render_frame_dp(mesh: Mesh, net_cfg, rc, axis_name: str = "dp"):
    """Data-parallel inference: one frame's rays sharded across the mesh.

    TPU-native design (NOT GSPMD over the global render graph): each
    device renders ITS ray shard with `shard_map`, so the compaction
    cumsums, capacity buffers, and gathers are all device-local — zero
    collectives on the hot path (rays are embarrassingly parallel; the
    reference's closest analogue is the dormant DDP surface,
    nerf/utils.py:621-623). Static capacities apply per shard: a frac-
    based ray capacity of the LOCAL ray count, so the per-chip graph is
    the single-chip graph at N/n rays — per-chip FPS times n is the
    scaling model (PERFORMANCE.md).

    Returns ``render(params, state, batch, auds) -> (image, depth,
    state2)`` over a batch whose per-ray arrays are length N (divisible
    by the mesh size; pad with miss rays via pad_to_multiple). The
    returned state is the frame-to-frame renderer state (audio-code EMA):
    it evolves identically on every device from replicated inputs, so it
    is emitted replicated.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from ..models import render_rays

    P_ray = PartitionSpec(axis_name)
    P_rep = PartitionSpec()

    def local_render(params, state, rays_o, rays_d, bg_coords, bg_color,
                     auds, poses, eye, index):
        results, state2 = render_rays(
            params, net_cfg, rc, state, rays_o, rays_d, auds,
            bg_coords, poses, eye, index, bg_color, training=False,
        )
        return results["image"], results["depth"], state2

    smap = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P_rep, P_rep, P_ray, P_ray, P_ray, P_ray,
                  P_rep, P_rep, P_rep, P_rep),
        out_specs=(P_ray, P_ray, P_rep),
        check_vma=False,
    )

    @jax.jit
    def render(params, state, batch, auds):
        return smap(
            params, state, batch["rays_o"], batch["rays_d"],
            batch["bg_coords"], batch["bg_color"], auds,
            batch["poses"], batch["eye"], batch["index"],
        )

    return render
