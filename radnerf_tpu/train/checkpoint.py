"""Checkpoint save/load + torch .pth import.

Reference: Trainer.save_checkpoint / load_checkpoint (nerf/utils.py:
1302-1427): state = epoch/global_step/stats + density-grid means + model
state_dict; full checkpoints add optimizer/scheduler/EMA; "best" checkpoints
save EMA weights and drop density_grid (:1353-1355); rolling window of
max_keep_ckpt files (:1331-1337); latest resolved by filename glob (:1366).

Native format here is a flat .npz (pure numpy, no pickle) — fast, portable,
and safe to load. ``import_torch_checkpoint`` maps the reference's torch
state_dict layout onto our parameter pytree so published pretrained
checkpoints (e.g. obama_eo.pth) drop straight in; note best-ckpts lack
``density_grid`` and require an update_density_grid pass before first render
(the reference does this implicitly via its update loop).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- flat <-> tree
def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_checkpoint(
    path: str,
    params: dict,
    renderer_state=None,
    opt_state=None,
    ema_params: Optional[dict] = None,
    meta: Optional[dict] = None,
    include_grid: bool = True,
):
    """Write a flat-npz checkpoint. ``meta`` is stored as a JSON string."""
    flat = {}
    # derived caches (e.g. the bf16 ``_packed_*`` corner tables that
    # precompute_packed_tables attaches for eval) are NOT parameters: they
    # go stale the moment the embeddings train, and np.savez round-trips
    # bfloat16 as an unreadable void dtype ('|V2') — strip every
    # '_'-prefixed top-level key before flattening
    _flatten({k: v for k, v in params.items() if not k.startswith("_")},
             "model/", flat)
    if renderer_state is not None:
        st = {
            "density_bitfield": renderer_state.density_bitfield,
            "mean_density": renderer_state.mean_density,
            "density_grid_torso": renderer_state.density_grid_torso,
            "mean_density_torso": renderer_state.mean_density_torso,
            # acceleration state: cheap (1 byte/cell + 10 floats) and makes
            # grid-less "best" checkpoints render exactly on load — the
            # analogue of the reference KEEPING density_bitfield while
            # dropping density_grid (nerf/utils.py:1353-1355)
            "sigma_bytes": renderer_state.sigma_bytes,
            "occ_bbox": renderer_state.occ_bbox,
            "occ_sphere": renderer_state.occ_sphere,
        }
        if include_grid:
            st["density_grid"] = renderer_state.density_grid
        _flatten(st, "state/", flat)
    if opt_state is not None:
        _flatten(jax.tree_util.tree_map(np.asarray, opt_state), "opt/", flat)
    if ema_params is not None:
        _flatten(ema_params, "ema/", flat)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path: str):
    """Read back (params, state_dict, ema_params, opt_flat, meta)."""
    z = np.load(path, allow_pickle=False)
    groups: dict = {"model": {}, "state": {}, "ema": {}, "opt": {}}
    meta = {}
    for key in z.files:
        if key == "__meta__":
            meta = json.loads(bytes(z[key]).decode())
            continue
        head, _, rest = key.partition("/")
        if rest.startswith("_"):
            # derived '_'-prefixed caches from checkpoints written before
            # the save-side strip (stale + possibly void-dtype bf16) —
            # they are recomputed from the real params on demand
            continue
        value = z[key]
        if value.dtype.kind == "V" and value.dtype.itemsize == 2:
            # np.savez stores ml_dtypes.bfloat16 as a 2-byte void; undo it
            import ml_dtypes

            value = value.view(ml_dtypes.bfloat16)
        groups.setdefault(head, {})[rest] = value
    params = _unflatten(groups["model"]) if groups["model"] else None
    state = _unflatten(groups["state"]) if groups["state"] else None
    ema = _unflatten(groups["ema"]) if groups["ema"] else None
    opt_flat = groups["opt"] or None
    return params, state, ema, opt_flat, meta


def latest_checkpoint(ckpt_dir: str, name: str = "ngp") -> Optional[str]:
    """Resolve the newest epoch checkpoint (utils.py:1364-1369)."""
    lst = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.npz")))
    return lst[-1] if lst else None


# ------------------------------------------------------- torch .pth import
def _t(x):
    return np.asarray(x, dtype=np.float32)


def _map_mlp(sd: dict, prefix: str, n_layers: int):
    return {
        "layers": [
            {"w": _t(sd[f"{prefix}.net.{l}.weight"]).T} for l in range(n_layers)
        ]
    }


def _map_conv_stack(sd: dict, prefix: str, ids):
    return [
        {"w": _t(sd[f"{prefix}.{i}.weight"]), "b": _t(sd[f"{prefix}.{i}.bias"])}
        for i in ids
    ]


def import_torch_checkpoint(path: str) -> Tuple[dict, dict, dict]:
    """Import a reference RAD-NeRF torch checkpoint.

    Returns (params, state_arrays, meta). state_arrays may lack
    'density_grid' for best-ckpts (utils.py:1353-1355).
    Key layout: network.py:91-167 module names; renderer buffers
    renderer.py:88-127.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    params: dict = {
        "audio_net": {
            "conv": _map_conv_stack(sd, "audio_net.encoder_conv", (0, 2, 4, 6)),
            "fc": [
                {"w": _t(sd["audio_net.encoder_fc1.0.weight"]).T,
                 "b": _t(sd["audio_net.encoder_fc1.0.bias"])},
                {"w": _t(sd["audio_net.encoder_fc1.2.weight"]).T,
                 "b": _t(sd["audio_net.encoder_fc1.2.bias"])},
            ],
        },
        "encoder": _t(sd["encoder.embeddings"]),
        "encoder_ambient": _t(sd["encoder_ambient.embeddings"]),
        "ambient_net": _map_mlp(sd, "ambient_net", 3),
        "sigma_net": _map_mlp(sd, "sigma_net", 3),
        "color_net": _map_mlp(sd, "color_net", 2),
    }
    if "audio_att_net.attentionConvNet.0.weight" in sd:
        params["audio_att_net"] = {
            "conv": _map_conv_stack(sd, "audio_att_net.attentionConvNet",
                                    (0, 2, 4, 6, 8)),
            "fc": {"w": _t(sd["audio_att_net.attentionNet.0.weight"]).T,
                   "b": _t(sd["audio_att_net.attentionNet.0.bias"])},
        }
    if "individual_codes" in sd:
        params["individual_codes"] = _t(sd["individual_codes"])
    if "embedding.weight" in sd:
        params["embedding"] = _t(sd["embedding.weight"])
    if "torso_encoder.embeddings" in sd:
        params["torso_encoder"] = _t(sd["torso_encoder.embeddings"])
        params["torso_deform_net"] = _map_mlp(sd, "torso_deform_net", 3)
        params["torso_net"] = _map_mlp(sd, "torso_net", 3)
    if "individual_codes_torso" in sd:
        params["individual_codes_torso"] = _t(sd["individual_codes_torso"])
    if "camera_dR" in sd:
        params["camera_dR"] = _t(sd["camera_dR"])
        params["camera_dT"] = _t(sd["camera_dT"])

    state: dict = {}
    if "density_grid" in sd:
        state["density_grid"] = _t(sd["density_grid"])
    if "density_bitfield" in sd:
        state["density_bitfield"] = np.asarray(sd["density_bitfield"], np.uint8)
    if "density_grid_torso" in sd:
        state["density_grid_torso"] = _t(sd["density_grid_torso"])

    meta = {
        "epoch": int(ckpt.get("epoch", 0)),
        "global_step": int(ckpt.get("global_step", 0)),
        "mean_density": float(ckpt.get("mean_density", 0.0)),
        "mean_density_torso": float(ckpt.get("mean_density_torso", 0.0)),
    }
    return params, state, meta


def restore_opt_state(template, opt_flat: dict):
    """Rebuild an optax state pytree from the flat 'opt/' checkpoint group.

    ``template`` is ``tx.init(params)`` for the CURRENT param tree; saved
    leaves are matched by the same path-key scheme ``_flatten`` used at save
    time. Leaves that are missing or shape-mismatched (e.g. a torso-stage
    trainer resuming from a head-stage checkpoint) keep the template value —
    the strict=False analogue of the reference's try/except optimizer
    restore (nerf/utils.py:1406-1419)."""

    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(node)]
            if isinstance(node, tuple):
                # preserve NamedTuple subclasses (optax states)
                return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
            return vals
        key = prefix[:-1]
        saved = opt_flat.get(key)
        if saved is not None and np.shape(saved) == np.shape(node):
            return jnp.asarray(saved, dtype=getattr(node, "dtype", None))
        return node

    return rebuild(template)


def merge_imported(params: dict, imported: dict) -> Tuple[dict, list]:
    """strict=False load: overwrite matching keys, report missing ones
    (utils.py:1381-1386, main.py:146-151). Returns (params, loaded_keys)."""
    loaded = []
    out = dict(params)
    for k, v in imported.items():
        out[k] = v
        loaded.append(k)
    return out, loaded
