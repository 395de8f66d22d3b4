"""3DMM landmark-based face tracker, JAX implementation (preprocess task 8).

Reference: data_utils/face_tracking/face_tracker.py — a BFM-2009 3DMM fit:
focal sweep 600..1400 step 100 on every-40th frame (face_tracker.py:54-111),
coarse per-frame pose/expression fit over all frames with temporal laplacian
smoothing (:113-260), then a photometric fine fit through a differentiable
rasterizer (:259-377). Output: per-frame euler/trans + focal, consumed by
save_transforms (process.py:259-342).

This JAX version implements the geometry/landmark optimization stages
faithfully (same parameterization: id [1,100], exp [N,79], euler [N,3],
trans [N,3] with z-7 init; same losses: mean-squared landmark error +
0.5*id^2 + 0.4*exp^2 regularizers + laplacian temporal smoothing; same Adam
schedule with x0.2 decay), jit-compiled with optax. The morphable-model
BASIS (mean landmarks + id/exp bases at the 68 landmark vertices, from the
Basel Face Model whose data files cannot ship here) is an input array; the
photometric texture/lighting refinement stage requires a differentiable
rasterizer + BFM textures and remains a pluggable hook.

Convention notes (matching the reference):
- rotation: euler_zyx_rot (Rx@Ry@Rz with the tracker's signs, shared with
  preprocess.pipeline.save_transforms),
- projection: perspective with y/x flips as in face_tracking/geo_transform
  (u = f*x/z + cx with image-style axes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class LandmarkBasis:
    """68-landmark morphable model: lm = mean + id_base @ id + exp_base @ exp.

    mean: [68, 3]; id_base: [68, 3, id_dim]; exp_base: [68, 3, exp_dim].
    Units/axes must match the BFM convention the reference uses (the bases
    are extracted from the reference's 3DMM data files when available).
    """

    mean: np.ndarray
    id_base: np.ndarray
    exp_base: np.ndarray

    @property
    def id_dim(self):
        return self.id_base.shape[-1]

    @property
    def exp_dim(self):
        return self.exp_base.shape[-1]


def euler_rot(euler: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] -> [N, 3, 3], tracker convention (process.py:276-298)."""
    th, ph, ps = euler[:, 0], euler[:, 1], euler[:, 2]
    one, zero = jnp.ones_like(th), jnp.zeros_like(th)
    rx = jnp.stack([one, zero, zero,
                    zero, jnp.cos(th), jnp.sin(th),
                    zero, -jnp.sin(th), jnp.cos(th)], -1).reshape(-1, 3, 3)
    ry = jnp.stack([jnp.cos(ph), zero, -jnp.sin(ph),
                    zero, one, zero,
                    jnp.sin(ph), zero, jnp.cos(ph)], -1).reshape(-1, 3, 3)
    rz = jnp.stack([jnp.cos(ps), -jnp.sin(ps), zero,
                    jnp.sin(ps), jnp.cos(ps), zero,
                    zero, zero, one], -1).reshape(-1, 3, 3)
    return rx @ ry @ rz


def project(points: jnp.ndarray, euler: jnp.ndarray, trans: jnp.ndarray,
            focal, cxy) -> jnp.ndarray:
    """World landmarks [N, 68, 3] -> image coords [N, 68, 2]."""
    rot = euler_rot(euler)
    cam = jnp.einsum("nij,nkj->nki", rot, points) + trans[:, None, :]
    z = jnp.maximum(-cam[..., 2], 1e-6)  # camera looks down -z
    u = focal * cam[..., 0] / z + cxy[0]
    v = -focal * cam[..., 1] / z + cxy[1]
    return jnp.stack([u, v], -1)


def landmarks_from_params(basis: LandmarkBasis, ids: jnp.ndarray, exp: jnp.ndarray):
    """[B, id_dim], [B, exp_dim] -> [B, 68, 3]."""
    mean = jnp.asarray(basis.mean)
    idb = jnp.asarray(basis.id_base)
    expb = jnp.asarray(basis.exp_base)
    return mean[None] + jnp.einsum("kdi,bi->bkd", idb, ids) + jnp.einsum(
        "kdi,bi->bkd", expb, exp
    )


def _lan_loss(proj, lms):
    return jnp.mean(jnp.sum((proj - lms) ** 2, axis=-1))


def _fit(basis, lms, focal, cxy, n_pose, n_joint, lr=0.1,
         id_init=None, smooth_weight=0.0):
    """One fitting stage: pose-only Adam, then joint id/exp+pose Adam with
    the reference's regularizers and x0.2 decay at iter 1500
    (face_tracker.py:64-101)."""
    N = lms.shape[0]
    params = {
        "id": jnp.zeros((1, basis.id_dim)) if id_init is None else id_init,
        "exp": jnp.zeros((N, basis.exp_dim)),
        "euler": jnp.zeros((N, 3)),
        "trans": jnp.zeros((N, 3)).at[:, 2].add(-7.0),
    }

    def lan(p):
        geo = landmarks_from_params(
            basis, jnp.broadcast_to(p["id"], (N, basis.id_dim)), p["exp"]
        )
        proj = project(geo, p["euler"], p["trans"], focal, cxy)
        return _lan_loss(proj, lms)

    def full_loss(p):
        loss = lan(p)
        loss = loss + 0.5 * jnp.mean(p["id"] ** 2) + 0.4 * jnp.mean(p["exp"] ** 2)
        if smooth_weight > 0 and N > 2:
            for k in ("euler", "trans", "exp"):
                lap = p[k][1:-1] - 0.5 * (p[k][:-2] + p[k][2:])
                loss = loss + smooth_weight * jnp.mean(lap**2)
        return loss

    # stage A: pose only
    tx = optax.adam(lr)
    pose_keys = ("euler", "trans")

    def mask_grads(g, keys):
        return {k: (g[k] if k in keys else jnp.zeros_like(g[k])) for k in g}

    opt_state = tx.init(params)

    @jax.jit
    def step_pose(p, s):
        loss, g = jax.value_and_grad(lan)(p)
        g = mask_grads(g, pose_keys)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for _ in range(n_pose):
        params, opt_state, loss = step_pose(params, opt_state)

    # stage B: joint, with decay x0.2 at 1500 (two optimizer phases)
    for phase, iters in enumerate(_split_iters(n_joint)):
        tx2 = optax.adam(lr * (0.2**phase))
        s2 = tx2.init(params)

        @jax.jit
        def step_joint(p, s):
            loss, g = jax.value_and_grad(full_loss)(p)
            u, s = tx2.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        for _ in range(iters):
            params, s2, loss = step_joint(params, s2)

    return params, float(loss)


def _split_iters(n):
    return [min(n, 1500), max(0, n - 1500)]


def track_landmarks(
    lms: np.ndarray,
    img_w: int,
    img_h: int,
    basis: LandmarkBasis,
    focal_candidates=range(600, 1500, 100),
    sel_stride: int = 40,
    focal_iters=(2000, 2500),
    coarse_iters=(1000, 2500),
    photometric_fn: Optional[callable] = None,
) -> dict:
    """Full tracking pipeline on 68-pt landmark tracks [N, 68, 2].

    1. focal sweep on every sel_stride-th frame (face_tracker.py:54-111),
    2. coarse fit over all frames with temporal smoothing (:113-260),
    3. optional photometric refinement hook (:259-377; needs a
       differentiable rasterizer + BFM texture model).

    Returns {'focal': [1], 'euler': [N,3], 'trans': [N,3], 'id': [1,id_dim],
    'exp': [N,exp_dim]} — save_transforms-compatible.
    """
    lms = jnp.asarray(lms, jnp.float32)
    cxy = (img_w / 2.0, img_h / 2.0)

    sel = np.arange(0, lms.shape[0], sel_stride)
    best = (None, np.inf)
    for focal in focal_candidates:
        _, loss = _fit(basis, lms[sel], float(focal), cxy,
                       n_pose=focal_iters[0], n_joint=focal_iters[1])
        if loss < best[1]:
            best = (focal, loss)
    focal = float(best[0])

    params, loss = _fit(basis, lms, focal, cxy, n_pose=coarse_iters[0],
                        n_joint=coarse_iters[1], smooth_weight=0.01)

    out = {
        "focal": np.asarray([focal], np.float32),
        "euler": np.asarray(params["euler"], np.float32),
        "trans": np.asarray(params["trans"], np.float32),
        "id": np.asarray(params["id"], np.float32),
        "exp": np.asarray(params["exp"], np.float32),
    }
    if photometric_fn is not None:
        out = photometric_fn(out)
    return out


def basis_from_file(path: str, keys_path: Optional[str] = None,
                    id_dim: int = 100, exp_dim: int = 79) -> LandmarkBasis:
    """Load a LandmarkBasis from disk. Two formats:

    - ``.npz`` with ``mean [68,3]``, ``id_base [68,3,id]``,
      ``exp_base [68,3,exp]`` (this package's native format), or
    - the reference's ``3DMM_info.npy`` (data_utils/face_tracking/
      convert_BFM.py: ``mu_shape/b_shape/sig_shape`` + exp + tex arrays,
      Basel-2009 units) together with ``keys_info.npy`` (``keyinds`` =
      landmark vertex ids) as ``keys_path``. The sigma scalings are folded
      into the bases so unit-scale parameters match the reference's
      ``para * sig`` convention (facemodel.py:28-30, 51-53).
    """
    if path.endswith(".npz"):
        blob = np.load(path)
        return LandmarkBasis(
            mean=np.asarray(blob["mean"], np.float32),
            id_base=np.asarray(blob["id_base"], np.float32),
            exp_base=np.asarray(blob["exp_base"], np.float32),
        )
    info = np.load(path, allow_pickle=True).item()
    if keys_path is None:
        raise ValueError(
            "3DMM_info.npy needs keys_info.npy (landmark vertex ids) as "
            "keys_path"
        )
    keys = np.load(keys_path, allow_pickle=True).item()
    keyinds = np.asarray(keys["keyinds"]).reshape(-1)

    mu = (np.asarray(info["mu_shape"]) + np.asarray(info["mu_exp"])).reshape(-1, 3)
    mu = mu - mu.mean(axis=0, keepdims=True)  # facemodel.py:24-26
    mu = (mu / 100000.0).astype(np.float32)

    def _base(b, sig, dim):
        b = np.asarray(b)[:dim].reshape(dim, -1, 3) / 100000.0
        b = b * np.asarray(sig)[:dim, None, None]  # fold sig: unit params
        return np.transpose(b, (1, 2, 0)).astype(np.float32)  # [V, 3, dim]

    id_base = _base(info["b_shape"], info["sig_shape"], id_dim)
    exp_base = _base(info["b_exp"], info["sig_exp"], exp_dim)
    return LandmarkBasis(
        mean=mu[keyinds],
        id_base=id_base[keyinds],
        exp_base=exp_base[keyinds],
    )


def make_tracker_fn(basis: LandmarkBasis, **kwargs):
    """PreprocessPipeline-compatible tracker_fn built on landmark files."""
    import glob
    import os

    def tracker_fn(ori_imgs_dir: str, h: int, w: int, n_frames: int) -> dict:
        paths = sorted(
            glob.glob(os.path.join(ori_imgs_dir, "*.lms")),
            key=lambda p: int(os.path.basename(p).split(".")[0]),
        )
        lms = np.stack([np.loadtxt(p) for p in paths], 0)  # [N, 68, 2]
        return track_landmarks(lms, w, h, basis, **kwargs)

    return tracker_fn
