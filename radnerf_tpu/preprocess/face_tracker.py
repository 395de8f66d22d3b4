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
Basel Face Model whose data files cannot ship here) is an input array. The
photometric texture/lighting refinement stage is implemented too:
``photometric_refine`` below drives the native differentiable rasterizer in
``render_3dmm.py`` (SH lighting + texture fit, the pytorch3d-path analogue
of reference face_tracker.py:178-377) and is synthetic-recovery-tested
(tests/test_utils.py::test_photometric_refine_recovers_pose).

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


def photometric_refine(
    track: dict,
    lms: np.ndarray,
    images: np.ndarray,
    mesh,
    lm_basis: LandmarkBasis,
    img_h: int,
    img_w: int,
    batch_size: int = 64,
    light_iters: int = 71,
    fine_iters: int = 50,
    tile: int = 16,
    K: int = 128,
    verbose: bool = False,
) -> dict:
    """Photometric texture + SH-lighting refinement (the reference's fine
    tracking stages, face_tracker.py:178-360) on the landmark fit in
    ``track``.

    Stage 1 "fitting light" (:178-255): on ~batch_size spread-out frames,
    jointly fit a global texture code + per-frame 27-d SH light + id/exp/
    pose through the differentiable renderer (render_3dmm.Render3DMM);
    masked photometric L2 (util.py:cal_col_loss) + landmark + id/exp
    regularizers, two Adam groups (tex+light lr 0.1; pose/id/exp lr 0.01),
    x0.2 decay at iter 50, landmark weight 3 -> 0.05 after iter 50.

    Stage 2 "fine frame-wise fitting" (:258-360): consecutive batch_size-
    frame windows, Adam(0.005) on exp/euler/trans/light; loss = 0.5*col +
    lan*(8 -> 1.5 after iter 30) + 1e5 * temporal laplacian on the rigid
    vertices (5-frame overlap with already-refined frames) + regexp.

    track: {'focal','euler','trans','id','exp'}; lms [N,68,2];
    images [N,H,W,3] RGB in 0..255. mesh: render_3dmm.MeshBasis.
    Returns the refined dict + {'tex','light'}.
    """
    from .render_3dmm import Render3DMM, forward_geo, forward_tex

    N = int(np.asarray(track["euler"]).shape[0])
    S = min(batch_size, N)
    focal = float(np.asarray(track["focal"]).reshape(-1)[0])
    cxy = (img_w / 2.0, img_h / 2.0)
    renderer = Render3DMM(focal, img_h, img_w, mesh.tris, tile=tile, K=K)

    lms = jnp.asarray(lms, jnp.float32)
    images = jnp.asarray(images, jnp.float32)
    euler = jnp.asarray(track["euler"], jnp.float32)
    trans = jnp.asarray(track["trans"], jnp.float32)
    idp = jnp.asarray(track["id"], jnp.float32)
    exp = jnp.asarray(track["exp"], jnp.float32)

    rigid = mesh.rigid_ids
    if rigid is None:
        rigid = np.arange(0, mesh.mean.shape[0], max(1, mesh.mean.shape[0] // 200))
    rigid = jnp.asarray(rigid, jnp.int32)

    def rott(geo, eul, tr):
        return jnp.einsum("nij,nkj->nki", euler_rot(eul), geo) + tr[:, None, :]

    def render_loss(geo_cam, tex_codes, light, imgs):
        texture = forward_tex(mesh, tex_codes)
        out = renderer(geo_cam, texture, light)  # [S, H, W, 4]
        mask = jax.lax.stop_gradient(out[..., 3]) > 0.0
        err = jnp.sum((out[..., :3] - imgs) ** 2, -1) * mask / 255.0
        return jnp.mean(jnp.sum(err, (1, 2)) / jnp.maximum(
            jnp.sum(mask, (1, 2)), 1.0))  # cal_col_loss

    def lan_loss_of(idb, expb, eulb, trb, lms_b):
        geo = landmarks_from_params(lm_basis, idb, expb)
        proj = project(geo, eulb, trb, focal, cxy)
        return _lan_loss(proj, lms_b)

    # ----------------------------------------------------- stage 1: light
    sel = np.arange(0, N, max(1, N // S))[:S]
    sel_imgs = images[jnp.asarray(sel)]
    sel_lms = lms[jnp.asarray(sel)]

    p1 = {
        "tex": jnp.zeros((1, mesh.tex_dim)),
        "light": jnp.zeros((S, 27)),
        "id": idp,
        "exp": exp[jnp.asarray(sel)],
        "euler": euler[jnp.asarray(sel)],
        "trans": trans[jnp.asarray(sel)],
    }
    tl_keys, pose_keys = ("tex", "light"), ("id", "exp", "euler", "trans")

    def stage1_loss(p, lan_w, regid_w, regexp_w):
        idb = jnp.broadcast_to(p["id"], (S, lm_basis.id_dim))
        loss_lan = lan_loss_of(idb, p["exp"], p["euler"], p["trans"], sel_lms)
        geo = forward_geo(mesh, jnp.broadcast_to(p["id"], (S, mesh.id_dim)),
                          p["exp"])
        geo_cam = rott(geo, p["euler"], p["trans"])
        tex_codes = jnp.broadcast_to(p["tex"], (S, mesh.tex_dim))
        loss_col = render_loss(geo_cam, tex_codes, p["light"], sel_imgs)
        return (loss_col + lan_w * loss_lan
                + regid_w * jnp.mean(p["id"] ** 2)
                + regexp_w * jnp.mean(p["exp"] ** 2))

    def two_group_step(loss_fn, txs):
        @jax.jit
        def step(p, states, *loss_args):
            loss, g = jax.value_and_grad(
                lambda q: loss_fn(q, *loss_args))(p)
            new_states = []
            for (keys, tx), s in zip(txs, states):
                sub_g = {k: g[k] for k in keys}
                sub_p = {k: p[k] for k in keys}
                u, s2 = tx.update(sub_g, s, sub_p)
                p = {**p, **optax.apply_updates(sub_p, u)}
                new_states.append(s2)
            return p, tuple(new_states), loss

        return step

    for phase, (lo, hi) in enumerate([(0, min(51, light_iters)),
                                      (51, light_iters)]):
        if hi <= lo:
            continue
        d = 0.2**phase
        txs = [(tl_keys, optax.adam(0.1 * d)), (pose_keys, optax.adam(0.01 * d))]
        states = tuple(tx.init({k: p1[k] for k in keys}) for keys, tx in txs)
        step = two_group_step(stage1_loss, txs)
        for it in range(lo, hi):
            lan_w, regid_w, regexp_w = ((0.05, 1.0, 0.8) if it > 50
                                        else (3.0, 2.0, 1.0))
            p1, states, loss = step(p1, states, lan_w, regid_w, regexp_w)
        if verbose:
            print(f"[photometric] light phase {phase}: loss {float(loss):.4f}")

    idp, tex = p1["id"], p1["tex"]
    euler = euler.at[jnp.asarray(sel)].set(p1["euler"])
    trans = trans.at[jnp.asarray(sel)].set(p1["trans"])
    exp = exp.at[jnp.asarray(sel)].set(p1["exp"])
    light = jnp.tile(jnp.mean(p1["light"], 0, keepdims=True), (N, 1))

    # ---------------------------------------------- stage 2: fine fitting
    pre_num = 5

    tx2 = optax.adam(0.005)

    def stage2_loss(p, imgs_b, lms_b, pre_geo, lan_w, use_pre):
        B = p["exp"].shape[0]
        idb = jnp.broadcast_to(idp, (B, lm_basis.id_dim))
        loss_lan = lan_loss_of(idb, p["exp"], p["euler"], p["trans"], lms_b)
        geo = forward_geo(mesh, jnp.broadcast_to(idp, (B, mesh.id_dim)),
                          p["exp"])
        geo_cam = rott(geo, p["euler"], p["trans"])
        tex_codes = jnp.broadcast_to(tex, (B, mesh.tex_dim))
        loss_col = render_loss(geo_cam, tex_codes, p["light"], imgs_b)
        # temporal laplacian on rigid vertices, with the 5 preceding
        # already-refined frames prepended (face_tracker.py:323-339)
        rg = geo_cam[:, rigid, :].reshape(B, -1)
        if use_pre:
            rg = jnp.concatenate([pre_geo, rg], 0)
        lap = rg[1:-1] - 0.5 * (rg[:-2] + rg[2:])
        loss_lap = jnp.mean(lap**2)
        return (0.5 * loss_col + lan_w * loss_lan + 1e5 * loss_lap
                + jnp.mean(p["exp"] ** 2))

    from functools import partial

    @partial(jax.jit, static_argnames=("use_pre",))
    def fine_step(p, s, imgs_b, lms_b, pre_geo, lan_w, use_pre):
        loss, g = jax.value_and_grad(
            lambda q: stage2_loss(q, imgs_b, lms_b, pre_geo, lan_w, use_pre)
        )(p)
        u, s = tx2.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    n_batches = int(-(-N // S))
    for bi in range(n_batches):
        start = min(bi * S, N - S)
        ids = np.arange(start, start + S)
        jids = jnp.asarray(ids)
        p2 = {
            "exp": exp[jids], "euler": euler[jids], "trans": trans[jids],
            "light": light[jids],
        }
        use_pre = start >= pre_num
        if use_pre:
            pre_ids = jnp.asarray(np.arange(start - pre_num, start))
            geo_pre = forward_geo(
                mesh, jnp.broadcast_to(idp, (pre_num, mesh.id_dim)),
                exp[pre_ids])
            pre_geo = rott(geo_pre, euler[pre_ids],
                           trans[pre_ids])[:, rigid, :].reshape(pre_num, -1)
        else:
            pre_geo = jnp.zeros((pre_num, rigid.shape[0] * 3))

        s = tx2.init(p2)
        for it in range(fine_iters):
            p2, s, loss = fine_step(
                p2, s, images[jids], lms[jids], pre_geo,
                8.0 if it <= 30 else 1.5, use_pre,
            )
        if verbose:
            print(f"[photometric] fine batch {bi}: loss {float(loss):.4f}")
        exp = exp.at[jids].set(p2["exp"])
        euler = euler.at[jids].set(p2["euler"])
        trans = trans.at[jids].set(p2["trans"])
        light = light.at[jids].set(p2["light"])

    out = dict(track)
    out.update({
        "euler": np.asarray(euler, np.float32),
        "trans": np.asarray(trans, np.float32),
        "exp": np.asarray(exp, np.float32),
        "id": np.asarray(idp, np.float32),
        "tex": np.asarray(tex, np.float32),
        "light": np.asarray(light, np.float32),
    })
    return out


def make_photometric_fn(mesh, lm_basis: LandmarkBasis, ori_imgs_dir: str,
                        img_h: int, img_w: int, **kwargs):
    """track_landmarks-compatible ``photometric_fn`` hook: loads the frame
    images + landmark files and runs photometric_refine."""
    import glob
    import os

    def photometric_fn(track: dict) -> dict:
        import cv2

        paths = sorted(
            glob.glob(os.path.join(ori_imgs_dir, "*.jpg")),
            key=lambda p: int(os.path.basename(p).split(".")[0]),
        )
        imgs = np.stack([
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths
        ]).astype(np.float32)
        lms = np.stack([
            np.loadtxt(p.replace(".jpg", ".lms")) for p in paths
        ]).astype(np.float32)
        return photometric_refine(track, lms, imgs, mesh, lm_basis,
                                  img_h, img_w, **kwargs)

    return photometric_fn


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
