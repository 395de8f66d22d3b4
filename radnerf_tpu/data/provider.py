"""Dataset providers for the reference's on-disk format (host side).

Reference: nerf/provider.py — NeRFDataset (train/val/test with gt images,
:311-735) and NeRFDataset_Test (pose json + novel audio, no images, :84-308).

Disk layout consumed (produced by the preprocessing pipeline):
  <root>/transforms_{train,val}.json   poses + per-frame img_id/aud_id/eye
  <root>/gt_imgs/<id>.jpg              ground-truth frames
  <root>/torso_imgs/<id>.png           RGBA torso plates
  <root>/ori_imgs/<id>.lms             68-pt landmarks (face/lips rects, eye area)
  <root>/bc.jpg                        background plate
  <root>/aud_eo.npy | aud_ds.npy | aud.npy   audio feature table [T, 16, K]

Batches are plain dicts of fixed-shape numpy arrays; the trainer moves them
to device. No torch DataLoader — batch assembly is cheap host work and the
device pipeline is fully jitted.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from .rays import (
    convert_poses,
    get_audio_features,
    get_bg_coords,
    get_rays,
    nerf_matrix_to_ngp,
    polygon_area,
    smooth_camera_path,
)


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3 and img.shape[-1] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def _smooth_1d(x: np.ndarray) -> np.ndarray:
    """Naive 3-window average (provider.py:208-214)."""
    out = x.copy()
    for i in range(x.shape[0]):
        out[i] = x[max(0, i - 1): min(x.shape[0], i + 2)].mean()
    return out


def load_audio_features(path: str, emb: bool = False) -> np.ndarray:
    """[T, 16, K] logits -> [T, K, 16]; or [T, 16] labels when emb
    (provider.py:400-414)."""
    feats = np.load(path)
    if feats.ndim == 3:
        feats = feats.astype(np.float32).transpose(0, 2, 1)
        if emb:
            feats = feats.argmax(1).astype(np.int64)
    else:
        assert emb, "aud only provides labels, must use --emb"
        feats = feats.astype(np.int64)
    return feats


class TalkingHeadDataset:
    """Train/val/test dataset over a processed video directory
    (NeRFDataset, provider.py:311-735)."""

    def __init__(self, opt, split: str = "train", downscale: int = 1):
        self.opt = opt
        self.split = split
        self.training = split in ("train", "all", "trainval")
        self.num_rays = opt.num_rays if self.training else -1
        self.root = opt.path
        self.rng = np.random.default_rng(opt.seed)

        transform = self._load_transform(split)

        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // downscale
            self.W = int(transform["w"]) // downscale
        else:
            self.H = int(transform["cy"]) * 2 // downscale
            self.W = int(transform["cx"]) * 2 // downscale

        frames = transform["frames"]
        start, end = opt.data_range
        if end == -1:
            end = len(frames)
        frames = frames[start:end]
        if split == "train":
            if opt.part:
                frames = frames[::10]
            elif opt.part2:
                frames = frames[:375]
        elif split == "val":
            frames = frames[:100]

        # audio features
        self.auds: Optional[np.ndarray]
        if opt.asr:
            aud_features = None
        elif opt.aud == "":
            name = (
                "aud_eo.npy" if "esperanto" in opt.asr_model
                else "aud_ds.npy" if "deepspeech" in opt.asr_model
                else "aud.npy"
            )
            aud_features = load_audio_features(os.path.join(self.root, name), opt.emb)
        else:
            aud_features = load_audio_features(opt.aud, opt.emb)

        poses, auds, images, torso_imgs = [], [], [], []
        face_rect, lips_rect, eye_area = [], [], []
        for f in frames:
            img_path = os.path.join(self.root, "gt_imgs", str(f["img_id"]) + ".jpg")
            if not os.path.exists(img_path):
                continue
            pose = np.array(f["transform_matrix"], dtype=np.float32)
            poses.append(nerf_matrix_to_ngp(pose, scale=opt.scale, offset=opt.offset))
            if opt.preload > 0:
                images.append(_imread_rgb(img_path))
            else:
                images.append(img_path)
            torso_path = os.path.join(self.root, "torso_imgs", str(f["img_id"]) + ".png")
            if opt.preload > 0:
                torso_imgs.append(_imread_rgb(torso_path))
            else:
                torso_imgs.append(torso_path)
            if aud_features is not None and opt.aud == "":
                auds.append(aud_features[min(f["aud_id"], len(aud_features) - 1)])

            lms = np.loadtxt(os.path.join(self.root, "ori_imgs", str(f["img_id"]) + ".lms"))
            xmin, xmax = int(lms[31:36, 1].min()), int(lms[:, 1].max())
            ymin, ymax = int(lms[:, 0].min()), int(lms[:, 0].max())
            face_rect.append([xmin, xmax, ymin, ymax])

            if opt.exp_eye:
                area_l = polygon_area(lms[36:42, 0], lms[36:42, 1])
                area_r = polygon_area(lms[42:48, 0], lms[42:48, 1])
                eye_area.append((area_l + area_r) / (self.H * self.W) * 100)

            if opt.finetune_lips:
                lips = slice(48, 60)
                lxmin, lxmax = int(lms[lips, 1].min()), int(lms[lips, 1].max())
                lymin, lymax = int(lms[lips, 0].min()), int(lms[lips, 0].max())
                cx_ = (lxmin + lxmax) // 2
                cy_ = (lymin + lymax) // 2
                half = max(lxmax - lxmin, lymax - lymin) // 2
                # TPU: bucket the rect half-size to a multiple of 16 so the
                # lips-finetune batch shapes (and thus jit compilations) are
                # bounded; the rect is shifted (not clipped) to stay in-frame
                # so its static size is preserved. The reference pads to a
                # square of the exact size (provider.py:487-502).
                half = ((half + 15) // 16) * 16
                x0 = min(max(0, cx_ - half), self.H - 2 * half)
                y0 = min(max(0, cy_ - half), self.W - 2 * half)
                lips_rect.append([x0, x0 + 2 * half, y0, y0 + 2 * half])

        self.poses = np.stack(poses, 0)
        if opt.smooth_path:
            self.poses = smooth_camera_path(self.poses, opt.smooth_path_window)
        self.images = images
        self.torso_imgs = torso_imgs
        self.face_rect = face_rect
        self.lips_rect = lips_rect
        self.preload = opt.preload
        if self.preload > 0:
            self.images = np.stack(self.images, 0)
            self.torso_imgs = np.stack(self.torso_imgs, 0)

        if opt.asr:
            self.auds = None
        elif opt.aud == "":
            self.auds = np.stack(auds, 0)
        else:
            self.auds = aud_features

        # background plate
        self.bg_img = self._load_bg(opt)

        if opt.exp_eye:
            ea = np.array(eye_area, np.float32)
            if opt.smooth_eye:
                ea = _smooth_1d(ea)
            self.eye_area = ea.reshape(-1, 1)
        else:
            self.eye_area = None

        # intrinsics
        if "focal_len" in transform:
            fl_x = fl_y = transform["focal_len"]
        elif "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / downscale
            fl_y = transform.get("fl_y", transform.get("fl_x")) / downscale
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = (
                self.W / (2 * np.tan(transform["camera_angle_x"] / 2))
                if "camera_angle_x" in transform else None
            )
            fl_y = (
                self.H / (2 * np.tan(transform["camera_angle_y"] / 2))
                if "camera_angle_y" in transform else None
            )
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("Failed to load focal length from transforms json")
        cx = transform.get("cx", self.W / 2) / downscale
        cy = transform.get("cy", self.H / 2) / downscale
        self.intrinsics = np.array([fl_x, fl_y, cx, cy], np.float64)

        self.bg_coords = get_bg_coords(self.H, self.W)
        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

    # -- loading helpers --------------------------------------------------
    def _load_transform(self, split):
        if split == "all":
            transform = None
            for p in glob.glob(os.path.join(self.root, "*.json")):
                with open(p) as f:
                    t = json.load(f)
                if transform is None:
                    transform = t
                else:
                    transform["frames"].extend(t["frames"])
            return transform
        if split == "trainval":
            with open(os.path.join(self.root, "transforms_train.json")) as f:
                transform = json.load(f)
            with open(os.path.join(self.root, "transforms_val.json")) as f:
                transform["frames"].extend(json.load(f)["frames"])
            return transform
        name = "val" if split == "test" else split
        with open(os.path.join(self.root, f"transforms_{name}.json")) as f:
            return json.load(f)

    def _load_bg(self, opt):
        import cv2

        if opt.bg_img == "white":
            return np.ones((self.H, self.W, 3), np.float32)
        if opt.bg_img == "black":
            return np.zeros((self.H, self.W, 3), np.float32)
        path = opt.bg_img or os.path.join(self.root, "bc.jpg")
        bg = _imread_rgb(path)[..., :3]
        if bg.shape[0] != self.H or bg.shape[1] != self.W:
            bg = cv2.resize(bg, (self.W, self.H), interpolation=cv2.INTER_AREA)
        return bg

    # -- batch assembly ----------------------------------------------------
    def __len__(self):
        if self.training:
            return self.poses.shape[0]
        if self.auds is not None:
            return self.auds.shape[0]
        return 2 * self.poses.shape[0]

    def mirror_index(self, index: int) -> int:
        """Replay --> <-- --> <-- (provider.py:615-622)."""
        size = self.poses.shape[0]
        turn, res = divmod(index, size)
        return res if turn % 2 == 0 else size - res - 1

    def _frame_images(self, index: int):
        if self.preload > 0:
            return self.images[index], self.torso_imgs[index]
        return _imread_rgb(self.images[index]), _imread_rgb(self.torso_imgs[index])

    def collate(self, index: int) -> dict:
        """Build one batch (provider.py:625-714). Index is the loader index;
        pose/image use the mirrored index, audio uses the original."""
        results = {}
        if self.auds is not None:
            results["auds"] = get_audio_features(self.auds, self.opt.att, index)

        midx = self.mirror_index(index)
        pose = self.poses[midx]

        if self.training and self.opt.finetune_lips:
            rect = self.lips_rect[midx]
            results["rect"] = rect
            rays = get_rays(pose, self.intrinsics, self.H, self.W, -1, rect=rect, rng=self.rng)
        else:
            rays = get_rays(
                pose, self.intrinsics, self.H, self.W, self.num_rays,
                self.opt.patch_size, rng=self.rng,
            )

        results["index"] = midx
        results["H"], results["W"] = self.H, self.W
        results["rays_o"] = rays["rays_o"]
        results["rays_d"] = rays["rays_d"]

        if self.training:
            xmin, xmax, ymin, ymax = self.face_rect[midx]
            results["face_mask"] = (
                (rays["j"] >= xmin) & (rays["j"] < xmax)
                & (rays["i"] >= ymin) & (rays["i"] < ymax)
            )

        results["eye"] = (
            self.eye_area[midx].reshape(1, 1) if self.eye_area is not None else None
        )

        image, torso_img = self._frame_images(midx)
        # torso plate composited over background (provider.py:673)
        bg_torso = (
            torso_img[..., :3] * torso_img[..., 3:] + self.bg_img * (1 - torso_img[..., 3:])
        ).reshape(-1, 3)
        bg_flat = self.bg_img.reshape(-1, 3)

        inds = rays["inds"]
        if not self.opt.torso:
            bg_img = bg_torso  # head stage: torso plate is the background
        else:
            bg_img = bg_flat
        results["bg_color"] = bg_img[inds] if self.training else bg_img
        if self.opt.torso and self.training:
            results["bg_torso_color"] = bg_torso[inds]

        img_flat = image.reshape(-1, image.shape[-1])
        results["images"] = img_flat[inds] if self.training else image[None]

        results["bg_coords"] = (
            self.bg_coords[inds] if self.training else self.bg_coords
        )
        results["poses"] = convert_poses(pose[None])
        results["poses_matrix"] = pose[None]
        return results

    def epoch_indices(self, shuffle: Optional[bool] = None) -> np.ndarray:
        shuffle = self.training if shuffle is None else shuffle
        idx = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(idx)
        return idx

    @property
    def has_gt(self) -> bool:
        return self.opt.aud == ""


class PoseAudioDataset:
    """Inference-only dataset: pose json + novel audio npy, no images
    (NeRFDataset_Test, provider.py:84-308)."""

    def __init__(self, opt, downscale: int = 1):
        self.opt = opt
        self.training = False
        self.num_rays = -1
        self.rng = np.random.default_rng(opt.seed)

        with open(opt.pose) as f:
            transform = json.load(f)
        self.H = int(transform["cy"]) * 2 // downscale
        self.W = int(transform["cx"]) * 2 // downscale

        frames = transform["frames"]
        start, end = opt.data_range
        if end == -1:
            end = len(frames)
        frames = frames[start:end]

        if not opt.asr:
            self.auds = load_audio_features(opt.aud, opt.emb)
        else:
            self.auds = None

        poses, eye_area = [], []
        for f in frames:
            pose = np.array(f["transform_matrix"], dtype=np.float32)
            poses.append(nerf_matrix_to_ngp(pose, scale=opt.scale, offset=opt.offset))
            if opt.exp_eye:
                eye_area.append(f.get("eye_ratio", 0.25))

        self.poses = np.stack(poses, 0)
        if opt.smooth_path:
            self.poses = smooth_camera_path(self.poses, opt.smooth_path_window)

        # background
        if opt.bg_img == "white" or opt.bg_img == "":
            self.bg_img = np.ones((self.H, self.W, 3), np.float32)
        elif opt.bg_img == "black":
            self.bg_img = np.zeros((self.H, self.W, 3), np.float32)
        else:
            import cv2

            bg = _imread_rgb(opt.bg_img)[..., :3]
            if bg.shape[0] != self.H or bg.shape[1] != self.W:
                bg = cv2.resize(bg, (self.W, self.H), interpolation=cv2.INTER_AREA)
            self.bg_img = bg

        if opt.exp_eye:
            ea = np.array(eye_area, np.float32)
            if opt.smooth_eye:
                ea = _smooth_1d(ea)
            self.eye_area = ea.reshape(-1, 1)
        else:
            self.eye_area = None

        fl = transform["focal_len"]
        self.intrinsics = np.array(
            [fl, fl, transform["cx"] / downscale, transform["cy"] / downscale], np.float64
        )
        self.bg_coords = get_bg_coords(self.H, self.W)

    def __len__(self):
        if self.auds is not None:
            return self.auds.shape[0]
        return 2 * self.poses.shape[0]

    def mirror_index(self, index: int) -> int:
        size = self.poses.shape[0]
        turn, res = divmod(index, size)
        return res if turn % 2 == 0 else size - res - 1

    def collate(self, index: int) -> dict:
        results = {}
        if self.auds is not None:
            results["auds"] = get_audio_features(self.auds, self.opt.att, index)
        midx = self.mirror_index(index)
        pose = self.poses[midx]
        rays = get_rays(pose, self.intrinsics, self.H, self.W, -1, rng=self.rng)
        results["index"] = midx
        results["H"], results["W"] = self.H, self.W
        results["rays_o"] = rays["rays_o"]
        results["rays_d"] = rays["rays_d"]
        results["eye"] = (
            self.eye_area[midx].reshape(1, 1) if self.eye_area is not None else None
        )
        results["bg_color"] = self.bg_img.reshape(-1, 3)
        results["bg_coords"] = self.bg_coords
        results["poses"] = convert_poses(pose[None])
        results["poses_matrix"] = pose[None]
        return results

    @property
    def has_gt(self) -> bool:
        return False
