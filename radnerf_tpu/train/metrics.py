"""Evaluation metrics: PSNR, LPIPS (AlexNet-style, JAX), LMD.

Reference: nerf/utils.py:402-436 (PSNRMeter), :438-472 (LPIPSMeter, alex),
:475-567 (LMDMeter, mouth-landmark distance via dlib/face_alignment).

LPIPS here is a self-contained JAX implementation of the LPIPS-alex
architecture (AlexNet conv stack, unit-normalized feature taps, learned 1x1
calibration weights, spatial average). Calibrated weights can be loaded from
the official ``lpips`` torch checkpoint when available
(``LPIPS.load_torch_weights``); in a hermetic environment the metric runs
with fixed-seed filters — still a valid *relative* perceptual distance for
tracking training progress, and the in-graph perceptual term for lips
finetune / patch training. The report string names the active backend so
numbers are never silently conflated with official LPIPS.

LMD requires a face-landmark model (the reference uses dlib or
face_alignment); it is gated on those packages being importable.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class PSNRMeter:
    """PSNR over full frames (utils.py:402-436)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        preds = np.asarray(preds, np.float32)
        truths = np.asarray(truths, np.float32)
        mse = float(np.mean((preds - truths) ** 2))
        psnr = -10.0 * math.log10(max(mse, 1e-12))
        self.V += psnr
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        writer.add_scalar(f"{prefix}/PSNR", self.measure(), global_step)

    def report(self) -> str:
        return f"PSNR = {self.measure():.6f}"


# ---------------------------------------------------------------------- lpips
_ALEX_CFG = [
    # (out_ch, kernel, stride, pad, pool_after)
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, True),
]
# ImageNet normalization used by LPIPS ("scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_init(key):
    params = []
    c_in = 3
    for i, (c_out, k, _, _, _) in enumerate(_ALEX_CFG):
        key, sub = jax.random.split(key)
        fan_in = c_in * k * k
        w = jax.random.normal(sub, (c_out, c_in, k, k)) * (2.0 / fan_in) ** 0.5
        params.append({"w": w, "b": jnp.zeros((c_out,))})
        c_in = c_out
    key, sub = jax.random.split(key)
    lins = [jnp.ones((c,)) / c for c in (64, 192, 384, 256, 256)]
    return {"convs": params, "lins": lins}


def _alex_features(params, x):
    """x: [B, H, W, 3] in [0, 1] -> list of 5 feature maps [B, h, w, c]."""
    x = 2.0 * x - 1.0  # [-1, 1]
    x = (x - _SHIFT) / _SCALE
    x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW
    feats = []
    for p, (c_out, k, s, pad, pool) in zip(params["convs"], _ALEX_CFG):
        x = jax.lax.conv_general_dilated(
            x, p["w"], (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + p["b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                [(0, 0), (0, 0), (0, 0), (0, 0)],
            )
    return feats


@partial(jax.jit, static_argnames=())
def _lpips_distance(params, a, b):
    fa = _alex_features(params, a)
    fb = _alex_features(params, b)
    total = 0.0
    for xa, xb, lin in zip(fa, fb, params["lins"]):
        na = xa / jnp.sqrt(jnp.sum(xa**2, axis=1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # [B, C, h, w]
        total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1), axis=(1, 2))
    return total  # [B]


class LPIPS:
    """LPIPS-alex perceptual distance in JAX."""

    def __init__(self, seed: int = 0):
        self.params = _alex_init(jax.random.PRNGKey(seed))
        self.calibrated = False

    def load_torch_weights(self, alexnet_state: dict, lpips_state: dict):
        """Import official weights: torchvision alexnet ``features`` convs +
        lpips ``lin{0..4}.model.1.weight`` calibration."""
        convs = []
        conv_ids = [0, 3, 6, 8, 10]
        for i, cid in enumerate(conv_ids):
            w = np.asarray(alexnet_state[f"features.{cid}.weight"], np.float32)
            b = np.asarray(alexnet_state[f"features.{cid}.bias"], np.float32)
            convs.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        lins = []
        for i in range(5):
            w = np.asarray(lpips_state[f"lin{i}.model.1.weight"], np.float32)
            lins.append(jnp.asarray(w.reshape(-1)))
        self.params = {"convs": convs, "lins": lins}
        self.calibrated = True

    def load_weights_file(self, path: str):
        """Load calibration weights from a single file.

        Accepted formats (the reference's ``lpips`` pip package fetches the
        torchvision alexnet + its ``lin`` calibration heads at runtime; in a
        hermetic environment the user supplies them as one file):

        - ``.npz``: keys ``features.{0,3,6,8,10}.{weight,bias}`` (alexnet
          convs) + ``lin{0..4}.model.1.weight`` (calibration),
        - torch ``.pth``/``.pt``: either ``{"alexnet": sd, "lpips": sd}``
          nested state dicts, or one flat dict carrying both key families.
        """
        if path.endswith(".npz"):
            blob = dict(np.load(path))
            alex = {k: v for k, v in blob.items() if k.startswith("features.")}
            lin = {k: v for k, v in blob.items() if k.startswith("lin")}
        else:
            import torch

            blob = torch.load(path, map_location="cpu", weights_only=False)
            if "alexnet" in blob and "lpips" in blob:
                alex, lin = blob["alexnet"], blob["lpips"]
            else:
                alex = {k: v for k, v in blob.items() if k.startswith("features.")}
                lin = {k: v for k, v in blob.items() if k.startswith("lin")}
            alex = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
                    for k, v in alex.items()}
            lin = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
                   for k, v in lin.items()}
        if not alex or not lin:
            raise ValueError(
                f"{path}: expected alexnet 'features.*' and lpips 'lin*' keys, "
                f"got {sorted(blob)[:6]}..."
            )
        self.load_torch_weights(alex, lin)

    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [0, 1] -> [B] distances. Differentiable."""
        return _lpips_distance(self.params, a, b)

    def loss_fn(self):
        """Closure suitable for the in-graph lips-finetune perceptual term."""
        params = self.params
        return lambda a, b: _lpips_distance(params, a, b)


class LPIPSMeter:
    """LPIPS over full frames (utils.py:438-472)."""

    def __init__(self, seed: int = 0, weights_path: str = ""):
        self.lpips = LPIPS(seed)
        if weights_path:
            self.lpips.load_weights_file(weights_path)
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        a = jnp.asarray(np.asarray(preds, np.float32)).reshape(1, *np.shape(preds)[-3:])
        b = jnp.asarray(np.asarray(truths, np.float32)).reshape(1, *np.shape(truths)[-3:])
        self.V += float(self.lpips(a, b)[0])
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        writer.add_scalar(f"{prefix}/LPIPS{self._tag()}", self.measure(), global_step)

    def _tag(self):
        return " (alex)" if self.lpips.calibrated else " (uncalibrated-jax)"

    def report(self) -> str:
        return f"LPIPS{self._tag()} = {self.measure():.6f}"


class LMDMeter:
    """Mouth-landmark distance (utils.py:475-567). Requires the
    ``face_alignment`` (backend='fan') or ``dlib`` package; unavailable in a
    hermetic environment -> raises ImportError at construction."""

    def __init__(self, backend: str = "fan", region: str = "mouth",
                 predictor=None):
        self.backend = backend
        self.region = region
        if predictor is not None:
            # Injected predictor (tests / alternative landmark models): any
            # object with get_landmarks(uint8 image) -> [68, 2] array(s).
            self.predictor = predictor
        elif backend == "dlib":
            import dlib  # noqa: F401  (gated)

            raise ImportError("dlib backend requires a local predictor .dat file")
        else:
            import face_alignment  # noqa: F401  (gated)

            # Reference passes LandmarksType._2D + flip_input=False
            # (nerf/utils.py:495); the enum member was renamed TWO_D in
            # face_alignment >= 1.4.
            lm_type = getattr(face_alignment.LandmarksType, "TWO_D",
                              getattr(face_alignment.LandmarksType, "_2D", None))
            if lm_type is None:
                # another enum rename: fail through the ImportError path so
                # main.py's optional-metric gating skips LMD cleanly instead
                # of FaceAlignment(None) erroring opaquely downstream
                raise ImportError(
                    "face_alignment.LandmarksType exposes neither TWO_D nor "
                    "_2D; unsupported face_alignment version for LMDMeter"
                )
            self.predictor = face_alignment.FaceAlignment(
                lm_type, flip_input=False)
        self.clear()

    def get_landmarks(self, img: np.ndarray) -> np.ndarray:
        lms = self.predictor.get_landmarks(np.asarray(img * 255.0, np.uint8))[-1]
        return lms.astype(np.float32)

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        lms_pred = self.get_landmarks(np.asarray(preds))
        lms_true = self.get_landmarks(np.asarray(truths))
        # normalize by centering (utils.py:537-541), mouth = points 48:68
        lms_pred = lms_pred - lms_pred.mean(0)
        lms_true = lms_true - lms_true.mean(0)
        if self.region == "mouth":
            lms_pred, lms_true = lms_pred[48:68], lms_true[48:68]
        self.V += float(np.linalg.norm(lms_pred - lms_true, axis=-1).mean())
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        writer.add_scalar(f"{prefix}/LMD ({self.backend})", self.measure(), global_step)

    def report(self) -> str:
        return f"LMD ({self.backend}) = {self.measure():.6f}"
