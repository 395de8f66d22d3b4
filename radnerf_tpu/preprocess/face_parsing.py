"""BiSeNet face parsing, JAX implementation (preprocessing task 4).

Reference: data_utils/face_parsing/{model,resnet,test}.py — a 19-class
BiSeNet with a ResNet-18 backbone whose spatial path is replaced by the
backbone's 1/8 feature (model.py:230-246), producing head/neck/torso/bg
color masks for the torso/gt synthesis step:

  classes 1-13, 17-18 -> head  (255, 0, 0)
  classes 14-15       -> neck  (0, 255, 0)
  class  16           -> torso (0, 0, 255)
  class  0            -> bg    (255, 255, 255)       (test.py:20-51)

This is a functional JAX port of the architecture with a torch-checkpoint
import hook (`load_torch_weights` maps the reference's 79999_iter.pth state
dict). Without weights the network runs with He-init (useful only for
testing shapes/pipelines) — the pipeline treats weight availability as an
external input, like every pretrained model in the hermetic environment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_CLASSES = 19
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ------------------------------------------------------------ building blocks
def _conv_init(key, cin, cout, k):
    fan = cin * k * k
    return jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(1.0 / fan)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"][None, :, None, None]) * (inv * p["scale"])[None, :, None, None] \
        + p["bias"][None, :, None, None]


def _cbr_init(key, cin, cout, k):
    return {"w": _conv_init(key, cin, cout, k), "bn": _bn_init(cout)}


def _cbr(x, p, stride=1, padding=0):
    return jax.nn.relu(_bn(_conv(x, p["w"], stride, padding), p["bn"]))


def _interp_nearest(x, hw):
    return jax.image.resize(x, (*x.shape[:2], *hw), method="nearest")


def _interp_bilinear(x, hw):
    return jax.image.resize(x, (*x.shape[:2], *hw), method="linear")


# ------------------------------------------------------------------ resnet18
def _block_init(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(k1, cin, cout, 3), "bn1": _bn_init(cout),
        "conv2": _conv_init(k2, cout, cout, 3), "bn2": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["down_w"] = _conv_init(k3, cin, cout, 1)
        p["down_bn"] = _bn_init(cout)
    return p


def _block(x, p, stride):
    h = jax.nn.relu(_bn(_conv(x, p["conv1"], stride, 1), p["bn1"]))
    h = _bn(_conv(h, p["conv2"], 1, 1), p["bn2"])
    sc = x
    if "down_w" in p:
        sc = _bn(_conv(x, p["down_w"], stride, 0), p["down_bn"])
    return jax.nn.relu(h + sc)


def _resnet18_init(key):
    ks = jax.random.split(key, 9)
    return {
        "conv1": _conv_init(ks[0], 3, 64, 7), "bn1": _bn_init(64),
        "layer1": [_block_init(ks[1], 64, 64, 1), _block_init(ks[2], 64, 64, 1)],
        "layer2": [_block_init(ks[3], 64, 128, 2), _block_init(ks[4], 128, 128, 1)],
        "layer3": [_block_init(ks[5], 128, 256, 2), _block_init(ks[6], 256, 256, 1)],
        "layer4": [_block_init(ks[7], 256, 512, 2), _block_init(ks[8], 512, 512, 1)],
    }


def _resnet18(x, p):
    x = jax.nn.relu(_bn(_conv(x, p["conv1"], 2, 3), p["bn1"]))
    x = jax.lax.reduce_window(  # maxpool 3x3 s2 p1
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    for i, (layer, strides) in enumerate(
        [("layer1", (1, 1)), ("layer2", (2, 1)), ("layer3", (2, 1)), ("layer4", (2, 1))]
    ):
        for blk, s in zip(p[layer], strides):
            x = _block(x, blk, s)
        if layer == "layer2":
            feat8 = x
        elif layer == "layer3":
            feat16 = x
    return feat8, feat16, x


# -------------------------------------------------------------------- bisenet
def _arm_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"conv": _cbr_init(k1, cin, cout, 3),
            "atten_w": _conv_init(k2, cout, cout, 1), "atten_bn": _bn_init(cout)}


def _arm(x, p):
    feat = _cbr(x, p["conv"], 1, 1)
    atten = jnp.mean(feat, axis=(2, 3), keepdims=True)
    atten = jax.nn.sigmoid(_bn(_conv(atten, p["atten_w"]), p["atten_bn"]))
    return feat * atten


def _out_init(key, cin, cmid, ncls):
    k1, k2 = jax.random.split(key)
    return {"conv": _cbr_init(k1, cin, cmid, 3),
            "out_w": _conv_init(k2, cmid, ncls, 1),
            "out_b": jnp.zeros((ncls,))}


def _out(x, p):
    h = _cbr(x, p["conv"], 1, 1)
    return _conv(h, p["out_w"]) + p["out_b"][None, :, None, None]


def bisenet_init(key, n_classes: int = N_CLASSES) -> dict:
    ks = jax.random.split(key, 10)
    return {
        "resnet": _resnet18_init(ks[0]),
        "arm16": _arm_init(ks[1], 256, 128),
        "arm32": _arm_init(ks[2], 512, 128),
        "conv_head32": _cbr_init(ks[3], 128, 128, 3),
        "conv_head16": _cbr_init(ks[4], 128, 128, 3),
        "conv_avg": _cbr_init(ks[5], 512, 128, 1),
        # FFM input = concat(feat8 @128ch, context @128ch) (model.py:235)
        "ffm_convblk": _cbr_init(ks[6], 256, 256, 1),
        "ffm_conv1": _conv_init(ks[7], 256, 64, 1),
        "ffm_conv2": _conv_init(ks[8], 64, 256, 1),
        "conv_out": _out_init(ks[9], 256, 256, n_classes),
    }


def bisenet_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, 3, H, W] normalized -> logits [N, n_classes, H, W]
    (model.py:241-258; aux heads omitted — inference only)."""
    H, W = x.shape[2:]
    feat8, feat16, feat32 = _resnet18(x, params["resnet"])
    h8, w8 = feat8.shape[2:]
    h16, w16 = feat16.shape[2:]
    h32, w32 = feat32.shape[2:]

    avg = jnp.mean(feat32, axis=(2, 3), keepdims=True)
    avg = _cbr(avg, params["conv_avg"])
    avg_up = _interp_nearest(avg, (h32, w32))

    f32 = _arm(feat32, params["arm32"]) + avg_up
    f32_up = _cbr(_interp_nearest(f32, (h16, w16)), params["conv_head32"], 1, 1)

    f16 = _arm(feat16, params["arm16"]) + f32_up
    f16_up = _cbr(_interp_nearest(f16, (h8, w8)), params["conv_head16"], 1, 1)

    # FFM: spatial path = the backbone 1/8 feature (model.py:233-246)
    fcat = jnp.concatenate([feat8, f16_up], axis=1)
    feat = _cbr(fcat, params["ffm_convblk"])
    atten = jnp.mean(feat, axis=(2, 3), keepdims=True)
    atten = jax.nn.relu(_conv(atten, params["ffm_conv1"]))
    atten = jax.nn.sigmoid(_conv(atten, params["ffm_conv2"]))
    feat = feat * atten + feat

    logits = _out(feat, params["conv_out"])
    return _interp_bilinear(logits, (H, W))


# -------------------------------------------------------------- weight import
def load_torch_weights(path: str, n_classes: int = N_CLASSES) -> dict:
    """Import the reference's face-parsing checkpoint (79999_iter.pth)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def bn(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    def cbr(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.conv.weight"]), "bn": bn(f"{prefix}.bn")}

    def block(prefix):
        p = {"conv1": jnp.asarray(sd[f"{prefix}.conv1.weight"]), "bn1": bn(f"{prefix}.bn1"),
             "conv2": jnp.asarray(sd[f"{prefix}.conv2.weight"]), "bn2": bn(f"{prefix}.bn2")}
        if f"{prefix}.downsample.0.weight" in sd:
            p["down_w"] = jnp.asarray(sd[f"{prefix}.downsample.0.weight"])
            p["down_bn"] = bn(f"{prefix}.downsample.1")
        return p

    res = {"conv1": jnp.asarray(sd["cp.resnet.conv1.weight"]),
           "bn1": bn("cp.resnet.bn1")}
    for i in range(1, 5):
        res[f"layer{i}"] = [block(f"cp.resnet.layer{i}.{j}") for j in range(2)]

    def arm(prefix):
        return {"conv": cbr(f"{prefix}.conv"),
                "atten_w": jnp.asarray(sd[f"{prefix}.conv_atten.weight"]),
                "atten_bn": bn(f"{prefix}.bn_atten")}

    def outhead(prefix):
        return {"conv": cbr(f"{prefix}.conv"),
                "out_w": jnp.asarray(sd[f"{prefix}.conv_out.weight"]),
                "out_b": jnp.asarray(sd.get(f"{prefix}.conv_out.bias",
                                            np.zeros(n_classes, np.float32)))}

    return {
        "resnet": res,
        "arm16": arm("cp.arm16"),
        "arm32": arm("cp.arm32"),
        "conv_head32": cbr("cp.conv_head32"),
        "conv_head16": cbr("cp.conv_head16"),
        "conv_avg": cbr("cp.conv_avg"),
        "ffm_convblk": cbr("ffm.convblk"),
        "ffm_conv1": jnp.asarray(sd["ffm.conv1.weight"]),
        "ffm_conv2": jnp.asarray(sd["ffm.conv2.weight"]),
        "conv_out": outhead("conv_out"),
    }


# ------------------------------------------------------------------- pipeline
def classes_to_colors(parsing: np.ndarray) -> np.ndarray:
    """Class map [H, W] -> head/neck/torso/bg color mask (test.py:20-51)."""
    out = np.full((*parsing.shape, 3), 255, np.uint8)  # bg white
    head = ((parsing >= 1) & (parsing <= 13)) | (parsing >= 17)
    out[head] = (255, 0, 0)
    out[(parsing == 14) | (parsing == 15)] = (0, 255, 0)
    out[parsing == 16] = (0, 0, 255)
    return out


def make_parsing_fn(weights_path: str):
    """Build a PreprocessPipeline-compatible parsing_fn from a torch
    checkpoint of the reference face-parsing model."""
    import glob
    import os

    import cv2

    params = load_torch_weights(weights_path)
    apply = jax.jit(lambda x: bisenet_apply(params, x))

    def parsing_fn(ori_imgs_dir: str, parsing_dir: str):
        for p in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            h, w = img.shape[:2]
            x = cv2.resize(img, (512, 512), interpolation=cv2.INTER_LINEAR)
            x = (x.astype(np.float32) / 255.0 - _MEAN) / _STD
            logits = apply(jnp.asarray(x.transpose(2, 0, 1))[None])
            parsing = np.asarray(jnp.argmax(logits[0], axis=0)).astype(np.uint8)
            colors = classes_to_colors(parsing)
            colors = cv2.resize(colors, (w, h), interpolation=cv2.INTER_NEAREST)
            out = os.path.join(parsing_dir, os.path.basename(p).replace(".jpg", ".png"))
            cv2.imwrite(out, colors)

    return parsing_fn
