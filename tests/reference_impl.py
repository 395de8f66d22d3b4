"""Literal numpy re-implementations of the reference CUDA algorithms.

These are test oracles only (never on any hot path): they transcribe the
*algorithm* of the reference kernels (cited per function) as sequential numpy
so the TPU ops can be property-tested against the exact semantics.
"""

from __future__ import annotations

import math

import numpy as np

SQRT3 = 1.7320508075688772
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)
_U32 = 1 << 32


# ---------------------------------------------------------------- grid encode
def ref_grid_encode(inputs01, embeddings, spec):
    """gridencoder.cu:87-196 kernel_grid, align_corners=False."""
    B = inputs01.shape[0]
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    offsets = spec.offsets
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    out = np.zeros((B, L, C), np.float64)

    for b in range(B):
        x = inputs01[b]
        if np.any((x < 0) | (x > 1)):
            continue  # OOB -> zeros
        for level in range(L):
            hashmap_size = offsets[level + 1] - offsets[level]
            # fp32 position math, exactly like the CUDA kernel
            scale = np.float32(
                np.exp2(np.float32(level) * np.float32(S)) * np.float32(H) - np.float32(1.0)
            )
            resolution = int(np.ceil(scale)) + 1
            pos = x.astype(np.float32) * scale + np.float32(0.5)
            pos_grid = np.floor(pos).astype(np.int64)
            frac = (pos - pos_grid.astype(np.float32)).astype(np.float64)
            if spec.interpolation == "smoothstep":
                frac = frac * frac * (3 - 2 * frac)
            for corner in range(1 << D):
                w = 1.0
                cg = np.zeros(D, np.int64)
                for d in range(D):
                    if corner & (1 << d):
                        w *= frac[d]
                        cg[d] = pos_grid[d] + 1
                    else:
                        w *= 1 - frac[d]
                        cg[d] = pos_grid[d]
                # get_grid_index, gridencoder.cu:66-84
                stride = 1
                index = 0
                for d in range(D):
                    if stride <= hashmap_size:
                        index = (index + cg[d] * stride) % _U32
                    stride = (stride * (resolution + 1)) % _U32
                if spec.gridtype == "hash" and stride > hashmap_size:
                    index = 0
                    for d in range(D):
                        index ^= (cg[d] * _PRIMES[d]) % _U32
                    index %= _U32
                idx = index % hashmap_size + offsets[level]
                out[b, level] += w * embeddings[idx]
    return out.reshape(B, L * C)


# ----------------------------------------------------------------- sh encode
def ref_sh_encode4(d):
    """shencoder.cu:27-80 kernel_sh, degree 4 (the shipped dir encoder).

    d: [B, 3] -> [B, 16], literal transcription of the hard-coded
    polynomials (coefficients verbatim)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    out = np.stack(
        [
            np.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ],
        axis=-1,
    )
    return out


# --------------------------------------------------------------- freq encode
def ref_freq_encode(x, deg):
    """freqencoder.cu:30-57 kernel_freq: [B, D] -> [B, D + 2*D*deg];
    column c < D is identity, then col = c/D - 1, freq = col/2,
    phase = (col % 2) * pi/2: sin(2^freq * x + phase)."""
    B, D = x.shape
    cols = [x]
    for col in range(2 * deg):
        freq = col // 2
        phase = (col % 2) * (math.pi / 2)
        cols.append(np.sin((2.0**freq) * x + phase))
    return np.concatenate(cols, axis=-1)


# ------------------------------------------------------------ field networks
def ref_mlp(layers, h):
    """network.py:69-88 MLP: bias-free Linear stack, ReLU between layers,
    none after the last. ``layers`` are our imported [{'w': [in, out]}]."""
    for li, layer in enumerate(layers):
        h = h @ np.asarray(layer["w"], np.float64)
        if li < len(layers) - 1:
            h = np.maximum(h, 0.0)
    return h


def ref_trunc_exp(x):
    """activation.py:5-18: exp with clamped input."""
    return np.exp(np.clip(x, -15.0, 15.0))


# -------------------------------------------------------------------- marcher
def _morton3d(x, y, z):
    def expand(v):
        v = (v * 0x00010001) & 0xFF0000FF
        v = (v * 0x00000101) & 0x0F00F00F
        v = (v * 0x00000011) & 0xC30C30C3
        v = (v * 0x00000005) & 0x49249249
        return v

    return expand(x) | (expand(y) << 1) | (expand(z) << 2)


def _mip_from_pos(x, y, z, max_cascade):
    mx = max(abs(x), abs(y), abs(z))
    e = math.frexp(mx)[1]
    return int(min(max_cascade - 1, max(0, e)))


def _mip_from_dt(dt, H, max_cascade):
    e = math.frexp(dt * H * 0.5)[1]
    return int(min(max_cascade - 1, max(0, e)))


def ref_march_ray(o, d, near, far, bitfield, bound, cascade, H, max_steps, dt_gamma, noise=0.0):
    """kernel_march_rays_train (raymarching.cu:352-518), one ray.

    Returns list of (x, y, z, dt, t_after) samples.
    """
    dt_max = 2 * SQRT3 * (1 << (cascade - 1)) / H
    dt_min = min(dt_max, 2 * SQRT3 / max_steps)

    def clamp_dt(t):
        return min(max(t * dt_gamma, dt_min), dt_max)

    t = near + clamp_dt(near) * noise
    rH = 1.0 / H
    H3 = H * H * H
    samples = []
    while t < far and len(samples) < max_steps:
        x = min(max(o[0] + t * d[0], -bound), bound)
        y = min(max(o[1] + t * d[1], -bound), bound)
        z = min(max(o[2] + t * d[2], -bound), bound)
        dt = clamp_dt(t)
        level = max(_mip_from_pos(x, y, z, cascade), _mip_from_dt(dt, H, cascade))
        mip_bound = min(2.0**level, bound)
        nx = int(min(max(0.5 * (x / mip_bound + 1) * H, 0.0), H - 1))
        ny = int(min(max(0.5 * (y / mip_bound + 1) * H, 0.0), H - 1))
        nz = int(min(max(0.5 * (z / mip_bound + 1) * H, 0.0), H - 1))
        index = level * H3 + _morton3d(nx, ny, nz)
        occ = bitfield[index // 8] & (1 << (index % 8))
        if occ:
            t_next = t + dt
            samples.append((x, y, z, dt, t_next))
            t = t_next
        else:
            sgn = lambda v: math.copysign(1.0, v)
            tx = (((nx + 0.5 + 0.5 * sgn(d[0])) * rH * 2 - 1) * mip_bound - x) / d[0]
            ty = (((ny + 0.5 + 0.5 * sgn(d[1])) * rH * 2 - 1) * mip_bound - y) / d[1]
            tz = (((nz + 0.5 + 0.5 * sgn(d[2])) * rH * 2 - 1) * mip_bound - z) / d[2]
            tt = t + max(0.0, min(tx, min(ty, tz)))
            while True:
                t += clamp_dt(t)
                if t >= tt:
                    break
    return samples


# ----------------------------------------------------------------- compositor
def ref_composite_ray(sigmas, rgbs, ambient, dts, ts_after, T_thresh=1e-4):
    """kernel_composite_rays_train_forward (raymarching.cu:603-687), one ray."""
    T = 1.0
    r = g = b = ws = depth = amb = 0.0
    for i in range(len(sigmas)):
        alpha = 1.0 - math.exp(-sigmas[i] * dts[i])
        weight = alpha * T
        r += weight * rgbs[i][0]
        g += weight * rgbs[i][1]
        b += weight * rgbs[i][2]
        depth += weight * ts_after[i]
        ws += weight
        amb += ambient[i]
        T *= 1.0 - alpha
        if T < T_thresh:
            break
    return np.array([r, g, b]), depth, ws, amb
