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


# ------------------------------------------------------------ near/far (slab)
def ref_near_far(o, d, aabb, min_near=0.05):
    """kernel_near_far_from_aabb (raymarching.cu:91-156), one ray: per-axis
    slab test against the rectangular AABB, near clamped up to min_near,
    miss -> (FLT_MAX, FLT_MAX)."""
    tmin, tmax = -math.inf, math.inf
    for a in range(3):
        da = d[a] if d[a] != 0.0 else 1e-30
        t0 = (aabb[a] - o[a]) / da
        t1 = (aabb[3 + a] - o[a]) / da
        tmin = max(tmin, min(t0, t1))
        tmax = min(tmax, max(t0, t1))
    if tmin > tmax:
        return 3.4028235e38, 3.4028235e38
    return max(tmin, min_near), tmax


# ----------------------------------------------------- torso occupancy sample
def ref_bilinear_2d(grid_flat, coords, H):
    """F.grid_sample(grid.view(1,1,H,H), coords, align_corners=True) with the
    reference's flat layout flat[c1*H + c0] (reference renderer.py:282,472)."""
    a = (coords[..., 0] + 1.0) * 0.5 * (H - 1)
    b = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    a0 = np.clip(np.floor(a), 0, H - 1).astype(np.int64)
    b0 = np.clip(np.floor(b), 0, H - 1).astype(np.int64)
    a1 = np.clip(a0 + 1, 0, H - 1)
    b1 = np.clip(b0 + 1, 0, H - 1)
    wa = np.clip(a - a0, 0.0, 1.0)
    wb = np.clip(b - b0, 0.0, 1.0)
    top = grid_flat[b0 * H + a0] * (1 - wa) + grid_flat[b0 * H + a1] * wa
    bot = grid_flat[b1 * H + a0] * (1 - wa) + grid_flat[b1 * H + a1] * wa
    return top * (1 - wb) + bot * wb


# -------------------------------------------------------- full field (numpy)
def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def ref_field_forward(params, cfg, x, d, enc_a, c, e):
    """NeRFNetwork.forward re-executed in numpy (reference network.py:222-283)
    via the kernel-transcription encoders. x [M,3] in [-bound,bound], d [M,3]
    unit, enc_a [1,64] (None -> zero-ambient branch, network.py:233-236),
    c [ind_dim], e scalar."""
    M = x.shape[0]
    b = cfg.bound
    enc_x = ref_grid_encode(
        (x.astype(np.float64) + b) / (2 * b),
        np.asarray(params["encoder"], np.float64), cfg.grid_spec)
    if enc_a is None:
        ambient = np.zeros((M, cfg.ambient_dim), np.float64)
    else:
        a_rep = np.repeat(np.asarray(enc_a, np.float64), M, axis=0)
        ambient = np.tanh(ref_mlp(params["ambient_net"]["layers"],
                                  np.concatenate([enc_x, a_rep], axis=-1)))
    enc_w = ref_grid_encode(
        (ambient + 1.0) / 2.0,
        np.asarray(params["encoder_ambient"], np.float64), cfg.ambient_spec)
    parts = [enc_x, enc_w]
    if e is not None:
        parts.append(np.full((M, 1), e, np.float64))
    h = ref_mlp(params["sigma_net"]["layers"], np.concatenate(parts, axis=-1))
    sigma = ref_trunc_exp(h[:, 0])
    geo = h[:, 1:]
    enc_d = ref_sh_encode4(d.astype(np.float64))
    parts2 = [enc_d, geo]
    if c is not None:
        parts2.append(np.repeat(np.asarray(c, np.float64)[None], M, axis=0))
    color = _sigmoid(ref_mlp(params["color_net"]["layers"],
                             np.concatenate(parts2, axis=-1)))
    return sigma, color, ambient


def ref_forward_torso(params, cfg, x, pose6, c):
    """forward_torso re-executed in numpy (reference network.py:188-219)."""
    M = x.shape[0]
    xs = x.astype(np.float64) * cfg.torso_shrink
    enc_pose = ref_freq_encode(np.asarray(pose6, np.float64), 4)
    enc_x = ref_freq_encode(xs, 10)
    parts = [enc_x, np.repeat(enc_pose, M, axis=0)]
    if c is not None:
        parts.append(np.repeat(np.asarray(c, np.float64)[None], M, axis=0))
    h = np.concatenate(parts, axis=-1)
    dx = ref_mlp(params["torso_deform_net"]["layers"], h)
    xp = np.clip(xs + dx, -1.0, 1.0)
    enc_t = ref_grid_encode(
        (xp + 1.0) / 2.0, np.asarray(params["torso_encoder"], np.float64),
        cfg.torso_spec)
    h2 = ref_mlp(params["torso_net"]["layers"],
                 np.concatenate([enc_t, h], axis=-1))
    return _sigmoid(h2[:, :1]), _sigmoid(h2[:, 1:])


def ref_render_frame(params, net_cfg, rays_o, rays_d, bg_coords, pose6,
                     enc_a, eye, bg_color, bitfield, density_grid_torso,
                     mean_density_torso, *, bound=1.0, min_near=0.05,
                     grid_size=128, cascade=1, max_steps=16, dt_gamma=0.0,
                     T_thresh=1e-4, density_thresh_torso=0.01, torso=True):
    """Full-frame reference-semantics render, assembled from the literal
    kernel transcriptions: slab near/far (raymarching.cu:91-156) ->
    per-ray marching (kernel_march_rays_train, :352-518) -> field eval
    (network.py:222-283) -> sequential compositing (:603-687) -> torso
    2-D layer over background with the grid_sample occupancy mask
    (renderer.py:265-311). Pure numpy/python; the oracle for the
    frame-level PSNR parity number quoted in README.

    Returns (image [N,3], weights_sum [N]).
    """
    N = rays_o.shape[0]
    aabb = (-bound, -bound / 2, -bound, bound, bound / 2, bound)
    ind_code = params.get("individual_codes")
    ind_code = None if ind_code is None else np.asarray(ind_code)[0]

    # march every ray, batch all samples for one vectorized field eval
    all_samples = []
    per_ray = []
    for n in range(N):
        o, d = rays_o[n], rays_d[n]
        near, far = ref_near_far(o, d, aabb, min_near)
        samples = [] if near >= 1e38 else ref_march_ray(
            o, d, near, far, bitfield, bound, cascade, grid_size,
            max_steps, dt_gamma, noise=0.0)
        per_ray.append((len(all_samples), len(samples)))
        all_samples.extend(samples)

    ws = np.zeros(N)
    head_rgb = np.zeros((N, 3))
    if all_samples:
        xyz = np.asarray([s[:3] for s in all_samples], np.float32)
        dts = np.asarray([s[3] for s in all_samples])
        ts_after = np.asarray([s[4] for s in all_samples])
        dirs = np.concatenate([
            np.repeat(rays_d[n][None], cnt, axis=0)
            for n, (_, cnt) in enumerate(per_ray) if cnt], axis=0)
        sigma, color, ambient = ref_field_forward(
            params, net_cfg, xyz, dirs, enc_a, ind_code, eye)
        for n, (base, cnt) in enumerate(per_ray):
            if not cnt:
                continue
            sl = slice(base, base + cnt)
            rgb, _, w, _ = ref_composite_ray(
                sigma[sl], color[sl], ambient[sl, 0] if ambient.ndim > 1
                else ambient[sl], dts[sl], ts_after[sl], T_thresh)
            head_rgb[n] = rgb
            ws[n] = w

    bg = np.asarray(bg_color, np.float64).copy()
    if torso:
        thresh_t = min(density_thresh_torso, float(mean_density_torso))
        occ = ref_bilinear_2d(np.asarray(density_grid_torso, np.float64),
                              np.asarray(bg_coords, np.float64), grid_size)
        mask = occ > thresh_t
        if mask.any():
            c_t = params.get("individual_codes_torso")
            c_t = None if c_t is None else np.asarray(c_t)[0]
            t_alpha, t_color = ref_forward_torso(
                params, net_cfg, np.asarray(bg_coords)[mask], pose6, c_t)
            bg[mask] = t_color * t_alpha + bg[mask] * (1.0 - t_alpha)

    image = np.clip(head_rgb + (1.0 - ws)[:, None] * bg, 0.0, 1.0)
    return image, ws


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
