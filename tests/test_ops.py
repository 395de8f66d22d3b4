"""Unit tests for radnerf_tpu.ops against literal numpy oracles of the
reference CUDA kernels (see tests/reference_impl.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.ops import (
    GridSpec,
    MarchConfig,
    compact_samples,
    composite_rays,
    freq_encode,
    grid_encode,
    grid_encode01,
    march_rays,
    morton3d,
    morton3d_invert,
    morton_dilate,
    near_far_from_aabb,
    packbits,
    sh_encode,
    trunc_exp,
)

from reference_impl import (
    ref_composite_ray,
    ref_grid_encode,
    ref_march_ray,
    _morton3d as np_morton3d,
)


# ------------------------------------------------------------------ encoders
@pytest.mark.parametrize("shape", [(16, 2), (8, 4)])
@pytest.mark.parametrize("gridtype", ["tiled", "hash"])
@pytest.mark.parametrize("input_dim", [2, 3])
def test_grid_encode_matches_reference(gridtype, input_dim, shape):
    # (8, 4) is the TPU fast-grid shape (NetworkConfig.grid_levels/grid_ch):
    # same 32-d features, half the gather rows — the index/interp rules are
    # shape-independent and must match the CUDA transcription for both
    spec = GridSpec.create(
        input_dim=input_dim,
        num_levels=shape[0],
        level_dim=shape[1],
        base_resolution=16,
        log2_hashmap_size=16,
        desired_resolution=2048,
        gridtype=gridtype,
    )
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(spec.n_embeddings, spec.level_dim)).astype(np.float32)
    x = rng.uniform(0.0, 1.0, size=(64, input_dim)).astype(np.float32)
    # include boundary + OOB rows
    x[0] = 0.0
    x[1] = 1.0
    x[2, 0] = 1.5  # OOB -> zeros

    got = np.asarray(grid_encode01(jnp.asarray(x), jnp.asarray(emb), spec))
    want = ref_grid_encode(x.astype(np.float64), emb.astype(np.float64), spec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert np.all(got[2] == 0.0)


def test_grid_encode_offsets_match_reference_table():
    # the exact offsets table the reference computes for its 3-D head encoder
    # (grid.py:127 comment)
    spec = GridSpec.create(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=2048,
    )
    assert spec.offsets == (
        0, 4920, 18744, 51512, 117048, 182584, 248120, 313656, 379192,
        444728, 510264, 575800, 641336, 706872, 772408, 837944, 903480,
    )
    spec2d = GridSpec.create(
        input_dim=2, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=2048,
    )
    assert spec2d.n_embeddings == 555520  # torso encoder table size


def test_grid_encode_grads():
    spec = GridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                           base_resolution=4, log2_hashmap_size=8,
                           desired_resolution=32, gridtype="hash")
    key = jax.random.PRNGKey(0)
    emb = spec.init(key)
    x = jax.random.uniform(key, (32, 3), minval=-1.0, maxval=1.0)

    def loss(e, pts):
        return jnp.sum(grid_encode(pts, e, spec, bound=1.0) ** 2)

    g_emb = jax.grad(loss)(emb, x)
    assert g_emb.shape == emb.shape
    assert bool(jnp.any(g_emb != 0))

    # input gradient == analytic dy_dx contraction: check vs finite differences
    def loss_x(pts):
        return jnp.sum(grid_encode(pts, emb, spec, bound=1.0))

    g_x = jax.grad(loss_x)(x)
    eps = 1e-3
    for d in range(3):
        xp = x.at[:, d].add(eps)
        xm = x.at[:, d].add(-eps)
        fd = (loss_x(xp) - loss_x(xm)) / (2 * eps)
        # finite difference crosses cell boundaries for some points; compare
        # loosely in aggregate
        np.testing.assert_allclose(float(jnp.sum(g_x[:, d])), float(fd), rtol=0.2, atol=1e-2)


@pytest.mark.parametrize("shape", [(16, 2), (8, 4)])
@pytest.mark.parametrize("input_dim", [2, 3])
def test_grid_encode_packed_matches_unpacked(input_dim, shape):
    from radnerf_tpu.ops import build_packed_table, grid_encode01_packed

    spec = GridSpec.create(
        input_dim=input_dim, num_levels=shape[0], level_dim=shape[1],
        base_resolution=16,
        log2_hashmap_size=16, desired_resolution=2048, gridtype="tiled",
    )
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(spec.n_embeddings, spec.level_dim)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (128, input_dim)), jnp.float32)
    x = x.at[0].set(0.0).at[1].set(1.0).at[2, 0].set(1.3)  # edges + OOB

    want = grid_encode01(x, emb, spec)
    packed = build_packed_table(emb, spec)
    got = grid_encode01_packed(x, packed, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    # gradients agree too (the packed path autodiffs through the rolls)
    def loss_u(e):
        return jnp.sum(grid_encode01(x, e, spec) ** 2)

    def loss_p(e):
        return jnp.sum(grid_encode01_packed(x, build_packed_table(e, spec), spec) ** 2)

    gu = jax.grad(loss_u)(emb)
    gp = jax.grad(loss_p)(emb)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gu), rtol=1e-4, atol=1e-6)

    # input grads agree (needed by the torso deform branch)
    giu = jax.grad(lambda v: jnp.sum(grid_encode01(v, emb, spec)))(x)
    gip = jax.grad(lambda v: jnp.sum(grid_encode01_packed(v, packed, spec)))(x)
    np.testing.assert_allclose(np.asarray(gip), np.asarray(giu), rtol=3e-4, atol=1e-6)

    # bf16 tables (the fp16-AMP analogue used under -O): the whole lerp runs
    # in bf16 (the consumer MLPs are bf16 anyway — f32 interpolation of
    # bf16-quantized corners only doubled bandwidth); values match the fp32
    # reference up to bf16 quantization, gradients stay finite
    packed_bf16 = build_packed_table(emb, spec, dtype=jnp.bfloat16)
    got_b = grid_encode01_packed(x, packed_bf16, spec)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
    )
    gb = jax.grad(
        lambda e: jnp.sum(
            grid_encode01_packed(x, build_packed_table(e, spec, jnp.bfloat16), spec) ** 2
        )
    )(emb)
    assert np.isfinite(np.asarray(gb)).all()


def test_sh_encode_basic():
    d = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.577, 0.577, 0.577]], np.float32)
    out = np.asarray(sh_encode(jnp.asarray(d), degree=4))
    assert out.shape == (3, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.48860251, rtol=1e-6)  # z term
    np.testing.assert_allclose(out[1, 3], -0.48860251, rtol=1e-6)  # x term
    # degree 8 full basis evaluates
    out8 = sh_encode(jnp.asarray(d), degree=8)
    assert out8.shape == (3, 64)


def test_freq_encode_layout():
    x = np.array([[0.3, -0.7]], np.float32)
    deg = 3
    out = np.asarray(freq_encode(jnp.asarray(x), deg))
    assert out.shape == (1, 2 + 2 * 2 * deg)
    np.testing.assert_allclose(out[0, :2], x[0], rtol=1e-6)
    # block f: sin(2^f x), cos(2^f x)
    for f in range(deg):
        np.testing.assert_allclose(out[0, 2 + 4 * f : 4 + 4 * f], np.sin(2.0**f * x[0]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 4 + 4 * f : 6 + 4 * f], np.cos(2.0**f * x[0]), rtol=1e-5)


def test_trunc_exp():
    x = jnp.array([-20.0, 0.0, 5.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)), rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.exp(np.clip(np.asarray(x), -15, 15)), rtol=1e-6
    )


# ----------------------------------------------------------- morton / packbits
def test_morton_roundtrip():
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 128, size=(256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    want = np.array([np_morton3d(int(c[0]), int(c[1]), int(c[2])) for c in coords])
    np.testing.assert_array_equal(codes, want)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_packbits():
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(1, 64)).astype(np.float32)
    bf = np.asarray(packbits(jnp.asarray(grid), 0.0))
    assert bf.shape == (8,)
    for i in range(64):
        assert bool(bf[i // 8] & (1 << (i % 8))) == bool(grid[0, i] > 0.0)


def test_morton_dilate_matches_cross_neighborhood():
    H = 8
    rng = np.random.default_rng(3)
    grid = rng.normal(size=(1, H**3)).astype(np.float32)
    out = np.asarray(morton_dilate(jnp.asarray(grid), H))

    # brute force oracle (raymarching.cu:303-341)
    dense = np.zeros((H, H, H), np.float32)
    for i in range(H**3):
        c = np.asarray(morton3d_invert(jnp.asarray([i])))[0]
        dense[c[0], c[1], c[2]] = grid[0, i]
    for i in range(H**3):
        c = np.asarray(morton3d_invert(jnp.asarray([i])))[0]
        x, y, z = int(c[0]), int(c[1]), int(c[2])
        res = dense[x, y, z]
        for dx, dy, dz in [(1,0,0),(-1,0,0),(0,1,0),(0,-1,0),(0,0,1),(0,0,-1)]:
            nx, ny, nz = x+dx, y+dy, z+dz
            if 0 <= nx < H and 0 <= ny < H and 0 <= nz < H:
                res = max(res, dense[nx, ny, nz])
        assert out[0, i] == pytest.approx(res)


# ------------------------------------------------------------------ ray/aabb
def test_near_far_from_aabb():
    aabb = jnp.array([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
    o = jnp.array([[0.0, 0.0, -4.0], [0.0, 5.0, -4.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
    np.testing.assert_allclose(np.asarray(nears[0]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fars[0]), 5.0, rtol=1e-6)
    assert float(nears[1]) > 1e30  # miss

    # near clamping
    o2 = jnp.array([[0.0, 0.0, 0.0]])
    nears2, fars2 = near_far_from_aabb(o2, d[:1], aabb, 0.05)
    np.testing.assert_allclose(np.asarray(nears2[0]), 0.05, rtol=1e-6)


# ------------------------------------------------------------------- marching
def _random_scene(seed, cascade=1, H=32, occupied_frac=0.05):
    rng = np.random.default_rng(seed)
    n_cells = cascade * H**3
    occ = (rng.uniform(size=n_cells) < occupied_frac).astype(np.uint8)
    bitfield = np.zeros(n_cells // 8, np.uint8)
    for i in range(n_cells):
        if occ[i]:
            bitfield[i // 8] |= 1 << (i % 8)
    return bitfield


@pytest.mark.parametrize("dt_gamma", [0.0, 1.0 / 256])
def test_march_rays_matches_reference(dt_gamma):
    H, cascade, bound, max_steps = 32, 1, 1.0, 16
    bitfield = _random_scene(4, cascade, H, occupied_frac=0.08)
    rng = np.random.default_rng(5)

    N = 32
    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -4.0
    o[:, 0] = rng.uniform(-0.3, 0.3, N)
    o[:, 1] = rng.uniform(-0.2, 0.2, N)
    d = np.zeros((N, 3), np.float32)
    d[:, 2] = 1.0
    d[:, 0] = rng.uniform(-0.15, 0.15, N)
    d[:, 1] = rng.uniform(-0.1, 0.1, N)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    aabb = jnp.array([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)

    cfg = MarchConfig(bound=bound, cascade=cascade, grid_size=H,
                      max_steps=max_steps, dt_gamma=dt_gamma)
    out = march_rays(jnp.asarray(o), jnp.asarray(d), nears, fars,
                     jnp.asarray(bitfield), cfg)

    got_t = np.asarray(out["t"])
    got_dt = np.asarray(out["dt"])
    got_valid = np.asarray(out["valid"])
    got_xyz = np.asarray(out["xyz"])

    for n in range(N):
        want = ref_march_ray(o[n], d[n], float(nears[n]), float(fars[n]),
                             bitfield, bound, cascade, H, max_steps, dt_gamma)
        n_want = len(want)
        assert int(got_valid[n].sum()) == n_want, f"ray {n}: sample count"
        for s, (wx, wy, wz, wdt, wt_after) in enumerate(want):
            assert got_valid[n, s]
            np.testing.assert_allclose(got_t[n, s] + got_dt[n, s], wt_after, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(got_dt[n, s], wdt, rtol=1e-5)
            np.testing.assert_allclose(got_xyz[n, s], [wx, wy, wz], rtol=1e-4, atol=1e-5)


def test_march_rays_perturb_matches_reference():
    H, cascade, bound, max_steps = 32, 1, 1.0, 16
    bitfield = _random_scene(7, cascade, H, occupied_frac=0.2)
    o = np.array([[0.1, 0.0, -4.0]], np.float32)
    d = np.array([[0.02, 0.01, 1.0]], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.array([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)
    noise = np.array([0.37], np.float32)
    cfg = MarchConfig(bound=bound, cascade=cascade, grid_size=H, max_steps=max_steps)
    out = march_rays(jnp.asarray(o), jnp.asarray(d), nears, fars,
                     jnp.asarray(bitfield), cfg, noises=jnp.asarray(noise))
    want = ref_march_ray(o[0], d[0], float(nears[0]), float(fars[0]),
                         bitfield, bound, cascade, H, max_steps, 0.0, noise=0.37)
    assert int(np.asarray(out["valid"])[0].sum()) == len(want)


def test_composite_matches_reference():
    rng = np.random.default_rng(6)
    N, S = 16, 16
    n_steps = rng.integers(0, S + 1, N)
    sigmas = np.zeros((N, S), np.float32)
    rgbs = np.zeros((N, S, 3), np.float32)
    amb = np.zeros((N, S), np.float32)
    dts = np.zeros((N, S), np.float32)
    ts = np.zeros((N, S), np.float32)
    valid = np.zeros((N, S), bool)
    for n in range(N):
        k = n_steps[n]
        valid[n, :k] = True
        sigmas[n, :k] = rng.uniform(0, 60, k)  # large sigma -> exercise early term
        rgbs[n, :k] = rng.uniform(0, 1, (k, 3))
        amb[n, :k] = rng.uniform(0, 1, k)
        dts[n, :k] = 0.2165
        ts[n, :k] = 3.0 + 0.2165 * np.arange(k)

    res = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(dts),
        jnp.asarray(ts), jnp.asarray(valid), ambient=jnp.asarray(amb),
        T_thresh=1e-4,
    )
    for n in range(N):
        k = int(n_steps[n])
        want_rgb, want_d, want_ws, want_amb = ref_composite_ray(
            sigmas[n, :k], rgbs[n, :k], amb[n, :k], dts[n, :k],
            (ts + dts)[n, :k], T_thresh=1e-4,
        )
        np.testing.assert_allclose(np.asarray(res["image"])[n], want_rgb, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(res["depth"][n]), want_d, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(res["weights_sum"][n]), want_ws, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(res["ambient_sum"][n]), want_amb, rtol=1e-4, atol=1e-6)


def test_composite_grads_flow():
    N, S = 4, 8
    key = jax.random.PRNGKey(0)
    sigmas = jax.random.uniform(key, (N, S), minval=0.0, maxval=5.0)
    rgbs = jax.random.uniform(key, (N, S, 3))
    dts = jnp.full((N, S), 0.1)
    ts = jnp.cumsum(dts, axis=-1)
    valid = jnp.ones((N, S), bool)

    def loss(s, r):
        out = composite_rays(s, r, dts, ts, valid)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["weights_sum"])

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert bool(jnp.all(jnp.isfinite(gs))) and bool(jnp.all(jnp.isfinite(gr)))
    assert bool(jnp.any(gs != 0)) and bool(jnp.any(gr != 0))


def test_sph_from_ray():
    from radnerf_tpu.ops import sph_from_ray

    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0, 1, 0], [0, -1, 0], [0, 0, 1], [1, 0, 0]], jnp.float32)
    coords = np.asarray(sph_from_ray(o, d, 2.0))
    assert coords.shape == (4, 2)
    assert np.all((coords >= -1) & (coords <= 1))
    # +y pole -> theta 0 -> coord -1; -y pole -> +1
    np.testing.assert_allclose(coords[0, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(coords[1, 0], 1.0, atol=1e-6)


def test_sample_pdf():
    from radnerf_tpu.ops import sample_pdf

    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    w = jnp.zeros((4, 8)).at[:, 3].set(10.0)  # mass in bin 3 = [0.375, 0.5]
    samples = np.asarray(sample_pdf(bins, w, 16, det=True))
    assert samples.shape == (4, 16)
    assert (samples >= 0.3).mean() > 0.9 and (samples <= 0.55).mean() > 0.9
    s2 = np.asarray(sample_pdf(bins, w, 16, key=jax.random.PRNGKey(0)))
    assert s2.shape == (4, 16)


def test_get_encoder_factory():
    from radnerf_tpu.ops import get_encoder

    enc, dim, init = get_encoder("frequency", input_dim=2, multires=10)
    assert dim == 42 and init is None
    assert enc(jnp.zeros((3, 2))).shape == (3, 42)

    enc, dim, init = get_encoder("spherical_harmonics", degree=4)
    assert dim == 16
    assert enc(jnp.zeros((3, 3))).shape == (3, 16)

    enc, dim, init = get_encoder(
        "tiledgrid", input_dim=3, num_levels=16, level_dim=2,
        base_resolution=16, log2_hashmap_size=16, desired_resolution=2048,
    )
    assert dim == 32
    table = init(jax.random.PRNGKey(0))
    assert table.shape == (903480, 2)
    assert enc(jnp.zeros((5, 3)), params=table, bound=1.0).shape == (5, 32)

    enc, dim, init = get_encoder("None", input_dim=7)
    assert dim == 7


def test_compact_samples_roundtrip():
    rng = np.random.default_rng(8)
    valid = rng.uniform(size=(16, 8)) < 0.3
    cap = 64
    gather_idx, gather_ok, scatter_pos, n_valid = compact_samples(jnp.asarray(valid), cap)
    assert int(n_valid) == valid.sum()
    vals = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
    compacted = np.where(np.asarray(gather_ok), vals.reshape(-1)[np.asarray(gather_idx)], 0.0)
    # scatter back
    restored = np.zeros((16, 8), np.float32)
    sp = np.asarray(scatter_pos)
    for n in range(16):
        for s in range(8):
            if sp[n, s] < cap:
                restored[n, s] = compacted[sp[n, s]]
    np.testing.assert_array_equal(restored[valid], vals[valid])
    # capacity overflow drops, never corrupts
    _, ok2, sp2, _ = compact_samples(jnp.asarray(valid), 4)
    assert int(np.asarray(ok2).sum()) == 4
    assert int((np.asarray(sp2) < 4).sum()) == 4


def test_mip_level_matches_frexpf():
    """_mip_level's exponent extraction is bit-exact against C frexpf
    semantics, including at exact powers of two where a log2-based
    emulation rounds wrong (VERDICT round 1, weak #6)."""
    import math

    from radnerf_tpu.ops.marching import MarchConfig, _mip_level

    cfg = MarchConfig(bound=8.0, cascade=4, grid_size=32, max_steps=16,
                      dt_gamma=0.0)
    vals = [0.0625, 0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0]
    vals += [np.nextafter(np.float32(v), np.float32(0)) for v in vals]
    vals += [np.nextafter(np.float32(v), np.float32(100)) for v in vals[:8]]
    vals += [0.3, 0.7, 1.5, 3.1, 5.9, 7.99, 1e-30]
    xs = np.asarray([[v, 0.0, 0.0] for v in vals], np.float32)
    # dt tiny so mip_from_dt never dominates
    got = np.asarray(_mip_level(jnp.asarray(xs),
                                jnp.full((len(vals),), 1e-6), cfg))
    for v, g in zip(vals, got):
        e = math.frexp(np.float32(v))[1]
        want = min(cfg.cascade - 1, max(0, e))
        assert g == want, f"mx={v!r}: got level {g}, frexpf wants {want}"


@pytest.mark.parametrize("dt_gamma", [0.0, 1.0 / 256])
def test_march_rays_cascade_matches_reference(dt_gamma):
    """bound > 1 marching (cascade 3, mip-level cell sizing + dt_max
    scaling) against the CUDA-transcription oracle."""
    H, cascade, bound, max_steps = 32, 3, 4.0, 32
    bitfield = _random_scene(11, cascade, H, occupied_frac=0.10)
    rng = np.random.default_rng(6)

    N = 24
    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -10.0
    o[:, 0] = rng.uniform(-2.5, 2.5, N)
    o[:, 1] = rng.uniform(-1.5, 1.5, N)
    d = np.zeros((N, 3), np.float32)
    d[:, 2] = 1.0
    d[:, 0] = rng.uniform(-0.3, 0.3, N)
    d[:, 1] = rng.uniform(-0.2, 0.2, N)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    aabb = jnp.array([-bound, -bound / 2, -bound, bound, bound / 2, bound])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)

    cfg = MarchConfig(bound=bound, cascade=cascade, grid_size=H,
                      max_steps=max_steps, dt_gamma=dt_gamma)
    out = march_rays(jnp.asarray(o), jnp.asarray(d), nears, fars,
                     jnp.asarray(bitfield), cfg)

    got_t = np.asarray(out["t"])
    got_dt = np.asarray(out["dt"])
    got_valid = np.asarray(out["valid"])
    got_xyz = np.asarray(out["xyz"])

    n_checked = 0
    for n in range(N):
        want = ref_march_ray(o[n], d[n], float(nears[n]), float(fars[n]),
                             bitfield, bound, cascade, H, max_steps, dt_gamma)
        n_want = len(want)
        n_checked += n_want
        assert int(got_valid[n].sum()) == n_want, f"ray {n}: sample count"
        for s, (wx, wy, wz, wdt, wt_after) in enumerate(want):
            assert got_valid[n, s]
            np.testing.assert_allclose(got_t[n, s] + got_dt[n, s], wt_after,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(got_dt[n, s], wdt, rtol=1e-5)
            np.testing.assert_allclose(got_xyz[n, s], [wx, wy, wz],
                                       rtol=1e-4, atol=2e-5)
    assert n_checked > 50  # the scene actually exercises the cascades


@pytest.mark.parametrize("cull_T", [0.0, 1e-6])
def test_march_grouped_matches_dense(cull_T):
    """Two-level grouped marching emits EXACTLY the dense marcher's sample
    set for ample group capacities (ops/marching.py:march_rays_grouped):
    coarse dilation never misses an occupied cell, the coarse cull drops
    only suffixes the fine cull drops too, and the per-ray lattice
    reproduces the dense cumsum order."""
    from radnerf_tpu.ops.marching import (
        build_coarse_rows, build_sigma_bytes, march_rays_grouped,
        pack_sigma_byte_rows,
    )

    H, max_steps = 32, 8
    cfg = MarchConfig(bound=1.0, cascade=1, grid_size=H, max_steps=max_steps,
                      dt_gamma=0.0)
    rng = np.random.default_rng(3)

    # blobby scene with rough boundary + scattered occupancy (exercises
    # dilation margins and cull accumulation)
    coords = np.asarray(morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)))
    xyz = 2.0 * coords.astype(np.float32) / (H - 1) - 1.0
    r = np.linalg.norm(xyz - np.array([0.1, 0.0, -0.1], np.float32), axis=-1)
    dens = np.where(r < 0.45, 250.0, 0.0).astype(np.float32)
    sparse = rng.random(H**3) < 0.01
    dens[sparse] = 30.0
    sigma_bytes = build_sigma_bytes(jnp.asarray(dens), 5.0)
    sigma_rows = pack_sigma_byte_rows(sigma_bytes)
    coarse_rows = build_coarse_rows(sigma_bytes, 1, H, 4)

    N = 96
    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -3.0
    o[:, 0] = rng.uniform(-0.9, 0.9, N)
    o[:, 1] = rng.uniform(-0.9, 0.9, N)
    d = np.zeros((N, 3), np.float32)
    d[:, 2] = 1.0
    d[:, 0] = rng.uniform(-0.15, 0.15, N)
    d[:, 1] = rng.uniform(-0.15, 0.15, N)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.array(
        [-1.0, -0.5, -1.0, 1.0, 0.5, 1.0]
    )
    nears, fars = near_far_from_aabb(
        jnp.asarray(o), jnp.asarray(d), aabb, 0.05
    )
    noises = jnp.asarray(rng.random(N, dtype=np.float32))
    window = (nears, fars)

    dense = march_rays(
        jnp.asarray(o), jnp.asarray(d), nears, fars, None, cfg,
        noises=noises, t_window=window, sigma_rows=sigma_rows, cull_T=cull_T,
    )
    K = cfg.n_march_iters
    Kg = -(-K // 4)
    grouped = march_rays_grouped(
        jnp.asarray(o), jnp.asarray(d), nears, fars, cfg,
        sigma_rows, coarse_rows, window, 4,
        group_capacity=max(128, -(-N * Kg // 128) * 128),  # ample
        group_slots=Kg,
        noises=noises, cull_T=cull_T,
    )

    np.testing.assert_array_equal(
        np.asarray(dense["valid"]), np.asarray(grouped["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(dense["t"]), np.asarray(grouped["t"]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dense["xyz"]), np.asarray(grouped["xyz"]),
        rtol=1e-5, atol=1e-6,
    )
    assert int(dense["valid"].sum()) > 30  # scene non-trivial
    # telemetry sane
    assert int(grouped["n_group_max"]) <= Kg
    assert int(grouped["n_groups_needed"]) > 0


def test_march_grouped_overflow_is_subset():
    """Group-capacity overflow DROPS work but never fabricates samples:
    every sample the overflowed grouped marcher emits is also in the
    ample-capacity (== dense) sample set, and telemetry reports the need."""
    from radnerf_tpu.ops.marching import (
        build_coarse_rows, build_sigma_bytes, march_rays_grouped,
        pack_sigma_byte_rows,
    )

    H, max_steps = 32, 8
    cfg = MarchConfig(bound=1.0, cascade=1, grid_size=H, max_steps=max_steps,
                      dt_gamma=0.0)
    rng = np.random.default_rng(9)
    coords = np.asarray(morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)))
    xyz = 2.0 * coords.astype(np.float32) / (H - 1) - 1.0
    dens = np.where(np.linalg.norm(xyz, axis=-1) < 0.5, 150.0, 0.0).astype(np.float32)
    sigma_bytes = build_sigma_bytes(jnp.asarray(dens), 5.0)
    sigma_rows = pack_sigma_byte_rows(sigma_bytes)
    coarse_rows = build_coarse_rows(sigma_bytes, 1, H, 4)

    N = 64
    o = np.zeros((N, 3), np.float32); o[:, 2] = -3.0
    o[:, 0] = rng.uniform(-0.5, 0.5, N); o[:, 1] = rng.uniform(-0.5, 0.5, N)
    d = np.zeros((N, 3), np.float32); d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.array([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)
    K = cfg.n_march_iters
    Kg = -(-K // 4)

    def run(cap):
        return march_rays_grouped(
            jnp.asarray(o), jnp.asarray(d), nears, fars, cfg,
            sigma_rows, coarse_rows, (nears, fars), 4,
            group_capacity=cap, group_slots=Kg, cull_T=1e-6,
        )

    ample = run(max(128, -(-N * Kg // 128) * 128))
    tiny = run(128)  # deliberately undersized
    needed = int(ample["n_groups_needed"])
    assert needed > 128  # the scene actually overflows the tiny buffer
    assert int(tiny["n_groups_needed"]) == needed  # telemetry = true need

    va, vt = np.asarray(ample["valid"]), np.asarray(tiny["valid"])
    ta, tt = np.asarray(ample["t"]), np.asarray(tiny["t"])
    for n in range(N):
        # overflow may drop a prefix ray's samples entirely or truncate,
        # but every emitted (slot-compacted) sample must exist in ample's
        emitted = tt[n][vt[n]]
        full = ta[n][va[n]]
        for v in emitted:
            assert np.isclose(full, v, rtol=0, atol=1e-5).any()


def test_march_grouped_respects_k_truncation():
    """K not a multiple of ``group`` AND truncated below the window span:
    the grouped marcher's last group must NOT emit fine steps past the
    dense marcher's K-step cutoff (marching.py fine-pass ``kf - e_k0 < K``
    mask; live since capacity sizing buckets K to multiples of 2)."""
    from radnerf_tpu.ops.marching import (
        build_coarse_rows, build_sigma_bytes, march_rays_grouped,
        pack_sigma_byte_rows,
    )

    H = 32
    # K=10 (not a multiple of group=4) truncates far below the ~33-step
    # diagonal bound; a fully-occupied field saturates every ray's orbit
    # at exactly K samples, so steps 10..11 of the third group land in
    # occupied space and would be emitted without the mask
    cfg = MarchConfig(bound=1.0, cascade=1, grid_size=H, max_steps=16,
                      dt_gamma=0.0, march_iters=10)
    rng = np.random.default_rng(11)
    dens = np.full((H**3,), 80.0, np.float32)
    sigma_bytes = build_sigma_bytes(jnp.asarray(dens), 5.0)
    sigma_rows = pack_sigma_byte_rows(sigma_bytes)
    coarse_rows = build_coarse_rows(sigma_bytes, 1, H, 4)

    N = 48
    o = np.zeros((N, 3), np.float32); o[:, 2] = -3.0
    o[:, 0] = rng.uniform(-0.3, 0.3, N); o[:, 1] = rng.uniform(-0.3, 0.3, N)
    d = np.zeros((N, 3), np.float32); d[:, 2] = 1.0
    nears, fars = near_far_from_aabb(
        jnp.asarray(o), jnp.asarray(d),
        jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]), 0.05,
    )
    K, g = cfg.n_march_iters, 4
    Kg = -(-K // g)
    assert K % g != 0

    dense = march_rays(
        jnp.asarray(o), jnp.asarray(d), nears, fars, None, cfg,
        t_window=(nears, fars), sigma_rows=sigma_rows,
    )
    grouped = march_rays_grouped(
        jnp.asarray(o), jnp.asarray(d), nears, fars, cfg,
        sigma_rows, coarse_rows, (nears, fars), g,
        group_capacity=max(128, -(-N * Kg // 128) * 128), group_slots=Kg,
    )
    # dense saturates K on these rays — the scenario where the unmasked
    # last group emitted K..K+g-1
    assert int(np.asarray(dense["valid"]).sum(axis=1).max()) == K
    np.testing.assert_array_equal(
        np.asarray(dense["valid"]), np.asarray(grouped["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(dense["t"]), np.asarray(grouped["t"]), rtol=1e-6,
        atol=1e-6,
    )


# ------------------------------------------------- round-4 hot-path invariants
def test_take_rows_matches_bracket_indexing():
    """ops.rowgather.take_rows (PROMISE_IN_BOUNDS, no clamp/fill pass) must
    agree with plain indexing for in-bounds indices — every hot-path call
    site constructs indices in range (clip/mod/min) before the fetch."""
    from radnerf_tpu.ops.rowgather import take_rows

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(size=(257, 6)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 257, size=(33, 7)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(table, idx)), np.asarray(table[idx])
    )
    # grad path (training uses take_rows on the embedding table)
    g = jax.grad(lambda t: jnp.sum(take_rows(t, idx) ** 2))(table)
    assert np.isfinite(np.asarray(g)).all()


def test_packed_table_zero_row_oob_routing():
    """build_packed_table appends one ZERO row per level and OOB points
    route to it through the gather index — including levels small enough
    to take the one-hot MXU branch (T <= 2048). Exact zeros required."""
    from radnerf_tpu.ops import build_packed_table, grid_encode01_packed

    spec = GridSpec.create(
        input_dim=2, num_levels=6, level_dim=2, base_resolution=4,
        log2_hashmap_size=16, desired_resolution=128, gridtype="tiled",
    )
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(spec.n_embeddings, 2)), jnp.float32)
    packed = build_packed_table(emb, spec)
    offs = spec.offsets
    small = [lvl.shape[0] - 1 <= 2048 for lvl in packed]
    assert any(small), "spec must exercise the one-hot branch"
    for level, lvl in enumerate(packed):
        assert lvl.shape[0] == (offs[level + 1] - offs[level]) + 1
        assert np.all(np.asarray(lvl[-1]) == 0.0)

    x = jnp.asarray(rng.uniform(0, 1, (16, 2)), jnp.float32)
    x = x.at[3].set(jnp.asarray([1.2, 0.5]))   # oob on dim 0
    x = x.at[7].set(jnp.asarray([0.5, -0.1]))  # oob on dim 1
    out = np.asarray(grid_encode01_packed(x, packed, spec))
    assert np.all(out[3] == 0.0) and np.all(out[7] == 0.0)
    assert np.all(out[[0, 1, 2, 4]] != 0.0)


def test_u16_split_gather_is_bit_exact():
    """The ray-geometry fetch reconstructs f32 from two u16 gathers
    ((hi16 << 16) | lo16, models/renderer.py). Must be bit-exact for every
    f32 pattern that can appear in ray data, including negatives, tiny
    magnitudes, and exact zeros."""
    vals = np.array(
        [0.0, -0.0, 1.0, -3.3, 1e-38, -1e-38, 3.4e38, 0.1, np.pi],
        np.float32,
    )
    rng = np.random.default_rng(2)
    w = np.concatenate(
        [vals, rng.normal(scale=10.0, size=119).astype(np.float32)]
    ).reshape(16, 8)
    wj = jnp.asarray(w)
    bits = jax.lax.bitcast_convert_type(wj, jnp.uint32)
    hi = (bits >> 16).astype(jnp.uint16)
    lo = bits.astype(jnp.uint16)
    idx = jnp.asarray(rng.permutation(16), jnp.int32)
    rec = jax.lax.bitcast_convert_type(
        (hi[idx].astype(jnp.uint32) << 16) | lo[idx].astype(jnp.uint32),
        jnp.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(rec).view(np.uint32), w[np.asarray(idx)].view(np.uint32)
    )


def test_cull_T_flag_reaches_render_config():
    from radnerf_tpu.config import Options
    from radnerf_tpu.models.renderer import RenderConfig

    assert RenderConfig.from_options(Options()).cull_T == 1e-6
    assert RenderConfig.from_options(Options(cull_T=1e-4)).cull_T == 1e-4
