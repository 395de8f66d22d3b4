"""Numeric parity of the full field against the reference network semantics.

These tests re-execute the reference ``NeRFNetwork.forward`` /
``forward_torso`` (reference nerf/network.py:222-283, 188-219) in pure
numpy — grid encoders via the literal CUDA-transcription oracle
(``ref_grid_encode``), SH/freq encoders via their kernel transcriptions,
MLPs/trunc_exp/tanh/sigmoid via numpy — on weights imported from a torch
checkpoint in the reference's exact key layout, and assert our jitted field
matches. A change to any encoder index rule, MLP wiring, concat order, or
activation breaks these tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radnerf_tpu.models import NetworkConfig
from radnerf_tpu.models.network import field_forward, forward_torso
from radnerf_tpu.train import import_torch_checkpoint

from reference_impl import (
    ref_freq_encode,
    ref_grid_encode,
    ref_mlp,
    ref_sh_encode4,
    ref_trunc_exp,
)


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from test_train import _ref_state_dict

    gen = torch.Generator().manual_seed(7)
    sd = _ref_state_dict(torch, gen, torso=True, grid=True, grid_size=32)
    path = str(tmp_path_factory.mktemp("parity") / "ref.pth")
    torch.save({"model": sd}, path)
    params, _, _ = import_torch_checkpoint(path)
    cfg = NetworkConfig(torso=True, exp_eye=True)
    return params, cfg


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_field_forward_matches_reference(imported):
    """forward(x, d, enc_a, c, e) — reference nerf/network.py:222-283."""
    params, cfg = imported
    rng = np.random.default_rng(0)
    N = 64
    x = rng.uniform(-0.95, 0.95, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    enc_a = rng.normal(size=(1, 64)).astype(np.float32)
    c = np.asarray(params["individual_codes"][0], np.float32)  # [4]
    e = np.float32(0.25)

    # ---- numpy re-execution of the reference forward
    b = cfg.bound
    x64 = x.astype(np.float64)
    enc_x = ref_grid_encode(
        (x64 + b) / (2 * b), np.asarray(params["encoder"], np.float64),
        cfg.grid_spec,
    )
    a_rep = np.repeat(enc_a.astype(np.float64), N, axis=0)
    ambient = np.tanh(
        ref_mlp(params["ambient_net"]["layers"],
                np.concatenate([enc_x, a_rep], axis=-1))
    )
    enc_w = ref_grid_encode(
        (ambient + 1.0) / 2.0,
        np.asarray(params["encoder_ambient"], np.float64), cfg.ambient_spec,
    )
    h = np.concatenate([enc_x, enc_w, np.full((N, 1), e, np.float64)], axis=-1)
    h = ref_mlp(params["sigma_net"]["layers"], h)
    sigma_ref = ref_trunc_exp(h[:, 0])
    geo = h[:, 1:]
    enc_d = ref_sh_encode4(d.astype(np.float64))
    h2 = np.concatenate([enc_d, geo, np.repeat(c[None], N, axis=0)], axis=-1)
    color_ref = _sigmoid(ref_mlp(params["color_net"]["layers"], h2))

    # ---- our jitted field on the same imported weights
    sigma, color, amb = jax.jit(
        lambda p, x, d, a, c, e: field_forward(p, cfg, x, d, a, c, e)
    )(params, jnp.asarray(x), jnp.asarray(d), jnp.asarray(enc_a),
      jnp.asarray(c), jnp.asarray([[e]]))

    np.testing.assert_allclose(np.asarray(amb), ambient, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(color), color_ref, rtol=1e-3, atol=2e-4)


def test_field_forward_no_audio_matches_reference(imported):
    """The enc_a=None branch: ambient forced to zeros, no ambient_net
    (reference network.py:233-236)."""
    params, cfg = imported
    rng = np.random.default_rng(1)
    N = 32
    x = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    b = cfg.bound
    enc_x = ref_grid_encode(
        (x.astype(np.float64) + b) / (2 * b),
        np.asarray(params["encoder"], np.float64), cfg.grid_spec,
    )
    ambient = np.zeros((N, cfg.ambient_dim), np.float64)
    enc_w = ref_grid_encode(
        (ambient + 1.0) / 2.0,
        np.asarray(params["encoder_ambient"], np.float64), cfg.ambient_spec,
    )
    h = ref_mlp(params["sigma_net"]["layers"],
                np.concatenate([enc_x, enc_w, np.full((N, 1), 0.25)], axis=-1))
    sigma_ref = ref_trunc_exp(h[:, 0])

    sigma, _, amb = field_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(d), None,
        jnp.asarray(params["individual_codes"][0]),
        jnp.asarray([[0.25]], jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(amb), 0.0)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-3, atol=1e-4)


def test_forward_torso_matches_reference(imported):
    """forward_torso(x, poses, c) — reference nerf/network.py:188-219:
    shrink 0.8, freq-encoded deform input + pose, deform MLP, clamp,
    tiledgrid-2D on the deformed coords, torso MLP, sigmoid split."""
    params, cfg = imported
    rng = np.random.default_rng(2)
    N = 64
    x = rng.uniform(-1.0, 1.0, (N, 2)).astype(np.float32)
    pose6 = rng.normal(size=(1, 6)).astype(np.float32)
    c = np.asarray(params["individual_codes_torso"][0], np.float32)  # [8]

    xs = x.astype(np.float64) * cfg.torso_shrink
    enc_pose = ref_freq_encode(pose6.astype(np.float64), 4)  # [1, 54]
    enc_x = ref_freq_encode(xs, 10)  # [N, 42]
    h = np.concatenate(
        [enc_x, np.repeat(enc_pose, N, axis=0), np.repeat(c[None], N, axis=0)],
        axis=-1,
    )
    dx_ref = ref_mlp(params["torso_deform_net"]["layers"], h)
    xp = np.clip(xs + dx_ref, -1.0, 1.0)
    enc_t = ref_grid_encode(
        (xp + 1.0) / 2.0, np.asarray(params["torso_encoder"], np.float64),
        cfg.torso_spec,
    )
    h2 = ref_mlp(params["torso_net"]["layers"],
                 np.concatenate([enc_t, h], axis=-1))
    alpha_ref = _sigmoid(h2[:, :1])
    color_ref = _sigmoid(h2[:, 1:])

    alpha, color, dx = jax.jit(
        lambda p, x, q, c: forward_torso(p, cfg, x, q, c)
    )(params, jnp.asarray(x), jnp.asarray(pose6), jnp.asarray(c))

    np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), alpha_ref, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(color), color_ref, rtol=1e-3, atol=2e-4)


def test_reference_semantics_frame_psnr(imported):
    """Full-frame PSNR against the assembled reference-semantics render
    (BASELINE.md: 'PSNR within 0.5 dB of the reference renders'; true
    pretrained-checkpoint parity is impossible here — no published weights
    ship — so the honest maximum is this numpy re-execution of the
    reference's whole pipeline on imported torch-layout weights:
    slab near/far -> kernel_march_rays_train -> NeRFNetwork.forward ->
    kernel_composite_rays_train -> torso grid_sample mask -> bg blend,
    reference_impl.ref_render_frame, every stage a literal transcription).

    The fp32 TPU render must match far inside the 0.5 dB criterion — the
    floor asserted here (>= 40 dB on [0,1] pixels, i.e. max|dI| ~ 1e-2)
    is dominated by fp32-order-of-operations and the bf16 table policy
    being OFF; measured ~60+ dB in CI. README quotes the measured value."""
    from test_train import _blob_grid
    from radnerf_tpu.data.rays import get_bg_coords, get_rays
    from radnerf_tpu.models import (
        RenderConfig, RendererState, compute_occ_bbox, render_rays,
    )
    from radnerf_tpu.models.network import encode_audio
    from radnerf_tpu.models.renderer import compute_occ_sphere
    from radnerf_tpu.ops.marching import build_sigma_bytes
    from radnerf_tpu.ops.morton import packbits

    from reference_impl import ref_render_frame

    params, cfg = imported
    H = W = 48
    rc = RenderConfig(torso=True, exp_eye=True, grid_size=32, max_steps=8,
                      dt_gamma=0.0, sample_capacity_mult=16.0,
                      ray_capacity_frac=1.0, cull_T=1e-6)

    grid = jnp.asarray(_blob_grid(32))  # [1, 32^3], values {0, 20}
    thresh = 1.0  # min(mean_density=1.0, density_thresh=10)
    rng = np.random.default_rng(5)
    torso_grid = jnp.asarray(rng.uniform(0, 0.2, (32 * 32,)), jnp.float32)
    state = RendererState.create(rc).replace(
        density_grid=grid,
        density_bitfield=packbits(grid, thresh),
        mean_density=jnp.asarray(1.0, jnp.float32),
        density_grid_torso=torso_grid,
        mean_density_torso=jnp.asarray(0.05, jnp.float32),
        occ_bbox=compute_occ_bbox(rc, grid, thresh),
        occ_sphere=compute_occ_sphere(rc, grid, thresh),
    ).with_sigma_bytes(build_sigma_bytes(grid, thresh))

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -3.3
    rays = get_rays(pose, (80.0, 80.0, W / 2, H / 2), H, W, -1)
    bg_coords = np.asarray(get_bg_coords(H, W))
    pose6 = rng.normal(size=(1, 6)).astype(np.float32)
    auds = rng.normal(size=(8, 44, 16)).astype(np.float32)
    bg_color = np.full((H * W, 3), 0.7, np.float32)
    eye = 0.25

    out, _ = jax.jit(
        lambda p, s: render_rays(
            p, cfg, rc, s, jnp.asarray(rays["rays_o"]),
            jnp.asarray(rays["rays_d"]), jnp.asarray(auds),
            jnp.asarray(bg_coords), jnp.asarray(pose6),
            jnp.asarray([[eye]], jnp.float32), jnp.zeros((), jnp.int32),
            jnp.asarray(bg_color), training=False,
        ),
        static_argnames=(),
    )(params, state)
    # nothing may be capacity-dropped, or the comparison measures drops
    cap = RenderConfig.sample_capacity(
        RenderConfig.ray_capacity(H * W, 1.0), rc.sample_capacity_mult)
    assert int(out["n_samples_needed"]) <= cap

    # the audio encoder is parity-tested separately (torch-conv
    # equivalence); the frame oracle consumes its output as given
    enc_a = np.asarray(encode_audio(params, cfg, jnp.asarray(auds)))
    ref_img, ref_ws = ref_render_frame(
        params={k: np.asarray(v) if not isinstance(v, dict) else v
                for k, v in params.items()},
        net_cfg=cfg,
        rays_o=np.asarray(rays["rays_o"]), rays_d=np.asarray(rays["rays_d"]),
        bg_coords=bg_coords, pose6=pose6, enc_a=enc_a, eye=eye,
        bg_color=bg_color,
        bitfield=np.asarray(state.density_bitfield),
        density_grid_torso=np.asarray(torso_grid),
        mean_density_torso=0.05,
        bound=1.0, min_near=rc.min_near, grid_size=32, cascade=1,
        max_steps=8, dt_gamma=0.0, T_thresh=rc.T_thresh,
        density_thresh_torso=rc.density_thresh_torso, torso=True,
    )

    img = np.asarray(out["image"], np.float64)
    assert ref_ws.max() > 0.05, "oracle head is invisible — scene broken"
    mse = float(np.mean((img - ref_img) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"\n[frame-parity] PSNR vs reference-semantics render: "
          f"{psnr:.2f} dB (max|dI| {np.abs(img - ref_img).max():.2e})")
    assert psnr >= 40.0, f"frame PSNR {psnr:.2f} dB vs reference semantics"


def test_golden_frame_anchor(tmp_path):
    """Fixed-pose full-frame golden render: a deterministic head+torso frame
    from an imported torch checkpoint. Anchors the END-TO-END numeric
    behavior (ray gen -> march -> field -> composite -> torso -> bg blend);
    any silent change to an index rule, capacity layout, or blend order
    moves these statistics."""
    torch = pytest.importorskip("torch")
    from test_train import _blob_grid, _ref_state_dict
    from radnerf_tpu.config import Options
    from radnerf_tpu.models import RenderConfig
    from radnerf_tpu.ops.morton import packbits
    from radnerf_tpu.train import Trainer

    gen = torch.Generator().manual_seed(7)
    sd = _ref_state_dict(torch, gen, torso=True, grid=True, grid_size=32)
    grid = _blob_grid(32)
    sd["density_grid"] = torch.from_numpy(grid.copy())
    sd["density_bitfield"] = torch.from_numpy(
        np.asarray(packbits(jnp.asarray(grid), 0.5)).copy()
    )
    sd["density_grid_torso"] = torch.rand(32**2, generator=gen)
    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd, "mean_density": 1.0, "mean_density_torso": 0.05},
               path)

    opt = Options(workspace=str(tmp_path / "ws"), exp_eye=True, torso=True,
                  iters=100, dt_gamma=0.0, sample_capacity_mult=2)
    rc = RenderConfig(torso=True, exp_eye=True, grid_size=32, max_steps=8,
                      dt_gamma=0.0, sample_capacity_mult=2)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr.load_checkpoint(path)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -3.3
    auds = np.random.default_rng(3).normal(size=(8, 44, 16)).astype(np.float32)
    out = tr.test_gui(pose, (100.0, 100.0, 32.0, 32.0), 64, 64, auds=auds)
    img = out["image"]

    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    np.testing.assert_allclose(float(img.mean()), 0.7251534, atol=1e-3)
    np.testing.assert_allclose(
        img.mean((0, 1)), [0.7414108, 0.7001389, 0.7339113], atol=1e-3
    )
    np.testing.assert_allclose(float(img.std()), 0.0418528, atol=1e-3)
    np.testing.assert_allclose(
        img[32, 32], [0.6230101, 0.5925164, 0.6190711], atol=2e-3
    )
    np.testing.assert_allclose(
        img[10, 50], [0.7493507, 0.7092435, 0.7245707], atol=2e-3
    )
