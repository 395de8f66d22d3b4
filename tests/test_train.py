"""End-to-end training-engine tests on a tiny synthetic on-disk dataset in
the reference's format (transforms json + gt/torso images + landmarks +
audio features + background plate)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.config import Options
from radnerf_tpu.data import TalkingHeadDataset
from radnerf_tpu.models import NetworkConfig, RenderConfig
from radnerf_tpu.train import (
    LPIPS,
    LPIPSMeter,
    PSNRMeter,
    Trainer,
    import_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)

H = W = 64
N_FRAMES = 4


def _make_pose(dist=3.3):
    """A transform_matrix whose ngp conversion has R=I, t=(0,0,-dist)
    (inverting provider.py:19-26 with scale=4)."""
    pose = np.zeros((4, 4), np.float32)
    pose[3, 3] = 1
    pose[0, :3] = [0, 0, -1]
    pose[1, :3] = [1, 0, 0]
    pose[2, :3] = [0, -1, 0]
    pose[0, 3] = -dist / 4.0  # scale=4
    return pose


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("obama_tiny")
    os.makedirs(root / "gt_imgs")
    os.makedirs(root / "torso_imgs")
    os.makedirs(root / "ori_imgs")
    rng = np.random.default_rng(0)

    frames = []
    for i in range(N_FRAMES):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(str(root / "gt_imgs" / f"{i}.jpg"), img)
        torso = (rng.uniform(0, 255, (H, W, 4))).astype(np.uint8)
        cv2.imwrite(str(root / "torso_imgs" / f"{i}.png"), torso)
        # 68 landmarks: (x=col, y=row) pairs within the frame
        lms = rng.uniform(10, 50, (68, 2))
        np.savetxt(str(root / "ori_imgs" / f"{i}.lms"), lms)
        frames.append({
            "img_id": i,
            "aud_id": i,
            "transform_matrix": _make_pose().tolist(),
        })

    cv2.imwrite(str(root / "bc.jpg"), (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8))
    np.save(str(root / "aud_eo.npy"), rng.normal(size=(N_FRAMES + 2, 16, 44)).astype(np.float32))

    transform = {"focal_len": 100.0, "cx": W / 2, "cy": H / 2, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(transform, f)
    with open(root / "transforms_val.json", "w") as f:
        json.dump(transform, f)
    return str(root)


def _opts(data_dir, tmp, **kw):
    opt = Options(path=data_dir, workspace=tmp, num_rays=512, exp_eye=True,
                  iters=100, dt_gamma=0.0, sample_capacity_mult=2, **kw)
    return opt


TINY_RC = dict(grid_size=32, max_steps=8, dt_gamma=0.0, sample_capacity_mult=2)


def test_dataset_loading(data_dir):
    opt = _opts(data_dir, "/tmp/ws_ds")
    ds = TalkingHeadDataset(opt, split="train")
    assert len(ds) == N_FRAMES
    assert ds.poses.shape == (N_FRAMES, 4, 4)
    np.testing.assert_allclose(ds.poses[0, :3, 3], [0, 0, -3.3], atol=1e-5)
    batch = ds.collate(0)
    assert batch["rays_o"].shape == (512, 3)
    assert batch["auds"].shape == (8, 44, 16)
    assert batch["images"].shape == (512, 3)
    assert batch["bg_color"].shape == (512, 3)
    assert batch["face_mask"].shape == (512,)
    assert batch["eye"].shape == (1, 1)
    assert batch["poses"].shape == (1, 6)
    # full-frame mode
    ds.training = False
    ds.num_rays = -1
    full = ds.collate(1)
    assert full["rays_o"].shape == (H * W, 3)
    assert full["images"].shape == (1, H, W, 3)


def test_trainer_head_stage(data_dir, tmp_path):
    opt = _opts(data_dir, str(tmp_path / "ws"))
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    val = TalkingHeadDataset(opt, split="val")
    val.eval_count = 1
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                 metrics=[PSNRMeter()], ema_decay=0.95, ema_update_interval=2,
                 use_tensorboard=False, mute=True)
    loss0 = None
    tr.train(ds, val, max_epochs=2)
    assert tr.global_step == 2 * N_FRAMES
    assert len(tr.stats["loss"]) == 2
    loss0 = tr.stats["loss"][0]
    assert np.isfinite(loss0)
    # checkpoints written
    assert os.path.exists(tmp_path / "ws" / "checkpoints" / "ngp_ep0002.npz")
    assert os.path.exists(tmp_path / "ws" / "checkpoints" / "ngp.npz")  # best

    # resume restores step counters
    tr2 = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                  use_checkpoint="latest", use_tensorboard=False, mute=True)
    assert tr2.epoch == 2 and tr2.global_step == 2 * N_FRAMES

    # grid state advanced
    assert float(tr.state.mean_density) > 0


def test_trainer_torso_stage(data_dir, tmp_path):
    opt = _opts(data_dir, str(tmp_path / "ws_t"), torso=True)
    rc = RenderConfig(torso=True, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_t"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    head_before = jax.tree_util.tree_leaves(tr.params["sigma_net"])[0].copy()
    torso_before = jax.tree_util.tree_leaves(tr.params["torso_net"])[0].copy()
    tr.train_gui(ds, step=4)
    head_after = jax.tree_util.tree_leaves(tr.params["sigma_net"])[0]
    torso_after = jax.tree_util.tree_leaves(tr.params["torso_net"])[0]
    # head frozen, torso trains (main.py:142-157 freeze semantics)
    np.testing.assert_array_equal(np.asarray(head_before), np.asarray(head_after))
    assert bool(jnp.any(torso_before != torso_after))
    assert float(tr.state.mean_density_torso) > 0


def test_trainer_test_video(data_dir, tmp_path):
    opt = _opts(data_dir, str(tmp_path / "ws_v"))
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="val")
    ds.training = False
    ds.num_rays = -1
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_v"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    # occupancy so something renders
    tr.state = tr.state.replace(
        density_bitfield=jnp.full_like(tr.state.density_bitfield, 255),
    ).with_sigma_bytes(jnp.full_like(tr.state.sigma_bytes, 168))
    fps = tr.test(ds, save_path=str(tmp_path / "out"), write_image=True)
    assert fps > 0
    outs = os.listdir(tmp_path / "out")
    assert any(o.endswith("_rgb.png") for o in outs)

    # interactive free-viewpoint render
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -3.3
    out = tr.test_gui(pose, (100.0, 100.0, 32.0, 32.0), 64, 64,
                      auds=ds.collate(0)["auds"])
    assert out["image"].shape == (64, 64, 3)


def test_checkpoint_roundtrip(tmp_path):
    cfg = NetworkConfig(torso=True)
    from radnerf_tpu.models import RendererState, init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    rc = RenderConfig(torso=True, **TINY_RC)
    state = RendererState.create(rc)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, state, meta={"epoch": 3, "global_step": 77})
    p2, s2, _, _, meta = load_checkpoint(path)
    assert meta["epoch"] == 3
    for k in params:
        a = jax.tree_util.tree_leaves(params[k])
        b = jax.tree_util.tree_leaves(p2[k])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert "density_grid" in s2
    # best-style: grid dropped
    save_checkpoint(path, params, state, meta={}, include_grid=False)
    _, s3, _, _, _ = load_checkpoint(path)
    assert "density_grid" not in s3


def test_checkpoint_strips_packed_caches(tmp_path):
    """Saving params that carry the bf16 ``_packed_*`` eval caches (as
    Trainer.save_checkpoint(best=True) does via _eval_params) must not
    write them: np.savez round-trips bfloat16 as a void '|V2' dtype that
    broke every later load (the round-4 quality-harness torso stage died
    on exactly this), and a stale packed table from disk would silently
    shadow retrained embeddings."""
    from radnerf_tpu.models import RendererState, init_params
    from radnerf_tpu.models.network import precompute_packed_tables

    cfg = NetworkConfig(torso=True, compute_dtype="bfloat16")
    params = precompute_packed_tables(
        init_params(jax.random.PRNGKey(0), cfg), cfg)
    assert "_packed_encoder" in params  # the hazard exists
    rc = RenderConfig(torso=True, **TINY_RC)
    state = RendererState.create(rc)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, state, meta={})
    raw = np.load(path)
    assert not any("/_" in k for k in raw.files)
    p2, _, _, _, _ = load_checkpoint(path)
    assert not any(k.startswith("_") for k in p2)

    # loader side: checkpoints written BEFORE the save-side strip (packed
    # caches present as void bf16) must still load, dropping the caches
    import ml_dtypes

    flat = dict(np.load(path).items())
    flat["model/_packed_encoder/0"] = np.zeros(
        (4, 16), ml_dtypes.bfloat16).view(np.dtype("V2"))
    np.savez(path, **flat)
    p3, _, _, _, _ = load_checkpoint(path)
    assert "_packed_encoder" not in p3
    np.testing.assert_array_equal(
        np.asarray(p3["sigma_net"]["layers"][0]["w"]),
        np.asarray(params["sigma_net"]["layers"][0]["w"]))


def _ref_state_dict(torch, gen, torso=True, grid=True, grid_size=128):
    """Synthetic torch state_dict in the reference's exact key layout
    (network.py:91-167 module names, renderer.py:88-127 buffers)."""

    def lin(i, o, bias=True):
        d = {"weight": torch.randn(o, i, generator=gen) * 0.1}
        if bias:
            d["bias"] = torch.randn(o, generator=gen) * 0.1
        return d

    def conv(i, o, k):
        return {"weight": torch.randn(o, i, k, generator=gen) * 0.1,
                "bias": torch.randn(o, generator=gen) * 0.1}

    sd = {}
    for j, (ci, co) in enumerate([(44, 32), (32, 32), (32, 64), (64, 64)]):
        for n, v in conv(ci, co, 3).items():
            sd[f"audio_net.encoder_conv.{j*2}.{n}"] = v
    for j, (ci, co) in enumerate([(64, 64), (64, 64)]):
        for n, v in lin(ci, co).items():
            sd[f"audio_net.encoder_fc1.{j*2}.{n}"] = v
    for j, (ci, co) in enumerate([(64, 16), (16, 8), (8, 4), (4, 2), (2, 1)]):
        for n, v in conv(ci, co, 3).items():
            sd[f"audio_att_net.attentionConvNet.{j*2}.{n}"] = v
    for n, v in lin(8, 8).items():
        sd[f"audio_att_net.attentionNet.0.{n}"] = v
    sd["encoder.embeddings"] = torch.randn(903480, 2, generator=gen) * 1e-4
    sd["encoder_ambient.embeddings"] = torch.randn(555520, 2, generator=gen) * 1e-4
    for name, dims in [
        ("ambient_net", [(96, 64), (64, 64), (64, 2)]),
        ("sigma_net", [(65, 64), (64, 64), (64, 65)]),
        ("color_net", [(84, 64), (64, 3)]),
    ]:
        for j, (ci, co) in enumerate(dims):
            sd[f"{name}.net.{j}.weight"] = lin(ci, co, False)["weight"]
    sd["individual_codes"] = torch.randn(10000, 4, generator=gen) * 0.1
    if torso:
        sd["torso_encoder.embeddings"] = torch.randn(555520, 2, generator=gen) * 1e-4
        for name, dims in [
            ("torso_deform_net", [(104, 64), (64, 64), (64, 2)]),
            ("torso_net", [(136, 32), (32, 32), (32, 4)]),
        ]:
            for j, (ci, co) in enumerate(dims):
                sd[f"{name}.net.{j}.weight"] = lin(ci, co, False)["weight"]
        sd["individual_codes_torso"] = torch.randn(10000, 8, generator=gen) * 0.1
        sd["density_grid_torso"] = torch.rand(grid_size**2)
    if grid:
        sd["density_grid"] = torch.rand(1, grid_size**3)
    sd["density_bitfield"] = torch.randint(
        0, 256, (grid_size**3 // 8,), dtype=torch.uint8
    )
    return sd


def test_torch_checkpoint_import(tmp_path):
    """Build a synthetic torch state_dict in the reference's exact key layout
    (network.py:91-167) and verify functional equivalence after import."""
    torch = pytest.importorskip("torch")

    gen = torch.Generator().manual_seed(0)
    sd = _ref_state_dict(torch, gen, torso=True, grid=True, grid_size=128)

    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd, "epoch": 5, "global_step": 1234,
                "mean_density": 1.5, "mean_density_torso": 0.2}, path)

    params, state, meta = import_torch_checkpoint(path)
    assert meta["global_step"] == 1234 and meta["mean_density"] == 1.5
    assert params["encoder"].shape == (903480, 2)
    assert "density_grid" in state

    # functional check: torch audio_net forward == jax audio_net forward
    from radnerf_tpu.models.audio import audio_net_apply

    x = torch.randn(8, 44, 16, generator=gen)
    with torch.no_grad():
        h = x
        convs = [torch.nn.Conv1d(44, 32, 3, 2, 1), torch.nn.Conv1d(32, 32, 3, 2, 1),
                 torch.nn.Conv1d(32, 64, 3, 2, 1), torch.nn.Conv1d(64, 64, 3, 2, 1)]
        for j, c in enumerate(convs):
            c.weight.copy_(sd[f"audio_net.encoder_conv.{j*2}.weight"])
            c.bias.copy_(sd[f"audio_net.encoder_conv.{j*2}.bias"])
            h = torch.nn.functional.leaky_relu(c(h), 0.02)
        h = h.squeeze(-1)
        fc1 = torch.nn.Linear(64, 64)
        fc1.weight.copy_(sd["audio_net.encoder_fc1.0.weight"])
        fc1.bias.copy_(sd["audio_net.encoder_fc1.0.bias"])
        fc2 = torch.nn.Linear(64, 64)
        fc2.weight.copy_(sd["audio_net.encoder_fc1.2.weight"])
        fc2.bias.copy_(sd["audio_net.encoder_fc1.2.bias"])
        want = fc2(torch.nn.functional.leaky_relu(fc1(h), 0.02)).numpy()

    got = np.asarray(audio_net_apply(params["audio_net"], jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _render_probe(tr, n_rays=256):
    """Render a fixed bundle of rays through the trainer's current state."""
    from radnerf_tpu.models import render_rays

    rng = np.random.default_rng(0)
    rays_o = np.tile(np.array([[0.0, 0.0, -3.3]], np.float32), (n_rays, 1))
    d = np.concatenate(
        [rng.uniform(-0.12, 0.12, (n_rays, 2)), np.ones((n_rays, 1))], -1
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    results, _ = render_rays(
        tr.params, tr.net_cfg, tr.render_cfg, tr.state,
        jnp.asarray(rays_o), jnp.asarray(d, jnp.float32),
        jnp.asarray(rng.normal(size=(8, 44, 16)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (n_rays, 2)), jnp.float32),
        jnp.zeros((1, 6), jnp.float32),
        jnp.full((1, 1), 0.25, jnp.float32) if tr.net_cfg.exp_eye else None,
        jnp.zeros((), jnp.int32),
        jnp.full((n_rays, 3), 0.5, jnp.float32),
        training=True,  # training mode returns weights_sum (the emptiness probe)
    )
    return {k: np.asarray(v) for k, v in results.items()}


def _blob_grid(grid_size, radius=0.45, value=20.0):
    """Morton-ordered [1, H^3] density grid: a sphere of ``value``."""
    from radnerf_tpu.ops.morton import morton3d_invert

    H = grid_size
    coords = np.asarray(morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)))
    world = (2.0 * (coords + 0.5) / H - 1.0)
    occ = np.linalg.norm(world, axis=-1) < radius
    return (occ[None].astype(np.float32) * value)


def test_gridless_pth_checkpoint_renders(tmp_path):
    """Reference best-style .pth (density_bitfield kept, density_grid
    DELETED, nerf/utils.py:1353-1355) must render a non-empty frame: the
    loader synthesizes sigma_bytes + occ windows from the bitfield."""
    torch = pytest.importorskip("torch")
    from radnerf_tpu.ops.morton import packbits

    opt = Options(workspace=str(tmp_path / "ws"), exp_eye=True, iters=100,
                  dt_gamma=0.0, sample_capacity_mult=2)
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")

    gen = torch.Generator().manual_seed(1)
    sd = _ref_state_dict(torch, gen, torso=False, grid=False,
                         grid_size=rc.grid_size)
    grid = _blob_grid(rc.grid_size)
    sd["density_bitfield"] = torch.from_numpy(
        np.asarray(packbits(jnp.asarray(grid), 0.5))
    )
    path = str(tmp_path / "best.pth")
    torch.save({"model": sd, "epoch": 9, "global_step": 200000,
                "mean_density": 4.2, "mean_density_torso": 0.0}, path)

    tr.load_checkpoint(path)

    # sigma_bytes synthesized: occupied bit + MINIMUM sigma code (no cull)
    sb = np.asarray(tr.state.sigma_bytes)
    occ = grid.reshape(-1) > 0.5
    assert np.array_equal(sb[occ], np.full(occ.sum(), 129, np.uint8))
    assert np.array_equal(sb[~occ], np.zeros((~occ).sum(), np.uint8))
    # occ windows derived from the bitfield (tight, not the full-box fallback)
    sphere = np.asarray(tr.state.occ_sphere)
    assert sphere[3] < 0.7 * np.sqrt(3.0) * rc.bound
    # and the frame is NOT empty: rays accumulate weight and the image
    # departs from the 0.5 background (the bug mode composites nothing and
    # renders background-only frames: weights_sum identically 0)
    res = _render_probe(tr)
    assert res["weights_sum"].max() > 1e-3
    assert np.abs(res["image"] - 0.5).max() > 1e-4
    assert np.isfinite(res["image"]).all()


def test_gridless_best_npz_roundtrip(tmp_path):
    """Native best-style checkpoints (include_grid=False) restore the exact
    acceleration state (sigma_bytes saved) and render identically."""
    opt = Options(workspace=str(tmp_path / "ws"), exp_eye=True, iters=100,
                  dt_gamma=0.0, sample_capacity_mult=2)
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    grid = _blob_grid(rc.grid_size)
    from radnerf_tpu.ops.morton import packbits

    tr._apply_state_arrays(
        {"density_grid": grid,
         "density_bitfield": np.asarray(packbits(jnp.asarray(grid), 0.5))},
        {"mean_density": 1.0},
    )
    res1 = _render_probe(tr)
    assert res1["weights_sum"].max() > 1e-3

    path = str(tmp_path / "best.npz")
    save_checkpoint(path, tr.params, tr.state, meta={"mean_density": 1.0},
                    include_grid=False)

    tr2 = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws2"),
                  use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr2.load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(tr.state.sigma_bytes), np.asarray(tr2.state.sigma_bytes)
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.occ_sphere), np.asarray(tr2.state.occ_sphere)
    )
    res2 = _render_probe(tr2)
    np.testing.assert_allclose(res2["image"], res1["image"], atol=1e-5)


def test_optimizer_state_restore(data_dir, tmp_path):
    """Resuming from a full checkpoint restores Adam moments and the LR
    schedule's internal step (the reference restores optimizer + scheduler
    state, nerf/utils.py:1406-1419)."""
    opt = _opts(data_dir, str(tmp_path / "ws"))
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    val = TalkingHeadDataset(opt, split="val")
    val.eval_count = 1
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr.train(ds, val, max_epochs=1)  # saves a full checkpoint per epoch

    tr2 = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws"),
                  use_tensorboard=False, mute=True, use_checkpoint="latest")
    assert tr2.global_step == tr.global_step > 0

    leaves1 = jax.tree_util.tree_leaves(tr.opt_state)
    leaves2 = jax.tree_util.tree_leaves(tr2.opt_state)
    assert len(leaves1) == len(leaves2) > 0
    some_nonzero = False
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        if np.asarray(a).size and np.any(np.asarray(a) != 0):
            some_nonzero = True
    assert some_nonzero  # moments/steps actually moved and were restored


def test_training_converges(data_dir, tmp_path):
    """Overfit smoke test: loss should drop substantially on a tiny dataset
    (the reference's only functional check is end-to-end training quality)."""
    opt = _opts(data_dir, str(tmp_path / "ws_c"))
    opt.num_rays = 1024
    opt.iters = 64
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_c"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    first = tr.train_gui(ds, step=8)["loss"]
    for _ in range(6):
        last = tr.train_gui(ds, step=8)["loss"]
    assert np.isfinite(last)
    # 64 steps is a smoke test, not a fit: the loss must move monotonically
    # downward (the reference's recipes run 200k steps)
    assert last < first * 0.99, f"no convergence: first={first}, last={last}"


def test_train_camera_path(data_dir, tmp_path):
    opt = _opts(data_dir, str(tmp_path / "ws_cam"), train_camera=True)
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_cam"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    assert "camera_dT" in tr.params
    before = np.asarray(tr.params["camera_dT"]).copy()
    tr.train_gui(ds, step=4)
    after = np.asarray(tr.params["camera_dT"])
    assert np.isfinite(after).all()
    assert not np.array_equal(before, after)  # camera offsets receive grads


def test_lpips_and_psnr():
    a = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1)
    psnr = PSNRMeter()
    psnr.update(a, a)
    assert psnr.measure() > 100
    lp = LPIPSMeter()
    lp.update(a, b)
    d_ab = lp.measure()
    lp.clear()
    lp.update(a, a)
    assert lp.measure() < 1e-6 < d_ab

    # differentiable perceptual loss
    fn = LPIPS().loss_fn()
    g = jax.grad(lambda x: jnp.sum(fn(x, jnp.asarray(b)[None])))(jnp.asarray(a)[None])
    assert bool(jnp.any(g != 0))


def test_lmd_meter_fake_predictor():
    """LMD update/measure with an injected landmark predictor (the real
    face_alignment model is gated; reference nerf/utils.py:475-567)."""
    from radnerf_tpu.train.metrics import LMDMeter

    base = np.stack(
        [np.arange(68, dtype=np.float32), np.arange(68, dtype=np.float32) * 2],
        axis=1,
    )  # [68, 2]

    class FakePredictor:
        def get_landmarks(self, img):
            # scale landmarks by the (uint8) image mean so pred != truth
            s = 1.0 + float(np.asarray(img).mean()) / 255.0
            return [base * s]

    m = LMDMeter(predictor=FakePredictor())
    pred = np.zeros((16, 16, 3), np.float32)
    truth = np.ones((16, 16, 3), np.float32)
    m.update(pred, truth)
    # expected: centered landmarks scaled by s_pred=1.0 vs s_true=2.0,
    # mouth region points 48:68
    c = base - base.mean(0)
    expected = float(np.linalg.norm(c[48:68] * 1.0 - c[48:68] * 2.0, axis=-1).mean())
    np.testing.assert_allclose(m.measure(), expected, rtol=1e-5)
    assert "LMD" in m.report()
    m.clear()
    m.update(pred, pred)
    assert m.measure() < 1e-6

    # without a predictor and without face_alignment installed, construction
    # raises ImportError (main.py catches any failure and skips the metric)
    import importlib.util

    if importlib.util.find_spec("face_alignment") is None:
        import pytest as _pytest

        with _pytest.raises(ImportError):
            LMDMeter()


def test_color_space_linear(data_dir, tmp_path):
    """color_space='linear': the train step fits linearized GT
    (utils.py:736-737) and display paths srgb-encode predictions
    (:952-953, 1088-1089)."""
    from radnerf_tpu.data.rays import get_audio_features
    from radnerf_tpu.utils.color import linear_to_srgb

    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    opt_s = _opts(data_dir, str(tmp_path / "ws_cs"))
    opt_l = _opts(data_dir, str(tmp_path / "ws_cl"), color_space="linear")
    ds = TalkingHeadDataset(opt_s, split="train")
    tr_s = Trainer("ngp", opt_s, render_cfg=rc, workspace=str(tmp_path / "ws_cs"),
                   use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr_l = Trainer("ngp", opt_l, render_cfg=rc, workspace=str(tmp_path / "ws_cl"),
                   use_tensorboard=False, mute=True, use_checkpoint="scratch")

    # same seed -> identical initial params; the same batch must produce a
    # DIFFERENT loss because linear mode linearizes the GT inside the step
    batch = tr_s._to_device(ds.collate(0))
    sig = ("none", None, batch["rays_o"].shape[0])
    key = jax.random.PRNGKey(7)
    gs = jnp.asarray(1.0, jnp.float32)
    loss_s = tr_s._get_train_step(sig)(
        tr_s.params, tr_s.opt_state, tr_s.state, batch, gs, key)[3]
    loss_l = tr_l._get_train_step(sig)(
        tr_l.params, tr_l.opt_state, tr_l.state, batch, gs, key)[3]
    assert np.isfinite(float(loss_s)) and np.isfinite(float(loss_l))
    assert abs(float(loss_s) - float(loss_l)) > 1e-6

    # display path: identical params/state, flipping the flag must encode
    # the linear prediction with linear_to_srgb (exact functional relation)
    pose = np.asarray(ds.poses[0])
    auds = get_audio_features(ds.auds, opt_s.att, 0)
    out_srgb = tr_s.test_gui(pose, ds.intrinsics, W, H, auds=auds)
    tr_s.opt.color_space = "linear"
    out_lin = tr_s.test_gui(pose, ds.intrinsics, W, H, auds=auds)
    np.testing.assert_allclose(
        out_lin["image"],
        np.asarray(linear_to_srgb(np.clip(out_srgb["image"], 0.0, 1.0))),
        atol=1e-5,
    )


def test_test_gui_downscale_upsamples(data_dir, tmp_path):
    """test_gui renders at `downscale` resolution but returns full (H, W)
    frames (reference nerf/utils.py:1085)."""
    from radnerf_tpu.data.rays import get_audio_features

    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    opt = _opts(data_dir, str(tmp_path / "ws_dsg"))
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_dsg"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    pose = np.asarray(ds.poses[0])
    auds = get_audio_features(ds.auds, opt.att, 0)
    out = tr.test_gui(pose, ds.intrinsics, W, H, auds=auds, downscale=0.5)
    assert out["image"].shape == (H, W, 3)
    assert out["depth"].shape == (H, W)


def test_torso_stage_from_head_checkpoint(data_dir, tmp_path):
    """The full 3-stage golden path: head train (with EMA) -> save -> torso
    trainer imports + freezes the head ckpt -> train -> eval. Regression for
    the EMA-tree replacement bug (a head-stage checkpoint's EMA lacks torso
    keys and must MERGE into the torso trainer's EMA)."""
    opt_h = _opts(data_dir, str(tmp_path / "h"))
    rc_h = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt_h, split="train")
    val = TalkingHeadDataset(opt_h, split="val")
    val.eval_count = 1
    tr_h = Trainer("ngp", opt_h, render_cfg=rc_h, workspace=str(tmp_path / "h"),
                   ema_decay=0.95, ema_update_interval=1,
                   use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr_h.train(ds, val, max_epochs=1)
    head_ckpt = str(tmp_path / "h" / "checkpoints" / "ngp_ep0001.npz")
    assert os.path.exists(head_ckpt)

    opt_t = _opts(data_dir, str(tmp_path / "t"), torso=True)
    rc_t = RenderConfig(torso=True, exp_eye=True, **TINY_RC)
    ds_t = TalkingHeadDataset(opt_t, split="train")
    tr_t = Trainer("ngp", opt_t, render_cfg=rc_t, workspace=str(tmp_path / "t"),
                   ema_decay=0.95, use_tensorboard=False, mute=True,
                   use_checkpoint="scratch")
    tr_t.freeze_loaded_head(head_ckpt)
    # EMA tree must still contain the torso groups after the import
    assert "individual_codes_torso" in tr_t.ema_params
    assert "torso_net" in tr_t.ema_params
    tr_t.train_gui(ds_t, step=2)
    # eval path uses EMA params; must render without KeyError
    ds_t.training = False
    ds_t.num_rays = -1
    batch = tr_t._to_device(ds_t.collate(0))
    pred, _ = tr_t.eval_step(batch)
    assert np.isfinite(pred).all()

    # missing head ckpt -> clear error
    with pytest.raises(FileNotFoundError, match="head_ckpt"):
        tr_t.freeze_loaded_head(str(tmp_path / "nope.npz"))


def test_adaptive_capacities(data_dir, tmp_path):
    """_adapt_capacities resizes ray/sample capacities to measured occupancy
    (the mean_count analogue) and invalidates the jit caches."""
    opt = _opts(data_dir, str(tmp_path / "ws_a"))
    kw = {**TINY_RC, "sample_capacity_mult": 4}
    rc = RenderConfig(torso=False, exp_eye=True, ray_capacity_frac=0.5, **kw)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_a"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr._train_step_fn["sentinel"] = object()

    # hits near capacity -> frac grows
    n_rays = 1024
    tr._adapt_capacities(np.array([600, 1000]), n_rays)  # hits 600/1024 > .85*512
    assert tr.render_cfg.ray_capacity_frac > 0.5
    assert "sentinel" not in tr._train_step_fn  # caches invalidated

    # sparse scene -> both shrink
    kw8 = {**TINY_RC, "sample_capacity_mult": 8}
    tr.render_cfg = RenderConfig(torso=False, exp_eye=True,
                                 ray_capacity_frac=1.0, **kw8)
    tr._adapt_capacities(np.array([64, 128]), n_rays)
    assert tr.render_cfg.ray_capacity_frac < 1.0
    assert tr.render_cfg.sample_capacity_mult < 8

    # capacities never under-provision the measured demand
    R = max(128, int(-(-n_rays * tr.render_cfg.ray_capacity_frac // 128)) * 128)
    assert R >= 64 * 1.2
    assert tr.render_cfg.sample_capacity_mult * R >= 128


def test_trainer_march_group_training(data_dir, tmp_path):
    """march_group now TRAINS: the stats stack carries group telemetry
    (n_groups_needed / n_group_max, zeros when grouping is off) and
    _adapt_capacities resizes the group buffers from it. Replaces the
    round-3 loud reject: the grouped marcher measured a 1.47x frame win on
    a genuinely sparse scene (scripts/bench_march_group.py 36.2 vs 53.1
    ms/frame, PERFORMANCE.md), so training must adapt its capacities the
    same way it does ray/sample capacities instead of refusing."""
    opt = _opts(data_dir, str(tmp_path))
    rc = RenderConfig(torso=False, exp_eye=True, march_group=True,
                      march_group_mult=2.0, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    out = tr.train_gui(ds, step=2)
    assert np.isfinite(out["loss"])

    # overflow telemetry reaches the sizing rules: a stats stack showing
    # group overflow must GROW the group capacities (no silent drops)
    from radnerf_tpu.train.capacity import ray_capacity

    R = ray_capacity(opt.num_rays, tr.render_cfg.ray_capacity_frac)
    G_cap = RenderConfig.sample_capacity(R, tr.render_cfg.march_group_mult)
    stats = np.asarray([R // 2, 64, 4, 8, G_cap * 2, 16], np.int64)
    tr._adapt_capacities(stats, n_rays=opt.num_rays)
    assert (RenderConfig.sample_capacity(
        ray_capacity(opt.num_rays, tr.render_cfg.ray_capacity_frac),
        tr.render_cfg.march_group_mult) >= G_cap * 2), (
        "group overflow telemetry did not grow march_group_mult")


def test_checkpoint_persists_render_capacities(data_dir, tmp_path):
    """Adapted capacities + march lattice survive a checkpoint roundtrip:
    a fresh Trainer would otherwise render with DEFAULT capacities, which on
    a converged scene silently drops >half the needed samples (measured:
    15 dB instead of 32 dB on the quality-harness scene) and changes the
    quadrature (march_iters/sample_slots) the field was trained with."""
    import dataclasses

    opt = _opts(data_dir, str(tmp_path / "ws_c"))
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_c"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr.render_cfg = dataclasses.replace(
        tr.render_cfg, ray_capacity_frac=1.0, sample_capacity_mult=18.0,
        march_iters=80, sample_slots=16,
    )
    tr.epoch = 1
    tr.save_checkpoint(full=True)

    tr2 = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_c"),
                  use_tensorboard=False, mute=True, use_checkpoint="latest")
    assert tr2.render_cfg.ray_capacity_frac == 1.0
    assert tr2.render_cfg.sample_capacity_mult == 18.0
    assert tr2.render_cfg.march_iters == 80
    assert tr2.render_cfg.sample_slots == 16
    # non-capacity fields still come from the constructor config
    assert tr2.render_cfg.grid_size == rc.grid_size

    # model_only loads (freeze_loaded_head) must NOT clobber capacities a
    # trainer already restored from its OWN checkpoint: a resumed torso
    # trainer carries its adapted torso_capacity_frac, and the head
    # checkpoint's stale value would silently drop torso work on resume.
    head_ws = tmp_path / "ws_head"
    opt_h = _opts(data_dir, str(head_ws))
    tr_h = Trainer("ngp", opt_h, render_cfg=rc, workspace=str(head_ws),
                   use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr_h.epoch = 1
    tr_h.save_checkpoint(full=False)  # default torso_capacity_frac in meta
    head_ckpt = tr_h.stats["checkpoints"][-1]

    tr3 = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_c"),
                  use_tensorboard=False, mute=True, use_checkpoint="latest")
    assert tr3._cap_restored
    tr3.freeze_loaded_head(head_ckpt)
    assert tr3.render_cfg.sample_capacity_mult == 18.0  # not clobbered

    # ... but a FRESH torso trainer (no checkpoint of its own) does adopt
    # the head checkpoint's trained capacities
    tr4 = Trainer("ngp", opt_h, render_cfg=rc,
                  workspace=str(tmp_path / "ws_fresh"),
                  use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr4.freeze_loaded_head(
        os.path.join(str(tmp_path / "ws_c"), "checkpoints",
                     os.path.basename(tr.stats["checkpoints"][-1]))
    )
    assert tr4.render_cfg.sample_capacity_mult == 18.0


def test_cap_overrides_by_provenance(data_dir, tmp_path):
    """The capacity-restore opt-out is PROVENANCE-based: only capacity
    fields the user explicitly set (CLI flags recorded in
    Options.cap_overrides by main.py, or Trainer(cap_overrides=...)) win
    over a checkpoint's trained capacities. A constructor-supplied custom
    RenderConfig alone is a starting config, NOT an override — the round-4
    diff-against-dataclass-defaults heuristic silently skipped restoring
    trained capacities for every custom config (red at round-4 HEAD)."""
    import dataclasses

    ws = str(tmp_path / "ws_o")
    opt = _opts(data_dir, ws)
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=ws,
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr.render_cfg = dataclasses.replace(
        tr.render_cfg, sample_capacity_mult=18.0, march_iters=80)
    tr.epoch = 1
    tr.save_checkpoint(full=True)

    # explicit constructor override: that field keeps the constructor value,
    # every other capacity still restores from checkpoint meta
    rc2 = dataclasses.replace(rc, sample_capacity_mult=6.0)
    tr2 = Trainer("ngp", opt, render_cfg=rc2, workspace=ws,
                  use_tensorboard=False, mute=True, use_checkpoint="latest",
                  cap_overrides=("sample_capacity_mult",))
    assert tr2.render_cfg.sample_capacity_mult == 6.0  # override wins
    assert tr2.render_cfg.march_iters == 80  # non-overridden field restores

    # CLI provenance path: Options.cap_overrides (as main.options_from_args
    # records for flags actually typed) has the same effect
    opt3 = _opts(data_dir, ws)
    opt3.cap_overrides = ("sample_capacity_mult",)
    tr3 = Trainer("ngp", opt3, render_cfg=rc2, workspace=ws,
                  use_tensorboard=False, mute=True, use_checkpoint="latest")
    assert tr3.render_cfg.sample_capacity_mult == 6.0
    assert tr3.render_cfg.march_iters == 80

    # typos in override names fail loudly, not silently
    with pytest.raises(ValueError):
        Trainer("ngp", opt, render_cfg=rc, workspace=ws,
                use_tensorboard=False, mute=True, use_checkpoint="scratch",
                cap_overrides=("sample_capacity_multt",))


def test_grid_shape_checkpoint_identity(data_dir, tmp_path):
    """The grid shape (grid_levels x grid_ch) is part of the model identity:
    training at the TPU fast shape (8x4) works end to end, checkpoints embed
    the shape, and restoring into a differently-shaped trainer fails LOUDLY
    instead of merging mismatched embedding tables."""
    ws = str(tmp_path / "ws_g")
    opt = _opts(data_dir, ws)
    opt.grid_levels, opt.grid_ch = 8, 4
    tr = Trainer("ngp", opt, workspace=ws, use_tensorboard=False, mute=True,
                 use_checkpoint="scratch")
    assert tr.net_cfg.grid_spec.output_dim == 32  # same feature width
    out = tr.train_gui(TalkingHeadDataset(opt, split="train"), step=1)
    assert np.isfinite(out["loss"])
    tr.epoch = 1
    tr.save_checkpoint(full=False)

    # same-shape restore works
    tr2 = Trainer("ngp", opt, workspace=ws, use_tensorboard=False, mute=True,
                  use_checkpoint="latest")
    assert tr2.epoch == 1

    # wrong-shape restore is a hard error naming the fix
    opt16 = _opts(data_dir, ws)
    with pytest.raises(ValueError, match="grid shape"):
        Trainer("ngp", opt16, workspace=ws, use_tensorboard=False, mute=True,
                use_checkpoint="latest")

    # the coarsest resolution (--grid_base) is model identity too: same
    # levels x ch at a different base has different table sizes and must
    # also fail loudly (8 levels from base 32 densifies the level spectrum
    # — per-level scale 1.81 vs 2.0 — the round-5 quality-recovery knob)
    optb = _opts(data_dir, ws)
    optb.grid_levels, optb.grid_ch, optb.grid_base = 8, 4, 32
    from radnerf_tpu.models.network import NetworkConfig
    spec32 = NetworkConfig.from_options(optb).grid_spec
    assert spec32.output_dim == 32
    assert spec32.base_resolution == 32  # base respected
    assert spec32.per_level_scale < 2.0  # denser spectrum over 32->2048
    with pytest.raises(ValueError, match="grid shape"):
        Trainer("ngp", optb, workspace=ws, use_tensorboard=False, mute=True,
                use_checkpoint="latest")


def test_asymmetric_amb_grid_checkpoint_identity(data_dir, tmp_path):
    """The asymmetric 2-D grid (--amb_grid_*: ambient+torso encoders shaped
    independently of the quality-bearing spatial grid) trains end to end, is
    embedded in the checkpoint identity (6-element grid_shape), restores
    into a matching trainer, and fails loudly on any mismatch."""
    from radnerf_tpu.models.network import NetworkConfig

    ws = str(tmp_path / "ws_amb")
    opt = _opts(data_dir, ws)
    opt.amb_grid_levels, opt.amb_grid_ch, opt.amb_grid_base = 8, 4, 32
    cfg = NetworkConfig.from_options(opt)
    # spatial grid untouched; 2-D grids take the override; feature width kept
    assert cfg.grid_spec.num_levels == 16 and cfg.grid_spec.level_dim == 2
    assert cfg.ambient_spec.num_levels == 8 and cfg.ambient_spec.level_dim == 4
    assert cfg.ambient_spec.base_resolution == 32
    assert cfg.torso_spec.num_levels == 8  # torso shares the 2-D shape
    assert cfg.ambient_spec.output_dim == 32

    # the complementary asymmetry — fast 3-D spatial grid, reference-shape
    # 2-D grids (spatial 8x4 + ambient 16x2) — shapes independently too
    opt_sp = _opts(data_dir, str(tmp_path / "ws_sp8"))
    opt_sp.grid_levels, opt_sp.grid_ch = 8, 4
    opt_sp.amb_grid_levels, opt_sp.amb_grid_ch = 16, 2
    cfg_sp = NetworkConfig.from_options(opt_sp)
    assert cfg_sp.grid_spec.num_levels == 8 and cfg_sp.grid_spec.level_dim == 4
    assert (cfg_sp.ambient_spec.num_levels == 16
            and cfg_sp.ambient_spec.level_dim == 2)
    assert cfg_sp.torso_spec.num_levels == 16
    assert cfg_sp.grid_spec.output_dim == 32

    tr = Trainer("ngp", opt, workspace=ws, use_tensorboard=False, mute=True,
                 use_checkpoint="scratch")
    out = tr.train_gui(TalkingHeadDataset(opt, split="train"), step=1)
    assert np.isfinite(out["loss"])
    tr.epoch = 1
    tr.save_checkpoint(full=False)
    assert tr._grid_shape_id() == [16, 2, 16, 8, 4, 32]

    # same-shape restore works
    tr2 = Trainer("ngp", opt, workspace=ws, use_tensorboard=False, mute=True,
                  use_checkpoint="latest")
    assert tr2.epoch == 1

    # symmetric trainer must reject the asymmetric checkpoint, naming the fix
    opt_sym = _opts(data_dir, ws)
    with pytest.raises(ValueError, match="amb_grid_levels 8"):
        Trainer("ngp", opt_sym, workspace=ws, use_tensorboard=False,
                mute=True, use_checkpoint="latest")

    # and a symmetric checkpoint must reject an asymmetric trainer (the
    # 3-element record implies amb == spatial)
    ws_sym = str(tmp_path / "ws_sym")
    opt_s2 = _opts(data_dir, ws_sym)
    tr3 = Trainer("ngp", opt_s2, workspace=ws_sym, use_tensorboard=False,
                  mute=True, use_checkpoint="scratch")
    assert tr3._grid_shape_id() == [16, 2, 16]  # compact symmetric record
    tr3.epoch = 1
    tr3.save_checkpoint(full=False)
    opt_a2 = _opts(data_dir, ws_sym)
    opt_a2.amb_grid_levels, opt_a2.amb_grid_ch = 8, 4
    with pytest.raises(ValueError, match="grid shape"):
        Trainer("ngp", opt_a2, workspace=ws_sym, use_tensorboard=False,
                mute=True, use_checkpoint="latest")


def test_cli_records_cap_override_provenance():
    """main.py records which capacity flags were actually typed: unset
    flags keep dataclass defaults and restore freely; typed flags land in
    Options.cap_overrides and survive checkpoint capacity restore."""
    import main as main_cli

    args = main_cli.build_parser().parse_args(["data/x"])
    opt = main_cli.options_from_args(args)
    assert opt.cap_overrides == ()
    assert opt.sample_capacity_mult == 4.0  # dataclass default preserved

    args = main_cli.build_parser().parse_args(
        ["data/x", "--sample_capacity_mult", "16", "--ray_capacity_frac",
         "1.0"])
    opt = main_cli.options_from_args(args)
    assert set(opt.cap_overrides) == {"sample_capacity_mult",
                                      "ray_capacity_frac"}
    assert opt.sample_capacity_mult == 16.0
    assert opt.ray_capacity_frac == 1.0
    assert RenderConfig.from_options(opt).ray_capacity_frac == 1.0


def test_lpips_weights_file(tmp_path):
    """LPIPS.load_weights_file imports official-format calibration weights
    (torchvision alexnet `features.*` convs + lpips `lin*` heads) from a
    single torch file or npz (reference uses the lpips pip package, which
    fetches the same tensors at runtime)."""
    import torch

    conv_ids = [0, 3, 6, 8, 10]
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    rng = np.random.default_rng(0)
    alex = {}
    for cid, sh in zip(conv_ids, shapes):
        alex[f"features.{cid}.weight"] = torch.tensor(
            (rng.normal(size=sh) * 0.05).astype(np.float32))
        alex[f"features.{cid}.bias"] = torch.tensor(
            (rng.normal(size=sh[0]) * 0.05).astype(np.float32))
    lp_sd = {
        f"lin{i}.model.1.weight": torch.tensor(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
        for i, c in enumerate((64, 192, 384, 256, 256))
    }
    path = str(tmp_path / "lpips_calib.pth")
    torch.save({"alexnet": alex, "lpips": lp_sd}, path)

    m = LPIPS()
    assert not m.calibrated
    m.load_weights_file(path)
    assert m.calibrated
    np.testing.assert_allclose(
        np.asarray(m.params["convs"][0]["w"]),
        alex["features.0.weight"].numpy())
    a = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(m(a, a)[0]) < 1e-6 < float(m(a, b)[0])

    # flat npz format
    blob = {k: v.numpy() for k, v in {**alex, **lp_sd}.items()}
    npz_path = str(tmp_path / "lpips_calib.npz")
    np.savez(npz_path, **blob)
    m2 = LPIPS()
    m2.load_weights_file(npz_path)
    np.testing.assert_allclose(
        np.asarray(m2.params["lins"][2]),
        lp_sd["lin2.model.1.weight"].numpy().reshape(-1))

    # meter + trainer flag plumbing
    meter = LPIPSMeter(weights_path=npz_path)
    assert meter.lpips.calibrated


def test_patch_mode_lpips_applied(data_dir, tmp_path):
    """patch_size > 1 must activate the perceptual term at weight 1e-3
    (reference utils.py:757-781) — it was previously dead code outside
    lips-rect mode."""
    opt = Options(path=data_dir, workspace=str(tmp_path / "ws_p"),
                  num_rays=1024, patch_size=32, exp_eye=True, iters=100,
                  dt_gamma=0.0, sample_capacity_mult=2)
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    ds = TalkingHeadDataset(opt, split="train")
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_p"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    assert tr.lpips is not None

    # sub-receptive-field patches are rejected up front (NaN/torch-error zone)
    bad = Options(path=data_dir, workspace=str(tmp_path / "ws_p2"),
                  num_rays=1024, patch_size=4, exp_eye=True)
    with pytest.raises(ValueError, match="patch_size"):
        Trainer("ngp", bad, render_cfg=rc, workspace=str(tmp_path / "ws_p2"),
                use_tensorboard=False, mute=True, use_checkpoint="scratch")

    batch = tr._to_device(ds.collate(0))
    n = batch["rays_o"].shape[0]
    assert n % (32 * 32) == 0
    step_patch = tr._get_train_step(("patch", (32, 32), n))
    step_plain = tr._get_train_step(("none", None, n))
    args = (tr.params, tr.opt_state, tr.state, batch,
            jnp.asarray(1.0, jnp.float32), jax.random.PRNGKey(0))
    _, _, _, loss_patch, _ = step_patch(*args)
    _, _, _, loss_plain, _ = step_plain(*args)
    assert np.isfinite(float(loss_patch)) and np.isfinite(float(loss_plain))
    # same batch, same key: only the perceptual term differs
    assert float(loss_patch) != pytest.approx(float(loss_plain))

    # one real epoch end-to-end: train_one_epoch must dispatch the patch sig
    tr.train_one_epoch(ds)
    assert ("patch", (32, 32), n) in tr._train_step_fn


def test_eval_writes_validation_images(data_dir, tmp_path):
    """Each eval epoch leaves pred/depth PNGs in workspace/validation
    (reference utils.py:1259-1273)."""
    opt = _opts(data_dir, str(tmp_path / "ws_e"))
    rc = RenderConfig(torso=False, exp_eye=True, **TINY_RC)
    val = TalkingHeadDataset(opt, split="val")
    val.training = False
    val.num_rays = -1
    val.eval_count = 1
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path / "ws_e"),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    tr.evaluate_one_epoch(val)
    outs = os.listdir(tmp_path / "ws_e" / "validation")
    assert any(o.endswith("_rgb.png") for o in outs)
    assert any(o.endswith("_depth.png") for o in outs)


def test_adapt_render_config_k_span_rule():
    """march_iters follows the MEASURED window span telemetry: grows
    immediately when the span outgrows the orbit (exactness protection)
    and shrinks on slack; falls back to the sphere-diameter bound when no
    telemetry is given (train/capacity.py)."""
    import dataclasses

    from radnerf_tpu.models import RenderConfig
    from radnerf_tpu.train.capacity import adapt_render_config

    rc = RenderConfig(grid_size=128, max_steps=16, dt_gamma=0.0,
                      ray_capacity_frac=0.5, sample_capacity_mult=2.0,
                      march_iters=32, sample_slots=8)

    # span telemetry grows past the current orbit -> K grows (bucket 8)
    rc2 = adapt_render_config(rc, 1000, 2000, 4, 4096, 0.7, n_k_span=45)
    assert rc2 is not None and rc2.march_iters == 48

    # big slack -> shrinks (band is 16 wide: per-pose span variation must
    # not churn grow/shrink recompiles)
    rc3 = adapt_render_config(rc, 1000, 2000, 4, 4096, 0.7, n_k_span=5)
    assert rc3 is not None and rc3.march_iters == 8

    # moderate slack stays within the hysteresis band -> no resize
    rc4 = adapt_render_config(rc, 1000, 2000, 4, 4096, 0.7, n_k_span=20)
    assert rc4 is None or rc4.march_iters == 32

    # no telemetry -> sphere-diameter bound (2*r/dt + 2, bucket 8)
    dt = rc.march_config().dt_min
    rc5 = adapt_render_config(rc, 1000, 2000, 4, 4096, 1.0)
    want = min(-(-int(2.0 / dt + 2) // 8) * 8 + 8,  # loose upper sanity
               dataclasses.replace(rc, march_iters=None).march_config().n_march_iters)
    assert rc5 is not None and rc5.march_iters <= want


def test_adapt_render_config_group_rules():
    """Two-level-march capacities size from their telemetry only when the
    feature is enabled; slots are capped at ceil(K/4)."""
    from radnerf_tpu.models import RenderConfig
    from radnerf_tpu.train.capacity import adapt_render_config

    rc = RenderConfig(grid_size=128, max_steps=16, dt_gamma=0.0,
                      ray_capacity_frac=0.5, sample_capacity_mult=2.0,
                      march_iters=32, sample_slots=8,
                      march_group=True, march_group_mult=2.0)
    # needed groups ~3.2/compacted-ray -> mult grows to cover with headroom
    R = RenderConfig.ray_capacity(4096, 0.5)
    rc2 = adapt_render_config(rc, 1000, 2000, 4, 4096, 0.7,
                              n_groups=int(R * 3.2), n_group_max=9,
                              n_k_span=30,  # pins march_iters at 32
                              fresh=True)
    assert rc2 is not None
    assert rc2.march_iters == 32
    assert rc2.march_group_mult >= 3.25
    assert rc2.march_group_slots == 8  # capped at ceil(K/4)

    # disabled feature ignores group telemetry
    rc_off = RenderConfig(march_iters=32, march_group=False)
    rc3 = adapt_render_config(rc_off, 1000, 2000, 4, 4096, 0.7,
                              n_groups=99999, n_group_max=9)
    assert rc3 is None or (rc3.march_group_mult == rc_off.march_group_mult
                           and rc3.march_group_slots is None)
