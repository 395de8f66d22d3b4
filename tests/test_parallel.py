"""Data-parallel tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.parallel import create_mesh, replicate, shard_batch, shard_rays
from radnerf_tpu.parallel.mesh import pad_to_multiple


def test_mesh_and_sharding():
    assert len(jax.devices()) == 8
    mesh = create_mesh()
    x = jnp.ones((1024, 3))
    xs = shard_rays(mesh, x)
    assert xs.sharding.is_fully_replicated is False
    p = replicate(mesh, {"a": jnp.ones((4, 4))})
    assert p["a"].sharding.is_fully_replicated

    batch = {"rays_o": jnp.ones((1024, 3)), "auds": jnp.ones((8, 44, 16)),
             "images": jnp.ones((1000, 3))}  # 1000 % 8 == 0
    sb = shard_batch(mesh, batch)
    assert not sb["rays_o"].sharding.is_fully_replicated
    # odd-sized arrays stay replicated instead of failing
    batch2 = {"rays_o": jnp.ones((1001, 3))}
    sb2 = shard_batch(mesh, batch2)
    assert sb2["rays_o"].shape == (1001, 3)


def test_pad_to_multiple():
    a = np.ones((13, 3))
    padded, n = pad_to_multiple(a, 8)
    assert padded.shape == (16, 3) and n == 13
    padded2, _ = pad_to_multiple(np.ones((16, 3)), 8)
    assert padded2.shape == (16, 3)


def test_dp_train_step_matches_single_device():
    """The sharded train step computes the same loss AND the same updated
    params as an unsharded run of the identical batch (XLA inserts the
    psum; numerics match up to fp32 reduction order)."""
    import __graft_entry__ as g

    loss8, params8 = g._dp_train_step(n_rays=512, mesh_size=8)
    loss1, params1 = g._dp_train_step(n_rays=512, mesh_size=1)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    leaves8 = jax.tree_util.tree_leaves_with_path(params8)
    leaves1 = jax.tree_util.tree_leaves(params1)
    assert len(leaves8) == len(leaves1) > 0
    for (path, l8), l1 in zip(leaves8, leaves1):
        np.testing.assert_allclose(
            np.asarray(l8), np.asarray(l1), rtol=1e-4, atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_dryrun_multichip_entry():
    """The driver-facing dryrun entry runs green in-process (the conftest
    already pinned CPU + 8 host devices, so the self-pin is a no-op)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_trainer_data_parallel(tmp_path):
    """Trainer with opt.data_parallel trains on the 8-device mesh."""
    from radnerf_tpu.config import Options
    from radnerf_tpu.models import RenderConfig, RendererState
    from radnerf_tpu.train import Trainer

    opt = Options(workspace=str(tmp_path), num_rays=512, exp_eye=True,
                  iters=10, dt_gamma=0.0, sample_capacity_mult=2,
                  data_parallel=True)
    rc = RenderConfig(grid_size=32, max_steps=8, dt_gamma=0.0,
                      sample_capacity_mult=2, exp_eye=True)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    assert tr.mesh is not None

    rng = np.random.default_rng(0)

    class FakeDataset:
        poses = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
        intrinsics = (100.0, 100.0, 32.0, 32.0)
        auds = rng.normal(size=(4, 44, 16)).astype(np.float32)
        eye_area = np.full((4, 1), 0.25, np.float32)

        def epoch_indices(self):
            return np.arange(2)

        def collate(self, i):
            o = np.tile(np.array([[0, 0, -3.3]], np.float32), (512, 1))
            d = np.concatenate(
                [rng.uniform(-0.1, 0.1, (512, 2)), np.ones((512, 1))], -1
            ).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            from radnerf_tpu.data.rays import get_audio_features

            return {
                "rays_o": o, "rays_d": d,
                "auds": get_audio_features(self.auds, 2, i),
                "bg_coords": rng.uniform(-1, 1, (512, 2)).astype(np.float32),
                "poses": np.zeros((1, 6), np.float32),
                "eye": self.eye_area[[i]],
                "index": i,
                "bg_color": np.ones((512, 3), np.float32) * 0.5,
                "images": rng.uniform(0, 1, (512, 3)).astype(np.float32),
                "face_mask": rng.uniform(size=512) < 0.5,
            }

    out = tr.train_gui(FakeDataset(), step=2)
    assert np.isfinite(out["loss"])

    # DP inference wiring: test_step shards the frame's rays over the mesh
    # (trainer.py test_step -> parallel/mesh.py make_render_frame_dp)
    fb = tr._to_device(FakeDataset().collate(0))
    fb["H"], fb["W"] = 16, 32  # 512 rays as a 16x32 frame
    pred, depth = tr.test_step(fb)
    assert pred.shape == (16, 32, 3) and np.isfinite(pred).all()
    assert "render_dp" in tr._render_fn  # the sharded path actually ran


class _FakeDPDataset:
    """Minimal dataset for DP Trainer loops (head or torso stage)."""

    def __init__(self, n_rays=512, torso=False, seed=0):
        self.rng = np.random.default_rng(seed)
        self.n_rays = n_rays
        self.torso = torso
        self.poses = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
        self.intrinsics = (100.0, 100.0, 32.0, 32.0)
        self.auds = self.rng.normal(size=(4, 44, 16)).astype(np.float32)
        self.eye_area = np.full((4, 1), 0.25, np.float32)

    def epoch_indices(self):
        return np.arange(2)

    def collate(self, i):
        from radnerf_tpu.data.rays import get_audio_features

        n = self.n_rays
        o = np.tile(np.array([[0, 0, -3.3]], np.float32), (n, 1))
        d = np.concatenate(
            [self.rng.uniform(-0.1, 0.1, (n, 2)), np.ones((n, 1))], -1
        ).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {
            "rays_o": o, "rays_d": d,
            "auds": get_audio_features(self.auds, 2, i),
            "bg_coords": self.rng.uniform(-1, 1, (n, 2)).astype(np.float32),
            "poses": np.zeros((1, 6), np.float32),
            "eye": self.eye_area[[i]],
            "index": i,
            "bg_color": np.ones((n, 3), np.float32) * 0.5,
            "images": self.rng.uniform(0, 1, (n, 3)).astype(np.float32),
            "face_mask": self.rng.uniform(size=n) < 0.5,
        }
        if self.torso:
            batch["bg_torso_color"] = self.rng.uniform(
                0, 1, (n, 3)).astype(np.float32)
        return batch


def _assert_replicated_in_sync(tree, name):
    """Every device's copy of a replicated pytree must be bit-identical."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(
                ref, np.asarray(s.data),
                err_msg=f"{name}{jax.tree_util.keystr(path)} diverged on "
                        f"device {s.device}",
            )


def test_dp_training_endurance(tmp_path):
    """Multi-step DP training STAYS IN SYNC: 36 steps through the Trainer
    (update_density_grid fires at the 16-step cadence) on the 8-device
    mesh, then every replicated state/param array is asserted bit-identical
    across devices (VERDICT r2 #6 / SURVEY §2.5 contract)."""
    from radnerf_tpu.config import Options
    from radnerf_tpu.models import RenderConfig
    from radnerf_tpu.train import Trainer

    opt = Options(workspace=str(tmp_path), num_rays=512, exp_eye=True,
                  iters=40, dt_gamma=0.0, sample_capacity_mult=2,
                  data_parallel=True, update_extra_interval=16)
    rc = RenderConfig(grid_size=32, max_steps=8, dt_gamma=0.0,
                      sample_capacity_mult=2, exp_eye=True)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    assert tr.mesh is not None
    ds = _FakeDPDataset()

    # 36 steps in 6-step bursts: each burst's loss pull is a host sync that
    # bounds the in-flight collective queue — the CPU backend emulates the
    # 8 devices on this box's SINGLE core, and a deep async queue of
    # all-reduce executables can starve XLA's 40 s rendezvous timeout into
    # a spurious abort (rendezvous.cc "only 5 of 8 arrived"); grid updates
    # still fire at steps 0, 16, 32
    for _ in range(6):
        out = tr.train_gui(ds, step=6)
        assert np.isfinite(out["loss"])
    assert tr.global_step == 36
    assert float(tr.state.mean_density) >= 0.0

    _assert_replicated_in_sync(tr.params, "params")
    _assert_replicated_in_sync(
        {"density_grid": tr.state.density_grid,
         "bitfield": tr.state.density_bitfield,
         "sigma_rows": tr.state.sigma_rows,
         "occ_bbox": tr.state.occ_bbox}, "state.")
    _assert_replicated_in_sync(tr.opt_state, "opt_state")


def test_dp_torso_stage_step(tmp_path):
    """A torso-stage DP train step (torso loss path + torso grid update)
    runs sharded and stays finite + in sync."""
    from radnerf_tpu.config import Options
    from radnerf_tpu.models import RenderConfig
    from radnerf_tpu.train import Trainer

    opt = Options(workspace=str(tmp_path), num_rays=512, exp_eye=True,
                  iters=40, dt_gamma=0.0, sample_capacity_mult=2,
                  data_parallel=True, torso=True, update_extra_interval=16)
    rc = RenderConfig(grid_size=32, max_steps=8, dt_gamma=0.0,
                      sample_capacity_mult=2, exp_eye=True, torso=True)
    tr = Trainer("ngp", opt, render_cfg=rc, workspace=str(tmp_path),
                 use_tensorboard=False, mute=True, use_checkpoint="scratch")
    assert tr.mesh is not None
    ds = _FakeDPDataset(torso=True)

    # small bursts bound the in-flight collective queue (see endurance test)
    for burst in (6, 6, 5):  # crosses the torso-grid update at step 16
        out = tr.train_gui(ds, step=burst)
        assert np.isfinite(out["loss"])
    _assert_replicated_in_sync(tr.params, "params")
    _assert_replicated_in_sync(
        {"torso_grid": tr.state.density_grid_torso}, "state.")


def test_dp_render_pad_path():
    """DP inference on a ray count that does NOT divide the mesh: pad with
    pad_to_multiple, render sharded, strip the padding — matches the
    single-device render of the original rays (parallel/mesh.py:74)."""
    import jax.numpy as jnp

    from radnerf_tpu.models import (
        NetworkConfig, RenderConfig, RendererState, init_params, render_rays,
    )
    from radnerf_tpu.parallel import create_mesh, replicate
    from radnerf_tpu.parallel.mesh import make_render_frame_dp, shard_batch

    net_cfg = NetworkConfig(exp_eye=True)
    rc = RenderConfig(exp_eye=True, grid_size=32, max_steps=8, dt_gamma=0.0,
                      sample_capacity_mult=8)
    params = init_params(jax.random.PRNGKey(0), net_cfg)
    state = RendererState.create(rc)
    state = state.replace(
        density_bitfield=jnp.full_like(state.density_bitfield, 255),
    ).with_sigma_bytes(jnp.full_like(state.sigma_bytes, 168))

    N = 1024 + 13  # not divisible by 8
    rng = np.random.default_rng(5)
    rays_o = np.tile(np.array([[0.0, 0.0, -3.3]], np.float32), (N, 1))
    d = np.concatenate([rng.uniform(-0.2, 0.2, (N, 2)), np.ones((N, 1))], -1)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    raw = {
        "rays_o": rays_o, "rays_d": d,
        "bg_coords": rng.uniform(-1, 1, (N, 2)).astype(np.float32),
        "bg_color": np.full((N, 3), 0.5, np.float32),
    }
    auds = jnp.zeros((8, 44, 16))
    rep = {"poses": jnp.zeros((1, 6)), "eye": jnp.full((1, 1), 0.25),
           "index": jnp.zeros((), jnp.int32)}

    ref, _ = render_rays(
        params, net_cfg, rc, state,
        jnp.asarray(rays_o), jnp.asarray(d), auds,
        jnp.asarray(raw["bg_coords"]), rep["poses"], rep["eye"],
        rep["index"], jnp.asarray(raw["bg_color"]), training=False,
    )

    mesh = create_mesh()
    padded = {}
    for k, v in raw.items():
        padded[k], n_orig = pad_to_multiple(v, mesh.devices.size)
    assert n_orig == N and padded["rays_o"].shape[0] == 1040
    batch = {**{k: jnp.asarray(v) for k, v in padded.items()}, **rep}

    render = make_render_frame_dp(mesh, net_cfg, rc)
    img, depth, _ = render(
        replicate(mesh, params), replicate(mesh, state),
        shard_batch(mesh, batch), auds,
    )
    np.testing.assert_allclose(
        np.asarray(img)[:N], np.asarray(ref["image"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(depth)[:N], np.asarray(ref["depth"]), rtol=1e-5, atol=1e-5)
    # the scene is non-trivial (foreground differs from the 0.5 background)
    assert float(np.abs(np.asarray(ref["image"]) - 0.5).sum()) > 1.0


def test_dp_render_frame_matches_single_device():
    """shard_map DP inference: a frame rendered with rays sharded over the
    8-device mesh matches the single-device render exactly (per-device
    local compaction; zero collectives — parallel/mesh.py:
    make_render_frame_dp)."""
    import numpy as np

    from radnerf_tpu.models import (
        NetworkConfig, RenderConfig, RendererState, init_params, render_rays,
    )
    from radnerf_tpu.models.renderer import compute_occ_bbox, compute_occ_sphere
    from radnerf_tpu.ops import morton3d_invert, packbits
    from radnerf_tpu.ops.marching import build_sigma_bytes
    from radnerf_tpu.parallel import create_mesh, replicate
    from radnerf_tpu.parallel.mesh import make_render_frame_dp, shard_batch

    net_cfg = NetworkConfig(torso=True, exp_eye=True)
    # torso frac 1.0: the torso mask covers every pixel of this scene, so a
    # fractional torso capacity would drop pixels (differently per layout)
    rc = RenderConfig(torso=True, exp_eye=True, grid_size=32, max_steps=8,
                      dt_gamma=0.0, sample_capacity_mult=8,
                      ray_capacity_frac=0.5, torso_capacity_frac=1.0)
    params = init_params(jax.random.PRNGKey(0), net_cfg)
    state = RendererState.create(rc)

    H = 32
    rng = np.random.default_rng(2)
    coords = np.asarray(morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)))
    xyz = 2.0 * coords / (H - 1) - 1.0
    dens = np.where(np.linalg.norm(xyz, axis=-1) < 0.45, 120.0, 0.0).astype(np.float32)
    grid = jnp.asarray(dens)[None]
    state = state.replace(
        density_grid=grid,
        density_bitfield=packbits(grid, 5.0),
        density_grid_torso=jnp.ones((H * H,), jnp.float32) * 0.3,
        mean_density_torso=jnp.asarray(0.1, jnp.float32),
        occ_bbox=compute_occ_bbox(rc, grid, 5.0),
        occ_sphere=compute_occ_sphere(rc, grid, 5.0),
    ).with_sigma_bytes(build_sigma_bytes(grid, 5.0))

    N = 1024  # divisible by 8
    rays_o = np.tile(np.array([[0.0, 0.0, -3.3]], np.float32), (N, 1))
    d = np.concatenate([rng.uniform(-0.25, 0.25, (N, 2)), np.ones((N, 1))], -1)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    batch = {
        "rays_o": jnp.asarray(rays_o), "rays_d": jnp.asarray(d),
        "bg_coords": jnp.zeros((N, 2)), "bg_color": jnp.full((N, 3), 0.5),
        "poses": jnp.zeros((1, 6)), "eye": jnp.full((1, 1), 0.25),
        "index": jnp.zeros((), jnp.int32),
    }
    auds = jnp.zeros((8, 44, 16))

    # single-device reference
    ref, _ = render_rays(
        params, net_cfg, rc, state, batch["rays_o"], batch["rays_d"], auds,
        batch["bg_coords"], batch["poses"], batch["eye"], batch["index"],
        batch["bg_color"], training=False,
    )

    mesh = create_mesh()
    assert mesh.devices.size == 8
    params_r = replicate(mesh, params)
    state_r = replicate(mesh, state)
    sb = shard_batch(mesh, batch)
    render = make_render_frame_dp(mesh, net_cfg, rc)
    img, depth, _ = render(params_r, state_r, sb, auds)

    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref["image"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(depth), np.asarray(ref["depth"]), rtol=1e-5, atol=1e-5
    )
    assert float(np.abs(np.asarray(ref["image"]) - 0.5).sum()) > 1.0
