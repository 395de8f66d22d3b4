"""Model-layer tests: shapes, audio nets, field, whole-frame render, grid
maintenance, pose math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.models import (
    NetworkConfig,
    RenderConfig,
    RendererState,
    encode_audio,
    field_density,
    field_forward,
    forward_torso,
    init_params,
    mark_untrained_grid,
    param_groups,
    render_rays,
    update_density_grid,
    update_torso_grid,
    bilinear_sample_2d,
)
from radnerf_tpu.data.rays import (
    convert_poses,
    euler_xyz_to_matrix,
    matrix_to_euler_xyz,
    get_rays,
    get_audio_features,
)


NET = NetworkConfig(torso=True)
RC = RenderConfig(torso=True, max_steps=8, sample_capacity_mult=2, dt_gamma=0.0)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), NET)


def test_param_shapes(params):
    assert params["encoder"].shape == (903480, 2)
    assert params["encoder_ambient"].shape == (555520, 2)
    assert params["torso_encoder"].shape == (555520, 2)
    assert params["individual_codes"].shape == (10000, 4)
    assert params["individual_codes_torso"].shape == (10000, 8)
    assert params["sigma_net"]["layers"][0]["w"].shape == (65, 64)
    assert params["sigma_net"]["layers"][2]["w"].shape == (64, 65)
    assert params["color_net"]["layers"][0]["w"].shape == (84, 64)
    assert params["ambient_net"]["layers"][0]["w"].shape == (96, 64)
    assert params["torso_deform_net"]["layers"][0]["w"].shape == (104, 64)
    assert params["torso_net"]["layers"][0]["w"].shape == (136, 32)


def test_encode_audio(params):
    a = jnp.zeros((8, 44, 16))
    enc = encode_audio(params, NET, a)
    assert enc.shape == (1, 64)
    assert encode_audio(params, NET, None) is None
    # att=0 path returns per-frame features
    cfg0 = NetworkConfig(att=0)
    p0 = init_params(jax.random.PRNGKey(1), cfg0)
    enc0 = encode_audio(p0, cfg0, jnp.zeros((1, 44, 16)))
    assert enc0.shape == (1, 64)


def test_field_forward_shapes(params):
    N = 128
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (N, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    enc_a = jnp.zeros((1, 64))
    c = params["individual_codes"][0]
    e = jnp.ones((1, 1)) * 0.25
    sigma, color, ambient = field_forward(params, NET, x, d, enc_a, c, e)
    assert sigma.shape == (N,)
    assert color.shape == (N, 3)
    assert ambient.shape == (N, 2)
    assert bool(jnp.all(sigma >= 0)) and bool(jnp.all((color >= 0) & (color <= 1)))
    # enc_a=None branch (network.py:233-236)
    sigma2, _, amb2 = field_forward(params, NET, x, d, None, c, e)
    assert bool(jnp.all(amb2 == 0))
    out = field_density(params, NET, x, enc_a, e)
    assert out["sigma"].shape == (N,)
    assert out["geo_feat"].shape == (N, 64)


def test_forward_torso_shapes(params):
    x = jnp.zeros((64, 2))
    pose6 = jnp.zeros((1, 6))
    c = params["individual_codes_torso"][0]
    alpha, color, dx = forward_torso(params, NET, x, pose6, c)
    assert alpha.shape == (64, 1) and color.shape == (64, 3) and dx.shape == (64, 2)


def test_render_rays_end_to_end(params):
    N = 256
    state = RendererState.create(RC)
    # occupy everything so rays sample
    state = state.replace(
        density_bitfield=jnp.full_like(state.density_bitfield, 255),
        density_grid_torso=jnp.ones_like(state.density_grid_torso),
        mean_density_torso=jnp.ones(()) * 0.5,
    ).with_sigma_bytes(jnp.full_like(state.sigma_bytes, 168))
    rng = np.random.default_rng(0)
    rays_o = np.tile(np.array([[0.0, 0.0, -3.5]], np.float32), (N, 1))
    dirs = np.concatenate(
        [rng.uniform(-0.1, 0.1, (N, 2)), np.ones((N, 1))], axis=-1
    ).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    bg_coords = rng.uniform(-1, 1, (N, 2)).astype(np.float32)
    auds = jnp.zeros((8, 44, 16))
    pose6 = jnp.zeros((1, 6))
    eye = jnp.ones((1, 1)) * 0.25
    bg_color = jnp.ones((N, 3)) * 0.5

    for compact in (True, False):
        results, new_state = render_rays(
            params, NET, RC, state,
            jnp.asarray(rays_o), jnp.asarray(dirs), auds,
            jnp.asarray(bg_coords), pose6, eye,
            jnp.zeros((), jnp.int32), bg_color,
            training=True, compact=compact,
        )
        assert results["image"].shape == (N, 3)
        assert results["depth"].shape == (N,)
        assert results["weights_sum"].shape == (N,)
        assert results["ambient"].shape == (N,)
        assert results["torso_alpha"].shape == (N, 1)
        assert bool(jnp.all(jnp.isfinite(results["image"])))
        assert bool(jnp.any(results["weights_sum"] > 0))

    # compact and dense paths agree when capacity covers every sample
    # (the fully-occupied test scene emits max_steps samples per ray)
    rc_ample = RenderConfig(torso=True, max_steps=8, sample_capacity_mult=8,
                            dt_gamma=0.0)
    r_c, _ = render_rays(params, NET, rc_ample, state, jnp.asarray(rays_o),
                         jnp.asarray(dirs), auds, jnp.asarray(bg_coords),
                         pose6, eye, jnp.zeros((), jnp.int32), bg_color,
                         training=False, compact=True)
    r_d, _ = render_rays(params, NET, rc_ample, state, jnp.asarray(rays_o),
                         jnp.asarray(dirs), auds, jnp.asarray(bg_coords),
                         pose6, eye, jnp.zeros((), jnp.int32), bg_color,
                         training=False, compact=False)
    np.testing.assert_allclose(
        np.asarray(r_c["image"]), np.asarray(r_d["image"]), atol=1e-5
    )


def test_render_rays_differentiable(params):
    """Gradient flows through the whole render into every trainable group."""
    N = 64
    state = RendererState.create(RC)
    state = state.replace(
        density_bitfield=jnp.full_like(state.density_bitfield, 255),
    ).with_sigma_bytes(jnp.full_like(state.sigma_bytes, 168))
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -3.5]]), (N, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    bg_coords = jnp.zeros((N, 2))
    auds = jnp.ones((8, 44, 16)) * 0.1
    pose6 = jnp.zeros((1, 6))
    eye = jnp.ones((1, 1)) * 0.25
    bg = jnp.ones((N, 3))

    def loss_fn(p):
        res, _ = render_rays(p, NET, RC, state, rays_o, rays_d, auds,
                             bg_coords, pose6, eye, jnp.zeros((), jnp.int32),
                             bg, training=True)
        return jnp.mean(res["image"] ** 2) + jnp.mean(res["ambient"])

    grads = jax.grad(loss_fn)(params)
    for k in ("encoder", "sigma_net", "color_net", "ambient_net", "audio_net"):
        leaves = jax.tree_util.tree_leaves(grads[k])
        assert any(bool(jnp.any(g != 0)) for g in leaves), f"no grad in {k}"


def test_update_density_grid(params):
    rc = RenderConfig(max_steps=8)
    state = RendererState.create(rc)
    enc_a = jnp.zeros((1, 64))
    eye = jnp.ones((1, 1)) * 0.25
    new = update_density_grid(params, NET, rc, state, enc_a, eye,
                              jax.random.PRNGKey(0))
    assert float(new.mean_density) > 0
    assert int(np.asarray(new.density_bitfield).sum()) > 0
    # untrained cells stay -1 through the EMA update
    marked = state.replace(density_grid=state.density_grid.at[0, :100].set(-1.0))
    new2 = update_density_grid(params, NET, rc, marked, enc_a, eye,
                               jax.random.PRNGKey(0))
    assert bool(jnp.all(new2.density_grid[0, :100] == -1.0))


def test_update_torso_grid(params):
    state = RendererState.create(RC)
    pose6 = jnp.zeros((1, 6))
    c = params["individual_codes_torso"][0]
    new = update_torso_grid(params, NET, RC, state, pose6, c, jax.random.PRNGKey(0))
    assert float(new.mean_density_torso) > 0


def test_mark_untrained_grid():
    rc = RenderConfig(max_steps=8)
    state = RendererState.create(rc)
    # one camera at -z looking forward: cells behind it become untrained
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -4.0
    state2 = mark_untrained_grid(rc, state, jnp.asarray(pose[None]),
                                 (1200.0, 1200.0, 225.0, 225.0))
    grid = np.asarray(state2.density_grid)
    assert (grid == -1).any() and (grid == 0).any()


def test_bilinear_sample_matches_flat_layout():
    H = 4
    flat = jnp.arange(H * H, dtype=jnp.float32)  # flat[b*H + a]
    # coords (a, b) = (1, 2) exactly -> flat[2*4+1] = 9
    coords = jnp.array([[1.0, 2.0]]) / (H - 1) * 2 - 1
    v = bilinear_sample_2d(flat, coords, H)
    np.testing.assert_allclose(np.asarray(v), [9.0], atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.default_rng(0)
    angles = rng.uniform(-1.2, 1.2, (16, 3))
    m = euler_xyz_to_matrix(angles)
    back = matrix_to_euler_xyz(m)
    np.testing.assert_allclose(back, angles, atol=1e-6)
    pose = np.eye(4, dtype=np.float32)[None].repeat(3, 0)
    pose[:, :3, :3] = euler_xyz_to_matrix(angles[:3]).astype(np.float32)
    pose[:, :3, 3] = rng.uniform(-1, 1, (3, 3))
    out = convert_poses(pose)
    np.testing.assert_allclose(out[:, :3], angles[:3], atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], pose[:, :3, 3], atol=1e-6)


def test_get_rays_modes():
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -4.0
    intr = (1200.0, 1200.0, 225.0, 225.0)
    full = get_rays(pose, intr, 450, 450, -1)
    assert full["rays_o"].shape == (450 * 450, 3)
    np.testing.assert_allclose(
        np.linalg.norm(full["rays_d"], axis=-1), 1.0, atol=1e-5
    )
    rnd = get_rays(pose, intr, 450, 450, 1024, rng=np.random.default_rng(0))
    assert rnd["rays_o"].shape == (1024, 3)
    patch = get_rays(pose, intr, 450, 450, 1024, patch_size=16,
                     rng=np.random.default_rng(0))
    assert patch["rays_o"].shape == (1024, 3)
    rect = get_rays(pose, intr, 450, 450, rect=(100, 132, 200, 232))
    assert rect["rays_o"].shape == (32 * 32, 3)
    # rect indices form the expected grid rows
    inds = rect["inds"].reshape(32, 32)
    assert inds[0, 0] == 100 * 450 + 200 and inds[1, 0] == 101 * 450 + 200


def test_get_audio_features_window():
    feats = np.arange(10, dtype=np.float32).reshape(10, 1, 1).repeat(44, 1).repeat(16, 2)
    w = get_audio_features(feats, 2, 0)
    assert w.shape == (8, 44, 16)
    assert (w[:4] == 0).all() and w[4, 0, 0] == 0 and w[5, 0, 0] == 1
    w2 = get_audio_features(feats, 2, 9)
    assert (w2[-3:] == 0).all() and w2[0, 0, 0] == 5


def test_param_groups():
    g_head = param_groups(NetworkConfig(torso=False))
    assert g_head["encoder"] == "grid" and g_head["sigma_net"] == "net"
    assert g_head["audio_att_net"] == "att"
    g_torso = param_groups(NetworkConfig(torso=True))
    assert g_torso["torso_encoder"] == "grid"
    assert g_torso["sigma_net"] == "frozen"


def test_fast_path_matches_exhaustive(params):
    """The production fast path (ray compaction + bbox/sphere windowing +
    density-prior culling + sample compaction) must render every ray the
    exhaustive path renders, with matching values where culling cannot act
    (this codifies the capacity-overflow bug found during verification)."""
    import dataclasses

    from radnerf_tpu.models.renderer import compute_occ_bbox, compute_occ_sphere
    from radnerf_tpu.ops import packbits
    from radnerf_tpu.ops.marching import build_sigma_bytes

    H = 32
    rng = np.random.default_rng(11)
    # blob occupancy with LOW density so the prior cull never fires -> the
    # two paths must agree exactly
    coords = np.stack(np.meshgrid(*[np.arange(H)] * 3, indexing="ij"), -1).reshape(-1, 3)
    from radnerf_tpu.ops import morton3d

    xyz = 2.0 * coords / (H - 1) - 1.0
    dens = np.zeros(H**3, np.float32)
    dens_m = np.zeros(H**3, np.float32)
    mort = np.asarray(morton3d(jnp.asarray(coords, jnp.int32)))
    blob = np.linalg.norm(xyz - [0, 0.05, 0], axis=-1) < 0.4
    dens_m[mort[blob]] = 1.0  # sigma-hat 1 -> cum stays < ln(1e6)
    grid = jnp.asarray(dens_m)[None]

    rc_fast = RenderConfig(torso=False, max_steps=8, dt_gamma=0.0, grid_size=H,
                           sample_capacity_mult=8, ray_capacity_frac=0.5,
                           march_iters=None, cull_T=1e-6)
    rc_ref = dataclasses.replace(rc_fast, ray_capacity_frac=1.0, cull_T=0.0,
                                 sample_capacity_mult=8)

    state = RendererState.create(rc_fast)
    state = state.replace(
        density_grid=grid,
        density_bitfield=packbits(grid, 0.5),
        occ_bbox=compute_occ_bbox(rc_fast, grid, 0.5),
        occ_sphere=compute_occ_sphere(rc_fast, grid, 0.5),
    ).with_sigma_bytes(build_sigma_bytes(grid, 0.5))

    N = 1024
    rays_o = np.tile(np.array([[0.0, 0.0, -3.3]], np.float32), (N, 1))
    # wide spread so only ~25% of rays hit the blob (the ray capacity of
    # frac=0.5 must then cover all hits; overflow-drop is separate, tested
    # via compact_samples)
    d = np.concatenate([rng.uniform(-0.3, 0.3, (N, 2)), np.ones((N, 1))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    common = dict(
        auds=jnp.zeros((8, 44, 16)), bg_coords=jnp.zeros((N, 2)),
        pose6=jnp.zeros((1, 6)), eye=jnp.full((1, 1), 0.25),
        index=jnp.zeros((), jnp.int32), bg_color=jnp.full((N, 3), 0.5),
    )

    def run(rc):
        res, _ = render_rays(params, NET, rc, state, jnp.asarray(rays_o),
                             jnp.asarray(d, jnp.float32), common["auds"],
                             common["bg_coords"], common["pose6"], common["eye"],
                             common["index"], common["bg_color"], training=True)
        return res

    fast = run(rc_fast)
    ref = run(rc_ref)
    ws_f = np.asarray(fast["weights_sum"])
    ws_r = np.asarray(ref["weights_sum"])
    # every ray the exhaustive path renders also renders in the fast path
    assert not ((ws_r > 1e-3) & (ws_f < 1e-6)).any()
    np.testing.assert_allclose(ws_f, ws_r, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fast["image"]), np.asarray(ref["image"]), atol=1e-4
    )


def test_reset_extra_state():
    from radnerf_tpu.models import reset_extra_state

    rc = RenderConfig(grid_size=32, max_steps=8)
    state = RendererState.create(rc)
    state = state.replace(
        density_grid=jnp.ones_like(state.density_grid),
        mean_density=jnp.ones(()),
        density_grid_torso=jnp.full_like(state.density_grid_torso, 0.3),
    )
    out = reset_extra_state(rc, state)
    assert float(out.density_grid.sum()) == 0.0
    assert float(out.mean_density) == 0.0
    # torso grid preserved (the reference only clears the head grid,
    # renderer.py:145-155)
    assert float(out.density_grid_torso.mean()) == pytest.approx(0.3)


def test_grouped_march_render_matches_dense():
    """Full renders with two-level grouped marching (march_group=True) match
    the dense-march renders exactly at ample group capacities (the renderer
    wiring over ops-level parity, test_ops.py::test_march_grouped_matches_dense)."""
    import dataclasses

    from radnerf_tpu.models.renderer import compute_occ_bbox, compute_occ_sphere
    from radnerf_tpu.ops import morton3d_invert, packbits
    from radnerf_tpu.ops.marching import build_sigma_bytes

    H = 32
    rng = np.random.default_rng(5)
    coords = np.asarray(morton3d_invert(jnp.arange(H**3, dtype=jnp.int32)))
    xyz = 2.0 * coords / (H - 1) - 1.0
    dens = np.where(
        np.linalg.norm(xyz - [0.05, 0.0, 0.1], axis=-1) < 0.42, 200.0, 0.0
    ).astype(np.float32)
    dens[rng.random(H**3) < 0.01] = 25.0
    grid = jnp.asarray(dens)[None]

    rc_dense = RenderConfig(torso=True, max_steps=8, dt_gamma=0.0, grid_size=H,
                            sample_capacity_mult=8, ray_capacity_frac=0.5,
                            cull_T=1e-6, march_group=False)
    rc_grouped = dataclasses.replace(rc_dense, march_group=True,
                                     march_group_mult=16.0)

    state = RendererState.create(rc_dense)
    state = state.replace(
        density_grid=grid,
        density_bitfield=packbits(grid, 5.0),
        density_grid_torso=jnp.ones((H * H,), jnp.float32) * 0.4,
        mean_density_torso=jnp.asarray(0.2, jnp.float32),
        occ_bbox=compute_occ_bbox(rc_dense, grid, 5.0),
        occ_sphere=compute_occ_sphere(rc_dense, grid, 5.0),
    ).with_sigma_bytes(build_sigma_bytes(grid, 5.0))

    N = 512
    rays_o = np.tile(np.array([[0.0, 0.0, -3.3]], np.float32), (N, 1))
    d = np.concatenate([rng.uniform(-0.3, 0.3, (N, 2)), np.ones((N, 1))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    params = init_params(jax.random.PRNGKey(0), NET)

    def run(rc):
        res, _ = render_rays(
            params, NET, rc, state, jnp.asarray(rays_o),
            jnp.asarray(d, jnp.float32), jnp.zeros((8, 44, 16)),
            jnp.zeros((N, 2)), jnp.zeros((1, 6)), jnp.full((1, 1), 0.25),
            jnp.zeros((), jnp.int32), jnp.full((N, 3), 0.5), training=False,
        )
        return res

    dense = run(rc_dense)
    grouped = run(rc_grouped)
    np.testing.assert_allclose(
        np.asarray(dense["image"]), np.asarray(grouped["image"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dense["depth"]), np.asarray(grouped["depth"]),
        rtol=1e-5, atol=1e-6,
    )
    # scene non-trivial: foreground actually rendered over the 0.5 bg
    assert float(np.abs(np.asarray(dense["image"]) - 0.5).sum()) > 1.0
    assert int(grouped["n_groups_needed"]) > 0


def test_sigma_bytes_invariant_no_bare_replace():
    """Source-level guard for the RendererState derived-field invariant:
    sigma_bytes must never be set with a bare .replace() — with_sigma_bytes
    keeps sigma_rows/coarse_rows in sync (a stale packed view silently
    renders from outdated occupancy)."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    offenders = []
    for p in list((root / "radnerf_tpu").rglob("*.py")) + [
        root / "bench.py", root / "__graft_entry__.py"
    ]:
        tree = ast.parse(p.read_text())
        # Map each node to its enclosing function name via a walk that
        # threads the innermost def name down the tree.
        def visit(node, func_name):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                func_name = node.name
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "replace"
                and any(kw.arg == "sigma_bytes" for kw in node.keywords)
                and func_name not in ("with_sigma_bytes", "create")
            ):
                offenders.append(
                    f"{p.relative_to(root)}:{node.lineno} in {func_name}()"
                )
            for child in ast.iter_child_nodes(node):
                visit(child, func_name)

        visit(tree, "<module>")
    assert not offenders, (
        "bare .replace(sigma_bytes=...) found (use with_sigma_bytes): "
        + "; ".join(offenders)
    )


@pytest.mark.parametrize("S,cap", [(8, 512), (6, 512), (8, 40)])
def test_eval_field_compacted_matches_direct(S, cap):
    """_eval_field_compacted (prefix-sum buffer + wide-row return trip)
    equals a direct lattice field eval on every kept sample, for both
    return-row groupings (S=8 -> quad rows, S=6 -> pair rows) and for an
    undersized capacity (drop semantics: kept == valid & fits)."""
    from radnerf_tpu.models.network import field_forward
    from radnerf_tpu.models.renderer import _eval_field_compacted

    net_cfg = NetworkConfig(torso=False, exp_eye=True)
    params = init_params(jax.random.PRNGKey(3), net_cfg)
    rng = np.random.default_rng(5)
    N = 64
    counts = rng.integers(0, S + 1, N)
    valid = jnp.arange(S)[None, :] < jnp.asarray(counts)[:, None]
    xyz = jnp.asarray(rng.uniform(-1, 1, (N, S, 3)).astype(np.float32))
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)
    enc_a = jnp.asarray(rng.normal(size=(1, net_cfg.audio_dim)).astype(np.float32))
    ind = params["individual_codes"][0]
    eye = jnp.full((1, 1), 0.25, jnp.float32)

    sig, col, amb, kept = _eval_field_compacted(
        params, net_cfg, {"xyz": xyz, "valid": valid}, rays_d,
        enc_a, ind, eye, cap,
    )

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
    s2, c2, a2 = field_forward(
        params, net_cfg, xyz.reshape(-1, 3), dirs.reshape(-1, 3), enc_a, ind, eye
    )
    s2 = s2.reshape(N, S)
    c2 = c2.reshape(N, S, 3)
    a2 = a2.reshape(N, S, -1)

    ends = np.cumsum(counts)
    base = ends - counts
    fits = jnp.asarray(base)[:, None] + jnp.arange(S)[None, :] < cap
    assert bool(jnp.all(kept == (valid & fits)))
    m = kept
    atol = 1e-2 if net_cfg.dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.where(m, np.asarray(sig), 0), np.where(m, np.asarray(s2), 0), atol=atol)
    np.testing.assert_allclose(
        np.where(m[..., None], np.asarray(col), 0),
        np.where(m[..., None], np.asarray(c2), 0), atol=atol)
    np.testing.assert_allclose(
        np.where(m[..., None], np.asarray(amb), 0),
        np.where(m[..., None], np.asarray(a2), 0), atol=atol)
    # dropped/invalid slots return zeros
    assert float(jnp.max(jnp.abs(jnp.where(m, 0.0, sig)))) == 0.0
