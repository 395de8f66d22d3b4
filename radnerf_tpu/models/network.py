"""The audio-conditioned NeRF field (NeRFNetwork), functional TPU version.

Reference: nerf/network.py:91-362. Architecture (numbers for the esperanto
wav2vec variant; deepspeech only changes audio_in_dim to 29):

- audio: AudioNet(44 -> 64), AudioAttNet over 8 frames when att > 0
  (network.py:124-130).
- spatial encoder: tiledgrid 3-D, 16 levels x 2ch, base 16, desired
  2048*bound, log2_hashmap 16, linear -> 32-d (network.py:133).
- ambient encoder: tiledgrid 2-D, same config, desired 2048 -> 32-d (:134).
- ambient_net: MLP(32+64 -> 2, hidden 64 x 3) + tanh (:140, :245-247).
- sigma_net: MLP(32+32+eye -> 1+64, hidden 64 x 3) (:149); sigma =
  trunc_exp(h[..., 0]) (:264).
- dir encoder: SH degree 4 -> 16-d (:154); color_net: MLP(16+64+ind_dim -> 3,
  hidden 64 x 2) + sigmoid (:156, :277-281).
- torso branch (:158-167, :188-219): freq-enc 2-D deform input (deg 10 -> 42)
  + freq-enc 6-d pose (deg 4 -> 54) + 8-d torso code -> deform MLP(104 -> 2);
  x' = clamp(x * torso_shrink + dx); tiledgrid-2D(x') = 32 concat -> torso
  MLP(136 -> 4, hidden 32 x 3) -> sigmoid alpha + rgb.
- latents: individual_codes [ind_num, 4], individual_codes_torso
  [ind_num, 8] (renderer.py:92-101); optional camera_dR/dT (:104-107).

All state is an explicit parameter pytree; every apply function is pure and
jit/grad/vmap-compatible. Compute runs in the configured dtype (bfloat16 on
TPU when opt.fp16 — the MXU-native equivalent of the reference's AMP fp16),
with fp32 grid tables and fp32 density/compositing math.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import (
    GridSpec,
    build_packed_table,
    freq_encode,
    freq_output_dim,
    grid_encode,
    grid_encode_packed,
    sh_encode,
    trunc_exp,
)
from .audio import (
    audio_att_net_apply,
    audio_att_net_init,
    audio_net_apply,
    audio_net_init,
)
from .modules import mlp_apply, mlp_init


def _encode(x, embeddings, spec: GridSpec, bound: float, table_dtype=None,
            packed=None):
    """Grid encode via the corner-packed fast path (one gather row per
    point-level, per-level VMEM-sized tables) for tiled grids; plain
    per-corner gathers otherwise. ``table_dtype=bfloat16`` halves row bytes
    and runs the lerp end-to-end in bf16 (the fp16-AMP analogue; weights
    still derive from fp32 positions).

    ``packed`` short-circuits the in-graph table packing with tables built
    once by :func:`precompute_packed_tables` — at inference the embeddings
    are frozen, and re-packing them every frame cost ~19 ms/frame of
    copies/reshapes in the profiled 512x512 render (PERFORMANCE.md).
    Inference-only: gradients do not flow from a precomputed table to the
    embeddings."""
    if spec.gridtype == "tiled":
        if packed is None:
            packed = build_packed_table(embeddings, spec, dtype=table_dtype)
        return grid_encode_packed(x, packed, spec, bound)
    return grid_encode(x, embeddings, spec, bound)


def precompute_packed_tables(params: dict, cfg: "NetworkConfig") -> dict:
    """Shallow-copy ``params`` with corner-packed encoder tables attached.

    The returned dict carries ``_packed_encoder`` / ``_packed_ambient`` /
    ``_packed_torso`` entries that ``field_forward`` / ``forward_torso``
    use instead of re-packing the (frozen) embeddings inside every jitted
    frame. Call once per parameter change (e.g. after checkpoint load);
    never feed the result to the optimizer."""
    p = dict(params)
    if cfg.grid_spec.gridtype == "tiled":
        p["_packed_encoder"] = build_packed_table(
            params["encoder"], cfg.grid_spec, dtype=cfg.table_dtype)
    if cfg.ambient_spec.gridtype == "tiled":
        p["_packed_ambient"] = build_packed_table(
            params["encoder_ambient"], cfg.ambient_spec, dtype=cfg.table_dtype)
    if cfg.torso and "torso_encoder" in params \
            and cfg.torso_spec.gridtype == "tiled":
        p["_packed_torso"] = build_packed_table(
            params["torso_encoder"], cfg.torso_spec, dtype=cfg.table_dtype)
    return p


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Static architecture description."""

    audio_in_dim: int = 44
    audio_dim: int = 64
    att: int = 2
    emb: bool = False
    bound: float = 1.0
    exp_eye: bool = True
    ind_dim: int = 4
    ind_num: int = 10_000
    ind_dim_torso: int = 8
    torso: bool = False
    torso_shrink: float = 0.8
    train_camera: bool = False
    # main nets
    num_layers: int = 3
    hidden_dim: int = 64
    geo_feat_dim: int = 64
    num_layers_color: int = 2
    hidden_dim_color: int = 64
    num_layers_ambient: int = 3
    hidden_dim_ambient: int = 64
    ambient_dim: int = 2
    # compute dtype for MLP matmuls ('bfloat16' or 'float32')
    compute_dtype: str = "float32"
    # Grid shape: levels x channels for the spatial/ambient/torso encoders.
    # The reference fixes 16x2 (network.py:133-134,165). TPU lever: the
    # encoder cost is GATHER ROWS per sample (one row per point-level,
    # PERFORMANCE.md), so 8 levels x 4 channels keeps the same 32-d feature
    # width and halves the dominant gather cost; packed bf16 rows stay
    # <= 64 B (4ch x 8 corners x 2 B), within the free-row-width regime.
    # Quality-gated through scripts/quality_harness.py before changing any
    # default.
    grid_levels: int = 16
    grid_ch: int = 2
    # coarsest grid resolution (reference: 16). With few levels the
    # geometric level spacing gets sparse (8 levels from 16 -> 2048 is
    # per-level-scale 2.0); raising the base densifies the mid/high
    # spectrum where the detail lives (32 -> 2048 over 8 levels = 1.81).
    grid_base: int = 16
    # Asymmetric override for the 2-D grids (ambient + torso encoders):
    # None inherits the spatial grid's shape. The spatial 3-D grid carries
    # the head geometry/texture (quality-bearing), while the ambient grid
    # only decodes a learned 2-D coordinate — it tolerates fewer levels, so
    # e.g. amb 8x4/base 32 cuts 8 of the 32 encoder gather rows per sample
    # without touching the spatial capacity (PERFORMANCE.md round-5).
    amb_grid_levels: Optional[int] = None
    amb_grid_ch: Optional[int] = None
    amb_grid_base: Optional[int] = None

    @property
    def amb_levels(self) -> int:
        return self.amb_grid_levels or self.grid_levels

    @property
    def amb_ch(self) -> int:
        return self.amb_grid_ch or self.grid_ch

    @property
    def amb_base(self) -> int:
        return self.amb_grid_base or self.grid_base

    @staticmethod
    def from_options(opt) -> "NetworkConfig":
        return NetworkConfig(
            audio_in_dim=opt.audio_in_dim,
            att=opt.att,
            emb=opt.emb,
            bound=opt.bound,
            exp_eye=opt.exp_eye,
            ind_dim=opt.ind_dim,
            ind_num=opt.ind_num,
            ind_dim_torso=opt.ind_dim_torso,
            torso=opt.torso,
            torso_shrink=opt.torso_shrink,
            train_camera=opt.train_camera,
            ambient_dim=opt.amb_dim,
            compute_dtype="bfloat16" if opt.fp16 else "float32",
            grid_levels=getattr(opt, "grid_levels", 16),
            grid_ch=getattr(opt, "grid_ch", 2),
            grid_base=getattr(opt, "grid_base", 16),
            amb_grid_levels=getattr(opt, "amb_grid_levels", None),
            amb_grid_ch=getattr(opt, "amb_grid_ch", None),
            amb_grid_base=getattr(opt, "amb_grid_base", None),
        )

    @property
    def grid_spec(self) -> GridSpec:
        return GridSpec.create(
            input_dim=3, num_levels=self.grid_levels, level_dim=self.grid_ch,
            base_resolution=self.grid_base, log2_hashmap_size=16,
            desired_resolution=2048 * self.bound,
            gridtype="tiled", interpolation="linear",
        )

    @property
    def ambient_spec(self) -> GridSpec:
        return GridSpec.create(
            input_dim=self.ambient_dim, num_levels=self.amb_levels,
            level_dim=self.amb_ch, base_resolution=self.amb_base,
            log2_hashmap_size=16, desired_resolution=2048,
            gridtype="tiled", interpolation="linear",
        )

    @property
    def torso_spec(self) -> GridSpec:
        return GridSpec.create(
            input_dim=2, num_levels=self.amb_levels, level_dim=self.amb_ch,
            base_resolution=self.amb_base, log2_hashmap_size=16,
            desired_resolution=2048,
            gridtype="tiled", interpolation="linear",
        )

    @property
    def in_dim(self) -> int:
        return self.grid_spec.output_dim  # 32

    @property
    def in_dim_ambient(self) -> int:
        return self.ambient_spec.output_dim  # 32

    @property
    def eye_dim(self) -> int:
        return 1 if self.exp_eye else 0

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def table_dtype(self):
        """Grid-table storage dtype: bf16 under the fp16/-O policy (the
        reference's AMP runs its grid encoders in half precision too,
        main.py:111-113); fp32 otherwise. Halves gather row bytes."""
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def init_params(key: jax.Array, cfg: NetworkConfig) -> dict:
    """Build the full parameter pytree."""
    ks = jax.random.split(key, 16)
    sh_dim = 16  # SH degree 4
    params = {
        "audio_net": audio_net_init(ks[0], cfg.audio_in_dim, cfg.audio_dim),
        "encoder": cfg.grid_spec.init(ks[1]),
        "encoder_ambient": cfg.ambient_spec.init(ks[2]),
        "ambient_net": mlp_init(
            ks[3], cfg.in_dim + cfg.audio_dim, cfg.ambient_dim,
            cfg.hidden_dim_ambient, cfg.num_layers_ambient,
        ),
        "sigma_net": mlp_init(
            ks[4], cfg.in_dim + cfg.in_dim_ambient + cfg.eye_dim,
            1 + cfg.geo_feat_dim, cfg.hidden_dim, cfg.num_layers,
        ),
        "color_net": mlp_init(
            ks[5], sh_dim + cfg.geo_feat_dim + cfg.ind_dim, 3,
            cfg.hidden_dim_color, cfg.num_layers_color,
        ),
    }
    if cfg.att > 0:
        params["audio_att_net"] = audio_att_net_init(ks[6], cfg.audio_dim)
    if cfg.emb:
        params["embedding"] = (
            jax.random.normal(ks[7], (cfg.audio_in_dim, cfg.audio_in_dim)) * 1.0
        )
    if cfg.ind_dim > 0:
        params["individual_codes"] = (
            jax.random.normal(ks[8], (cfg.ind_num, cfg.ind_dim)) * 0.1
        )
    if cfg.torso:
        deform_in = freq_output_dim(2, 10)  # 42
        pose_in = freq_output_dim(6, 4)  # 54
        params["torso_deform_net"] = mlp_init(
            ks[9], deform_in + pose_in + cfg.ind_dim_torso, 2, 64, 3
        )
        params["torso_encoder"] = cfg.torso_spec.init(ks[10])
        params["torso_net"] = mlp_init(
            ks[11], cfg.torso_spec.output_dim + deform_in + pose_in + cfg.ind_dim_torso,
            4, 32, 3,
        )
        if cfg.ind_dim_torso > 0:
            params["individual_codes_torso"] = (
                jax.random.normal(ks[12], (cfg.ind_num, cfg.ind_dim_torso)) * 0.1
            )
    if cfg.train_camera:
        params["camera_dR"] = jnp.zeros((cfg.ind_num, 3))
        params["camera_dT"] = jnp.zeros((cfg.ind_num, 3))
    return params


def encode_audio(params: dict, cfg: NetworkConfig, a: Optional[jax.Array]) -> Optional[jax.Array]:
    """[seq, audio_in_dim, 16] -> [1, audio_dim] (network.py:170-185)."""
    if a is None:
        return None
    if cfg.emb:
        # label mode: a is [seq, 16] int -> embed -> [seq, audio_in_dim, 16]
        a = jnp.transpose(params["embedding"][a], (0, 2, 1))
    enc = audio_net_apply(params["audio_net"], a)  # [seq, 64]
    if cfg.att > 0:
        enc = audio_att_net_apply(params["audio_att_net"], enc[None])  # [1, 64]
    return enc


def _spatial_and_ambient(params, cfg: NetworkConfig, x, enc_a):
    """Shared trunk of forward/density (network.py:233-252)."""
    dt = cfg.dtype
    enc_x = _encode(x, params["encoder"], cfg.grid_spec, cfg.bound,
                    table_dtype=cfg.table_dtype,
                    packed=params.get("_packed_encoder"))
    if enc_a is None:
        ambient = jnp.zeros((*x.shape[:-1], cfg.ambient_dim), jnp.float32)
    else:
        a = jnp.broadcast_to(enc_a, (*x.shape[:-1], enc_a.shape[-1]))
        h = jnp.concatenate([enc_x.astype(dt), a.astype(dt)], axis=-1)
        ambient = mlp_apply(params["ambient_net"], h, dt).astype(jnp.float32)
        ambient = jnp.tanh(ambient)  # [-1, 1]^amb_dim
    enc_w = _encode(ambient, params["encoder_ambient"], cfg.ambient_spec, 1.0,
                    table_dtype=cfg.table_dtype,
                    packed=params.get("_packed_ambient"))
    return enc_x, enc_w, ambient


def _sigma_head(params, cfg: NetworkConfig, enc_x, enc_w, e, batch_shape):
    dt = cfg.dtype
    parts = [enc_x.astype(dt), enc_w.astype(dt)]
    if e is not None:
        parts.append(jnp.broadcast_to(e.reshape(-1)[-1], (*batch_shape, 1)).astype(dt))
    h = jnp.concatenate(parts, axis=-1)
    h = mlp_apply(params["sigma_net"], h, dt)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return sigma, geo_feat


def field_forward(params, cfg: NetworkConfig, x, d, enc_a, c, e=None):
    """Full field query (network.py:222-283).

    Args:
      x: [..., 3] positions in [-bound, bound].
      d: [..., 3] unit view dirs.
      enc_a: [1, audio_dim] or None.
      c: [ind_dim] individual code or None.
      e: [1, 1] eye area scalar or None.

    Returns (sigma [...], color [..., 3], ambient [..., amb_dim]).
    """
    dt = cfg.dtype
    enc_x, enc_w, ambient = _spatial_and_ambient(params, cfg, x, enc_a)
    sigma, geo_feat = _sigma_head(params, cfg, enc_x, enc_w, e, x.shape[:-1])

    enc_d = sh_encode(d, degree=4)
    parts = [enc_d.astype(dt), geo_feat]
    if c is not None:
        parts.append(jnp.broadcast_to(c, (*x.shape[:-1], c.shape[-1])).astype(dt))
    h = jnp.concatenate(parts, axis=-1)
    h = mlp_apply(params["color_net"], h, dt)
    color = jax.nn.sigmoid(h.astype(jnp.float32))
    return sigma, color, ambient


def field_density(params, cfg: NetworkConfig, x, enc_a, e=None):
    """Density-only query for grid maintenance (network.py:286-325)."""
    enc_x, enc_w, _ = _spatial_and_ambient(params, cfg, x, enc_a)
    sigma, geo_feat = _sigma_head(params, cfg, enc_x, enc_w, e, x.shape[:-1])
    return {"sigma": sigma, "geo_feat": geo_feat}


def forward_torso(params, cfg: NetworkConfig, x, pose6, c=None):
    """2-D neural torso layer (network.py:188-219).

    Args:
      x: [..., 2] pixel coords in [-1, 1].
      pose6: [1, 6] euler+translation head pose.
      c: [ind_dim_torso] torso individual code or None.

    Returns (alpha [..., 1], color [..., 3], dx [..., 2]).
    """
    dt = cfg.dtype
    x = x * cfg.torso_shrink
    enc_pose = freq_encode(pose6, 4)  # [1, 54]
    enc_x = freq_encode(x, 10)  # [..., 42]
    parts = [enc_x, jnp.broadcast_to(enc_pose[0], (*x.shape[:-1], enc_pose.shape[-1]))]
    if c is not None:
        parts.append(jnp.broadcast_to(c, (*x.shape[:-1], c.shape[-1])))
    h = jnp.concatenate(parts, axis=-1)
    dx = mlp_apply(params["torso_deform_net"], h.astype(dt), dt).astype(jnp.float32)
    xp = jnp.clip(x + dx, -1.0, 1.0)
    enc_t = _encode(xp, params["torso_encoder"], cfg.torso_spec, 1.0,
                    table_dtype=cfg.table_dtype,
                    packed=params.get("_packed_torso"))
    h2 = jnp.concatenate([enc_t.astype(dt), h.astype(dt)], axis=-1)
    h2 = mlp_apply(params["torso_net"], h2, dt).astype(jnp.float32)
    alpha = jax.nn.sigmoid(h2[..., :1])
    color = jax.nn.sigmoid(h2[..., 1:])
    return alpha, color, dx


def param_groups(cfg: NetworkConfig):
    """Learning-rate groups, mirroring get_params (network.py:329-362).

    Returns a dict mapping top-level param key -> LR multiplier category:
      'grid' -> opt.lr, 'net' -> opt.lr_net, 'att' -> 5*lr_net,
      'camera' -> 1e-5, 'frozen' -> 0 (torso stage freezes head keys).
    """
    if cfg.torso:
        groups = {
            "torso_encoder": "grid",
            "torso_net": "net",
            "torso_deform_net": "net",
        }
        if cfg.ind_dim_torso > 0:
            groups["individual_codes_torso"] = "net"
        # everything else frozen (main.py:142-157 freezes loaded head keys)
        for k in ("audio_net", "audio_att_net", "encoder", "encoder_ambient",
                  "ambient_net", "sigma_net", "color_net", "individual_codes",
                  "embedding", "camera_dR", "camera_dT"):
            groups[k] = "frozen"
        return groups

    groups = {
        "audio_net": "net",
        "encoder": "grid",
        "encoder_ambient": "grid",
        "ambient_net": "net",
        "sigma_net": "net",
        "color_net": "net",
    }
    if cfg.att > 0:
        groups["audio_att_net"] = "att"
    if cfg.emb:
        groups["embedding"] = "grid"
    if cfg.ind_dim > 0:
        groups["individual_codes"] = "net"
    if cfg.train_camera:
        groups["camera_dR"] = "camera"
        groups["camera_dT"] = "camera"
    return groups
