"""Configuration for the TPU-native RAD-NeRF framework.

Replaces the reference's argparse namespace (reference main.py:12-108,
duplicated in test.py:12-108) with one typed dataclass. Field names and
defaults mirror the reference CLI so recipes translate 1:1; the `-O` bundle
and test-mode smoothing derivations (main.py:111-118) are `apply_O()` /
`apply_test_mode()`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Options:
    # data
    path: str = ""
    workspace: str = "workspace"
    seed: int = 0
    data_range: Tuple[int, int] = (0, -1)

    # training
    iters: int = 200_000
    lr: float = 5e-3
    lr_net: float = 5e-4
    ckpt: str = "latest"
    num_rays: int = 4096 * 16
    max_steps: int = 16
    update_extra_interval: int = 16
    # non-reference extension: the reference hardcodes EMA updates every
    # 1000 steps (nerf/utils.py:578), sized for 200k-iter schedules;
    # reduced-iteration recipes (quality harness, CI) need it shortened or
    # eval renders near-initial EMA weights
    ema_update_interval: int = 1000
    # accepted for reference-CLI parity only: the reference uses this to
    # chunk rays in its non-cuda_ray staged renderer (renderer.py:504-528),
    # a path its own main.py:120 makes unreachable (cuda_ray forced True).
    # The TPU renderer has no staged fallback either — the flag is a no-op
    # here exactly as it is in every reference recipe.
    max_ray_batch: int = 4096

    # precision / losses
    fp16: bool = False  # on TPU this selects bfloat16 compute
    lambda_amb: float = 0.1

    # appearance / conditioning
    bg_img: str = ""
    exp_eye: bool = False
    fix_eye: float = -1.0
    smooth_eye: bool = False
    torso_shrink: float = 0.8

    # scene
    color_space: str = "srgb"
    preload: int = 0
    bound: float = 1.0
    scale: float = 4.0
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    dt_gamma: float = 1.0 / 256
    # non-reference extension (TPU fast path): density-prior transmittance
    # cull threshold (RenderConfig.cull_T). The training default 1e-6 is
    # two decades safer than the reference's own inference early-
    # termination (T_thresh=1e-4, reference nerf/renderer.py:158); pure-
    # inference runs may set 1e-4 for ~25% fewer field evaluations at
    # reference-faithful semantics (probed: scripts/probe_cull.py).
    cull_T: float = 1e-6
    min_near: float = 0.05
    density_thresh: float = 10.0
    density_thresh_torso: float = 0.01
    patch_size: int = 1

    finetune_lips: bool = False
    smooth_lips: bool = False
    # path to LPIPS-alex calibration weights (npz or torch file; see
    # LPIPS.load_weights_file) — empty means uncalibrated random filters,
    # which the Trainer warns about when a perceptual loss is active
    lpips_weights: str = ""

    torso: bool = False
    head_ckpt: str = ""

    # GUI-equivalent interactive defaults (headless frame server)
    gui: bool = False
    W: int = 450
    H: int = 450
    radius: float = 3.35
    fovy: float = 21.24
    max_spp: int = 1

    # audio
    att: int = 2
    aud: str = ""
    emb: bool = False
    ind_dim: int = 4
    ind_num: int = 10_000
    ind_dim_torso: int = 8
    amb_dim: int = 2
    part: bool = False
    part2: bool = False

    train_camera: bool = False
    smooth_path: bool = False
    smooth_path_window: int = 7

    # asr (streaming features)
    asr: bool = False
    asr_wav: str = ""
    asr_play: bool = False
    asr_model: str = "cpierse/wav2vec2-large-xlsr-53-esperanto"
    asr_save_feats: bool = False
    fps: int = 50
    l: int = 10
    m: int = 50
    r: int = 10

    # test-mode flags
    test: bool = False
    test_train: bool = False
    smooth_camera_path: bool = False  # alias of smooth_path for clarity
    pose: str = ""  # inference-only: pose json

    # TPU-specific knobs (no reference counterpart)
    # Grid shape (levels x channels) for all three tiled-grid encoders.
    # Reference fixes 16x2 (network.py:133-134,165); 8x4 keeps the same
    # 32-d features and halves encoder gather rows/sample — the dominant
    # per-frame cost on TPU (PERFORMANCE.md). Checkpoints embed the shape;
    # changing it starts a new model.
    grid_levels: int = 16
    grid_ch: int = 2
    grid_base: int = 16  # coarsest grid resolution (see NetworkConfig)
    # asymmetric 2-D grid (ambient + torso encoders): None inherits the
    # spatial shape above (see NetworkConfig.amb_grid_levels)
    amb_grid_levels: Optional[int] = None
    amb_grid_ch: Optional[int] = None
    amb_grid_base: Optional[int] = None
    sample_capacity_mult: float = 4.0  # field-eval buffer = mult * num_rays
    march_iters: Optional[int] = None  # None -> safe bound from MarchConfig
    ray_capacity_frac: float = 1.0  # occupied-bbox ray compaction capacity
    data_parallel: bool = False  # shard ray batches over the device mesh
    # adapt ray/sample capacities to measured occupancy (the mean_count
    # analogue, raymarching.py:224-229); bounded bucketed recompiles
    auto_capacity: bool = True
    # capacity fields the user EXPLICITLY set (CLI provenance, filled by
    # main.py:options_from_args). Trainer keeps these over a checkpoint's
    # trained capacities; everything else restores from checkpoint meta.
    # A constructor-supplied RenderConfig is a *starting* config, not an
    # override — only names listed here (or Trainer(cap_overrides=...))
    # block the restore.
    cap_overrides: Tuple[str, ...] = ()

    def apply_O(self) -> "Options":
        """-O bundle: fp16 + exp_eye (main.py:111-113)."""
        self.fp16 = True
        self.exp_eye = True
        return self

    def apply_test_mode(self) -> "Options":
        """test-mode smoothing defaults (main.py:115-118)."""
        self.test = True
        self.smooth_path = True
        self.smooth_eye = True
        self.smooth_lips = True
        return self

    @property
    def audio_in_dim(self) -> int:
        # network.py:114-119
        if "esperanto" in self.asr_model:
            return 44
        if "deepspeech" in self.asr_model:
            return 29
        return 32
