"""Training engine: losses, metrics, checkpoints, trainer."""

from .checkpoint import (
    import_torch_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    merge_imported,
    save_checkpoint,
)
from .losses import binary_entropy, head_loss, torso_loss
from .metrics import LMDMeter, LPIPS, LPIPSMeter, PSNRMeter
from .trainer import Trainer, build_optimizer

__all__ = [
    "import_torch_checkpoint",
    "latest_checkpoint",
    "load_checkpoint",
    "merge_imported",
    "save_checkpoint",
    "binary_entropy",
    "head_loss",
    "torso_loss",
    "LMDMeter",
    "LPIPS",
    "LPIPSMeter",
    "PSNRMeter",
    "Trainer",
    "build_optimizer",
]
