"""Training: losses, per-param Adam, densification, the training loop."""

from .densify import DensifyConfig, DensifyState, densify_and_prune, reset_opacity
from .losses import photometric_loss, psnr, ssim
from .optimizer import OptimizerConfig, make_optimizer
from .trainer import TrainConfig, Trainer

__all__ = [
    "DensifyConfig",
    "DensifyState",
    "OptimizerConfig",
    "TrainConfig",
    "Trainer",
    "densify_and_prune",
    "make_optimizer",
    "photometric_loss",
    "psnr",
    "reset_opacity",
    "ssim",
]
