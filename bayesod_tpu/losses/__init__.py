"""Training objectives and target assignment (SURVEY.md §2 L5)."""

from bayesod_tpu.losses.losses import (
    attenuated_regression_loss,
    detection_loss,
    focal_loss,
    zloss,
)
from bayesod_tpu.losses.targets import AnchorTargets, assign_targets

__all__ = [
    "AnchorTargets",
    "assign_targets",
    "attenuated_regression_loss",
    "detection_loss",
    "focal_loss",
    "zloss",
]
