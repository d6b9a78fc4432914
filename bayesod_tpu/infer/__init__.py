"""Inference API: end-to-end jitted BayesOD detection (SURVEY.md §7 step 5)."""

from bayesod_tpu.infer.api import Detector
from bayesod_tpu.infer.detector import (
    Detections,
    build_detect_fn,
    jit_detect_fn,
)

__all__ = ["Detections", "Detector", "build_detect_fn", "jit_detect_fn"]
