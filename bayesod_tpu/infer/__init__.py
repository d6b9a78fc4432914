"""Inference API: end-to-end jitted BayesOD detection (SURVEY.md §7 step 5)."""

from bayesod_tpu.infer.detector import (
    Detections,
    build_detect_fn,
    jit_detect_fn,
)

__all__ = ["Detections", "build_detect_fn", "jit_detect_fn"]
