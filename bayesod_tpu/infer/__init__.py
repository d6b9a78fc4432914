"""Inference API: end-to-end jitted BayesOD detection (SURVEY.md §7 step 5)."""

from bayesod_tpu.infer.api import Detector
from bayesod_tpu.infer.detector import (
    Detections,
    build_detect_fn,
    jit_detect_fn,
)
from bayesod_tpu.infer.export import ServingArtifact, export_serving_artifact
from bayesod_tpu.infer.server import DetectionServer, serve_http

__all__ = [
    "Detections",
    "DetectionServer",
    "Detector",
    "ServingArtifact",
    "serve_http",
    "build_detect_fn",
    "export_serving_artifact",
    "jit_detect_fn",
]
