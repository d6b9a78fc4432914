"""Serialized serving artifacts: the whole detect graph as one StableHLO file.

The reference's deployment story is "clone the repo, install TF, load a
checkpoint" (SURVEY.md §2 README row). A TPU-native production framework
ships a compiler-level artifact instead: `jax.export` lowers the jitted
serving function — preprocessing, backbone, MC sampling, clustering, fusion —
to StableHLO with the weights BAKED IN as constants, serialized next to the
experiment config in a single zip. A consumer process needs bayesod_tpu only
for the thin loader (or nothing at all: the `detect.stablehlo` member is a
standard portable-artifact blob any StableHLO runtime can execute).

Contract notes:
- The serving signature is `(images uint8 [B,H,W,3], rng uint32 [2]) -> dict`
  with plain ndarray values (boxes/covs/probs/scores/entropy/classes/valid) —
  dict-of-arrays rather than the Detections NamedTuple so the output treedef
  stays serializable without custom-type registration.
- Artifacts are platform-bound: one exported on the TPU carries the Pallas
  fused kernels as custom calls and runs on TPU only; export on CPU (dense
  XLA route) for a portable CPU artifact. `ServingArtifact.platforms` says
  which.
- Batch size is static (one compiled graph per batch size, like Detector).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from bayesod_tpu.data.preprocess import normalize_images
from bayesod_tpu.infer.detector import build_detect_fn
from bayesod_tpu.models.retinanet import RetinaNet
from bayesod_tpu.utils.config import (
    ExperimentConfig,
    config_from_dict,
    config_to_dict,
    _yamlable,
)

_GRAPH = "detect.stablehlo"
_CONFIG = "config.yaml"
_META = "meta.json"
FORMAT_VERSION = 1


def export_serving_artifact(
    cfg: ExperimentConfig,
    variables,
    path: str,
    batch_size: int = 1,
) -> str:
    """Export `(images_u8, rng) -> detection dict` with weights baked in.

    Writes a zip at `path` containing the serialized StableHLO graph, the
    exact experiment config (load_config-roundtrippable YAML), and a meta
    header (format version, batch size, platforms, jax version).
    """
    from jax import export as jexport

    model = RetinaNet(cfg=cfg.model, train=False)
    detect_raw = build_detect_fn(cfg, model)

    def serve(images_u8: jnp.ndarray, rng: jnp.ndarray):
        images = normalize_images(images_u8, cfg.data.mean, cfg.data.std)
        out = detect_raw(variables, images, rng)
        return {
            "boxes": out.boxes,
            "covs": out.covs,
            "probs": out.probs,
            "scores": out.scores,
            "entropy": out.entropy,
            "classes": out.classes,
            "valid": out.valid,
        }

    example = (
        jnp.zeros((batch_size, *cfg.data.image_hw, 3), jnp.uint8),
        jnp.zeros((2,), jnp.uint32),
    )
    exported = jexport.export(jax.jit(serve))(*example)
    meta = {
        "format_version": FORMAT_VERSION,
        "batch_size": batch_size,
        "image_hw": list(cfg.data.image_hw),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_GRAPH, exported.serialize())
        z.writestr(
            _CONFIG,
            yaml.safe_dump(_yamlable(config_to_dict(cfg)), sort_keys=False),
        )
        z.writestr(_META, json.dumps(meta, indent=1))
    return path


class ServingArtifact:
    """A loaded serving bundle: `artifact(images_u8, rng) -> dict`.

    `images_u8` must be uint8 [batch_size, H, W, 3] at the exported shape
    (callers wanting arbitrary sizes/batches should wrap with
    data.preprocess.resize_and_pad like infer.api.Detector does).
    """

    def __init__(self, exported, cfg: ExperimentConfig, meta: Dict):
        self._exported = exported
        self.cfg = cfg
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self.platforms = tuple(meta["platforms"])

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jexport

        with zipfile.ZipFile(path, "r") as z:
            meta = json.loads(z.read(_META).decode())
            if meta["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {meta['format_version']} is newer than "
                    f"this loader ({FORMAT_VERSION})"
                )
            cfg = config_from_dict(yaml.safe_load(z.read(_CONFIG).decode()))
            exported = jexport.deserialize(z.read(_GRAPH))
        return cls(exported, cfg, meta)

    def __call__(
        self,
        images_u8: Union[np.ndarray, jnp.ndarray],
        rng: Optional[jnp.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        images_u8 = jnp.asarray(images_u8, jnp.uint8)
        expect = (self.batch_size, *self.cfg.data.image_hw, 3)
        if tuple(images_u8.shape) != expect:
            raise ValueError(
                f"artifact expects images {expect}, got {tuple(images_u8.shape)}"
            )
        if rng is None:
            rng = jnp.zeros((2,), jnp.uint32)
        out = self._exported.call(images_u8, jnp.asarray(rng, jnp.uint32))
        return {k: np.asarray(v) for k, v in out.items()}
