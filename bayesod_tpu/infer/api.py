"""High-level serving API: raw numpy images in, detection posteriors out.

The reference's user workflow is "edit YAML, run run_inference.py, read dump
files" (SURVEY.md §3.2). This wraps the same capability as a library object:

    det = Detector.from_config("configs/retinanet_kitti.yaml")   # or from_checkpoint
    result = det(images_uint8)            # list of per-image dicts, original coords

Handles preprocessing (resize/pad/normalize), batching to the compiled batch
size, RNG management, and coordinate un-scaling — everything between a camera
frame and the reference's output schema.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from bayesod_tpu.data.preprocess import normalize_images, resize_and_pad
from bayesod_tpu.infer.detector import build_detect_fn
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from bayesod_tpu.utils.config import ExperimentConfig


class Detector:
    """Compiled BayesOD detector bound to weights + a static batch size."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        variables,
        batch_size: int = 1,
        seed: int = 0,
        mesh=None,
    ):
        """mesh (optional): a `jax.sharding.Mesh` for multi-device serving.
        The batch is split over the mesh's data axis (and MC samples over
        its sample axis when cfg.mesh.sample_parallel > 1) exactly as
        eval.evaluator.run_inference's mesh route; batch_size must divide
        the data axis. Pairs with DetectionServer for online multi-chip
        serving."""
        self.cfg = cfg
        self.batch_size = batch_size
        self._model = RetinaNet(cfg=cfg.model, train=False)
        detect_raw = build_detect_fn(
            cfg, self._model, mesh=mesh,
            mesh_cfg=cfg.mesh if mesh is not None else None,
        )

        def _detect(variables, images_u8, rng):
            images = normalize_images(images_u8, cfg.data.mean, cfg.data.std)
            return detect_raw(variables, images, rng)

        if mesh is not None:
            from bayesod_tpu.parallel import mesh as mesh_lib

            self._detect = mesh_lib.jit_serving_fn(
                _detect, mesh, cfg.mesh, batch_size
            )
            variables = jax.device_put(variables, mesh_lib.replicated(mesh))
        else:
            self._detect = jax.jit(_detect)
        self.variables = variables
        self._mesh = mesh
        self._rng = jax.random.PRNGKey(seed)
        self._calls = 0

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        yaml_path_or_cfg: Union[str, ExperimentConfig],
        batch_size: int = 1,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ) -> "Detector":
        """Random-init weights (smoke/serving-shape tests)."""
        cfg = _load(yaml_path_or_cfg)
        variables = init_variables(
            RetinaNet(cfg=cfg.model, train=False),
            rng if rng is not None else jax.random.PRNGKey(0),
            cfg.data.image_hw,
        )
        return cls(cfg, variables, batch_size, mesh=mesh)

    @classmethod
    def from_checkpoint(
        cls,
        yaml_path_or_cfg: Union[str, ExperimentConfig],
        checkpoint_dir: Optional[str] = None,
        batch_size: int = 1,
        use_ema: bool = False,
        mesh=None,
    ) -> "Detector":
        """Restore the latest Orbax checkpoint (SURVEY.md §5.4 restore flow).

        use_ema serves the EMA-smoothed weights instead of the raw params
        (requires the run to have trained with TrainConfig.ema_decay > 0).
        """
        cfg = _load(yaml_path_or_cfg)
        from bayesod_tpu.train import restore_state

        state = restore_state(cfg, checkpoint_dir)
        return cls(
            cfg, state.variables(use_ema=use_ema), batch_size, mesh=mesh
        )

    @classmethod
    def from_ensemble(
        cls,
        yaml_path_or_cfg: Union[str, ExperimentConfig],
        members: Union[int, Sequence],
        batch_size: int = 1,
        mesh=None,
    ) -> "Detector":
        """Deep-ensemble detector (BayesConfig.epistemic docs): the sample
        axis comes from M independent weight sets instead of (or, with
        epistemic='ensemble_mc', on top of) MC dropout.

        members: a list of variable trees, a list of Orbax checkpoint
        directories (each holding an independently trained run), or an int
        M for M random-init members (smoke/shape tests).
        """
        import dataclasses

        cfg = _load(yaml_path_or_cfg)
        if cfg.bayes.epistemic == "mc_dropout":
            cfg = dataclasses.replace(
                cfg, bayes=dataclasses.replace(cfg.bayes, epistemic="ensemble")
            )
        from bayesod_tpu.models.retinanet import stack_variables

        model = RetinaNet(cfg=cfg.model, train=False)
        if isinstance(members, int):
            trees = [
                init_variables(
                    model, jax.random.PRNGKey(i), cfg.data.image_hw
                )
                for i in range(members)
            ]
        elif members and isinstance(members[0], str):
            from bayesod_tpu.train import restore_state

            trees = [
                restore_state(cfg, d, model=model).variables()
                for d in members
            ]
        else:
            trees = list(members)
        return cls(cfg, stack_variables(trees), batch_size, mesh=mesh)

    def with_temperature(self, t: float, where: str = "output") -> "Detector":
        """New Detector with temperature-calibrated categoricals (fit T with
        eval.uncertainty.fit_temperature on a val split's TP/FP labels,
        reported by evaluate() as `temperature_fit`).

        where="output" (default): temper the FUSED output categorical
        (bayes.output_temperature) — the exact in-graph mirror of
        apply_temperature, so the serving ECE equals the report's
        `ece_calibrated`. Candidate selection and fusion are untouched.

        where="logits": set bayes.category_temperature — the detect graph
        scales the final cls conv kernel+bias by 1/T, so every execution
        path emits logits/T at zero runtime cost, and the tempering also
        flows through preselection, clustering scores, and category fusion
        (likelihood products / Dirichlet counts). NOTE: softmax-mean and
        fusion do not commute with tempering, so the resulting calibration
        differs from the offline fit; prefer "output" when reproducing a
        fitted T, "logits" when tempering should reshape fusion itself.
        """
        if t <= 0:
            raise ValueError(f"temperature must be positive, got {t}")
        if where not in ("output", "logits"):
            raise ValueError(f"where must be 'output' or 'logits', got {where}")
        import dataclasses

        field = (
            "output_temperature" if where == "output"
            else "category_temperature"
        )
        cfg = dataclasses.replace(
            self.cfg,
            bayes=dataclasses.replace(self.cfg.bayes, **{field: float(t)}),
        )
        return Detector(cfg, self.variables, self.batch_size, mesh=self._mesh)

    def quantized(
        self,
        calib_images: Sequence[np.ndarray],
        margin: float = 1.0,
        backbone: bool = True,
        trunk: bool = True,
        fpn: bool = True,
        table: bool = False,
    ) -> "Detector":
        """New Detector serving the SAME weights through the int8-resident
        backbone / FPN / head trunks (models/{resnet,fpn,heads}.py),
        calibrated on the given raw uint8 images. The backbone path needs
        norm=batchnorm (skipped otherwise); FPN and trunks quantize under
        any config. PTQ-grade accuracy — DESIGN.md §8 ablations."""
        import dataclasses

        from bayesod_tpu.models.calibration import quantized_serving_config

        if self.cfg.bayes.epistemic != "mc_dropout":
            raise ValueError(
                "int8-resident calibration assumes ONE weight set; "
                "quantize per member before stacking an ensemble"
            )

        batch = np.zeros(
            (len(calib_images), *self.cfg.data.image_hw, 3), np.uint8
        )
        for i, img in enumerate(calib_images):
            batch[i], _, _ = resize_and_pad(
                np.asarray(img), np.zeros((0, 4), np.float32),
                self.cfg.data.image_hw,
            )
        normalized = normalize_images(
            jnp.asarray(batch), self.cfg.data.mean, self.cfg.data.std
        )
        base = dataclasses.replace(
            self.cfg,
            model=dataclasses.replace(
                self.cfg.model, backbone_dtype="bf16",
                backbone_act_scales=None,
                head_trunk_dtype="bf16", head_trunk_act_scales=None,
                fpn_dtype="bf16", fpn_act_scales=None,
                head_table_dtype="bf16", head_table_scales=None,
            ),
        )
        cfg8 = quantized_serving_config(
            base, self.variables, normalized, margin=margin,
            backbone=backbone, trunk=trunk, fpn=fpn, table=table,
        )
        return Detector(cfg8, self.variables, self.batch_size, mesh=self._mesh)

    # -- inference ------------------------------------------------------------

    def dispatch(
        self, images: Sequence[np.ndarray], rng: Optional[jax.Array] = None
    ):
        """Async half of __call__: preprocess + launch the device graph for
        ONE chunk of up to batch_size images WITHOUT fetching results. The
        returned handle goes to collect(); dispatching the next chunk
        before collecting the previous overlaps host preprocessing and H2D
        with device compute (jax async dispatch)."""
        if len(images) > self.batch_size:
            raise ValueError(
                f"dispatch takes at most batch_size={self.batch_size} "
                f"images, got {len(images)}"
            )
        batch = np.zeros(
            (self.batch_size, *self.cfg.data.image_hw, 3), np.uint8
        )
        scales = np.ones(self.batch_size, np.float32)
        shapes = []
        for i, img in enumerate(images):
            img = np.asarray(img)
            canvas, _, scale = resize_and_pad(
                img, np.zeros((0, 4), np.float32), self.cfg.data.image_hw
            )
            batch[i] = canvas
            scales[i] = scale
            shapes.append(img.shape[:2])
        if rng is None:
            step_rng = jax.random.fold_in(self._rng, self._calls)
            self._calls += 1
        else:
            step_rng = rng
        res = self._detect(self.variables, jnp.asarray(batch), step_rng)
        return (shapes, scales, res)

    def collect(self, handle) -> List[Dict[str, np.ndarray]]:
        """Fetch one dispatched chunk (the D2H sync point) and return the
        per-image result dicts in original coordinates."""
        shapes, scales, res = handle
        res = jax.tree_util.tree_map(np.asarray, res)
        out: List[Dict[str, np.ndarray]] = []
        for i, (oh, ow) in enumerate(shapes):
            v = res.valid[i]
            s = scales[i]
            boxes = np.clip(
                res.boxes[i][v] / s,
                0.0,
                np.array([ow, oh, ow, oh], np.float32),
            )
            out.append(
                {
                    "boxes": boxes,
                    "covs": res.covs[i][v] / (s * s),
                    "probs": res.probs[i][v],
                    "scores": res.scores[i][v],
                    "entropy": res.entropy[i][v],
                    "classes": res.classes[i][v],
                }
            )
        return out

    def __call__(
        self, images: Sequence[np.ndarray], rng: Optional[jax.Array] = None
    ) -> List[Dict[str, np.ndarray]]:
        """Detect on a list of HxWx3 uint8 images (any sizes).

        Returns one dict per image with boxes/covs/probs/scores/entropy/
        classes in ORIGINAL image coordinates (only valid detections).
        Chunks are double-buffered: chunk k+1 is dispatched before chunk
        k's results are fetched, overlapping host work with the device.
        """
        out: List[Dict[str, np.ndarray]] = []
        pending = None
        for start in range(0, len(images), self.batch_size):
            handle = self.dispatch(
                images[start : start + self.batch_size], rng
            )
            if pending is not None:
                out.extend(self.collect(pending))
            pending = handle
        if pending is not None:
            out.extend(self.collect(pending))
        return out


def _load(yaml_path_or_cfg) -> ExperimentConfig:
    if isinstance(yaml_path_or_cfg, ExperimentConfig):
        return yaml_path_or_cfg
    from bayesod_tpu.utils.config import load_config

    return load_config(yaml_path_or_cfg)
