"""Post-training calibration for the int8-resident backbone.

backbone_dtype="int8_resident" (models/resnet.py) keeps activations int8 in
HBM between layers, which requires a STATIC scale at every quantization site
— dynamic absmax would force an extra full pass over each activation and
break the conv-epilogue fusion (the round-1 int8 dead end, DESIGN.md §8).

This module produces those scales: run the bf16 backbone over a calibration
batch with per-site absmax capture (ResNet.capture_scales sows into the
"intermediates" collection), convert absmax -> symmetric int8 scale, and
return the hashable tuple that ModelConfig.backbone_act_scales expects.

No reference counterpart (SURVEY.md §2 — the reference serves fp32 TF);
this is TPU-serving machinery.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from bayesod_tpu.models.resnet import ResNet



def _to_scale(sown_value, margin: float) -> float:
    """absmax capture -> symmetric int8 scale: max(absmax*margin, 1e-6)/127.
    THE calibration rule — every quantized subgraph derives its scales here
    so the formula cannot diverge between backbone-only and full-graph
    calibration."""
    return max(float(np.asarray(sown_value[0])) * margin, 1e-6) / 127.0


def _walk_absmax(tree, margin: float, out: Dict[str, float], prefix=""):
    """Flatten a sown "intermediates" subtree into {site: scale}."""
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, Mapping):
            _walk_absmax(value, margin, out, path)
        else:
            out[path] = _to_scale(value, margin)


def calibrate_backbone_scales(
    cfg,
    variables,
    images: jnp.ndarray,
    margin: float = 1.0,
) -> Tuple[Tuple[str, float], ...]:
    """Per-site int8 activation scales for the backbone.

    Args:
      cfg: ExperimentConfig (model section is read).
      variables: full model variables (as produced by init_variables /
        checkpoint restore — must contain params["backbone"]).
      images: calibration batch, ALREADY normalized the way the model sees
        it (use bayesod_tpu.data.preprocess.normalize_images on raw uint8).
      margin: multiplier on the observed absmax (1.0 = clip exactly at the
        calibration range; >1 leaves headroom for unseen inputs).

    Returns:
      Sorted tuple of (site, scale) pairs for
      ModelConfig.backbone_act_scales; sites are "stem",
      "<stageS_blockB>/{q1,q2,out}" ("q2" only for bottleneck variants),
      and "<stageS_block0>/proj" (pre-add projection-branch scale — the
      round-5 s32-spill fix; resnet.py falls back to a bf16 proj epilogue
      when absent, so pre-round-5 scale sets still serve).
    """
    from bayesod_tpu.models.retinanet import _dtype_of

    backbone = ResNet(
        variant=cfg.model.backbone,
        norm=cfg.model.norm,
        stem=cfg.model.stem,
        dtype=_dtype_of(cfg.model),
        train=False,
        conv_dtype="bf16",
        capture_scales=True,
    )
    bvars = {"params": variables["params"]["backbone"]}
    if "batch_stats" in variables:
        bvars["batch_stats"] = variables["batch_stats"]["backbone"]
    _, state = backbone.apply(bvars, images, mutable=["intermediates"])

    flat: Dict[str, float] = {}
    _walk_absmax(state["intermediates"], margin, flat)
    return tuple(sorted(flat.items()))


def with_int8_resident_backbone(cfg, variables, images, margin: float = 1.0):
    """Convenience: calibrate and return a new ExperimentConfig with
    backbone_dtype="int8_resident" + the calibrated scales set."""
    scales = calibrate_backbone_scales(cfg, variables, images, margin)
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            backbone_dtype="int8_resident",
            backbone_act_scales=scales,
        ),
    )


def calibrate_serving_scales(
    cfg,
    variables,
    images: jnp.ndarray,
    margin: float = 1.0,
) -> Tuple[
    Tuple[Tuple[str, float], ...],
    Tuple[Tuple[str, float], ...],
    Tuple[Tuple[str, float], ...],
    Tuple[Tuple[str, float], ...],
]:
    """ONE bf16 capture pass over backbone + FPN + head trunks, returning
    (backbone_scales, fpn_scales, trunk_scales, table_scales) — the inputs
    for ModelConfig.backbone_act_scales / .fpn_act_scales /
    .head_trunk_act_scales / .head_table_scales.

    Trunk sites are "{cls|reg}/p{level}_{in|conv{i}}": the trunk weights are
    shared across pyramid levels, but activation statistics are not, so each
    level gets its own requant constants (free — they're epilogue scalars).
    FPN sites are c3,c4,c5 (inputs), l3,l4,l5 (post-add, pre-smooth), p6r.
    Table sites are ("cls", s), ("reg", s) — ONE scale per head over all
    levels (the trunk convs are level-shared, so trunk-OUTPUT ranges match
    across levels; the scale quantizes the candidate kernels' row table).
    """
    from bayesod_tpu.models.retinanet import RetinaNet

    bf16_model = dataclasses.replace(
        cfg.model, backbone_dtype="bf16", backbone_act_scales=None,
        head_trunk_dtype="bf16", head_trunk_act_scales=None,
        fpn_dtype="bf16", fpn_act_scales=None,
    )
    model = RetinaNet(cfg=bf16_model, train=False, capture_scales=True)

    def run(m, imgs):
        return m.head_trunk_outputs(m.features(imgs))

    (cls_t, reg_t), state = model.apply(
        variables, images, method=run, mutable=["intermediates"]
    )
    inter = state["intermediates"]

    backbone: Dict[str, float] = {}
    _walk_absmax(inter["backbone"], margin, backbone)

    fpn = {
        site: _to_scale(value, margin) for site, value in inter["fpn"].items()
    }

    trunk: Dict[str, float] = {}
    for trunk_key, prefix in (("cls_trunk", "cls"), ("reg_trunk", "reg")):
        for site, value in inter["heads"][trunk_key].items():
            trunk[f"{prefix}/{site}"] = _to_scale(value, margin)

    def table_scale(levels) -> float:
        # 99.99th-percentile absmax, not the max: one exploded activation
        # (observed: an overfit flagship checkpoint with cls-trunk absmax
        # 1.25e6 vs typical values ~1e2) would otherwise blow the scale up
        # until every normal value quantizes to 0 and the quantized graph
        # emits ZERO detections. Values above the quantile saturate at
        # +-127 (quantize_act clips) — ordering-preserving for scores.
        m = jnp.quantile(
            jnp.concatenate(
                [jnp.abs(t.astype(jnp.float32)).ravel() for t in levels]
            ),
            0.9999,
        )
        return _to_scale((m,), margin)  # (m,) matches the sown-tuple shape

    table = {"cls": table_scale(cls_t), "reg": table_scale(reg_t)}

    return (
        tuple(sorted(backbone.items())),
        tuple(sorted(fpn.items())),
        tuple(sorted(trunk.items())),
        tuple(sorted(table.items())),
    )


def quantized_serving_config(
    cfg,
    variables,
    images: jnp.ndarray,
    margin: float = 1.0,
    backbone: bool = True,
    trunk: bool = True,
    fpn: bool = True,
    table: "bool | str" = False,
    scales=None,
):
    """Calibrate and return an ExperimentConfig serving the same weights
    through the int8-resident backbone / FPN / head trunks. The backbone
    path needs norm="batchnorm" (it folds BN statically); the FPN and trunk
    paths fold their optional BatchNorm (fpn_norm/head_norm) the same way
    and also work norm-free. `table` additionally
    quantizes the candidate kernels' trunk row tables to int8
    (ModelConfig.head_table_dtype — orthogonal to the other three, works
    on an otherwise-bf16 graph too).

    `scales` short-circuits the capture pass with a precomputed
    (backbone, fpn, trunk, table) scale 4-tuple — exactly
    calibrate_serving_scales' return value (e.g. loaded from a committed
    YAML; the capture is deterministic in (weights, calib batch))."""
    if backbone and cfg.model.norm != "batchnorm":
        backbone = False  # fpn/trunk-only quantization still applies
    backbone_scales, fpn_scales, trunk_scales, table_scales = (
        scales
        if scales is not None
        else calibrate_serving_scales(cfg, variables, images, margin)
    )
    model = cfg.model
    if backbone:
        model = dataclasses.replace(
            model, backbone_dtype="int8_resident",
            backbone_act_scales=backbone_scales,
        )
    if fpn:
        model = dataclasses.replace(
            model, fpn_dtype="int8_resident", fpn_act_scales=fpn_scales,
        )
    if trunk:
        model = dataclasses.replace(
            model, head_trunk_dtype="int8_resident",
            head_trunk_act_scales=trunk_scales,
        )
    if table:
        # table=True -> both heads; table="int8_reg" -> reg only (safe when
        # the cls trunk's dynamic range exceeds int8 — see retinanet.py).
        model = dataclasses.replace(
            model,
            head_table_dtype=table if isinstance(table, str) else "int8",
            head_table_scales=table_scales,
        )
    return dataclasses.replace(cfg, model=model)
