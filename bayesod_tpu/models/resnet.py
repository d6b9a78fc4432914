"""ResNet backbone (Flax linen), NHWC, bf16-compute / fp32-params.

TPU-native rebuild of the reference's feature extractor
(ref: src/retina_net/models/ — a stock Keras ResNet-50 producing C3/C4/C5 for
the FPN; SURVEY.md §2 "ResNet-50 backbone"). Differences are deliberate and
TPU-motivated:

  * NHWC layout + bfloat16 conv compute: XLA's TPU conv emitter tiles NHWC
    onto the MXU directly; parameters and normalization statistics stay fp32.
  * Norm layer is selectable: BatchNorm (reference parity) or GroupNorm —
    GroupNorm has no cross-device batch statistics, so data-parallel training
    over a mesh needs no extra collectives on the norm path.
  * No ImageNet weight loading: the environment has no network and weight
    porting is out of scope (SURVEY.md §5.4); training is from scratch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayesod_tpu.models.quant import (
    BNFold,
    absmax as _absmax,
    ConvKernel,
    QuantConv,
    conv_int8,
    quantize_act,
    quantize_kernel,
    requant,
)

ModuleDef = Any

_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def make_conv(
    conv_dtype: str, dtype, act_scale=None
) -> Callable[..., nn.Module]:
    """Backbone conv factory: "bf16" -> nn.Conv (exact); "int8" -> QuantConv
    (execution-time quantization — same param names/shapes, so a bf16-trained
    checkpoint serves the int8 path; DESIGN.md §8: the flagship graph is
    HBM-bound and int8 activations halve backbone bytes). act_scale: static
    activation scale (see models/quant.py; None = dynamic absmax)."""
    init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
    if conv_dtype == "int8":
        return lambda f, k, s, name: QuantConv(
            f, kernel_size=(k, k), strides=(s, s), use_bias=False,
            kernel_init=init, dtype=dtype, act_scale=act_scale, name=name,
        )
    if conv_dtype == "bf16":
        return lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=dtype, param_dtype=jnp.float32,
            kernel_init=init, name=name,
        )
    raise ValueError(f"unknown backbone conv dtype '{conv_dtype}'")


STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
BOTTLENECK = {
    "resnet18": False,
    "resnet34": False,
    "resnet50": True,
    "resnet101": True,
    "resnet152": True,
}


def make_norm(norm: str, dtype, train: bool) -> Callable[..., nn.Module]:
    """Build a norm-layer constructor. fp32 statistics regardless of dtype."""
    if norm == "batchnorm":
        return lambda name=None: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
    if norm == "groupnorm":
        return lambda name=None: nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
            name=name,
        )
    raise ValueError(f"unknown norm '{norm}'")


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut when needed."""

    features: int  # inner width; output is 4x
    strides: int
    norm: str
    dtype: Any = jnp.bfloat16
    train: bool = False
    conv_dtype: str = "bf16"
    act_scale: Any = None
    # int8_resident: (("in", s), ("q1", s), ("q2", s), ("out", s)) static
    # activation scales (models/calibration.py). capture: bf16 path sows
    # per-site absmax into the "intermediates" collection for calibration.
    scales: Any = None
    capture: bool = False

    @nn.compact
    def __call__(self, x):
        if self.conv_dtype == "int8_resident":
            return self._int8_resident(x)
        norm = make_norm(self.norm, self.dtype, self.train)
        conv = make_conv(self.conv_dtype, self.dtype, self.act_scale)
        residual = x
        y = nn.relu(norm(name="bn1")(conv(self.features, 1, 1, "conv1")(x)))
        if self.capture:
            self.sow("intermediates", "q1", _absmax(y))
        y = nn.relu(norm(name="bn2")(conv(self.features, 3, self.strides, "conv2")(y)))
        if self.capture:
            self.sow("intermediates", "q2", _absmax(y))
        y = norm(name="bn3")(conv(4 * self.features, 1, 1, "conv3")(y))
        if residual.shape[-1] != y.shape[-1] or self.strides != 1:
            residual = norm(name="bn_proj")(
                conv(4 * self.features, 1, self.strides, "conv_proj")(residual)
            )
            if self.capture:
                # Pre-add projection-branch absmax: the int8_resident path
                # requants this branch to int8 inside the conv_proj epilogue
                # (site "proj") so the residual add reads int8, not a spilled
                # s32 accumulator (DESIGN.md §8 round-4 probe).
                self.sow("intermediates", "proj", _absmax(residual))
        out = nn.relu(y + residual)
        if self.capture:
            self.sow("intermediates", "out", _absmax(out))
        return out

    def _int8_resident(self, xq):
        """int8-in/int8-out execution: conv int32 accumulate, folded-BN
        scale/shift + relu + requant in the conv epilogue (models/quant.py;
        measured 1.82x over bf16 at C3 shape). xq is int8 at scales['in'].

        Projection blocks: two convs feed the residual add, and XLA's conv
        epilogue fusion can absorb the add tail into only ONE of them — the
        other's raw s32 accumulator spilled to HBM (0.94 GB/batch-16, 23.6%
        of quantized-backbone bytes; round-4 HLO probe, DESIGN.md §8). Fix:
        give EACH branch its own single-consumer epilogue — conv_proj
        requants to int8 at the calibrated pre-add scale (site "proj"),
        conv3 dequantizes to bf16 — so the tensor crossing HBM is 1-2 bytes
        either way, and the add+relu+requant runs as a cheap elementwise
        pass. Falls back to a bf16 proj epilogue when the scale set predates
        the "proj" site (old calibration caches)."""
        sc = dict(self.scales)
        s_in, s1, s2, s_out = sc["in"], sc["q1"], sc["q2"], sc["out"]
        cin, width = xq.shape[-1], self.features

        wq1, ws1 = quantize_kernel(ConvKernel(width, (1, 1), _INIT, name="conv1")(cin))
        g1, b1 = BNFold(name="bn1")(width)
        q1 = requant(conv_int8(xq, wq1, 1), s_in * ws1 * g1, b1, s1)

        wq2, ws2 = quantize_kernel(ConvKernel(width, (3, 3), _INIT, name="conv2")(width))
        g2, b2 = BNFold(name="bn2")(width)
        q2 = requant(conv_int8(q1, wq2, self.strides), s1 * ws2 * g2, b2, s2)

        wq3, ws3 = quantize_kernel(
            ConvKernel(4 * width, (1, 1), _INIT, name="conv3")(width)
        )
        g3, b3 = BNFold(name="bn3")(4 * width)
        y = conv_int8(q2, wq3, 1).astype(jnp.float32) * (s2 * ws3 * g3) + b3

        if cin != 4 * width or self.strides != 1:
            wqp, wsp = quantize_kernel(
                ConvKernel(4 * width, (1, 1), _INIT, name="conv_proj")(cin)
            )
            gp, bp = BNFold(name="bn_proj")(4 * width)
            acc_p = conv_int8(xq, wqp, self.strides)
            s_proj = sc.get("proj")
            if s_proj is not None:
                rq = requant(acc_p, s_in * wsp * gp, bp, s_proj, relu=False)
                r = rq.astype(jnp.float32) * s_proj
            else:
                r = (
                    acc_p.astype(jnp.float32) * (s_in * wsp * gp) + bp
                ).astype(jnp.bfloat16).astype(jnp.float32)
            # bf16-bound the main branch too so whichever conv XLA leaves
            # unfused spills 2 bytes/elem, not the 4-byte accumulator.
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            r = xq.astype(jnp.float32) * s_in
        return quantize_act(jax.nn.relu(y + r), s_out)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (resnet18/34)."""

    features: int
    strides: int
    norm: str
    dtype: Any = jnp.bfloat16
    train: bool = False
    conv_dtype: str = "bf16"
    act_scale: Any = None
    scales: Any = None  # int8_resident: (("in",s),("q1",s),("out",s))
    capture: bool = False

    @nn.compact
    def __call__(self, x):
        if self.conv_dtype == "int8_resident":
            return self._int8_resident(x)
        norm = make_norm(self.norm, self.dtype, self.train)
        conv = make_conv(self.conv_dtype, self.dtype, self.act_scale)
        residual = x
        y = nn.relu(norm(name="bn1")(conv(self.features, 3, self.strides, "conv1")(x)))
        if self.capture:
            self.sow("intermediates", "q1", _absmax(y))
        y = norm(name="bn2")(conv(self.features, 3, 1, "conv2")(y))
        if residual.shape[-1] != y.shape[-1] or self.strides != 1:
            residual = norm(name="bn_proj")(
                conv(self.features, 1, self.strides, "conv_proj")(residual)
            )
            if self.capture:
                self.sow("intermediates", "proj", _absmax(residual))
        out = nn.relu(y + residual)
        if self.capture:
            self.sow("intermediates", "out", _absmax(out))
        return out

    def _int8_resident(self, xq):
        """See BottleneckBlock._int8_resident."""
        sc = dict(self.scales)
        s_in, s1, s_out = sc["in"], sc["q1"], sc["out"]
        cin, width = xq.shape[-1], self.features

        wq1, ws1 = quantize_kernel(ConvKernel(width, (3, 3), _INIT, name="conv1")(cin))
        g1, b1 = BNFold(name="bn1")(width)
        q1 = requant(conv_int8(xq, wq1, self.strides), s_in * ws1 * g1, b1, s1)

        wq2, ws2 = quantize_kernel(ConvKernel(width, (3, 3), _INIT, name="conv2")(width))
        g2, b2 = BNFold(name="bn2")(width)
        y = conv_int8(q1, wq2, 1).astype(jnp.float32) * (s1 * ws2 * g2) + b2

        if cin != width or self.strides != 1:
            wqp, wsp = quantize_kernel(
                ConvKernel(width, (1, 1), _INIT, name="conv_proj")(cin)
            )
            gp, bp = BNFold(name="bn_proj")(width)
            acc_p = conv_int8(xq, wqp, self.strides)
            s_proj = sc.get("proj")
            if s_proj is not None:
                # Per-branch epilogues (see BottleneckBlock._int8_resident):
                # int8 proj + bf16 main, no s32 accumulator crosses HBM.
                rq = requant(acc_p, s_in * wsp * gp, bp, s_proj, relu=False)
                r = rq.astype(jnp.float32) * s_proj
            else:
                r = (
                    acc_p.astype(jnp.float32) * (s_in * wsp * gp) + bp
                ).astype(jnp.bfloat16).astype(jnp.float32)
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            r = xq.astype(jnp.float32) * s_in
        return quantize_act(jax.nn.relu(y + r), s_out)


class ResNet(nn.Module):
    """Backbone returning {'c3', 'c4', 'c5'} feature maps (strides 8/16/32).

    `stem` selects the input layer:
      * "conv7" — canonical 7x7/s2 conv. On TPU this conv is MXU-starved:
        3 input channels fill ~2% of the 128-deep contraction lanes.
      * "space_to_depth" (default) — rearrange 2x2 pixel blocks into channels
        ([H,W,3] -> [H/2,W/2,12]) and apply a 4x4/s1 conv: identical output
        shape/stride and equivalent receptive field (a reparametrized 8x8/s2
        superset of the 7x7), with 4x the contraction depth. The standard
        MLPerf-era TPU ResNet stem; valid here because training is from
        scratch (no reference weights exist to port — SURVEY.md §5.4).
    """

    variant: str = "resnet50"
    norm: str = "batchnorm"
    stem: str = "space_to_depth"
    dtype: Any = jnp.bfloat16
    train: bool = False
    # Residual-block conv execution: "bf16" exact; "int8" dynamic-quantized
    # inside each conv (block I/O stays bf16 — measured neutral, DESIGN §8);
    # "int8_resident" int8 activations IN HBM between layers with folded-BN
    # epilogues (1.82x at C3 shape; needs norm=batchnorm + act_scales).
    # The stem stays bf16 in every mode — 12-channel contraction gains
    # nothing from int8 and pixel statistics quantize worst.
    conv_dtype: str = "bf16"
    act_scale: Any = None  # static int8 activation scale (None = dynamic)
    # int8_resident per-site scales: (("stem", s), ("<block>/q1", s), ...)
    # from models/calibration.py:calibrate_backbone_scales.
    act_scales: Any = None
    # bf16 path: sow per-site activation absmax into "intermediates" for
    # the calibration pass.
    capture_scales: bool = False
    # Selective rematerialization (training only): wrap every residual
    # block in nn.remat, so the backward recomputes the block's inner
    # conv/bn/relu intermediates instead of reading them back from HBM —
    # only block-boundary tensors stay saved. The round-2 whole-model
    # remat was a measured dead end (XLA materialized the recomputed
    # forward to HBM, bytes went UP — DESIGN.md §8); block granularity
    # keeps each recomputation small enough to stay fused into its
    # backward consumers.
    block_remat: bool = False
    # int8_resident only: return c3/c4/c5 as the RAW int8 block outputs
    # (they already live in HBM as the next stage's input) instead of
    # dequantizing to bf16. The consumer must quantize at the SAME scale
    # the block output used (sc["stage{S}_block{last}/out"]) — then the
    # bf16 dequant->requant roundtrip it replaces is an exact identity
    # (round(q*s/s) == q) and ~0.66 GB/batch-16 of bf16 c-output traffic
    # disappears. RetinaNet.features enables this when the FPN is also
    # int8-resident and verifies the scales match (round 5).
    raw_int8_outputs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        stage_sizes = STAGE_SIZES[self.variant]
        block_cls = BottleneckBlock if BOTTLENECK[self.variant] else BasicBlock
        if self.block_remat and self.train:
            # Lifted remat preserves the variable tree (no extra scope), so
            # checkpoints are interchangeable with the non-remat model.
            block_cls = nn.remat(block_cls)
        resident = self.conv_dtype == "int8_resident"
        if resident:
            if self.train:
                raise ValueError(
                    "backbone_dtype='int8_resident' is a serving path; "
                    "train in bf16 and flip the knob for inference"
                )
            if self.norm != "batchnorm":
                raise ValueError(
                    "int8_resident folds batchnorm statically; "
                    f"norm='{self.norm}' cannot fold (group statistics "
                    "depend on the input)"
                )
            if self.act_scales is None:
                raise ValueError(
                    "int8_resident needs calibrated activation scales: run "
                    "models/calibration.py:calibrate_backbone_scales and "
                    "set model.backbone_act_scales"
                )
        norm = make_norm(self.norm, self.dtype, self.train)

        x = x.astype(self.dtype)
        if self.stem == "space_to_depth":
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = nn.Conv(
                64, (4, 4), strides=(1, 1), padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"
                ),
                name="conv_stem_s2d",
            )(x)
        elif self.stem == "conv7":
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"
                ),
                name="conv_stem",
            )(x)
        else:
            raise ValueError(f"unknown stem '{self.stem}'")
        x = nn.relu(norm(name="bn_stem")(x))
        sc = dict(self.act_scales) if resident else None
        in_scale = None
        if resident:
            # Quantize BEFORE the max-pool: max commutes with the monotone
            # round/clip, so pool(quantize(x)) == quantize(pool(x)) EXACTLY
            # — and the stem conv's epilogue then writes int8 instead of
            # bf16 (the probe's single biggest bf16 tensor, 252 MB/b16).
            # The stem "stem" calibration site is captured post-pool on the
            # bf16 path; absmax(pool(x)) == absmax over a subset <= the
            # pre-pool absmax, and relu makes every value >= 0 with the
            # max guaranteed to survive pooling, so the SAME scale clips
            # nothing extra. int8 max-pool via reduce_window (flax
            # max_pool's -inf init is float-only).
            in_scale = sc["stem"]
            x = quantize_act(x, in_scale)
            x = jax.lax.reduce_window(
                x, jnp.int8(-128), jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), "SAME",
            )
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        if self.capture_scales:
            self.sow("intermediates", "stem", _absmax(x))

        outputs: Dict[str, jnp.ndarray] = {}
        widths = (64, 128, 256, 512)
        bottleneck = BOTTLENECK[self.variant]
        for stage, (num_blocks, width) in enumerate(zip(stage_sizes, widths)):
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                name = f"stage{stage + 2}_block{block}"
                block_scales = None
                if resident:
                    keys = ("q1", "q2", "out") if bottleneck else ("q1", "out")
                    block_scales = (("in", in_scale),) + tuple(
                        (k, sc[f"{name}/{k}"]) for k in keys
                    )
                    # Pre-add projection scale (round-5 s32-spill fix);
                    # absent in pre-round-5 calibration sets -> the block
                    # falls back to a bf16 proj epilogue.
                    if f"{name}/proj" in sc:
                        block_scales += (("proj", sc[f"{name}/proj"]),)
                    in_scale = sc[f"{name}/out"]
                x = block_cls(
                    features=width,
                    strides=strides,
                    norm=self.norm,
                    dtype=self.dtype,
                    train=self.train,
                    conv_dtype=self.conv_dtype,
                    act_scale=self.act_scale,
                    scales=block_scales,
                    capture=self.capture_scales,
                    name=name,
                )(x)
            if stage >= 1:  # stages 3, 4, 5 -> strides 8, 16, 32
                if resident and self.raw_int8_outputs:
                    outputs[f"c{stage + 2}"] = x  # int8 at sc[.../out]
                elif resident:
                    outputs[f"c{stage + 2}"] = (
                        x.astype(self.dtype)
                        * jnp.asarray(in_scale, self.dtype)
                    )
                else:
                    outputs[f"c{stage + 2}"] = x
        return outputs
