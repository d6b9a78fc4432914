"""Feature Pyramid Network neck producing P3..P7 (Flax linen).

Rebuild of the reference's FPN (ref: src/retina_net/models/, canonical
RetinaNet neck; SURVEY.md §2 "FPN neck"): lateral 1x1 convs on C3-C5, top-down
nearest-neighbor upsample + sum, 3x3 smoothing convs, plus P6 = stride-2 conv
on C5 and P7 = stride-2 conv on relu(P6). All levels share `channels` width.

Upsampling is done with a static-shape reshape/broadcast (jnp.repeat on
spatial axes) rather than a resize op — the factor is always exactly 2 because
padded image shapes are multiples of the coarsest stride (ops/anchors.py), and
this form fuses trivially in XLA.

`conv_dtype="int8_resident"` (serving) runs every FPN conv as int8xint8->int32
on the MXU with the dequant/bias epilogue fused in (models/quant.py — the same
redesign as the backbone/trunk paths, DESIGN.md §8). The top-down adds happen
in fp32 (two different scales meet), then requantize at a calibrated per-site
scale for the smoothing convs. Outputs stay bf16 — the head trunks requantize
at their own calibrated scales.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayesod_tpu.models.quant import (
    BNFold,
    ConvKernelBias,
    absmax as _absmax,
    conv_int8,
    quantize_act,
    quantize_kernel,
)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC, static shapes."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.bfloat16
    # "bf16" (exact) or "int8_resident" (serving; needs act_scales with
    # sites c3,c4,c5,l3,l4,l5,p6r — models/calibration.py).
    conv_dtype: str = "bf16"
    act_scales: Any = None
    capture: bool = False
    # "none" | "batchnorm": BN after every FPN conv. The canonical FPN is
    # norm-free (SGD-era); under AdamW the linear conv stack inflates
    # without bound — round-3 flagship reached mean|P3| ~ 540 and poisoned
    # everything downstream (ModelConfig.fpn_norm). BN is a per-channel
    # affine at serving: XLA folds it on the bf16 path, BNFold folds it
    # exactly into the int8_resident epilogues.
    norm: str = "none"
    train: bool = False

    def _bn(self, x: jnp.ndarray, name: str) -> jnp.ndarray:
        if self.norm == "none":
            return x
        if self.norm != "batchnorm":
            raise ValueError(
                f"unknown fpn norm '{self.norm}' (none|batchnorm — "
                "batchnorm is the foldable choice; see ModelConfig.fpn_norm)"
            )
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=f"bn_{name}",
        )(x)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        if self.conv_dtype == "int8_resident":
            return self._int8_resident(feats)
        conv = lambda f, k, s, name: lambda x: self._bn(
            nn.Conv(
                f, (k, k), strides=(s, s), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )(x),
            name,
        )
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]
        if self.capture:
            for name, c in (("c3", c3), ("c4", c4), ("c5", c5)):
                self.sow("intermediates", name, _absmax(c))

        l5 = conv(self.channels, 1, 1, "lateral5")(c5)
        l4 = conv(self.channels, 1, 1, "lateral4")(c4) + _upsample2x(l5)
        l3 = conv(self.channels, 1, 1, "lateral3")(c3) + _upsample2x(l4)
        if self.capture:
            for name, l in (("l3", l3), ("l4", l4), ("l5", l5)):
                self.sow("intermediates", name, _absmax(l))

        p3 = conv(self.channels, 3, 1, "smooth3")(l3)
        p4 = conv(self.channels, 3, 1, "smooth4")(l4)
        p5 = conv(self.channels, 3, 1, "smooth5")(l5)
        p6 = conv(self.channels, 3, 2, "p6")(c5)
        if self.capture:
            self.sow("intermediates", "p6r", _absmax(nn.relu(p6)))
        p7 = conv(self.channels, 3, 2, "p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]

    def _int8_resident(self, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        """int8 FPN: laterals/smooths/p6/p7 as int8 convs with fused
        dequant+bias epilogues; adds in fp32 where scales meet."""
        if self.act_scales is None:
            raise ValueError(
                "int8_resident FPN needs calibrated activation scales: run "
                "models/calibration.py:calibrate_serving_scales and set "
                "model.fpn_act_scales"
            )
        sc = dict(self.act_scales)

        def qconv(xq, s_in, features, ksize, strides, name):
            """int8 conv -> fp32 (dequant + bias [+ folded BN] fused into
            the epilogue)."""
            kernel, bias = ConvKernelBias(
                features, (ksize, ksize),
                nn.initializers.lecun_normal(), name=name,
            )(xq.shape[-1])
            wq, ws = quantize_kernel(kernel)
            eff, shift = s_in * ws, bias
            if self.norm == "batchnorm":
                g, b = BNFold(name=f"bn_{name}")(features)
                eff, shift = eff * g, g * bias + b
            acc = conv_int8(xq, wq, strides)
            return acc.astype(jnp.float32) * eff + shift

        def as_q(c, site):
            # int8 input = the backbone's raw block output, already at
            # THIS site's scale (RetinaNet.features verifies; the bf16
            # dequant->requant it replaces was an exact identity).
            return c if c.dtype == jnp.int8 else quantize_act(c, sc[site])

        c3q = as_q(feats["c3"], "c3")
        c4q = as_q(feats["c4"], "c4")
        c5q = as_q(feats["c5"], "c5")

        l5 = qconv(c5q, sc["c5"], self.channels, 1, 1, "lateral5")
        l4 = qconv(c4q, sc["c4"], self.channels, 1, 1, "lateral4") + _upsample2x(l5)
        l3 = qconv(c3q, sc["c3"], self.channels, 1, 1, "lateral3") + _upsample2x(l4)

        p3 = qconv(quantize_act(l3, sc["l3"]), sc["l3"], self.channels, 3, 1, "smooth3")
        p4 = qconv(quantize_act(l4, sc["l4"]), sc["l4"], self.channels, 3, 1, "smooth4")
        p5 = qconv(quantize_act(l5, sc["l5"]), sc["l5"], self.channels, 3, 1, "smooth5")
        p6 = qconv(c5q, sc["c5"], self.channels, 3, 2, "p6")
        p7 = qconv(
            quantize_act(jax.nn.relu(p6), sc["p6r"]), sc["p6r"],
            self.channels, 3, 2, "p7",
        )
        return [p.astype(self.dtype) for p in (p3, p4, p5, p6, p7)]
