"""Execution-time int8 convolution (MXU int8 path, dynamic quantization).

No reference counterpart (the reference runs fp32 TF convs — SURVEY.md §2);
this is a TPU-first serving optimization: v5e's MXU doubles throughput on
int8 contractions and int8 activations halve HBM traffic, which is the
binding constraint on the flagship graph (DESIGN.md §8 roofline: measured
throughput sits on the HBM roofline, so bytes — not FLOPs — set the
ceiling).

Parameters are fp32 with the SAME names/shapes as `nn.Conv` ("kernel",
optional "bias"), so checkpoints are interchangeable between the bf16 and
int8 execution paths: train in bf16, flip the dtype knob for serving.
Quantization is dynamic — per-tensor activation absmax, per-output-channel
weight absmax — and the dequant chain is elementwise, so XLA fuses it into
the conv epilogue.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def absmax(x) -> jnp.ndarray:
    """Per-site activation absmax (the int8-resident calibration statistic;
    models/calibration.py converts it to a symmetric scale)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


class QuantConv(nn.Module):
    """k x k SAME conv executed as int8 x int8 -> int32 on the MXU."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.normal(0.01)
    dtype: Any = jnp.bfloat16  # output dtype (matches the bf16 conv path)
    # Activation quantization scale. None = dynamic per-tensor absmax —
    # robust, but the absmax reduction is an extra full pass over the
    # activation, which on an HBM-bound graph cancels the int8 byte savings
    # (measured neutral end-to-end, DESIGN.md §8). A static float (calibrated
    # offline) makes quantization purely elementwise so XLA fuses it into the
    # producer's epilogue and the activation round-trips HBM as int8.
    act_scale: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        xf = x.astype(jnp.float32)
        if self.act_scale is not None:
            x_scale = jnp.float32(self.act_scale)
        else:
            x_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        w_scale = (
            jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        )
        wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (x_scale * w_scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias
        return out.astype(self.dtype)


# ---------------------------------------------------------------------------
# int8-RESIDENT building blocks (backbone_dtype="int8_resident").
#
# Unlike QuantConv above — which quantizes INSIDE each conv while block I/O
# stays bf16 in HBM, so the byte floor never moves — these helpers keep the
# activation tensors int8 IN HBM between layers. Each layer is
#   conv(int8 x, int8 w) -> int32 acc
#   acc * eff + shift            (folded batchnorm, per-channel fp32)
#   relu; round; clip; int8      (requant to the NEXT layer's static scale)
# and the whole epilogue fuses into the conv, so the tensor that crosses HBM
# is int8. Microbench (tools/int8_resident_microbench.py, v5e, C3 shape
# [16,96,320,256] 3x3): bf16 3.31 ms/layer -> int8-resident 1.82 ms/layer
# (1.82x), cost-analysis bytes 5.30 -> 2.90 GB; the round-1 inside-quant
# semantics measured 1.36x with bytes UP (7.56 GB — the absmax pass).
# ---------------------------------------------------------------------------


class ConvKernel(nn.Module):
    """Parameter-only conv kernel, path-compatible with nn.Conv ("kernel",
    [kh, kw, cin, cout] fp32) so bf16-trained checkpoints serve the
    int8-resident path unchanged."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Callable = nn.initializers.normal(0.01)

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cin, self.features), jnp.float32,
        )


class ConvKernelBias(nn.Module):
    """Parameter-only conv kernel + bias, path-compatible with a biased
    nn.Conv ("kernel" [kh,kw,cin,cout] + "bias" [cout], fp32) so bf16-trained
    head checkpoints serve the int8-resident trunk unchanged."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Callable = nn.initializers.normal(0.01)

    @nn.compact
    def __call__(self, cin: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class BNFold(nn.Module):
    """Parameter-only BatchNorm, path-compatible with nn.BatchNorm
    ("scale"/"bias" params + "mean"/"var" batch_stats). Returns the folded
    inference transform (g, b): bn(x) = g * x + b."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        g = scale * jax.lax.rsqrt(var.value + self.epsilon)
        return g, bias - mean.value * g


def quantize_kernel(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8 weight quantization. Runs inside
    the serving graph (weights are jit inputs, not constants); the requant
    pass reads ~100 MB of fp32 weights per BATCH — noise next to the
    per-image activation bytes it saves."""
    w_scale = (
        jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    )
    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    return wq, w_scale


def conv_int8(xq: jnp.ndarray, wq: jnp.ndarray, strides: int) -> jnp.ndarray:
    """int8 x int8 -> int32 SAME conv on the MXU (2x bf16 throughput)."""
    return jax.lax.conv_general_dilated(
        xq, wq, (strides, strides), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantize_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """fp -> int8 at a static calibrated scale (elementwise; fuses into the
    producer so the HBM tensor is int8)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
    ).astype(jnp.int8)


def requant(acc, eff, shift, out_scale: float, relu: bool = True):
    """Folded epilogue: int32 acc -> scale/shift (+relu) -> int8 at
    out_scale. relu commutes with the positive 1/out_scale factor, so the
    divide folds into eff/shift and the epilogue is two FMAs + round."""
    h = acc.astype(jnp.float32) * (eff / out_scale) + shift / out_scale
    if relu:
        h = jax.nn.relu(h)
    return jnp.clip(jnp.round(h), -127, 127).astype(jnp.int8)
