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
