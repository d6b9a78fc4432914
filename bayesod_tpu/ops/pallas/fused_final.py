"""Fused MC-dropout + 3x3 prediction conv as one Pallas TPU kernel.

The per-sample cost of MC inference with `dropout_layers="last"` is:
  mask = bernoulli(rng, [B,H,W,256])        (materialized in HBM)
  y_n  = conv3x3(x * mask / keep, W)        (re-reads the masked copy)
per sample n — measured ~4.1 ms / 16-image batch / sample on v5e, dominated
by HBM traffic for the masked activations and lane-underfilled final convs.

This kernel runs the whole thing on-chip, one program per (image, sample):
  * the shared trunk activation block (padded, bf16) is DMA'd to VMEM once,
  * the dropout mask is generated IN REGISTERS from the TPU hardware PRNG
    (pltpu.prng_*) — nothing ever hits HBM,
  * the 3x3 conv is computed as 9 shifted [H*W, Cin] @ [Cin, Cout] MXU
    matmuls accumulated in fp32,
  * only the [H, W, Cout] result is written back.

Cout for RetinaNet finals is 36/72 (<128 lanes); cls+reg are still separate
kernels because their inputs differ, but the padding waste now rides VMEM,
not HBM. Semantics: same Bernoulli(keep)/keep scaling as flax Dropout; the
RNG stream differs (hardware PRNG vs threefry), which changes *which* masks
are drawn, not their distribution — MC estimates are statistically
equivalent, and tests assert exact conv parity at rate=0 plus mask-rate /
moment statistics at rate>0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    seed_ref,  # [1, 1] int32 SMEM
    x_ref,  # [1, Hp+2, W+2, Cin] bf16 VMEM (zero-padded borders)
    w_ref,  # [9, Cin, Cp] bf16 or int8 VMEM
    b_ref,  # [1, Cp] fp32 VMEM
    wscale_ref,  # [1, Cp] fp32 VMEM (int8 path; ones otherwise)
    out_ref,  # [1, 1, RB, W, Cp] bf16 VMEM (one row block)
    *,
    rb: int,
    w: int,
    cin: int,
    cp: int,
    keep_prob: float,
    threshold: int,
    quantized: bool,
):
    b_idx = pl.program_id(0)
    n_idx = pl.program_id(1)
    r_idx = pl.program_id(2)
    n_total = pl.num_programs(1)
    row0 = r_idx * rb

    def keep_mask(row0, hb):
        """Stateless counter-based dropout mask for padded rows
        [row0, row0+hb): a splitmix32-style integer mixer over (seed, image,
        sample, absolute element index). Pure VPU integer ops — identical in
        interpret mode and on hardware, reproducible across backends, never
        touches HBM — and because it is addressed by absolute index, the
        overlapping halo rows of adjacent row blocks mask identically."""
        stream = (
            seed_ref[0, 0] * jnp.int32(1000003)
            + (b_idx * n_total + n_idx) * jnp.int32(-1640531527)  # 0x9E3779B9
        ).astype(jnp.uint32)
        idx = (
            (
                jax.lax.broadcasted_iota(jnp.int32, (hb, w + 2, cin), 0)
                + jnp.int32(row0)
            )
            * jnp.int32((w + 2) * cin)
            + jax.lax.broadcasted_iota(jnp.int32, (hb, w + 2, cin), 1)
            * jnp.int32(cin)
            + jax.lax.broadcasted_iota(jnp.int32, (hb, w + 2, cin), 2)
        ).astype(jnp.uint32)
        z = idx + stream
        z = z ^ (z >> jnp.uint32(16))
        z = z * jnp.uint32(0x85EBCA6B)
        z = z ^ (z >> jnp.uint32(13))
        z = z * jnp.uint32(0xC2B2AE35)
        z = z ^ (z >> jnp.uint32(16))
        return (z >> jnp.uint32(1)) < jnp.uint32(threshold)

    # Row-blocked via the grid: each program computes RB output rows from the
    # (RB+2)-row padded slab. Only the slab is ever loaded from the resident
    # input block (ref indexing, not a full-map materialization), keeping the
    # working set ~2 MB — the whole-map form blew the 16 MB VMEM budget at
    # production shapes.
    slab = x_ref[0, pl.ds(row0, rb + 2)]  # [RB+2, W+2, Cin]

    if quantized:
        # Dynamic per-slab activation scale; the mask multiplies int8 values
        # by 0/1 and the Bernoulli 1/keep correction folds into the dequant
        # scale, so quantization cost is one pass per slab.
        sf = slab.astype(jnp.float32)
        x_scale = jnp.maximum(jnp.max(jnp.abs(sf)), 1e-6) / 127.0
        slab = jnp.clip(
            jnp.round(sf * (1.0 / x_scale)), -127.0, 127.0
        ).astype(jnp.int8)
        acc_dtype = jnp.int32
    else:
        acc_dtype = jnp.float32

    if keep_prob < 1.0:
        keep = keep_mask(row0, rb + 2)
        if quantized:
            slab = jnp.where(keep, slab, jnp.int8(0))
        else:
            slab = jnp.where(keep, slab * (1.0 / keep_prob), 0.0).astype(
                x_ref.dtype
            )

    acc = jnp.zeros((rb * w, cp), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            # out[i, j] += x[i+dy, j+dx] @ W[dy*3+dx] (SAME, pad=1)
            window = jax.lax.slice(slab, (dy, dx, 0), (dy + rb, dx + w, cin))
            acc = acc + jnp.dot(
                window.reshape(rb * w, cin),
                w_ref[dy * 3 + dx],
                preferred_element_type=acc_dtype,
            )
    if quantized:
        scale = (x_scale / keep_prob) * wscale_ref[0][None, :]
        accf = acc.astype(jnp.float32) * scale + b_ref[0][None, :]
    else:
        accf = acc + b_ref[0][None, :]
    out_ref[0, 0] = accf.reshape(rb, w, cp).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "keep_prob", "interpret", "dtype"),
)
def dropout_final_conv(
    x: jnp.ndarray,  # [B, H, W, Cin] shared trunk activations
    kernel: jnp.ndarray,  # [3, 3, Cin, Cout] conv weights (HWIO)
    bias: jnp.ndarray,  # [Cout]
    seed: jnp.ndarray,  # scalar int32
    num_samples: int,
    keep_prob: float,
    interpret: Optional[bool] = None,
    dtype: str = "bf16",
) -> jnp.ndarray:
    """[B,H,W,Cin] -> [N,B,H,W,Cout]: N dropout samples x 3x3 SAME conv.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (identical results — the mask is a stateless integer hash).
    dtype: "bf16" (exact) or "int8" — dynamic per-block activation scale +
    per-output-channel weight scale; the MXU's int8 path doubles throughput
    on the lane-padded final matmuls at <1% relative logit error.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dtype not in ("bf16", "int8"):
        raise ValueError(f"unknown fused-final dtype '{dtype}'")
    quantized = dtype == "int8"
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    cp = _round_up(cout, 128)
    rb = min(16, _round_up(h, 8))  # output rows per program
    hp = _round_up(h, rb)

    x_pad = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 1 + (hp - h)), (1, 1), (0, 0)),
    )
    kernel9 = kernel.reshape(9, cin, cout).astype(jnp.float32)
    if quantized:
        w_absmax = jnp.maximum(jnp.max(jnp.abs(kernel9), axis=(0, 1)), 1e-8)
        w_scale = w_absmax / 127.0  # [Cout]
        wq = jnp.clip(
            jnp.round(kernel9 / w_scale[None, None, :]), -127, 127
        ).astype(jnp.int8)
        w9 = jnp.zeros((9, cin, cp), jnp.int8).at[:, :, :cout].set(wq)
        wscale_pad = jnp.zeros((1, cp), jnp.float32).at[0, :cout].set(w_scale)
    else:
        w9 = jnp.zeros((9, cin, cp), jnp.bfloat16).at[:, :, :cout].set(
            kernel9.astype(jnp.bfloat16)
        )
        wscale_pad = jnp.ones((1, cp), jnp.float32)
    b_pad = jnp.zeros((1, cp), jnp.float32).at[0, :cout].set(
        bias.astype(jnp.float32)
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    # P[keep] = threshold / 2^31
    threshold = min(int(keep_prob * 2147483648.0), 2147483647)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            rb=rb, w=w, cin=cin, cp=cp,
            keep_prob=float(keep_prob),
            threshold=threshold,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, num_samples, hp // rb),
            in_specs=[
                pl.BlockSpec(
                    (1, hp + 2, w + 2, cin),
                    lambda bi, ni, ri, sref: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (9, cin, cp), lambda bi, ni, ri, sref: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, cp), lambda bi, ni, ri, sref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, cp), lambda bi, ni, ri, sref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rb, w, cp),
                lambda bi, ni, ri, sref: (ni, bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_samples, b, hp, w, cp), jnp.bfloat16
        ),
        interpret=interpret,
    )(seed_arr, x_pad, w9, b_pad, wscale_pad)
    return out[:, :, :h, :, :cout]
