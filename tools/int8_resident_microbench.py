"""Microbench: is an int8-RESIDENT conv chain actually ~2x on this TPU?

Question behind DESIGN.md §8's int8-backbone dead end: the QuantConv knob
quantizes INSIDE each conv (block I/O stays bf16 in HBM), so neither the
byte floor nor the measured time moved. The redesign keeps activations int8
IN HBM between layers — conv int8xint8->int32, per-channel scale+shift
(folded batchnorm), relu, requantize to int8, all in the conv epilogue.

This script measures, at a C3-scale shape, a chain of L 3x3 convs in:
  * bf16:          bf16 in -> conv -> scale+shift+relu -> bf16 out
  * int8_resident: int8 in -> conv(int32 acc) -> scale+shift+relu+requant -> int8 out
  * int8_inside:   bf16 in -> quant -> conv int8 -> dequant -> bf16 out
                   (the round-1 QuantConv semantics, for reference)

plus XLA cost-analysis bytes for each, so the result separates "MXU int8 is
2x" from "the bytes actually halved".

Run ON TPU (axon tunnel): python tools/int8_resident_microbench.py
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fold_scales(c):
    # per-channel folded batchnorm scale/shift, arbitrary values
    k = jax.random.PRNGKey(0)
    return (
        jax.random.uniform(k, (c,), jnp.float32, 0.5, 1.5),
        jax.random.uniform(k, (c,), jnp.float32, -0.1, 0.1),
    )


def bf16_layer(x, w, scale, shift):
    acc = jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(acc * scale + shift).astype(jnp.bfloat16)


def int8_resident_layer(xq, wq, eff_scale, shift, out_scale):
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    h = jax.nn.relu(acc.astype(jnp.float32) * eff_scale + shift)
    return jnp.clip(jnp.round(h * (1.0 / out_scale)), -127, 127).astype(
        jnp.int8
    )


def int8_inside_layer(x, wq, w_scale, scale, shift):
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * (a_scale * w_scale) * scale + shift
    return jax.nn.relu(h).astype(jnp.bfloat16)


def chain(layer, x0, iters, n_layers, *params):
    def body(i, carry):
        x, acc = carry
        for _ in range(n_layers):
            x = layer(x, *params)
        # data dependency: scalar of this iteration feeds the next input
        s = jnp.sum(x[0, 0, 0, :3].astype(jnp.float32)) * 1e-9
        nxt = (x0.astype(jnp.float32) + s).astype(x0.dtype)
        return nxt, acc + s

    return jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))[1]


def measure(name, fn, args, iters, n_layers, warmup=2):
    run = jax.jit(fn, static_argnames=())
    t0 = time.time()
    np.asarray(run(*args, 1))
    compile_s = time.time() - t0
    np.asarray(run(*args, warmup))
    t0 = time.time()
    np.asarray(run(*args, iters))
    dt = (time.time() - t0) / iters / n_layers * 1e3
    lowered = jax.jit(fn).lower(*args, 1).compile()
    ca = lowered.cost_analysis()
    print(
        f"{name:14s} {dt:7.3f} ms/layer   bytes={ca.get('bytes accessed', 0)/1e9:.3f} GB/iter"
        f"   flops={ca.get('flops', 0)/1e12:.2f} TF/iter   (compile {compile_s:.0f}s)",
        flush=True,
    )
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=(96, 320))
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    B, (H, W), C, L = args.batch, args.hw, args.channels, args.layers
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"shape [{B},{H},{W},{C}] x {L} layers 3x3", flush=True)

    k = jax.random.PRNGKey(1)
    x_bf16 = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, C, C), jnp.float32) * 0.05
    scale, shift = fold_scales(C)

    wq = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w)) / 127.0)), -127, 127
                  ).astype(jnp.int8)
    w_scale = jnp.max(jnp.abs(w)) / 127.0
    xq = jnp.clip(jnp.round(x_bf16.astype(jnp.float32) / 0.03), -127, 127
                  ).astype(jnp.int8)

    t_bf16 = measure(
        "bf16",
        functools.partial(
            lambda x, w, s, b, it: chain(bf16_layer, x, it, L, w, s, b)
        ),
        (x_bf16, w, scale, shift),
        args.iters, L,
    )
    t_res = measure(
        "int8_resident",
        functools.partial(
            lambda x, w, s, b, it: chain(
                int8_resident_layer, x, it, L, w, s, b, 0.03
            )
        ),
        (xq, wq, scale, shift),
        args.iters, L,
    )
    t_in = measure(
        "int8_inside",
        functools.partial(
            lambda x, w, ws, s, b, it: chain(
                int8_inside_layer, x, it, L, w, ws, s, b
            )
        ),
        (x_bf16, wq, w_scale, scale, shift),
        args.iters, L,
    )
    print(
        f"speedup int8_resident vs bf16: {t_bf16 / t_res:.2f}x"
        f"   (inside-quant: {t_bf16 / t_in:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
