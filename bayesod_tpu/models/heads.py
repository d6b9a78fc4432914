"""RetinaNet prediction subnets with interleaved MC-dropout (Flax linen).

Rebuild of the reference's classification / regression-with-variance heads
(ref: src/retina_net/models/, SURVEY.md §2 "Classification subnet" and
"Regression subnet + variance head"; arXiv:1903.03838 §III.A):

  * both subnets: `depth` x (3x3 conv, `channels`, ReLU, Dropout), weights
    SHARED across pyramid levels; dropout is the MC-sampling site and stays
    active at inference when an rng is supplied.
  * classification: final conv -> K * (num_classes + 1) logits per cell —
    categorical INCLUDING background (softmax), because BayesOD fuses full
    categorical distributions (paper §III.C), unlike canonical RetinaNet's
    per-class sigmoid. Final bias init pi=0.01 (focal-loss convention).
  * regression: final conv -> K * 8 = 4 box deltas + 4 log-variances
    (diagonal aleatoric covariance in encoded space, trained by loss
    attenuation — paper §III.A).

TPU note: heads are where the MC-sample axis multiplies FLOPs. The module is
written so the caller can vmap it over dropout rngs with the (deterministic)
FPN features held constant — the backbone is computed once per image, not once
per sample as in the reference's Python loop (SURVEY.md §3.2 hot loop #1).
Outputs are flattened to the anchor axis and concatenated across levels in
the same (level, y, x, per-cell-anchor) order as ops/anchors.generate_anchors.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


from bayesod_tpu.models.quant import (
    BNFold,
    ConvKernelBias,
    absmax as _absmax,
    QuantConv,
    conv_int8,
    quantize_act,
    quantize_kernel,
    requant,
)


class QuantConv3x3(QuantConv):
    """3x3 int8 head-trunk conv (models/quant.py), fp32 output to match the
    pre-refactor head numerics."""

    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32


class SubnetTrunk(nn.Module):
    """depth x (conv3x3 -> ReLU [-> Dropout]), shared across levels.

    `dropout_layers` controls the MC-dropout placement:
      * "all":  dropout after every conv (reference-style interleaving).
        Under `vmap` over sample rngs, convs after the first dropout carry
        the sample axis -> ~N x trunk FLOPs.
      * "last": one dropout after the final conv. The whole conv trunk stays
        sample-independent, so `vmap` computes it ONCE and only the final
        prediction convs replicate per sample — the TPU-first default
        (measured ~4x faster end-to-end at N=10 on v5e).

    `trunk_dtype` selects the conv execution:
      * "bf16" — exact (training + default serving).
      * "int8" — round-1 inside-quant path (dynamic activation scales; block
        I/O stays bf16 in HBM — measured neutral, kept for comparison).
      * "int8_resident" — activations stay int8 IN HBM between the trunk
        convs: conv int8xint8->int32, bias + relu + requant fused into the
        conv epilogue (models/quant.py; same redesign that won 1.82x/layer
        on the backbone, DESIGN.md §8). Needs static per-level per-conv
        scales (`act_scales`, models/calibration.py) and
        dropout_layers="last" (residency is broken by interleaved dropout).
        The LAST conv dequantizes to `dtype` — its output feeds the sampled
        final convs / fused Pallas kernels exactly like the bf16 path.
    """

    depth: int
    channels: int
    dropout_rate: float
    dropout_layers: str = "last"
    dtype: Any = jnp.bfloat16
    trunk_dtype: str = "bf16"
    # int8_resident: (("p{level}_in", s), ("p{level}_conv{i}", s), ...)
    # static activation scales. capture: bf16 path sows per-site absmax into
    # "intermediates" for calibration (models/calibration.py).
    act_scales: Any = None
    capture: bool = False
    # "none" | "batchnorm": conv -> BN -> ReLU per trunk conv. BN params and
    # statistics are per-LEVEL (bn{i}_p{level}) while the convs stay
    # level-shared — P3/P7 activation scales differ wildly, and a norm-free
    # trunk inflates without bound under AdamW (ModelConfig.head_norm).
    # At serving BN is a per-channel affine: XLA fuses it on the bf16 path,
    # and the int8_resident epilogue folds it exactly (BNFold).
    norm: str = "none"
    train: bool = False

    def _bn(self, x: jnp.ndarray, i: int, level: int) -> jnp.ndarray:
        if self.norm == "none":
            return x
        if self.norm != "batchnorm":
            raise ValueError(
                f"unknown head norm '{self.norm}' (none|batchnorm — "
                "batchnorm is the foldable choice; see ModelConfig.head_norm)"
            )
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
            name=f"bn{i}_p{level}",
        )(x)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, stochastic: bool, level: int = 0
    ) -> jnp.ndarray:
        if self.dropout_layers not in ("all", "last"):
            raise ValueError(f"unknown dropout_layers '{self.dropout_layers}'")
        if self.trunk_dtype == "int8_resident":
            return self._int8_resident(x, stochastic=stochastic, level=level)
        if self.capture:
            self.sow("intermediates", f"p{level}_in", _absmax(x))
        for i in range(self.depth):
            if self.trunk_dtype == "int8":
                x = QuantConv3x3(self.channels, name=f"conv{i}")(x)
            else:
                x = nn.Conv(
                    self.channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"conv{i}",
                )(x)
            x = self._bn(x, i, level)
            x = nn.relu(x)
            if self.capture and i < self.depth - 1:
                self.sow("intermediates", f"p{level}_conv{i}", _absmax(x))
            if self.dropout_layers == "all" or i == self.depth - 1:
                x = nn.Dropout(
                    rate=self.dropout_rate, deterministic=not stochastic,
                    name=f"dropout{i}",
                )(x)
        return x

    def _int8_resident(self, x, *, stochastic: bool, level: int):
        """int8-in-HBM trunk: requant chains conv0..conv{d-2}; the last conv
        dequantizes to `dtype` so downstream (dropout + finals) is unchanged.
        Scales are per (level, conv) — weights are shared across levels but
        activation statistics are not."""
        if self.dropout_layers != "last":
            raise ValueError(
                "trunk_dtype='int8_resident' requires dropout_layers='last' "
                "(interleaved dropout breaks int8 residency)"
            )
        if self.act_scales is None:
            raise ValueError(
                "int8_resident trunk needs calibrated activation scales: run "
                "models/calibration.py:calibrate_serving_scales and set "
                "model.head_trunk_act_scales"
            )
        sc = dict(self.act_scales)
        s_in = sc[f"p{level}_in"]
        xq = quantize_act(x, s_in)
        y = None
        for i in range(self.depth):
            kernel, bias = ConvKernelBias(
                self.channels, (3, 3), name=f"conv{i}"
            )(xq.shape[-1])
            wq, ws = quantize_kernel(kernel)
            # Fold the (per-level) trunk BatchNorm into the epilogue:
            # bn(conv + bias) = g*conv + (g*bias + b) — same fold the
            # backbone path uses; eff/shift stay one FMA each.
            if self.norm == "batchnorm":
                g, b = BNFold(name=f"bn{i}_p{level}")(self.channels)
                eff, shift = s_in * ws * g, g * bias + b
            else:
                eff, shift = s_in * ws, bias
            acc = conv_int8(xq, wq, 1)
            if i < self.depth - 1:
                s_out = sc[f"p{level}_conv{i}"]
                xq = requant(acc, eff, shift, s_out)
                s_in = s_out
            else:
                y = jax.nn.relu(
                    acc.astype(jnp.float32) * eff + shift
                ).astype(self.dtype)
        return nn.Dropout(
            rate=self.dropout_rate, deterministic=not stochastic,
            name=f"dropout{self.depth - 1}",
        )(y)


class RetinaNetHeads(nn.Module):
    """Class + box/variance subnets applied to every pyramid level."""

    num_classes: int  # foreground classes; +1 background is added internally
    anchors_per_cell: int
    depth: int = 4
    channels: int = 256
    dropout_rate: float = 0.3
    dropout_layers: str = "last"
    trunk_dtype: str = "bf16"
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16
    # int8_resident trunks: (("cls/p0_in", s), ("reg/p2_conv1", s), ...) —
    # the "cls/"/"reg/" prefix routes each site to its subnet's SubnetTrunk.
    trunk_act_scales: Any = None
    capture_scales: bool = False
    norm: str = "none"  # trunk norm (SubnetTrunk.norm)
    train: bool = False
    # Clamp on the raw log-variance head output (ModelConfig.log_var_bound):
    # the regression loss never supervises negatives, so their log_vars are
    # unconstrained and detect-time exp() must be protected.
    log_var_bound: float = 16.0

    def _trunk_scales(self, prefix: str):
        if self.trunk_act_scales is None:
            return None
        p = prefix + "/"
        scales = tuple(
            (site[len(p):], s)
            for site, s in self.trunk_act_scales
            if site.startswith(p)
        )
        if not scales:
            raise ValueError(
                f"head_trunk_act_scales has no '{prefix}/' sites — expected "
                "the tuple produced by models/calibration.py:"
                "calibrate_serving_scales (sites like 'cls/p0_in')"
            )
        return scales

    def setup(self):
        k = self.anchors_per_cell
        n_cls = self.num_classes + 1  # + background
        self.cls_trunk = SubnetTrunk(
            self.depth, self.channels, self.dropout_rate,
            self.dropout_layers, self.dtype, self.trunk_dtype,
            act_scales=self._trunk_scales("cls"),
            capture=self.capture_scales,
            norm=self.norm, train=self.train,
        )
        self.reg_trunk = SubnetTrunk(
            self.depth, self.channels, self.dropout_rate,
            self.dropout_layers, self.dtype, self.trunk_dtype,
            act_scales=self._trunk_scales("reg"),
            capture=self.capture_scales,
            norm=self.norm, train=self.train,
        )
        # Background starts near-certain: foreground logits biased to
        # -log((1-pi)/pi) so initial softmax fg mass ~ pi (focal convention).
        fg_bias = -float(np.log((1.0 - self.prior_prob) / self.prior_prob))
        cls_bias = np.zeros((k * n_cls,), np.float32)
        cls_bias.reshape(k, n_cls)[:, 1:] = fg_bias  # class 0 = background
        self.cls_out = nn.Conv(
            k * n_cls, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                cls_bias, dtype
            ),
        )
        self.reg_out = nn.Conv(
            k * 8, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
        )

    def flatten_levels(
        self, cls_lvls: Sequence[jnp.ndarray], reg_lvls: Sequence[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-level head maps [..., h, w, k*C] -> ([..., A, C+1], [..., A, 4],
        [..., A, 4]) in the anchor-grid layout (ops/anchors.py)."""
        k = self.anchors_per_cell
        n_cls = self.num_classes + 1
        logits, reg = [], []
        for cls_map, reg_map in zip(cls_lvls, reg_lvls):
            lead = cls_map.shape[:-3]
            h, w = cls_map.shape[-3:-1]
            logits.append(cls_map.reshape(*lead, h * w * k, n_cls))
            reg.append(reg_map.reshape(*lead, h * w * k, 8))
        # Mixed precision is deliberate: logits stay fp32 (an all-bf16
        # variant measured 20.5 img/s vs 418.9 — bf16 poisons the downstream
        # softmax-mean/top-k lowering), while the regression outputs — 2/3 of
        # these ~GB tensors — stay in the compute dtype: they are only ever
        # GATHERED at k=512 candidates, then cast to fp32 for the moment
        # math. Re-bench end to end before touching either choice.
        logits = jnp.concatenate(logits, axis=-2).astype(jnp.float32)
        reg = jnp.concatenate(reg, axis=-2)
        # Negatives get no regression supervision, so their raw log-vars are
        # unconstrained; bound them before any consumer exp()s (the loss
        # clips tighter at ±10, so training gradients are unaffected).
        bound = jnp.asarray(self.log_var_bound, reg.dtype)
        log_vars = jnp.clip(reg[..., 4:], -bound, bound)
        return logits, reg[..., :4], log_vars

    def trunk_outputs(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Deterministic (pre-dropout) trunk activations per level — the
        input of the fused Pallas dropout+final kernel (dropout_layers=last
        puts the only stochastic op after these)."""
        cls_t = [
            self.cls_trunk(f, stochastic=False, level=li)
            for li, f in enumerate(feats)
        ]
        reg_t = [
            self.reg_trunk(f, stochastic=False, level=li)
            for li, f in enumerate(feats)
        ]
        return cls_t, reg_t

    def __call__(
        self, feats: Sequence[jnp.ndarray], *, stochastic: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """feats: list of NHWC pyramid levels -> (logits [B, A, C+1],
        deltas [B, A, 4], log_vars [B, A, 4]) in fp32."""
        cls_lvls: List[jnp.ndarray] = []
        reg_lvls: List[jnp.ndarray] = []
        for li, feat in enumerate(feats):
            cls_lvls.append(
                self.cls_out(self.cls_trunk(feat, stochastic=stochastic, level=li))
            )
            reg_lvls.append(
                self.reg_out(self.reg_trunk(feat, stochastic=stochastic, level=li))
            )
        return self.flatten_levels(cls_lvls, reg_lvls)
