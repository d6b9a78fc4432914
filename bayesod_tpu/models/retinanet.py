"""RetinaNet-with-variance-head: backbone + FPN + stochastic subnets.

Rebuild of the reference's top-level model
(ref: src/retina_net/models/retinanet*.py; SURVEY.md §2 "RetinaNet model",
§3.4 forward graph): images -> ResNet -> FPN(P3..P7) -> shared heads ->
(logits [B,A,K+1], deltas [B,A,4], log-variances [B,A,4]) with the anchor
axis A laid out exactly like ops/anchors.generate_anchors.

The TPU-first restructuring of the reference's MC-dropout loop lives here in
`mc_forward`: the reference runs N full forward passes in Python
(SURVEY.md §3.2 hot loop #1); we run the deterministic trunk ONCE and vmap
only the dropout-bearing heads over N rng keys. XLA batches the vmapped head
convs into single large MXU ops, so the backbone cost is amortized across all
samples — mathematically identical output distribution (dropout exists only in
the subnets), ~N-fold less backbone compute.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayesod_tpu.models.fpn import FPN
from bayesod_tpu.models.heads import RetinaNetHeads
from bayesod_tpu.models.resnet import ResNet
from bayesod_tpu.utils.config import ModelConfig


def _dtype_of(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


class RetinaNet(nn.Module):
    """Flax RetinaNet. `train` is a static attribute (selects BN mode); the
    same parameter structure is shared between train/eval instances."""

    cfg: ModelConfig
    anchors_per_cell: int = 9
    train: bool = False

    def setup(self):
        dtype = _dtype_of(self.cfg)
        self.backbone = ResNet(
            variant=self.cfg.backbone, norm=self.cfg.norm,
            stem=self.cfg.stem, dtype=dtype,
            train=self.train, conv_dtype=self.cfg.backbone_dtype,
            act_scale=self.cfg.backbone_act_scale,
            name="backbone",
        )
        self.fpn = FPN(channels=self.cfg.fpn_channels, dtype=dtype, name="fpn")
        self.heads = RetinaNetHeads(
            num_classes=self.cfg.num_classes,
            anchors_per_cell=self.anchors_per_cell,
            depth=self.cfg.head_depth,
            channels=self.cfg.head_channels,
            dropout_rate=self.cfg.dropout_rate,
            dropout_layers=self.cfg.dropout_layers,
            trunk_dtype=self.cfg.head_trunk_dtype,
            prior_prob=self.cfg.prior_prob,
            dtype=dtype,
            name="heads",
        )

    def features(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        """Deterministic trunk: images [B,H,W,3] -> pyramid [P3..P7]."""
        return self.fpn(self.backbone(images))

    def predict_heads(
        self, feats: Sequence[jnp.ndarray], *, stochastic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Stochastic heads on precomputed features (the vmap seam)."""
        return self.heads(feats, stochastic=stochastic)

    def head_trunk_outputs(self, feats: Sequence[jnp.ndarray]):
        """Deterministic per-level trunk activations (fused-kernel input)."""
        return self.heads.trunk_outputs(feats)

    def flatten_head_levels(self, cls_lvls, reg_lvls):
        return self.heads.flatten_levels(cls_lvls, reg_lvls)

    def __call__(self, images: jnp.ndarray, *, stochastic: bool = False):
        return self.predict_heads(self.features(images), stochastic=stochastic)


def init_variables(model: RetinaNet, rng: jax.Array, image_hw, batch: int = 1):
    """Initialize params (+ batch_stats when using BatchNorm)."""
    dummy = jnp.zeros((batch, *image_hw, 3), jnp.float32)
    return model.init({"params": rng, "dropout": rng}, dummy, stochastic=True)


def mc_forward(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MC-dropout sampling: trunk once, heads vmapped over dropout rngs.

    Returns (logits [N,B,A,K+1], deltas [N,B,A,4], log_vars [N,B,A,4]).
    Replaces the reference's N-iteration Python loop (SURVEY.md §3.2).

    Dropout masks are drawn with the `rbg` PRNG (TPU hardware RNG): mask
    generation covers ~1e8 elements per batch at N=10, and threefry costs
    tens of VPU ops per word — with rbg the masks are effectively free.
    The incoming key's impl is preserved if the caller already chose one.
    """
    feats = model.apply(variables, images, method=RetinaNet.features)

    backend = model.cfg.head_final_backend
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and model.cfg.dropout_layers == "last"
            else "xla"
        )
    if backend == "pallas":
        if model.cfg.dropout_layers != "last":
            raise ValueError(
                "head_final_backend='pallas' requires dropout_layers='last'"
            )
        return _mc_heads_fused(model, variables, feats, rng, num_samples)

    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        base = rng  # caller chose an impl; respect it
    else:
        # Legacy raw uint32 [2] key: reseed an rbg key from its words.
        base = jax.random.key(rng[0] ^ (rng[1] << 1), impl="rbg")
    keys = jax.random.split(base, num_samples)

    def sample(key):
        return model.apply(
            variables, feats, stochastic=True, rngs={"dropout": key},
            method=RetinaNet.predict_heads,
        )

    return jax.vmap(sample)(keys)


def mc_forward_probs(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MC sampling returning (mean_probs [B,A,C+1] fp32, deltas [N,B,A,4],
    log_vars [N,B,A,4]).

    The BayesOD pipeline only ever uses per-sample LOGITS through their
    mean softmax (per-anchor categorical, paper §III.A), so on the fused
    path the N-sample logits tensor — the largest array in the graph — is
    reduced per pyramid level straight off the kernel outputs and never
    materialized at [N, B, A, C+1].
    """
    # Two reductions ship (cfg.probs_reduce):
    #   "flat"  — flatten per-sample logits fp32 and reduce in XLA. (An
    #     XLA-level per-level softmax-mean measured 358 vs 454 img/s — the
    #     flat concat lowered better — so per-level reduction OUTSIDE the
    #     kernel is a recorded dead end.)
    #   "fused" — dropout_final_probs: softmax-mean accumulated inside the
    #     Pallas kernel across the sample grid axis; the per-sample logits
    #     never reach HBM.
    backend = model.cfg.head_final_backend
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and model.cfg.dropout_layers == "last"
            else "xla"
        )
    reduce = model.cfg.probs_reduce
    if reduce == "auto":
        reduce = "fused" if images.shape[0] >= 8 else "flat"
    if backend == "pallas" and reduce == "fused":
        feats = model.apply(variables, images, method=RetinaNet.features)
        return _mc_heads_fused(
            model, variables, feats, rng, num_samples, reduce_probs=True
        )
    logits, deltas, log_vars = mc_forward(
        model, variables, images, rng, num_samples
    )
    probs = jnp.mean(
        jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=0
    )
    return probs, deltas, log_vars


def _mc_heads_fused(model, variables, feats, rng, num_samples,
                    reduce_probs: bool = False):
    """Fused-kernel MC heads: deterministic trunks once, then one Pallas
    dropout+final-conv launch per (level, subnet) producing all N samples
    (ops/pallas/fused_final.py). Distributionally identical Bernoulli
    dropout; RNG stream differs from the flax path.

    reduce_probs=True returns (mean_probs [B,A,C+1] fp32, deltas, log_vars):
    the cls finals run through dropout_final_probs — dropout + conv +
    grouped softmax + mean over samples in ONE kernel with the output block
    accumulated in VMEM across the sample grid axis — so the [N,B,A,C+1]
    logits (the graph's largest tensor, ~3.4 GB/batch as kernel outputs)
    never reach HBM at all."""
    from bayesod_tpu.ops.pallas.fused_final import (
        dropout_final_conv,
        dropout_final_probs,
    )

    cls_t, reg_t = model.apply(
        variables, feats, method=RetinaNet.head_trunk_outputs
    )
    params = variables["params"]["heads"]
    cls_k = params["cls_out"]["kernel"]
    cls_b = params["cls_out"]["bias"]
    reg_k = params["reg_out"]["kernel"]
    reg_b = params["reg_out"]["bias"]
    keep = 1.0 - model.cfg.dropout_rate

    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        words = jax.random.key_data(rng).astype(jnp.int32)
        seed0 = words.ravel()[0] ^ (words.ravel()[-1] << 1)
    else:
        seed0 = (rng[0] ^ (rng[1] << 1)).astype(jnp.int32)

    def slab_vmem_bytes(t):
        # The kernel needs only a double-buffered (rb+2)-row slab in VMEM
        # (input_mode="dma" when the whole image doesn't fit; fused_final.py)
        # + weights/out/mask staging.
        h, w, c = t.shape[1:]
        rb = min(16, h)
        return 2 * (rb + 2) * (w + 18) * c * 2 + 4 * 1024 * 1024

    def xla_level(t, kernel, bias, seed):
        # Extreme-width fallback: plain vmapped mask+conv (hardware-RNG
        # keys); only triggers when even a row slab would blow VMEM
        # (w ~ 2500+ at 256ch — beyond any supported config).
        keys = jax.random.split(
            jax.random.key(seed, impl="rbg"), num_samples
        )

        def one(key):
            mask = jax.random.bernoulli(key, keep, t.shape)
            xt = jnp.where(mask, t / keep, 0.0).astype(t.dtype)
            return jax.lax.conv_general_dilated(
                xt, kernel.astype(t.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(t.dtype)

        return jax.vmap(one)(keys)

    vmem_budget = 12 * 1024 * 1024
    k = model.anchors_per_cell
    n_cls = model.cfg.num_classes + 1

    if not reduce_probs:
        cls_lvls, reg_lvls = [], []
        for lvl, (ct, rt) in enumerate(zip(cls_t, reg_t)):
            if slab_vmem_bytes(ct) <= vmem_budget:
                run = lambda t, k_, b_, s: dropout_final_conv(
                    t, k_, b_, s, num_samples, keep,
                    dtype=model.cfg.head_final_dtype,
                )
            else:
                run = lambda t, k_, b_, s: xla_level(t, k_, b_, s)
            cls_lvls.append(run(ct, cls_k, cls_b, seed0 + 2 * lvl))
            reg_lvls.append(run(rt, reg_k, reg_b, seed0 + 2 * lvl + 1))
        return model.apply(
            variables, cls_lvls, reg_lvls,
            method=RetinaNet.flatten_head_levels,
        )

    # Fused N-reduction: cls finals emit per-level MEAN-SOFTMAX maps
    # directly (dropout_final_probs — the sample axis never leaves VMEM);
    # reg finals still emit per-sample maps (the moments need them).
    probs_lvls, reg_flat = [], []
    for lvl, (ct, rt) in enumerate(zip(cls_t, reg_t)):
        if slab_vmem_bytes(ct) <= vmem_budget:
            p_map = dropout_final_probs(
                ct, cls_k, cls_b, seed0 + 2 * lvl, num_samples, keep,
                n_cls, dtype=model.cfg.head_final_dtype,
            )  # [B, h, w, k*(C+1)] fp32
            reg_map = dropout_final_conv(
                rt, reg_k, reg_b, seed0 + 2 * lvl + 1, num_samples, keep,
                dtype=model.cfg.head_final_dtype,
            )
        else:
            logits_l = xla_level(ct, cls_k, cls_b, seed0 + 2 * lvl)
            p_map = jnp.mean(
                jax.nn.softmax(
                    logits_l.astype(jnp.float32).reshape(
                        num_samples, *logits_l.shape[1:4], k, n_cls
                    ),
                    axis=-1,
                ),
                axis=0,
            ).reshape(*logits_l.shape[1:4], k * n_cls)
            reg_map = xla_level(rt, reg_k, reg_b, seed0 + 2 * lvl + 1)
        b, h, w = p_map.shape[:3]
        probs_lvls.append(p_map.reshape(b, h * w * k, n_cls))
        reg_flat.append(reg_map.reshape(num_samples, b, h * w * k, 8))
    probs = jnp.concatenate(probs_lvls, axis=-2)
    reg = jnp.concatenate(reg_flat, axis=-2)
    return probs, reg[..., :4], reg[..., 4:]


def single_forward(
    model: RetinaNet, variables, images: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One deterministic pass (dropout off) — the non-Bayesian baseline path."""
    return model.apply(variables, images, stochastic=False)
