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
    # Calibration mode: bf16 paths sow per-site activation absmax into the
    # "intermediates" collection (models/calibration.py reads them).
    capture_scales: bool = False
    # TrainConfig.remat="blocks": per-residual-block rematerialization in
    # the backward (models/resnet.py ResNet.block_remat). Training-only
    # knob; the variable tree is unchanged, so checkpoints are
    # interchangeable with block_remat=False instances.
    block_remat: bool = False

    def setup(self):
        if self.train and "int8_resident" in (
            self.cfg.head_trunk_dtype, self.cfg.fpn_dtype
        ):
            # (The backbone path raises its own guard inside ResNet.)
            raise ValueError(
                "head_trunk_dtype/fpn_dtype='int8_resident' are serving "
                "paths (round/clip has zero gradient): train in bf16 and "
                "flip the knob for inference"
            )
        dtype = _dtype_of(self.cfg)
        self.backbone = ResNet(
            variant=self.cfg.backbone, norm=self.cfg.norm,
            stem=self.cfg.stem, dtype=dtype,
            train=self.train, conv_dtype=self.cfg.backbone_dtype,
            act_scale=self.cfg.backbone_act_scale,
            act_scales=self.cfg.backbone_act_scales,
            capture_scales=self.capture_scales,
            block_remat=self.block_remat,
            raw_int8_outputs=self._int8_handoff(),
            name="backbone",
        )
        self.fpn = FPN(
            channels=self.cfg.fpn_channels, dtype=dtype,
            conv_dtype=self.cfg.fpn_dtype,
            act_scales=self.cfg.fpn_act_scales,
            capture=self.capture_scales,
            norm=self.cfg.fpn_norm, train=self.train,
            name="fpn",
        )
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
            trunk_act_scales=self.cfg.head_trunk_act_scales,
            capture_scales=self.capture_scales,
            norm=self.cfg.head_norm, train=self.train,
            log_var_bound=self.cfg.log_var_bound,
            name="heads",
        )

    def _int8_handoff(self) -> bool:
        """True when the backbone should hand c3/c4/c5 to the FPN as raw
        int8 (both sides int8-resident AND the FPN's cN calibration scales
        equal the backbone's corresponding block-output scales — they come
        from the same capture pass over the same tensors, so equality is
        the normal case; a hand-edited mismatch falls back to the exact
        bf16 dequant handoff). Saves the bf16 c-output roundtrip
        (~0.66 GB/batch-16; round-5 probe)."""
        cfg = self.cfg
        if (
            cfg.backbone_dtype != "int8_resident"
            or cfg.fpn_dtype != "int8_resident"
            or not cfg.backbone_act_scales
            or not cfg.fpn_act_scales
        ):
            return False
        from bayesod_tpu.models.resnet import STAGE_SIZES

        sizes = STAGE_SIZES[cfg.backbone]
        bsc = dict(cfg.backbone_act_scales)
        fsc = dict(cfg.fpn_act_scales)
        for stage, c in ((1, "c3"), (2, "c4"), (3, "c5")):
            out_site = f"stage{stage + 2}_block{sizes[stage] - 1}/out"
            if out_site not in bsc or c not in fsc:
                return False
            b, f = bsc[out_site], fsc[c]
            if abs(b - f) > 1e-9 * max(abs(b), abs(f), 1e-30):
                return False
        return True

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
        if model.cfg.dropout_layers != "last":
            # Mirrors mc_forward's guard: the fused kernels apply dropout
            # only at the final conv, so with 'all' this branch would
            # silently compute an under-dispersed MC posterior.
            raise ValueError(
                "head_final_backend='pallas' requires dropout_layers='last'"
            )
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
    probs = _fused_mean_probs(
        model, cls_t, cls_k, cls_b, seed0, num_samples, keep,
        slab_vmem_bytes, xla_level,
    )
    reg_flat = []
    for lvl, rt in enumerate(reg_t):
        if slab_vmem_bytes(rt) <= vmem_budget:
            reg_map = dropout_final_conv(
                rt, reg_k, reg_b, seed0 + 2 * lvl + 1, num_samples, keep,
                dtype=model.cfg.head_final_dtype,
            )
        else:
            reg_map = xla_level(rt, reg_k, reg_b, seed0 + 2 * lvl + 1)
        b, h, w = reg_map.shape[1:4]
        reg_flat.append(reg_map.reshape(num_samples, b, h * w * k, 8))
    reg = jnp.concatenate(reg_flat, axis=-2)
    return probs, reg[..., :4], reg[..., 4:]


def _fused_mean_probs(
    model, cls_t, cls_k, cls_b, seed0, num_samples, keep,
    slab_vmem_bytes, xla_level, batch_base=0,
):
    """Per-level fused mean-softmax cls maps, flattened and concatenated
    to [B, A, C+1] fp32 (shared by the dense-reg and candidates-reg
    routes).

    batch_base shifts the fused kernel's mask stream to absolute image
    indices (data-parallel shard_map shards). The oversized-level XLA
    fallback draws its masks from an rbg key over the LOCAL batch — valid
    i.i.d. dropout, but not bit-identical across shardings."""
    from bayesod_tpu.ops.pallas.fused_final import dropout_final_probs

    vmem_budget = 12 * 1024 * 1024
    k = model.anchors_per_cell
    n_cls = model.cfg.num_classes + 1
    probs_lvls = []
    for lvl, ct in enumerate(cls_t):
        if slab_vmem_bytes(ct) <= vmem_budget:
            p_map = dropout_final_probs(
                ct, cls_k, cls_b, seed0 + 2 * lvl, num_samples, keep,
                n_cls, dtype=model.cfg.head_final_dtype,
                batch_base=batch_base,
            )  # [B, h, w, k*(C+1)] fp32
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
        b, h, w = p_map.shape[:3]
        probs_lvls.append(p_map.reshape(b, h * w * k, n_cls))
    return jnp.concatenate(probs_lvls, axis=-2)


def mc_forward_stats(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
):
    """MC forward with in-kernel moment accumulation on BOTH heads:

      probs [B, A, C+1] fp32 — fused mean softmax (dropout_final_probs),
      stats [B, A, 18] fp32  — per-anchor regression sufficient statistics
        (dropout_final_reg_stats; bayes.moments.moments_from_stats turns
        them into exactly mc_box_moments' decoded mean/covariance).

    NO per-sample tensor ever reaches HBM: the N axis lives entirely inside
    the two kernels' VMEM-accumulated output blocks. This removes the
    [N, B, cells, 128-lane] reg kernel outputs and the flat [N, B, A, 8]
    concat — the waste a bench experiment bounded at 801.7 vs 598.5 img/s
    (DESIGN.md §8)."""
    from bayesod_tpu.ops.pallas.fused_final import dropout_final_reg_stats

    feats = model.apply(variables, images, method=RetinaNet.features)
    cls_t, reg_t = model.apply(
        variables, feats, method=RetinaNet.head_trunk_outputs
    )
    params = variables["params"]["heads"]
    cls_k = params["cls_out"]["kernel"]
    cls_b = params["cls_out"]["bias"]
    reg_k = params["reg_out"]["kernel"]
    reg_b = params["reg_out"]["bias"]
    keep = 1.0 - model.cfg.dropout_rate
    k = model.anchors_per_cell

    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        words = jax.random.key_data(rng).astype(jnp.int32)
        seed0 = words.ravel()[0] ^ (words.ravel()[-1] << 1)
    else:
        seed0 = (rng[0] ^ (rng[1] << 1)).astype(jnp.int32)

    def slab_vmem_bytes(t):
        h, w, c = t.shape[1:]
        rb = min(16, h)
        return 2 * (rb + 2) * (w + 18) * c * 2 + 4 * 1024 * 1024

    def xla_level(t, kernel, bias, seed):
        keys = jax.random.split(jax.random.key(seed, impl="rbg"), num_samples)

        def one(key):
            mask = jax.random.bernoulli(key, keep, t.shape)
            xt = jnp.where(mask, t / keep, 0.0).astype(t.dtype)
            return jax.lax.conv_general_dilated(
                xt, kernel.astype(t.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(t.dtype)

        return jax.vmap(one)(keys)

    probs = _fused_mean_probs(
        model, cls_t, cls_k, cls_b, seed0, num_samples, keep,
        slab_vmem_bytes, xla_level,
    )
    vmem_budget = 12 * 1024 * 1024
    stats_lvls = []
    for lvl, rt in enumerate(reg_t):
        if slab_vmem_bytes(rt) <= vmem_budget:
            s_map = dropout_final_reg_stats(
                rt, reg_k, reg_b, seed0 + 2 * lvl + 1, num_samples, keep,
                k, scale_factors=tuple(scale_factors),
                log_var_clip=log_var_clip,
                dtype=model.cfg.head_final_dtype,
            )  # [B, h, w, k*18]
        else:
            reg_map = xla_level(rt, reg_k, reg_b, seed0 + 2 * lvl + 1)
            s_map = _stats_from_samples(
                reg_map.astype(jnp.float32), k, scale_factors, log_var_clip
            )
        b, h, w = s_map.shape[:3]
        stats_lvls.append(s_map.reshape(b, h * w * k, 18))
    return probs, jnp.concatenate(stats_lvls, axis=-2)


def _stats_from_samples(reg_map, k, scale_factors, log_var_clip):
    """[N, B, h, w, k*8] per-sample reg maps -> [B, h, w, k*18] statistics
    (the fused kernel's REG_STATS layout; oversized-level fallback)."""
    from bayesod_tpu.ops.boxes import BBOX_XFORM_CLIP

    n, b, h, w, _ = reg_map.shape
    r = reg_map.reshape(n, b, h, w, k, 8)
    sx, sy, sw, sh = scale_factors
    tx, ty = r[..., 0], r[..., 1]
    ew = jnp.exp(jnp.minimum(r[..., 2] / sw, BBOX_XFORM_CLIP))
    eh = jnp.exp(jnp.minimum(r[..., 3] / sh, BBOX_XFORM_CLIP))
    v = jnp.exp(jnp.clip(r[..., 4:8], -log_var_clip, log_var_clip))
    stats = jnp.stack(
        [
            tx, ty, ew, eh, tx * tx, ty * ty, ew * ew, eh * eh,
            tx * ty, tx * ew, tx * eh, ty * ew, ty * eh, ew * eh,
            v[..., 0], v[..., 1], v[..., 2] * ew * ew, v[..., 3] * eh * eh,
        ],
        axis=-1,
    ).mean(0)  # [B, h, w, k, 18]
    return stats.reshape(b, h, w, k * 18)


def head_table_scale(model_cfg, head: str):
    """Static int8 row-table scale for `head` ("cls"/"reg"), or None when
    that head's table stays bf16. head_table_dtype: "bf16" | "int8" (both
    heads) | "int8_reg" (reg only — the safe mode when a checkpoint's cls
    trunk has an exploded dynamic range that int8 cannot hold; observed on
    an overfit flagship checkpoint whose cls-table 99.99th-pct absmax was
    1.2e6 while reg sat at ~6e2). See utils/config.py and
    ops/candidate_reg.py (table_scale)."""
    mode = getattr(model_cfg, "head_table_dtype", "bf16")
    if mode == "bf16" or (mode == "int8_reg" and head != "reg"):
        return None
    if mode not in ("int8", "int8_reg"):
        raise ValueError(f"unknown head_table_dtype '{mode}'")
    if not model_cfg.head_table_scales:
        raise ValueError(
            "head_table_dtype='int8' needs calibrated head_table_scales "
            "(models/calibration.py:calibrate_serving_scales)"
        )
    return float(dict(model_cfg.head_table_scales)[head])


def mc_forward_candidates(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    preselect_fn,
    tables,
    stats: bool = False,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    batch_base=0,
):
    """Candidates-only MC forward (ops/candidate_reg.py):

      probs [B, A, C+1] fp32  — fused mean softmax (dropout_final_probs),
      idx   [B, K] int32      — preselect_fn(probs) per image,
      valid [B, K] bool,
      cand_reg [N, B, K, 8]   — per-sample reg outputs at the candidates.

    The dense [N, B, cells, pad-128] reg kernel outputs and the flat
    [N, B, A, 8] concat never exist: a bench experiment bounding this waste
    measured 801.7 vs 598.5 img/s (DESIGN.md §8). The reg RNG stream is
    distinct from the dense kernels' — distributionally identical
    Bernoulli, exactly equal at dropout 0.
    """
    from bayesod_tpu.ops.candidate_reg import (
        candidate_reg_outputs,
        candidate_reg_stats,
    )

    feats = model.apply(variables, images, method=RetinaNet.features)
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
        h, w, c = t.shape[1:]
        rb = min(16, h)
        return 2 * (rb + 2) * (w + 18) * c * 2 + 4 * 1024 * 1024

    def xla_level(t, kernel, bias, seed):
        keys = jax.random.split(jax.random.key(seed, impl="rbg"), num_samples)

        def one(key):
            mask = jax.random.bernoulli(key, keep, t.shape)
            xt = jnp.where(mask, t / keep, 0.0).astype(t.dtype)
            return jax.lax.conv_general_dilated(
                xt, kernel.astype(t.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(t.dtype)

        return jax.vmap(one)(keys)

    probs = _fused_mean_probs(
        model, cls_t, cls_k, cls_b, seed0, num_samples, keep,
        slab_vmem_bytes, xla_level, batch_base=batch_base,
    )
    idx, valid = jax.vmap(preselect_fn)(probs)
    if stats:
        cand = candidate_reg_stats(
            list(reg_t), reg_k, reg_b, idx, seed0 + jnp.int32(7919),
            num_samples, keep, tables,
            scale_factors=tuple(scale_factors), log_var_clip=log_var_clip,
            batch_base=batch_base,
            table_scale=head_table_scale(model.cfg, "reg"),
        )  # [B, K, 18]
    else:
        cand = candidate_reg_outputs(
            list(reg_t), reg_k, reg_b, idx, seed0 + jnp.int32(7919),
            num_samples, keep, tables, batch_base=batch_base,
        )  # [N, B, K, 8]
    return probs, idx, valid, cand


def mc_forward_fused_sp(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    mesh,
    data_axis: str,
    sample_axis: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded fused MC heads: the Pallas dropout+final-conv kernel
    launched PER SHARD via shard_map (DESIGN.md §5's designed follow-up —
    the kernel is one opaque custom call GSPMD cannot partition, so the
    mesh path previously had to fall back to the XLA heads).

    Each (data, sample) shard runs `dropout_final_conv` on its batch slice
    with num_samples/sp samples, passing its absolute sample/batch offsets
    into the kernel's mask stream (`sample_base`/`batch_base`) — so the
    sharded launch produces BIT-IDENTICAL per-sample outputs to the
    unsharded kernel, merely laid out [N/sp, B/dp, ...] per device. The
    deterministic trunk stays outside the shard_map (replicated over
    `sample`, batch-sharded over `data`, GSPMD-managed); cross-device
    traffic happens only at the downstream moment reductions.

    Returns (logits [N,B,A,K+1], deltas [N,B,A,4], log_vars [N,B,A,4]),
    sharded (sample, data) on the leading two axes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bayesod_tpu.ops.pallas.fused_final import dropout_final_conv

    if model.cfg.dropout_layers != "last":
        raise ValueError(
            "mc_forward_fused_sp requires dropout_layers='last'"
        )
    sp = mesh.shape[sample_axis]
    dp = mesh.shape[data_axis]
    if num_samples % sp:
        raise ValueError(
            f"num_samples={num_samples} must be divisible by the sample "
            f"axis ({sp} devices)"
        )
    if images.shape[0] % dp:
        raise ValueError(
            f"batch={images.shape[0]} must be divisible by the data "
            f"axis ({dp} devices)"
        )
    n_loc = num_samples // sp

    feats = model.apply(variables, images, method=RetinaNet.features)
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

    def launch(t, kern, bias, seed):
        b_loc = t.shape[0] // dp

        def shard_fn(t_s, kern_s, bias_s, seed_s):
            off = jax.lax.axis_index(sample_axis) * n_loc
            b_base = jax.lax.axis_index(data_axis) * b_loc
            return dropout_final_conv(
                t_s, kern_s, bias_s, seed_s[0], n_loc, keep,
                dtype=model.cfg.head_final_dtype,
                sample_base=off, batch_base=b_base,
                total_samples=num_samples,
            )

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(data_axis), P(), P(), P()),
            out_specs=P(sample_axis, data_axis),
            # pallas_call emits outputs without varying-mesh-axis metadata;
            # skip the VMA check (the out_specs state the layout contract).
            check_vma=False,
        )(t, kern, bias, seed.reshape(1))

    cls_lvls, reg_lvls = [], []
    for lvl, (ct, rt) in enumerate(zip(cls_t, reg_t)):
        cls_lvls.append(
            launch(ct, cls_k, cls_b, seed0 + jnp.int32(2 * lvl))
        )
        reg_lvls.append(
            launch(rt, reg_k, reg_b, seed0 + jnp.int32(2 * lvl + 1))
        )
    return model.apply(
        variables, cls_lvls, reg_lvls,
        method=RetinaNet.flatten_head_levels,
    )


def single_forward(
    model: RetinaNet, variables, images: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One deterministic pass (dropout off) — the non-Bayesian baseline path."""
    return model.apply(variables, images, stochastic=False)


def stack_variables(variables_list):
    """Stack M per-member variable trees onto a leading member axis.

    The inverse of indexing: `member_variables(stacked, i)` recovers member
    i. All trees must share one structure/shapes (same ModelConfig).
    """
    if len(variables_list) < 2:
        raise ValueError("an ensemble needs >= 2 members")
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *variables_list
    )


def member_variables(stacked_variables, i: int):
    """Slice member `i` out of a stack_variables tree."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked_variables)


def average_variables(variables_list, weights=None):
    """Uniform (or weighted) average of variable trees — stochastic weight
    averaging over checkpoints of one run (same basin), the cheap sibling
    of a deep ensemble (distinct runs). Serve the result like any single
    weight set; fp32 accumulation regardless of leaf dtype.

    weights: optional per-tree weights (normalized internally)."""
    if len(variables_list) < 2:
        raise ValueError("averaging needs >= 2 variable trees")
    if weights is None:
        w = [1.0 / len(variables_list)] * len(variables_list)
    else:
        if len(weights) != len(variables_list):
            raise ValueError("len(weights) != len(variables_list)")
        total = float(sum(weights))
        w = [float(x) / total for x in weights]

    def avg(*leaves):
        acc = sum(
            wi * leaf.astype(jnp.float32) for wi, leaf in zip(w, leaves)
        )
        return acc.astype(leaves[0].dtype)

    return jax.tree_util.tree_map(avg, *variables_list)


def ensemble_forward(
    model: RetinaNet,
    stacked_variables,
    images: jnp.ndarray,
    rng: jax.Array,
    mc_per_member: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deep-ensemble sampling: vmap the FULL network over the member axis.

    Epistemic uncertainty from independent weight sets instead of (or on
    top of) shared-weight dropout — the standard ensemble estimator the
    BayesOD machinery is agnostic to: downstream moments/clustering/fusion
    only see a sample axis. Unlike `mc_forward` there is no shared trunk to
    amortize (members own their backbones), so the whole forward vmaps —
    XLA batches the M member convs into single MXU ops, the TPU analogue of
    the reference's would-be M-checkpoint Python loop (SURVEY.md §3.2).

    stacked_variables: `stack_variables` tree with leading member axis M.
    mc_per_member <= 0: one deterministic pass per member (dropout off),
        sample axis S = M.
    mc_per_member >= 1: that many dropout passes per member,
        S = M * mc_per_member, member-major order.

    Returns (logits [S,B,A,K+1], deltas [S,B,A,4], log_vars [S,B,A,4]).
    Always the XLA head path: the Pallas fused finals assume one weight
    set per launch and are not vmappable over parameters.
    """
    num_members = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    member_keys = (
        None
        if mc_per_member <= 0
        else jax.random.split(_ensemble_base_key(rng), num_members)
    )
    return _member_samples(
        model, stacked_variables, images, member_keys, mc_per_member
    )


def _ensemble_base_key(rng: jax.Array) -> jax.Array:
    """Ensemble dropout keys use THREEFRY, not the rbg hardware RNG:
    rbg bit streams are partitioning-dependent (measured: same key, same
    shape, different bits inside shard_map), which would break
    sharded == unsharded parity for ensemble_mc. Mask generation is
    negligible next to M full member forwards, so threefry's VPU cost is
    irrelevant here (unlike mc_forward's N-sample mask volume)."""
    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng
    return jax.random.key(rng[0] ^ (rng[1] << 1), impl="threefry2x32")


def _member_samples(
    model: RetinaNet, stacked_variables, images, member_keys, mc_per_member
):
    """[S, B, A, .] member-major samples for a (possibly local) member stack.

    member_keys: typed key array aligned with the stack's member axis
    (ignored when mc_per_member <= 0).
    """
    if mc_per_member <= 0:

        def member_det(vars_m):
            return model.apply(vars_m, images, stochastic=False)

        return jax.vmap(member_det)(stacked_variables)

    def member_mc(vars_m, key):
        feats = model.apply(vars_m, images, method=RetinaNet.features)
        keys = jax.random.split(key, mc_per_member)

        def sample(k):
            return model.apply(
                vars_m, feats, stochastic=True, rngs={"dropout": k},
                method=RetinaNet.predict_heads,
            )

        return jax.vmap(sample)(keys)

    out = jax.vmap(member_mc)(stacked_variables, member_keys)
    # [M, mc, B, A, .] -> [M*mc, B, A, .], member-major.
    return jax.tree_util.tree_map(
        lambda t: t.reshape(-1, *t.shape[2:]), out
    )


def ensemble_forward_sp(
    model: RetinaNet,
    stacked_variables,
    images: jnp.ndarray,
    rng: jax.Array,
    mc_per_member: int,
    mesh,
    data_axis: str,
    sample_axis: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Member-parallel ensemble forward under shard_map.

    Weights AND compute stay local: each device runs plain single-chip
    forwards for its M/sp members on its B/dp images; the only collective
    is one psum for the mean softmax. GSPMD is deliberately out of the
    loop — letting it partition the vmapped-over-weights graph measurably
    MISCOMPILES the FPN top-down chain on the CPU backend (P3-P5 diverge
    by O(feature magnitude) while P6/P7 stay exact; DESIGN.md dead ends),
    and shard_map is the faster layout anyway (no resharding decisions).

    Per-member dropout keys are split OUTSIDE the shard_map from the
    global member index, so streams are placement-independent across the
    MEMBER axis: on a pure member-parallel mesh (data_parallel=1) every
    (member, sample) mask is bit-identical to the unsharded graph
    (test-pinned). Sharding the batch axis too (dp>1) re-blocks the flax
    dropout draws within each image's activations — still i.i.d. Bernoulli
    at the same rate (distributionally identical posterior), but not
    bit-equal to the unsharded draw. mc_per_member=0 ("ensemble") has no
    dropout and is bit-tight on any dp x sp mesh.

    Returns (probs [B,A,C+1] fp32 mean softmax over ALL S samples,
    deltas [S,B,A,4], log_vars [S,B,A,4]), laid out with the member/sample
    axis on `sample_axis` and the batch axis on `data_axis`.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    num_members = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    sp = mesh.shape[sample_axis]
    dp = mesh.shape[data_axis]
    if num_members % sp or images.shape[0] % dp:
        raise ValueError(
            f"ensemble mesh serving needs members ({num_members}) divisible "
            f"by sample_parallel ({sp}) and batch ({images.shape[0]}) by "
            f"data_parallel ({dp})"
        )
    total_s = num_members * max(1, mc_per_member)

    if mc_per_member > 0:
        base = _ensemble_base_key(rng)
        impl = jax.random.key_impl(base)
        keys_data = jax.random.key_data(jax.random.split(base, num_members))
    else:
        impl = None
        keys_data = jnp.zeros((num_members, 1), jnp.uint32)

    def body(v_loc, im_loc, kd_loc):
        keys_loc = (
            jax.random.wrap_key_data(kd_loc, impl=impl)
            if mc_per_member > 0
            else None
        )
        logits, deltas, log_vars = _member_samples(
            model, v_loc, im_loc, keys_loc, mc_per_member
        )
        part = (
            jnp.sum(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=0)
            / total_s
        )
        probs = jax.lax.psum(part, sample_axis)
        return probs, deltas, log_vars

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(sample_axis), P(data_axis), P(sample_axis)),
        out_specs=(
            P(data_axis),
            P(sample_axis, data_axis),
            P(sample_axis, data_axis),
        ),
        check_vma=False,
    )(stacked_variables, images, keys_data)


def _member_det_probs_and_reg_trunk(model: RetinaNet, vars_m, images):
    """One ensemble member's deterministic pass, reduced to what the
    candidates route needs: the flattened per-anchor softmax categorical
    [B, A, C+1] fp32 (preselect + fusion statistic) and the reg trunk
    activations (input of the fused candidate-stats kernel)."""
    feats = model.apply(vars_m, images, method=RetinaNet.features)
    cls_t, reg_t = model.apply(
        vars_m, feats, method=RetinaNet.head_trunk_outputs
    )
    params = vars_m["params"]["heads"]
    cls_k = params["cls_out"]["kernel"]
    cls_b = params["cls_out"]["bias"]
    k = model.anchors_per_cell
    n_cls = model.cfg.num_classes + 1
    probs_lvls = []
    for ct in cls_t:
        logits = jax.lax.conv_general_dilated(
            ct, cls_k.astype(ct.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cls_b.astype(ct.dtype)
        b, h, w, _ = logits.shape
        lg = logits.reshape(b, h * w * k, n_cls).astype(jnp.float32)
        probs_lvls.append(jax.nn.softmax(lg, axis=-1))
    probs = jnp.concatenate(probs_lvls, axis=1)  # [B, A, C+1]
    reg_params = (params["reg_out"]["kernel"], params["reg_out"]["bias"])
    return probs, list(reg_t), reg_params


def ensemble_forward_candidates(
    model: RetinaNet,
    stacked_variables,
    images: jnp.ndarray,
    topk: int,
    score_threshold: float,
    approx_topk: bool,
    tables,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    batch_base=0,
):
    """Candidates-only DEEP-ENSEMBLE forward (epistemic="ensemble", fused
    fast path — the dense [M, B, A, .] member tensors never exist).

    Pure ensembles have no dropout, so each member is ONE deterministic
    pass and the fused candidate-stats kernel runs per member with
    num_samples=1, keep_prob=1 (one weight set per launch — exactly the
    kernel's contract). The REG_STATS accumulator is linear in samples, so
    the member-mean of per-member stats IS the M-sample moment statistics;
    the categorical mean softmax falls out of the same member-mean that
    preselection already needs. Per-image memory: M reg-trunk row tables
    (bf16) live simultaneously; everything else is [B, A or K]-sized.

    Returns (idx [B,K], valid [B,K], cand_probs [B,K,C+1],
    cand_stats [B,K,18]) — the same contract as mc_forward_candidates_det,
    with the sample axis sourced from members instead of dropout."""
    num_members = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    inv_m = 1.0 / num_members

    probs_mean = None
    member_reg = []
    for m in range(num_members):
        vars_m = member_variables(stacked_variables, m)
        probs_m, reg_t, reg_params = _member_det_probs_and_reg_trunk(
            model, vars_m, images
        )
        probs_mean = (
            probs_m * inv_m
            if probs_mean is None
            else probs_mean + probs_m * inv_m
        )
        member_reg.append((reg_t, reg_params))

    def presel(s):
        if approx_topk:
            _, idx = jax.lax.approx_max_k(s, topk, recall_target=0.99)
        else:
            _, idx = jax.lax.top_k(s, topk)
        return idx

    idx = jax.vmap(presel)(jnp.max(probs_mean[..., 1:], axis=-1))

    from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

    cand_stats = None
    for reg_t, (reg_k, reg_b) in member_reg:
        stats_m = candidate_reg_stats(
            reg_t, reg_k, reg_b, idx, jnp.int32(0),
            num_samples=1, keep_prob=1.0, tables=tables,
            scale_factors=tuple(scale_factors), log_var_clip=log_var_clip,
            batch_base=batch_base,
        )  # [B, K, 18]
        cand_stats = (
            stats_m * inv_m
            if cand_stats is None
            else cand_stats + stats_m * inv_m
        )

    cand_probs = jax.vmap(lambda p, i: p[i])(probs_mean, idx)
    valid = jnp.max(cand_probs[..., 1:], axis=-1) >= score_threshold
    return idx, valid, cand_probs, cand_stats


def ensemble_forward_candidates_sp(
    model: RetinaNet,
    stacked_variables,
    images: jnp.ndarray,
    topk: int,
    score_threshold: float,
    approx_topk: bool,
    tables,
    mesh,
    data_axis: str,
    sample_axis: str,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
):
    """Member-parallel `ensemble_forward_candidates` under shard_map.

    Each device runs the single-chip fast path for its M/sp members on its
    B/dp images; the only collectives are two psums over the member axis
    (mean softmax for preselection, member-mean candidate stats — both
    linear reductions, so sharded == unsharded up to fp32 summation
    order). Preselection runs identically on every member shard from the
    psum'd mean, so candidate sets agree by construction. Weights stay
    device-local (GSPMD deliberately out of the loop — see
    ensemble_forward_sp on the FPN miscompile)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    num_members = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    sp = mesh.shape[sample_axis]
    dp = mesh.shape[data_axis]
    if num_members % sp or images.shape[0] % dp:
        raise ValueError(
            f"ensemble candidates mesh serving needs members "
            f"({num_members}) divisible by sample_parallel ({sp}) and "
            f"batch ({images.shape[0]}) by data_parallel ({dp})"
        )
    m_loc = num_members // sp
    b_loc = images.shape[0] // dp
    inv_m = 1.0 / num_members

    from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

    def body(v_loc, im_loc):
        b_base = jax.lax.axis_index(data_axis) * b_loc
        probs_part = None
        member_reg = []
        for m in range(m_loc):
            vars_m = member_variables(v_loc, m)
            probs_m, reg_t, reg_params = _member_det_probs_and_reg_trunk(
                model, vars_m, im_loc
            )
            probs_part = (
                probs_m * inv_m
                if probs_part is None
                else probs_part + probs_m * inv_m
            )
            member_reg.append((reg_t, reg_params))
        probs_mean = jax.lax.psum(probs_part, sample_axis)

        def presel(s):
            if approx_topk:
                _, idx = jax.lax.approx_max_k(s, topk, recall_target=0.99)
            else:
                _, idx = jax.lax.top_k(s, topk)
            return idx

        idx = jax.vmap(presel)(jnp.max(probs_mean[..., 1:], axis=-1))

        stats_part = None
        for reg_t, (reg_k, reg_b) in member_reg:
            stats_m = candidate_reg_stats(
                reg_t, reg_k, reg_b, idx, jnp.int32(0),
                num_samples=1, keep_prob=1.0, tables=tables,
                scale_factors=tuple(scale_factors),
                log_var_clip=log_var_clip, batch_base=b_base,
            )
            stats_part = (
                stats_m * inv_m
                if stats_part is None
                else stats_part + stats_m * inv_m
            )
        cand_stats = jax.lax.psum(stats_part, sample_axis)
        cand_probs = jax.vmap(lambda p, i: p[i])(probs_mean, idx)
        valid = jnp.max(cand_probs[..., 1:], axis=-1) >= score_threshold
        return idx, valid, cand_probs, cand_stats

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(sample_axis), P(data_axis)),
        out_specs=(
            P(data_axis), P(data_axis), P(data_axis), P(data_axis),
        ),
        check_vma=False,
    )(stacked_variables, images)


def preselect_scores(
    cls_t, cls_k, cls_b, anchors_per_cell, n_cls, table_scale=None,
    scores=True, scoring="softmax",
):
    """Dense deterministic per-anchor foreground scores: one cls-final conv
    per level (dropout off), max-foreground-softmax per anchor.

    scores=False stops after the conv (returns per-level logits) — used by
    `bench.py --segment preselect_conv` to split the selection cost into
    conv / score / top-k parts (VERDICT r4 item 3a).

    table_scale (head_table_dtype="int8"): the dense selection conv runs
    int8 x int8 -> int32 on the SAME quantized activations the candidate
    kernels stream (per-output-channel weight scales, dequant + bias in
    fp32 before the softmax). Selection is ordering-only — membership can
    shift near the cut, but the validity gate downstream reads the exact
    MC-mean categorical, so admitted/dropped semantics are unchanged."""
    if table_scale is not None:
        from bayesod_tpu.models.quant import (
            conv_int8,
            quantize_act,
            quantize_kernel,
        )

        wq, ws = quantize_kernel(cls_k)
    logit_lvls = []
    for ct in cls_t:
        if table_scale is None:
            logits = jax.lax.conv_general_dilated(
                ct, cls_k.astype(ct.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cls_b.astype(ct.dtype)
        else:
            acc = conv_int8(quantize_act(ct, float(table_scale)), wq, 1)
            logits = (
                acc.astype(jnp.float32) * (float(table_scale) * ws)
                + cls_b.astype(jnp.float32)
            )
        logit_lvls.append(logits)
    if not scores:
        return logit_lvls
    score_lvls = []
    for logits in logit_lvls:
        b, h, w, _ = logits.shape
        lg = logits.reshape(
            b, h * w * anchors_per_cell, n_cls
        ).astype(jnp.float32)
        if scoring == "margin":
            # BayesConfig.preselect_scoring="margin": softmax-free anchor
            # ordering — exact for n_cls == 2 (binary softmax is monotone
            # in the margin), ordering surrogate above that.
            s = jnp.max(lg[..., 1:], axis=-1) - lg[..., 0]
        elif scoring == "softmax":
            p = jax.nn.softmax(lg, axis=-1)
            s = jnp.max(p[..., 1:], axis=-1)
        else:
            raise ValueError(
                f"unknown preselect_scoring {scoring!r} "
                "(expected 'softmax' or 'margin')"
            )
        score_lvls.append(s)  # [B, cells*k]
    return jnp.concatenate(score_lvls, axis=-1)  # [B, A]


def deterministic_preselect_idx(
    cls_t, cls_k, cls_b, anchors_per_cell, n_cls, topk, approx_topk,
    table_scale=None, scoring="softmax",
):
    """Dense deterministic preselection: `preselect_scores` + top-k indices.

    Factored out of mc_forward_candidates_det so the bench can time the
    trunk+preselect prefix alone (`bench.py --segment preselect`)."""
    scores = preselect_scores(
        cls_t, cls_k, cls_b, anchors_per_cell, n_cls,
        table_scale=table_scale, scoring=scoring,
    )

    def presel(s):
        if approx_topk:
            _, idx = jax.lax.approx_max_k(s, topk, recall_target=0.99)
        else:
            _, idx = jax.lax.top_k(s, topk)
        return idx

    return jax.vmap(presel)(scores)


def mc_forward_candidates_det(
    model: RetinaNet,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    topk: int,
    score_threshold: float,
    approx_topk: bool,
    tables,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    batch_base=0,
    scoring: str = "softmax",
):
    """Candidates-only MC forward with DETERMINISTIC preselection
    (BayesConfig.preselect_source="deterministic"):

      * ONE deterministic cls pass (dropout off) produces per-anchor
        foreground scores; top-k preselects on those — N-fold cheaper than
        the MC-mean scores, at the cost of a (slightly) different candidate
        ordering near the threshold;
      * the N-sample MC work then runs ONLY at the K candidates, for BOTH
        heads (candidate_cls_probs + candidate_reg_stats) — the paper's
        mean-softmax categorical and box moments are exact at every anchor
        that reaches fusion.

    Returns (idx [B,K], valid [B,K], cand_probs [B,K,C+1],
    cand_stats [B,K,18])."""
    from bayesod_tpu.ops.candidate_reg import (
        candidate_cls_probs,
        candidate_reg_stats,
    )

    feats = model.apply(variables, images, method=RetinaNet.features)
    cls_t, reg_t = model.apply(
        variables, feats, method=RetinaNet.head_trunk_outputs
    )
    params = variables["params"]["heads"]
    cls_k = params["cls_out"]["kernel"]
    cls_b = params["cls_out"]["bias"]
    reg_k = params["reg_out"]["kernel"]
    reg_b = params["reg_out"]["bias"]
    keep = 1.0 - model.cfg.dropout_rate
    k = model.anchors_per_cell
    n_cls = model.cfg.num_classes + 1

    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        words = jax.random.key_data(rng).astype(jnp.int32)
        seed0 = words.ravel()[0] ^ (words.ravel()[-1] << 1)
    else:
        seed0 = (rng[0] ^ (rng[1] << 1)).astype(jnp.int32)

    idx = deterministic_preselect_idx(
        cls_t, cls_k, cls_b, k, n_cls, topk, approx_topk,
        table_scale=head_table_scale(model.cfg, "cls"), scoring=scoring,
    )

    cand_probs = candidate_cls_probs(
        list(cls_t), cls_k, cls_b, idx, seed0 + jnp.int32(104729),
        num_samples, keep, tables, n_cls, batch_base=batch_base,
        table_scale=head_table_scale(model.cfg, "cls"),
    )
    # Validity gate on the MC-MEAN categorical (the statistic fusion
    # consumes), not the deterministic preselect scores: only the top-k
    # MEMBERSHIP depends on the deterministic pass, so the hard score gate
    # admits/drops exactly the same detections as the mc_mean path.
    valid = jnp.max(cand_probs[..., 1:], axis=-1) >= score_threshold
    cand_stats = candidate_reg_stats(
        list(reg_t), reg_k, reg_b, idx, seed0 + jnp.int32(7919),
        num_samples, keep, tables,
        scale_factors=tuple(scale_factors), log_var_clip=log_var_clip,
        batch_base=batch_base,
        table_scale=head_table_scale(model.cfg, "reg"),
    )
    return idx, valid, cand_probs, cand_stats
