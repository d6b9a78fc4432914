"""Training objectives: categorical focal loss + NLL loss attenuation.

Rebuild of the reference's two losses (SURVEY.md §2 "Focal loss" and
"Regression NLL"; arXiv:1903.03838 §III.A):

  * Focal loss on the softmax categorical INCLUDING background (BayesOD fuses
    full categoricals, so the classifier is softmax-(C+1), not canonical
    RetinaNet's per-class sigmoid):
        FL = -alpha_t * (1 - p_t)^gamma * log(p_t)
    with alpha_t = alpha for foreground targets, (1 - alpha) for background,
    normalized by the positive-anchor count; ignored anchors masked out.

  * Loss-attenuated regression NLL (Kendall & Gal) on positive anchors, per
    coordinate in encoded space with s = log sigma^2:
        l2:    0.5 * exp(-s) * (y - mu)^2       + 0.5 * s
        huber: exp(-s) * smooth_l1(y - mu)      + 0.5 * s
    which trains the aleatoric variance head with no variance labels.

All reductions are masked fixed-shape jnp ops in fp32 — they sit inside the
jit train step next to the model (the reference computes them eagerly in TF).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bayesod_tpu.losses.targets import AnchorTargets


# jax.checkpoint on both losses (round 4): the losses expand the bf16 head
# outputs into f32 [B,A,C+1] / [B,A,4] intermediates (log-softmax, powers,
# exp); the single largest train-step HBM tensor was the focal loss's
# stabilized f32 logits (1.5 GB/step at batch 32,
# tools/hbm_attribution.py). Rematerializing recomputes those elementwise
# chains in the backward from the already-saved bf16 logits. MEASURED
# NEUTRAL on v5e (253.2 vs 253.8 ms/step): the attribution's
# remat_compressed/uncompressed copies show this XLA build already
# auto-compresses the loss saves, so the decorator mostly documents the
# intent; kept because it is free and guards against builds without that
# pass.
def focal_loss(
    logits: jnp.ndarray,
    targets: AnchorTargets,
    alpha: float = 0.25,
    gamma: float = 2.0,
    backward: str = "autodiff",
) -> jnp.ndarray:
    """backward="custom" uses the hand-derived closed-form VJP (one fused
    elementwise pass recomputed from the bf16 logits; VERDICT r4 weak 6 —
    measure, don't assume). "autodiff" (default) keeps the checkpointed
    reverse-mode chain."""
    if backward == "custom":
        return _focal_custom(
            logits, targets.class_targets, targets.ignored,
            targets.positive, float(alpha), float(gamma),
        )
    if backward != "autodiff":
        raise ValueError(f"unknown focal backward '{backward}'")
    return _focal_loss_remat(logits, targets, alpha, gamma)


@functools.partial(jax.checkpoint, static_argnums=(2, 3))
def _focal_loss_remat(logits, targets, alpha, gamma):
    """Categorical focal loss, summed and normalized by #positives.

    logits: [..., A, C+1]; targets fields broadcast as [..., A].
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = targets.class_targets
    # One-hot multiply-reduce instead of take_along_axis: XLA lowers the
    # per-anchor indexed gather serially on TPU (DESIGN.md §8 "THE TPU
    # GATHER RULE"); the masked sum is one fused elementwise pass.
    logp_t = jnp.sum(
        logp * jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype),
        axis=-1,
    )
    p_t = jnp.exp(logp_t)
    alpha_t = jnp.where(tgt > 0, alpha, 1.0 - alpha)
    per_anchor = -alpha_t * (1.0 - p_t) ** gamma * logp_t
    per_anchor = jnp.where(targets.ignored, 0.0, per_anchor)
    num_pos = jnp.maximum(jnp.sum(targets.positive.astype(jnp.float32)), 1.0)
    return jnp.sum(per_anchor) / num_pos


# ---------------------------------------------------------------------------
# Hand-derived focal VJP. For one anchor with z the (C+1) logits, p =
# softmax(z), t the target class and L = -alpha_t (1-p_t)^g log p_t:
#   dL/dz_j = c * (onehot_t[j] - p_j),
#   c = p_t * dL/dp_t = -alpha_t [ (1-p_t)^g - g p_t (1-p_t)^(g-1) log p_t ]
# The backward is ONE fused elementwise pass recomputed from the saved
# logits — no reverse-mode chain intermediates. Measured against autodiff
# in tests/test_losses.py (grad parity to fp32 tolerance).
# ---------------------------------------------------------------------------


def _focal_parts(z32, tgt, alpha, gamma):
    logp = jax.nn.log_softmax(z32, axis=-1)
    onehot = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    logp_t = jnp.sum(logp * onehot, axis=-1)
    p_t = jnp.exp(logp_t)
    alpha_t = jnp.where(tgt > 0, alpha, 1.0 - alpha)
    return logp, onehot, logp_t, p_t, alpha_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _focal_custom(logits, tgt, ignored, positive, alpha, gamma):
    _, _, logp_t, p_t, alpha_t = _focal_parts(
        logits.astype(jnp.float32), tgt, alpha, gamma
    )
    per_anchor = -alpha_t * (1.0 - p_t) ** gamma * logp_t
    per_anchor = jnp.where(ignored, 0.0, per_anchor)
    num_pos = jnp.maximum(jnp.sum(positive.astype(jnp.float32)), 1.0)
    return jnp.sum(per_anchor) / num_pos


def _focal_custom_fwd(logits, tgt, ignored, positive, alpha, gamma):
    out = _focal_custom(logits, tgt, ignored, positive, alpha, gamma)
    return out, (logits, tgt, ignored, positive)


def _focal_custom_bwd(alpha, gamma, res, gbar):
    logits, tgt, ignored, positive = res
    logp, onehot, logp_t, p_t, alpha_t = _focal_parts(
        logits.astype(jnp.float32), tgt, alpha, gamma
    )
    p = jnp.exp(logp)
    om = 1.0 - p_t
    # (1-p_t)^(g-1) guarded at p_t == 1 (both loss and grad vanish there
    # for g > 1; avoid 0^(negative) for exotic g).
    om_gm1 = jnp.where(om > 0.0, om, 1.0) ** (gamma - 1.0)
    om_gm1 = jnp.where(om > 0.0, om_gm1, 0.0)
    c = -alpha_t * (om ** gamma - gamma * p_t * om_gm1 * logp_t)
    grad = c[..., None] * (onehot - p)
    grad = jnp.where(ignored[..., None], 0.0, grad)
    num_pos = jnp.maximum(jnp.sum(positive.astype(jnp.float32)), 1.0)
    grad = grad * (gbar / num_pos)
    import numpy as _np

    f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return (grad.astype(logits.dtype), f0(tgt), f0(ignored), f0(positive))


_focal_custom.defvjp(_focal_custom_fwd, _focal_custom_bwd)


def _huber(x: jnp.ndarray, delta: float = 1.0 / 9.0) -> jnp.ndarray:
    absx = jnp.abs(x)
    quad = 0.5 * x * x / delta
    return jnp.where(absx < delta, quad, absx - 0.5 * delta)


def attenuated_regression_loss(
    deltas: jnp.ndarray,
    log_vars: jnp.ndarray,
    targets: AnchorTargets,
    residual: str = "l2",
    log_var_clip: float = 10.0,
    variance_weight: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    return _attenuated_remat(
        deltas, log_vars, targets, variance_weight, residual, log_var_clip
    )


@functools.partial(jax.checkpoint, static_argnums=(4, 5))
def _attenuated_remat(
    deltas, log_vars, targets, variance_weight, residual, log_var_clip
):
    """Aleatoric NLL on positive anchors, normalized by #positives.

    deltas/log_vars: [..., A, 4] predictions in encoded space.

    variance_weight w in [0, 1] interpolates between the plain residual loss
    (w=0: no attenuation, the variance head gets zero gradient) and the full
    Kendall-Gal NLL (w=1). Early in training the residuals are huge, so the
    ds gradient of the NLL (-0.5*exp(-s)*err^2 + 0.5 per coordinate for l2)
    dwarfs everything else and forces global grad clipping every step; the
    trainer ramps w linearly over `variance_warmup_steps` so box regression
    settles before the variance head starts absorbing error.
    """
    deltas = deltas.astype(jnp.float32)
    s = jnp.clip(log_vars.astype(jnp.float32), -log_var_clip, log_var_clip)
    w = jnp.asarray(variance_weight, jnp.float32)
    err = targets.box_targets - deltas
    if residual == "l2":
        plain = 0.5 * err * err
        atten = 0.5 * jnp.exp(-s) * err * err + 0.5 * s
    elif residual == "huber":
        plain = _huber(err)
        atten = jnp.exp(-s) * _huber(err) + 0.5 * s
    else:
        raise ValueError(f"unknown residual '{residual}'")
    per_coord = (1.0 - w) * plain + w * atten
    per_anchor = jnp.sum(per_coord, axis=-1)
    per_anchor = jnp.where(targets.positive, per_anchor, 0.0)
    num_pos = jnp.maximum(jnp.sum(targets.positive.astype(jnp.float32)), 1.0)
    return jnp.sum(per_anchor) / num_pos


def zloss(logits: jnp.ndarray) -> jnp.ndarray:
    """mean(logsumexp(logits)^2) over every anchor (PaLM's z-loss, adapted
    to the per-anchor softmax). Softmax/focal losses are common-mode
    invariant, so nothing else pins the classifier's output scale; under
    AdamW the scale random-walks upward until bf16 rounding erases the
    class-discriminative logit gaps (round-3 flagship failure — see
    ModelConfig.head_norm / TrainConfig.zloss_weight). Pinning
    logsumexp ~ 0 bounds both the common mode and the positive logits."""
    z = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(z * z)


def detection_loss(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    log_vars: jnp.ndarray,
    targets: AnchorTargets,
    alpha: float = 0.25,
    gamma: float = 2.0,
    regression_weight: float = 1.0,
    residual: str = "l2",
    variance_weight: jnp.ndarray | float = 1.0,
    zloss_weight: float = 0.0,
    focal_backward: str = "autodiff",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss and a metrics dict (SURVEY.md §3.1 train_step objective)."""
    cls = focal_loss(logits, targets, alpha, gamma, backward=focal_backward)
    reg = attenuated_regression_loss(
        deltas, log_vars, targets, residual, variance_weight=variance_weight
    )
    total = cls + regression_weight * reg
    metrics = {
        "loss": total,
        "loss_cls": cls,
        "loss_reg": reg,
        "num_positive": jnp.sum(targets.positive.astype(jnp.float32)),
        # Scale canary: healthy runs sit at O(10); growth past ~1e3 means
        # the logit scale is drifting into bf16-rounding territory.
        "max_abs_logit": jnp.max(jnp.abs(logits.astype(jnp.float32))),
    }
    if zloss_weight > 0.0:
        zl = zloss_weight * zloss(logits)
        total = total + zl
        metrics["loss"] = total
        metrics["loss_z"] = zl
    return total, metrics
