"""The jit train step: augment -> forward -> assign -> loss -> update.

Counterpart of the reference's @tf.function train_step (SURVEY.md §3.1), with
the TPU-first differences:

  * uint8 images come in raw; normalization and random flip happen HERE,
    inside the graph, so the host->device copy is 4x smaller.
  * anchor<->GT target assignment runs on device (vmapped over the batch)
    instead of in the input pipeline — it is pure jnp and XLA fuses the IoU
    matrix + thresholding into the step.
  * under a data-sharded batch, every mean reduction (loss normalizers, BN
    batch statistics) is global via GSPMD-inserted collectives — i.e.
    sync-BN semantics across the mesh for free, no tf.distribute machinery.
  * loss math in fp32 islands while conv compute stays bf16 (model dtype).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from bayesod_tpu.data.preprocess import (
    normalize_images,
    photometric_jitter_batch,
    random_flip_batch,
    random_scale_jitter_batch,
)
from bayesod_tpu.losses import assign_targets, detection_loss
from bayesod_tpu.models.retinanet import RetinaNet
from bayesod_tpu.train.state import TrainState, make_optimizer
from bayesod_tpu.utils.config import ExperimentConfig


def make_train_model(cfg: ExperimentConfig) -> RetinaNet:
    """The training-mode model for a config: applies TrainConfig.remat=
    "blocks" (per-residual-block rematerialization) at construction — the
    one train-step knob that lives in the module tree rather than the step
    function. Used by the trainer, the bench, and build_train_step's
    default so every entry point agrees."""
    return RetinaNet(
        cfg=cfg.model, train=True,
        block_remat=cfg.train.remat == "blocks",
    )


def build_train_step(cfg: ExperimentConfig, anchors: jnp.ndarray, model=None):
    """Returns `train_step(state, batch) -> (state, metrics)`, jit-ready.

    `batch` is the loader's dict: image uint8 [B,H,W,3], gt_boxes [B,G,4],
    gt_classes [B,G], gt_valid [B,G]. `anchors` is the trace-time [A,4] grid.
    """
    model = model or make_train_model(cfg)
    opt = make_optimizer(cfg.train)
    tc = cfg.train
    use_bn = cfg.model.uses_batch_stats()

    assign = jax.vmap(
        functools.partial(
            assign_targets,
            iou_positive=tc.match_iou_positive,
            iou_negative=tc.match_iou_negative,
            scale_factors=cfg.bayes.box_scale_factors,
        ),
        in_axes=(None, 0, 0, 0),
    )

    def forward(params, batch_stats, images, dropout_rng):
        variables = {"params": params}
        if use_bn:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables,
            images,
            stochastic=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"] if use_bn else False,
        )
        if use_bn:
            (logits, deltas, log_vars), mutated = out
            return (logits, deltas, log_vars), mutated["batch_stats"]
        logits, deltas, log_vars = out
        return (logits, deltas, log_vars), batch_stats

    if tc.remat == "full":
        # Backward recomputes the whole forward instead of reading saved
        # activations from HBM (TrainConfig.remat docstring; the step is
        # HBM-bound, so bytes are the budget).
        forward = jax.checkpoint(forward)
    elif tc.remat not in ("none", "blocks"):
        # "blocks" is applied inside the module tree (make_train_model).
        raise ValueError(f"unknown TrainConfig.remat '{tc.remat}'")

    def loss_fn(params, batch_stats, images, targets, dropout_rng, var_w):
        (logits, deltas, log_vars), new_stats = forward(
            params, batch_stats, images, dropout_rng
        )
        total, metrics = detection_loss(
            logits,
            deltas,
            log_vars,
            targets,
            alpha=tc.focal_alpha,
            gamma=tc.focal_gamma,
            regression_weight=tc.regression_weight,
            residual=tc.residual,
            variance_weight=var_w,
            zloss_weight=tc.zloss_weight,
            focal_backward=tc.focal_backward,
        )
        return total, (metrics, new_stats)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, flip_rng, photo_rng, scale_rng, dropout_rng = jax.random.split(
            state.rng, 5
        )

        images = batch["image"]
        gt_boxes = batch["gt_boxes"]
        gt_valid = batch["gt_valid"]
        if cfg.data.augment_scale is not None:
            images, gt_boxes, gt_valid = random_scale_jitter_batch(
                scale_rng, images, gt_boxes, gt_valid,
                min_scale=cfg.data.augment_scale[0],
                max_scale=cfg.data.augment_scale[1],
            )
        if cfg.data.augment_flip:
            images, gt_boxes = random_flip_batch(
                flip_rng, images, gt_boxes, gt_valid
            )
        if cfg.data.augment_photometric:
            images = photometric_jitter_batch(photo_rng, images)
        images = normalize_images(images, cfg.data.mean, cfg.data.std)
        targets = assign(anchors, gt_boxes, batch["gt_classes"], gt_valid)

        # variance_warmup_steps counts train-step calls (microsteps), like
        # every TrainConfig step quantity — state.step is exactly that.
        if tc.variance_warmup_steps > 0:
            var_w = jnp.clip(
                state.step.astype(jnp.float32) / tc.variance_warmup_steps,
                0.0,
                1.0,
            )
        else:
            var_w = jnp.float32(1.0)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, targets, dropout_rng, var_w
        )
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["variance_weight"] = var_w
        metrics["grad_norm"] = jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
        )
        new_ema = state.ema_params
        if tc.ema_decay > 0:
            d = jnp.float32(tc.ema_decay)
            if tc.grad_accum_steps > 1:
                # Blend only on microsteps that applied an update (MultiSteps
                # resets mini_step to 0 right after the k-th accumulation),
                # so ema_decay keeps its per-optimizer-update meaning.
                applied = (new_opt_state.mini_step == 0).astype(jnp.float32)
                d = 1.0 - (1.0 - d) * applied
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)
                              ).astype(e.dtype),
                state.ema_params,
                new_params,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            rng=rng,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def build_eval_step(cfg: ExperimentConfig, anchors: jnp.ndarray, model=None):
    """Returns `eval_step(state, batch) -> metrics`, jit-ready: val loss on
    a batch with NO update, NO augmentation, NO dropout, BN in inference
    mode (running stats). The trainer runs it every TrainConfig.eval_every
    steps over a fixed set of val batches — the cheap early-signal
    complement to the full offline evaluator (eval/evaluator.py)."""
    eval_model = model or RetinaNet(cfg=cfg.model, train=False)
    if eval_model.train:
        raise ValueError("build_eval_step needs a train=False model")
    tc = cfg.train

    assign = jax.vmap(
        functools.partial(
            assign_targets,
            iou_positive=tc.match_iou_positive,
            iou_negative=tc.match_iou_negative,
            scale_factors=cfg.bayes.box_scale_factors,
        ),
        in_axes=(None, 0, 0, 0),
    )

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        images = normalize_images(batch["image"], cfg.data.mean, cfg.data.std)
        targets = assign(
            anchors, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
        )
        logits, deltas, log_vars = eval_model.apply(
            state.variables(), images, stochastic=False
        )
        _, metrics = detection_loss(
            logits, deltas, log_vars, targets,
            alpha=tc.focal_alpha, gamma=tc.focal_gamma,
            regression_weight=tc.regression_weight,
            residual=tc.residual,
            variance_weight=1.0,
            zloss_weight=tc.zloss_weight,
        )
        return metrics

    return eval_step
