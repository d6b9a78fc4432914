"""Train state: parameters + optimizer + BN statistics + RNG, one pytree.

Counterpart of the reference's tf.train.Checkpoint contents (SURVEY.md §5.4:
model variables + optimizer slots + step). A single flax PyTreeNode keeps the
whole thing shardable with one NamedSharding map and serializable with one
Orbax call.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32
    params: Any
    batch_stats: Any  # empty dict when norm != batchnorm
    opt_state: optax.OptState
    rng: jax.Array  # carried PRNG key (dropout + augmentation)
    # EMA of params (TrainConfig.ema_decay > 0); empty dict when off so the
    # treedef stays fixed for sharding maps and Orbax templates.
    ema_params: Any = flax.struct.field(default_factory=dict)

    def variables(self, use_ema: bool = False) -> Dict[str, Any]:
        if use_ema and not self.ema_params:
            raise ValueError(
                "state carries no EMA params (train with ema_decay > 0)"
            )
        v = {"params": self.ema_params if use_ema else self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_lr_schedule(train_cfg) -> optax.Schedule:
    """Linear warmup -> decay. TrainConfig.lr_schedule picks the decay:
    "step" = piecewise constant at lr_decay_steps by lr_decay_factor
    (reference-style schedule, SURVEY.md §2 "Trainer"); "cosine" = cosine
    from base_lr down to base_lr*lr_min_factor over total_steps.

    Step accounting: every TrainConfig step quantity (warmup_steps,
    total_steps, lr_decay_steps) counts TRAIN-STEP CALLS (microsteps) — the
    number of batches the loop runs, invariant to grad_accum_steps. Under
    gradient accumulation optax.MultiSteps advances the inner schedule once
    per OPTIMIZER UPDATE (every k-th call), so the config's microstep spans
    are converted to update counts here (// grad_accum_steps) — the anneal
    completes exactly when the loop reaches total_steps, for any k."""
    k = max(getattr(train_cfg, "grad_accum_steps", 1), 1)

    def upd(n: int) -> int:
        """Microstep count -> optimizer-update count."""
        return int(n) // k

    warmup = upd(train_cfg.warmup_steps)
    if train_cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=(
                train_cfg.base_lr / max(warmup, 1)
                if warmup > 0
                else train_cfg.base_lr
            ),
            peak_value=train_cfg.base_lr,
            warmup_steps=max(warmup, 0),
            decay_steps=max(upd(train_cfg.total_steps), 1),
            end_value=train_cfg.base_lr * train_cfg.lr_min_factor,
        )
    if train_cfg.lr_schedule != "step":
        raise ValueError(
            f"unknown TrainConfig.lr_schedule '{train_cfg.lr_schedule}'"
        )
    boundaries: dict = {}
    for s in train_cfg.lr_decay_steps:
        u = upd(s)
        # Two boundaries collapsing onto one update (coarse k) still apply
        # both decay factors.
        boundaries[u] = boundaries.get(u, 1.0) * train_cfg.lr_decay_factor
    decay = optax.piecewise_constant_schedule(train_cfg.base_lr, boundaries)
    if warmup <= 0:
        return decay

    def schedule(step):
        warm = train_cfg.base_lr * (step + 1) / warmup
        return jnp.where(step < warmup, warm, decay(step))

    return schedule


def make_optimizer(train_cfg) -> optax.GradientTransformation:
    """SGD+momentum (reference default) or AdamW, with grad clipping.
    grad_accum_steps > 1 wraps the whole chain in optax.MultiSteps: grads
    are averaged over that many microsteps, the inner optimizer (and its
    schedule) advances once per accumulation window, and non-apply
    microsteps return zero updates (params unchanged)."""
    lr = make_lr_schedule(train_cfg)
    if train_cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(train_cfg.weight_decay),
            optax.sgd(lr, momentum=train_cfg.momentum, nesterov=False),
        )
    elif train_cfg.optimizer == "adamw":
        opt = optax.adamw(lr, weight_decay=train_cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer '{train_cfg.optimizer}'")
    if train_cfg.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_norm), opt)
    accum = getattr(train_cfg, "grad_accum_steps", 1)
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt


def create_train_state(model, train_cfg, rng, image_hw, batch: int = 1) -> TrainState:
    """Initialize parameters + optimizer slots (host or inside pjit)."""
    from bayesod_tpu.models.retinanet import init_variables

    init_rng, carry_rng = jax.random.split(rng)
    variables = init_variables(model, init_rng, image_hw, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = make_optimizer(train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt.init(params),
        rng=carry_rng,
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, params)
            if getattr(train_cfg, "ema_decay", 0.0) > 0
            else {}
        ),
    )
