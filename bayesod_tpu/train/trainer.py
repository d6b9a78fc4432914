"""Training driver: mesh + loader + jit step + checkpoints + metrics.

Counterpart of the reference's run_training.py (SURVEY.md §3.1), restructured
TPU-first: one jit-compiled train step sharded over the (data, sample) mesh,
uint8 batches prefetched and device_put with the data-parallel layout so the
H2D copy of batch k+1 overlaps compute on batch k, async Orbax saves, JSONL +
TensorBoard metrics.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from bayesod_tpu.data import Loader, make_dataset
from bayesod_tpu.models.retinanet import RetinaNet
from bayesod_tpu.ops import anchors as anchor_ops
from bayesod_tpu.parallel import mesh as mesh_lib
from bayesod_tpu.train.checkpoint import CheckpointManager
from bayesod_tpu.train.state import TrainState, create_train_state
from bayesod_tpu.train.step import build_train_step, make_train_model
from bayesod_tpu.utils.config import ExperimentConfig
from bayesod_tpu.utils.metrics import MetricsLogger


def train(
    cfg: ExperimentConfig,
    max_steps: Optional[int] = None,
    out_dir: Optional[str] = None,
    devices=None,
    on_metrics: Optional[Callable[[int, Dict[str, float]], None]] = None,
    backbone_weights: Optional[str] = None,
) -> TrainState:
    """Run (or resume) training; returns the final state.

    `max_steps` overrides cfg.train.total_steps (smoke tests / benchmarks).
    `backbone_weights`: optional path to a pretrained ResNet archive
    (models/pretrained.py) applied at fresh starts — a restored checkpoint
    takes precedence (the weights are already inside it).
    """
    tc = cfg.train
    total_steps = max_steps if max_steps is not None else tc.total_steps
    out_dir = out_dir or f"data/outputs/{cfg.name}"

    mesh = mesh_lib.make_mesh(cfg.mesh, devices)
    n_data = mesh.shape[cfg.mesh.data_axis]
    if tc.batch_size % n_data:
        raise ValueError(
            f"batch_size={tc.batch_size} must be divisible by the data-"
            f"parallel axis ({n_data} devices) for even sharding"
        )
    model = make_train_model(cfg)
    anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)

    # --- state init (restore if a checkpoint exists: SURVEY.md §5.4) --------
    state = create_train_state(
        model, tc, jax.random.PRNGKey(tc.seed), cfg.data.image_hw
    )
    ckpt = CheckpointManager(f"{out_dir}/checkpoints", keep=3)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
    elif backbone_weights:
        from bayesod_tpu.models.pretrained import load_backbone_weights

        v = {"params": state.params, "batch_stats": state.batch_stats}
        v = load_backbone_weights(v, backbone_weights, cfg.model)
        state = state.replace(
            params=v["params"], batch_stats=v.get("batch_stats", {})
        )
    state = mesh_lib.replicate_state(state, mesh)

    # --- data ----------------------------------------------------------------
    # Multi-host: each process loads batch_size/process_count examples from
    # its disjoint shard of the seeded global order; mesh_lib.shard_batch
    # assembles the logically-global batch (SURVEY.md §5.8). Single-process
    # (process_count=1) reduces to the plain global loader.
    n_proc = jax.process_count()
    if tc.batch_size % n_proc:
        raise ValueError(
            f"batch_size={tc.batch_size} must be divisible by the process "
            f"count ({n_proc}) for multi-host input sharding"
        )
    dataset = make_dataset(cfg.data, split="train")
    loader = Loader(
        dataset,
        batch_size=tc.batch_size // n_proc,
        image_hw=cfg.data.image_hw,
        max_gt_boxes=cfg.data.max_gt_boxes,
        shuffle=True,
        seed=tc.seed,
        num_epochs=None,  # repeat forever; step count terminates
        cache=cfg.data.cache_examples,
        shard_index=jax.process_index(),
        shard_count=n_proc,
    )

    # --- compiled step ---------------------------------------------------------
    step_fn = jax.jit(
        build_train_step(cfg, anchors, model),
        in_shardings=(
            mesh_lib.replicated(mesh),
            mesh_lib.batch_sharding(mesh, cfg.mesh),
        ),
        out_shardings=(mesh_lib.replicated(mesh), mesh_lib.replicated(mesh)),
        donate_argnums=(0,),
    )

    # --- periodic val loss (TrainConfig.eval_every) -------------------------
    eval_fn, val_batches = None, []
    if tc.eval_every > 0:
        from bayesod_tpu.train.step import build_eval_step

        # No fallback: eval_every>0 is an explicit request for val metrics —
        # a broken val split must fail loudly, not log train loss as val/.
        val_dataset = make_dataset(cfg.data, split="val")
        # Same per-process sharding as the train loader: each process feeds
        # its local shard and shard_batch assembles the global val batch.
        val_loader = Loader(
            val_dataset,
            batch_size=tc.batch_size // n_proc,
            image_hw=cfg.data.image_hw,
            max_gt_boxes=cfg.data.max_gt_boxes,
            shuffle=False,
            num_epochs=1,
            shard_index=jax.process_index(),
            shard_count=n_proc,
        )
        # Fixed batches, sharded once: the same data every eval -> the val
        # curve moves only when the model does.
        for i, vb in enumerate(val_loader):
            if i >= tc.eval_batches:
                break
            val_batches.append(mesh_lib.shard_batch(vb, mesh, cfg.mesh))
        eval_fn = jax.jit(
            build_eval_step(cfg, anchors),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, cfg.mesh),
            ),
            out_shardings=mesh_lib.replicated(mesh),
        )

    # Multi-host: metrics files (JSONL/TensorBoard) are written by process 0
    # only — every process computes identical replicated metrics, and
    # concurrent appends to one shared out_dir would duplicate/corrupt rows.
    # ckpt.save stays on ALL processes: Orbax saving is a collective (each
    # process participates; the primary host writes).
    is_primary = jax.process_index() == 0
    logger = MetricsLogger(out_dir) if is_primary else None
    start_step = int(state.step)
    t_last = time.time()
    imgs_since = 0

    # The loop tracks the step count ON HOST (start_step + calls): fetching
    # int(state.step) each iteration is a D2H sync on the just-dispatched
    # step, which serializes the host (loader decode + shard/H2D of the
    # next batch) against device compute. With the async dispatch queue the
    # host instead runs ahead, overlapping input work with the device step.
    # Run-ahead is bounded by fetching one scalar from the step lagging
    # MAX_INFLIGHT behind (a real D2H fetch — on this remote-PJRT tunnel
    # block_until_ready can return early, only fetches truly sync), capping
    # live batch buffers in HBM.
    MAX_INFLIGHT = 2
    inflight: list = []
    step = start_step

    for batch in loader:
        if step >= total_steps:
            break
        device_batch = mesh_lib.shard_batch(batch, mesh, cfg.mesh)
        state, metrics = step_fn(state, device_batch)
        inflight.append(metrics["loss"])
        if len(inflight) > MAX_INFLIGHT:
            np.asarray(inflight.pop(0))
        imgs_since += tc.batch_size

        next_step = step + 1
        if next_step % tc.log_every == 0 or next_step == total_steps:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.time()
            metrics["images_per_sec"] = imgs_since / max(now - t_last, 1e-9)
            metrics["lr_step"] = next_step
            t_last, imgs_since = now, 0
            if logger is not None:
                logger.log(next_step, metrics, prefix="train/")
            if on_metrics is not None and is_primary:
                on_metrics(next_step, metrics)
        if eval_fn is not None and (
            next_step % tc.eval_every == 0 or next_step == total_steps
        ):
            sums: Dict[str, float] = {}
            for vb in val_batches:
                vm = eval_fn(state, vb)
                for k, v in vm.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            val_metrics = {
                k: v / max(len(val_batches), 1) for k, v in sums.items()
            }
            if logger is not None:
                logger.log(next_step, val_metrics, prefix="val/")
            if on_metrics is not None and is_primary:
                on_metrics(
                    next_step, {f"val/{k}": v for k, v in val_metrics.items()}
                )
        if next_step % tc.checkpoint_every == 0 or next_step == total_steps:
            ckpt.save(state, step=next_step)
        step = next_step

    ckpt.wait()
    if logger is not None:
        logger.close()
    return state
