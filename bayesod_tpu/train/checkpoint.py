"""Orbax checkpointing: async save, keep-last-k, restore-on-start.

Counterpart of the reference's tf.train.CheckpointManager flow (SURVEY.md
§5.4): periodic saves of the full TrainState under
data/outputs/<experiment>/checkpoints/, restore at trainer start and in the
inference driver. Async saves overlap serialization with the next train steps
(the TPU never waits on disk).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from bayesod_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else step
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint shaped like `template`, or None.

        EMA migration: checkpoints saved before ema_params existed (or by
        ema_decay=0 runs) lack the EMA subtree. If the template expects one,
        retry the restore without it and INITIALIZE the EMA at the restored
        params — the same seeding a fresh ema_decay>0 run gets, so enabling
        EMA on an existing run resumes cleanly instead of failing the Orbax
        structure match.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception:
            if not template.ema_params:
                raise
        bare = template.replace(ema_params={})
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(bare))
        import jax

        return restored.replace(
            ema_params=jax.tree_util.tree_map(lambda x: x, restored.params)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_state(
    cfg,
    checkpoint_dir: Optional[str] = None,
    model=None,
    missing_ok: bool = False,
    weights_npz: Optional[str] = None,
) -> TrainState:
    """Template-build + latest-checkpoint restore in one call — the single
    restore recipe shared by Detector.from_checkpoint / from_ensemble and
    cli.infer (previously three hand-rolled copies).

    Returns the restored TrainState; with missing_ok=True a fresh template
    (random init, step 0) when no checkpoint exists, else FileNotFoundError.
    `weights_npz` restores from a serving-weights archive instead (see
    save_weights_npz) — step/params/batch_stats/EMA only, optimizer state
    stays at init (eval/serving path; resuming training needs Orbax).
    """
    import jax

    from bayesod_tpu.models.retinanet import RetinaNet
    from bayesod_tpu.train.state import create_train_state

    model = model or RetinaNet(cfg=cfg.model, train=False)
    template = create_train_state(
        model, cfg.train, jax.random.PRNGKey(cfg.train.seed),
        cfg.data.image_hw,
    )
    if weights_npz is not None:
        return load_weights_npz(template, weights_npz)
    with CheckpointManager(
        checkpoint_dir or f"data/outputs/{cfg.name}/checkpoints",
        async_save=False,
    ) as mgr:
        state = mgr.restore(template)
        if state is None:
            if missing_ok:
                return template
            raise FileNotFoundError(f"no checkpoint found under {mgr.directory}")
        return state


# --- serving-weights npz archives ------------------------------------------
# A full Orbax TrainState checkpoint is ~3.4x the model size (params + two
# adamw moments + EMA + opt bookkeeping). Evaluation and serving only need
# params/batch_stats/EMA, and this environment only persists files committed
# to git between sessions (CLAUDE.md) — so trained weights ship as one
# compressed npz with '/'-joined pytree paths, loadable into a fresh
# TrainState template on any host. Reference counterpart: the released
# .ckpt serving archives (SURVEY.md §5.4); format is ours.

_NPZ_COLLECTIONS = ("params", "batch_stats", "ema_params")


def save_weights_npz(state: TrainState, path: str, dtype=None) -> int:
    """Write params/batch_stats/EMA (+ step) as one np.savez_compressed.

    Returns the number of arrays written. Optimizer state and the carried
    rng are deliberately dropped — archives restore for EVAL, not resume.

    `dtype` (e.g. "float16") downcasts floating arrays for the archive —
    halves the committed size; serving runs bf16 so fp16 storage (10
    mantissa bits > bf16's 7) is lossless for the serving graph.
    load_weights_npz casts back to the template dtypes on restore.
    """
    import numpy as np
    from flax import traverse_util

    arrays = {"_step": np.asarray(state.step)}
    for coll in _NPZ_COLLECTIONS:
        tree = getattr(state, coll)
        if not tree:
            continue
        flat = traverse_util.flatten_dict(dict(tree), sep="/")
        for key, value in flat.items():
            a = np.asarray(value)
            if dtype is not None and np.issubdtype(a.dtype, np.floating):
                a = a.astype(dtype)
            arrays[f"{coll}/{key}"] = a
    np.savez_compressed(path, **arrays)
    return len(arrays)


def load_weights_npz(template: TrainState, path: str) -> TrainState:
    """Rebuild a TrainState from save_weights_npz onto a fresh template.

    Every archive array must match the template's structure (loud on
    unknown keys — a config/archive mismatch should fail, not half-load);
    an archive without EMA loads into an EMA-less template only.
    """
    import jax.numpy as jnp
    import numpy as np
    from flax import traverse_util

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    step = arrays.pop("_step", None)
    flats = {}
    for coll in _NPZ_COLLECTIONS:
        prefix = f"{coll}/"
        flats[coll] = {
            k[len(prefix):]: arrays.pop(k)
            for k in list(arrays)
            if k.startswith(prefix)
        }
    if arrays:
        raise ValueError(f"unknown arrays in {path}: {sorted(arrays)[:5]}")

    def graft(templ, l_flat, name):
        t_flat = (
            traverse_util.flatten_dict(dict(templ), sep="/") if templ else {}
        )
        diff = sorted(set(t_flat) ^ set(l_flat))[:5] or [
            f"{k}: {tuple(l_flat[k].shape)} != {tuple(t_flat[k].shape)}"
            for k in sorted(t_flat)
            if tuple(t_flat[k].shape) != tuple(l_flat[k].shape)
        ][:5]
        if diff:
            raise ValueError(
                f"{path} {name} tree does not match the config's model "
                f"(archive saved from a different config? first "
                f"mismatches: {diff})"
            )
        if not templ:
            return templ
        new_flat = {k: jnp.asarray(l_flat[k], t_flat[k].dtype) for k in t_flat}
        out = traverse_util.unflatten_dict(new_flat, sep="/")
        return out if isinstance(templ, dict) else type(templ)(out)

    state = template.replace(
        params=graft(template.params, flats["params"], "params"),
        batch_stats=graft(
            template.batch_stats, flats["batch_stats"], "batch_stats"
        ),
        ema_params=graft(
            template.ema_params, flats["ema_params"], "ema_params"
        ),
    )
    if step is not None:
        state = state.replace(step=jnp.asarray(step, template.step.dtype))
    return state
