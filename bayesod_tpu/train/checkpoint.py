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
) -> TrainState:
    """Template-build + latest-checkpoint restore in one call — the single
    restore recipe shared by Detector.from_checkpoint / from_ensemble and
    cli.infer (previously three hand-rolled copies).

    Returns the restored TrainState; with missing_ok=True a fresh template
    (random init, step 0) when no checkpoint exists, else FileNotFoundError.
    """
    import jax

    from bayesod_tpu.models.retinanet import RetinaNet
    from bayesod_tpu.train.state import create_train_state

    model = model or RetinaNet(cfg=cfg.model, train=False)
    template = create_train_state(
        model, cfg.train, jax.random.PRNGKey(cfg.train.seed),
        cfg.data.image_hw,
    )
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
