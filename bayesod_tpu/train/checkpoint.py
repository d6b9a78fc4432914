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
        """Restore the latest checkpoint shaped like `template`, or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
