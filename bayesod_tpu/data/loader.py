"""Batched, prefetching host input pipeline feeding fixed-shape device arrays.

TPU-native replacement for the reference's tf.data pipeline (SURVEY.md §3.1
host hot loop #1). Design points:

  * A pool of worker threads decodes+resizes examples (PIL/cv2 release the
    GIL on the hot paths), assembling pinned numpy batches of
    {image uint8 [B,H,W,3], gt_boxes [B,G,4], gt_classes [B,G], gt_valid [B,G]}.
  * A bounded queue of `prefetch` ready batches hides host latency behind
    device steps; `jax.device_put` (optionally with a NamedSharding) overlaps
    the H2D copy of batch k+1 with compute on batch k.
  * Everything after this boundary (normalize, flip, target assignment) is
    jnp inside the train-step jit — the host ships only uint8 + padded GT.

No tf.data / grain dependency: the loader is ~100 lines of stdlib threading,
which keeps the framework standalone and the failure modes inspectable.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from bayesod_tpu.data.preprocess import prepare_example


class Loader:
    """Iterates fixed-shape numpy batches from any handler with .example(i).

    Args:
      dataset: handler exposing __len__ and example(i).
      batch_size: examples per batch (global batch; shard downstream).
      image_hw: static padded image shape.
      max_gt_boxes: static GT padding.
      shuffle: reshuffle each epoch (seeded, reproducible).
      num_workers: decode threads.
      prefetch: ready-batch queue depth.
      drop_remainder: always True semantics — fixed shapes require full
        batches; the final partial batch of an epoch is dropped.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        image_hw,
        max_gt_boxes: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        num_epochs: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_hw = tuple(image_hw)
        self.max_gt_boxes = max_gt_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.num_epochs = num_epochs

    def steps_per_epoch(self) -> int:
        return len(self.dataset) // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            epoch = 0
            try:
                while self.num_epochs is None or epoch < self.num_epochs:
                    order = self._epoch_order(epoch)
                    n_batches = len(order) // self.batch_size
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                        out_q.put(self._build_batch(idx))
                    epoch += 1
            finally:
                out_q.put(None)  # sentinel

        def _worker(i, idx, slots):
            slots[i] = prepare_example(
                self.dataset.example(int(idx)), self.image_hw, self.max_gt_boxes
            )

        def build_serial(indices):
            return [
                prepare_example(
                    self.dataset.example(int(i)), self.image_hw, self.max_gt_boxes
                )
                for i in indices
            ]

        def build_threaded(indices):
            slots = [None] * len(indices)
            threads = [
                threading.Thread(target=_worker, args=(i, idx, slots))
                for i, idx in enumerate(indices)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return slots

        self._build_examples = (
            build_threaded if self.num_workers > 1 else build_serial
        )

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # Drain so the producer's blocked put() can observe `stop`.
            while not out_q.empty():
                out_q.get_nowait()

    def _build_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        examples = self._build_examples(indices)
        return {
            "image": np.stack([e["image"] for e in examples]),
            "gt_boxes": np.stack([e["gt_boxes"] for e in examples]),
            "gt_classes": np.stack([e["gt_classes"] for e in examples]),
            "gt_valid": np.stack([e["gt_valid"] for e in examples]),
            "scale": np.stack([e["scale"] for e in examples]),
        }


def make_dataset(data_cfg, split: str = "train"):
    """Handler factory keyed on DataConfig.dataset (SURVEY.md §2 L3)."""
    name = data_cfg.dataset
    if name == "kitti":
        from bayesod_tpu.data.kitti import KittiDataset

        return KittiDataset(data_cfg.data_dir, split)
    if name == "bdd":
        from bayesod_tpu.data.bdd import BddDataset

        return BddDataset(data_cfg.data_dir, split)
    if name == "coco":
        from bayesod_tpu.data.coco import CocoDataset

        return CocoDataset(data_cfg.data_dir, split)
    if name == "synthetic":
        from bayesod_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(
            size=getattr(data_cfg, "synthetic_size", 512),
            image_hw=data_cfg.image_hw,
            seed=0 if split == "train" else 1,
        )
    raise ValueError(f"unknown dataset '{name}'")
