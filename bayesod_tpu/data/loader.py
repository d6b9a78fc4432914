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

import collections
import concurrent.futures
import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from bayesod_tpu.data.preprocess import prepare_example


def load_image_rgb(path: str) -> np.ndarray:
    """Decode an image file to uint8 RGB [H,W,3].

    Prefers cv2 (SIMD libpng/libjpeg-turbo, releases the GIL for the whole
    decode) and falls back to PIL. This is the host pipeline's hot function:
    at the flagship device rate (~800-1000 img/s/chip) decode throughput is
    the input-pipeline budget (SURVEY.md §7 hard part (e); measured rates in
    DESIGN.md "host input pipeline")."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        pass
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


class _Once:
    """Compute-exactly-once cell: the first caller runs `compute` under the
    cell lock, later callers (including concurrent ones on other workers)
    block briefly and read the stored value. A failed compute leaves the
    cell empty so a retry is possible."""

    __slots__ = ("_lock", "_done", "_value")

    def __init__(self):
        self._lock = threading.Lock()
        self._done = False
        self._value = None

    def get(self, compute):
        with self._lock:
            if not self._done:
                self._value = compute()
                self._done = True
            return self._value


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
      shard_index/shard_count: multi-host input sharding. Every process
        computes the SAME seeded global epoch order, then takes the strided
        slice order[shard_index::shard_count] — shards are disjoint, cover
        the epoch, and stay balanced under shuffle with zero cross-host
        coordination. Pass jax.process_index()/process_count() and the
        per-process batch size; parallel/mesh.shard_batch assembles the
        logically-global array from the local shards (SURVEY.md §5.8).
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
        cache: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        if not 0 <= shard_index < shard_count:
            raise ValueError(
                f"shard_index={shard_index} out of range for "
                f"shard_count={shard_count}"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_hw = tuple(image_hw)
        self.max_gt_boxes = max_gt_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.num_epochs = num_epochs
        self.shard_index = shard_index
        self.shard_count = shard_count
        # Optional cross-epoch memoization of prepared examples
        # (DataConfig.cache_examples). Handlers are deterministic per
        # index, so this is semantically identity. Entries are _Once cells
        # so each index is prepared EXACTLY once even when the cross-batch
        # lookahead submits an epoch-2 batch while epoch-1's examples are
        # still in flight (two workers racing on the same index).
        self._cache: Optional[Dict[int, "_Once"]] = {} if cache else None
        self._cache_lock = threading.Lock()

    def steps_per_epoch(self) -> int:
        shard_len = len(
            range(self.shard_index, len(self.dataset), self.shard_count)
        )
        return shard_len // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        # Strided slice of the (identical-on-every-host) global order:
        # disjoint per-process shards without coordination.
        return order[self.shard_index :: self.shard_count]

    def _batch_indices(self):
        """Yields per-batch index arrays across epochs (full batches only)."""
        epoch = 0
        while self.num_epochs is None or epoch < self.num_epochs:
            order = self._epoch_order(epoch)
            n_batches = len(order) // self.batch_size
            for b in range(n_batches):
                yield order[b * self.batch_size : (b + 1) * self.batch_size]
            epoch += 1

    def _prep(self, idx: int):
        idx = int(idx)
        if self._cache is None:
            return prepare_example(
                self.dataset.example(idx), self.image_hw, self.max_gt_boxes
            )
        with self._cache_lock:
            cell = self._cache.get(idx)
            if cell is None:
                cell = self._cache[idx] = _Once()
        return cell.get(
            lambda: prepare_example(
                self.dataset.example(idx), self.image_hw, self.max_gt_boxes
            )
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """PERSISTENT worker pool + cross-batch lookahead.

        Round-1 spawned one fresh thread per example per batch (128 spawns/
        batch at the bench batch size) and issued no decode work for batch
        k+1 until batch k was fully assembled. Now `num_workers` threads
        live for the whole iteration (ThreadPoolExecutor; PIL/cv2 release
        the GIL during decode), and the producer keeps `prefetch + 1`
        batches' example futures in flight, so workers never drain while a
        finished batch waits in the queue."""
        if self.num_workers <= 1:
            yield from self._iter_serial()
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=self.num_workers, thread_name_prefix="loader"
        )

        def produce():
            try:
                pending: "collections.deque" = collections.deque()
                gen = self._batch_indices()
                exhausted = False
                while True:
                    while not exhausted and len(pending) <= self.prefetch:
                        try:
                            idx = next(gen)
                        except StopIteration:
                            exhausted = True
                            break
                        pending.append(
                            [pool.submit(self._prep, i) for i in idx]
                        )
                    if not pending:
                        break
                    if stop.is_set():
                        return
                    examples = [f.result() for f in pending.popleft()]
                    out_q.put(self._stack_batch(examples))
            except BaseException:
                # Consumer-initiated teardown cancels in-flight futures;
                # anything else is a real error worth the traceback.
                if not stop.is_set():
                    raise
            finally:
                # Sentinel: never block forever if the consumer is gone.
                while True:
                    try:
                        out_q.put(None, timeout=0.1)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

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
            pool.shutdown(wait=False, cancel_futures=True)

    def _iter_serial(self) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self._batch_indices():
            yield self._stack_batch([self._prep(i) for i in idx])

    def _stack_batch(self, examples: Sequence[Dict]) -> Dict[str, np.ndarray]:
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
            max_objects=getattr(data_cfg, "synthetic_max_objects", 4),
            seed=0 if split == "train" else 1,
        )
    raise ValueError(f"unknown dataset '{name}'")
