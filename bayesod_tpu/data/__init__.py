"""Data pipeline: dataset handlers + fixed-shape preprocessing + loader
(SURVEY.md §2 L3; host shell ships uint8, device does the math)."""

from bayesod_tpu.data.loader import Loader, make_dataset
from bayesod_tpu.data.preprocess import (
    normalize_images,
    pad_gt,
    prepare_example,
    random_flip_batch,
    resize_and_pad,
)

__all__ = [
    "Loader",
    "make_dataset",
    "normalize_images",
    "pad_gt",
    "prepare_example",
    "random_flip_batch",
    "resize_and_pad",
]
