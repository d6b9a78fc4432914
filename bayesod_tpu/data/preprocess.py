"""Fixed-shape image + GT preprocessing shared by all dataset handlers.

The reference does resize/pad/normalize/flip inside its tf.data pipeline
(SURVEY.md §3.1 host hot loop #1). Here the host does ONLY what needs dynamic
shapes — decode + aspect-preserving resize to the static padded shape — in
numpy/cv2; normalization and flip augmentation are pure jnp functions that run
fused on device inside the train/infer jit graph, so the host->device transfer
ships uint8 pixels (3 bytes/px instead of 12 for fp32 — 4x less PCIe/DMA
traffic, the TPU-native choice for the input-bound regime at
>=500 img/s/chip, BASELINE.json:2).

Coordinate bookkeeping: `scale` maps model-space boxes back to original image
space (eval dumps detections in original coordinates like the reference).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

try:  # cv2 resize is ~3x faster than PIL on big JPEGs; fall back if absent.
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_and_pad(
    image: np.ndarray,
    boxes: np.ndarray,
    target_hw: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Aspect-preserving resize into the top-left of a zero-padded canvas.

    Returns (uint8 image [H,W,3], scaled boxes [G,4], scale). Original-space
    box = model-space box / scale.
    """
    th, tw = target_hw
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) != (h, w):
        if _HAS_CV2:
            interp = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_LINEAR
            image = cv2.resize(image, (nw, nh), interpolation=interp)
        else:  # pragma: no cover
            from PIL import Image

            image = np.asarray(
                Image.fromarray(image).resize((nw, nh), Image.BILINEAR)
            )
    canvas = np.zeros((th, tw, 3), np.uint8)
    canvas[:nh, :nw] = image
    return canvas, boxes.astype(np.float32) * scale, float(scale)


def pad_gt(
    boxes: np.ndarray, classes: np.ndarray, max_boxes: int
) -> Dict[str, np.ndarray]:
    """Pad GT to static [max_boxes, ...] with a validity mask (truncates
    overflow — the reference's dynamic lists have no cap; fixed shapes
    require one, and >64 objects/frame is beyond KITTI/BDD's tail)."""
    g = min(len(boxes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_classes = np.zeros((max_boxes,), np.int32)
    out_valid = np.zeros((max_boxes,), bool)
    out_boxes[:g] = boxes[:g]
    out_classes[:g] = classes[:g]
    out_valid[:g] = True
    return {"gt_boxes": out_boxes, "gt_classes": out_classes, "gt_valid": out_valid}


def prepare_example(
    example: Dict[str, np.ndarray],
    target_hw: Tuple[int, int],
    max_gt_boxes: int,
) -> Dict[str, np.ndarray]:
    """Raw handler example -> fixed-shape numpy record (host side)."""
    image, boxes, scale = resize_and_pad(
        example["image"], example["boxes"], target_hw
    )
    rec = {"image": image, "scale": np.float32(scale)}
    rec.update(pad_gt(boxes, example["classes"], max_gt_boxes))
    return rec


# --------------------------------------------------------------------------
# Device-side (jit) half: normalize + flip augmentation.
# --------------------------------------------------------------------------


def normalize_images(
    images: jnp.ndarray,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> fp32 normalized; fuses into the first conv."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def random_flip_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image random horizontal flip, fixed-shape, inside jit.

    images [B,H,W,C] (any dtype), gt_boxes [B,G,4] corners in model space.
    The canvas width is the flip axis; padded GT rows are zeroed after.
    """
    b = images.shape[0]
    w = images.shape[2]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    flipped_imgs = jnp.where(
        flip[:, None, None, None], images[:, :, ::-1, :], images
    )
    x1, y1, x2, y2 = jnp.split(gt_boxes, 4, axis=-1)
    flipped_boxes = jnp.concatenate([w - x2, y1, w - x1, y2], axis=-1)
    boxes = jnp.where(flip[:, None, None], flipped_boxes, gt_boxes)
    boxes = jnp.where(gt_valid[..., None], boxes, 0.0)
    return flipped_imgs, boxes


def photometric_jitter_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    brightness: float = 32.0,
    contrast: float = 0.5,
    saturation: float = 0.5,
) -> jnp.ndarray:
    """Per-image photometric augmentation, fixed-shape, inside the train jit.

    SSD-style brightness / contrast / saturation jitter — a standard
    detection-training augmentation the reference lacks (its pipeline flips
    only; SURVEY.md §2 dataset handlers). Purely photometric: GT boxes are
    untouched. Runs on the raw 0..255 scale BEFORE normalize_images so the
    whole thing fuses into the train step's elementwise preamble.

      brightness: additive delta ~ U(-brightness, +brightness) (pixel units)
      contrast:   x <- mu_img + f*(x - mu_img),  f ~ U(1-c, 1+c)
      saturation: x <- luma  + f*(x - luma),     f ~ U(1-s, 1+s)

    images [B,H,W,3] uint8 or float (0..255). Returns float32 clipped to
    [0, 255].
    """
    b = images.shape[0]
    kb, kc, ks = jax.random.split(rng, 3)
    x = images.astype(jnp.float32)

    delta = jax.random.uniform(
        kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness
    )
    x = x + delta

    f_c = jax.random.uniform(
        kc, (b, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast
    )
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = mu + f_c * (x - mu)

    f_s = jax.random.uniform(
        ks, (b, 1, 1, 1), minval=1.0 - saturation, maxval=1.0 + saturation
    )
    luma = jnp.sum(
        x * jnp.asarray([0.299, 0.587, 0.114], jnp.float32), axis=-1,
        keepdims=True,
    )
    x = luma + f_s * (x - luma)

    return jnp.clip(x, 0.0, 255.0)
