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


def random_scale_jitter_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    min_scale: float = 0.8,
    max_scale: float = 1.2,
    min_visible: float = 8.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image random zoom (in or out) at FIXED canvas shape, inside jit.

    The TPU-shaped form of scale augmentation: `jax.image.scale_and_translate`
    takes the scale/translation as TRACED floats while the output shape stays
    static, so one compiled graph covers the whole scale range — no
    dynamic-shape resize, no host round-trip. Zoom-out pads with zeros (the
    canvas padding color); zoom-in crops. The placement of the scaled image
    is uniform over the valid offset range.

    images [B,H,W,C] uint8/float -> float32; gt_boxes [B,G,4] corners map
    affinely (b' = f*b + t) and are clipped to the canvas; boxes left with
    less than `min_visible` pixels of width or height are invalidated (and
    zeroed, matching the loader's padding convention).

    Returns (images float32, gt_boxes, gt_valid).
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    kf, kx, ky = jax.random.split(rng, 3)
    f = jax.random.uniform(kf, (b,), minval=min_scale, maxval=max_scale)
    # Valid offset range keeps the scaled image covering as much canvas as
    # possible: [0, W - fW] when zooming out (place the small image inside),
    # [W - fW, 0] when zooming in (crop a window of the big image).
    ux = jax.random.uniform(kx, (b,))
    uy = jax.random.uniform(ky, (b,))
    tx = ux * (w - f * w)  # (w - fw) flips sign with f, so does the range
    ty = uy * (h - f * h)
    x = images.astype(jnp.float32)

    def per_image(img, fi, txi, tyi):
        return jax.image.scale_and_translate(
            img, (h, w, img.shape[-1]), (0, 1),
            jnp.stack([fi, fi]), jnp.stack([tyi, txi]),
            method="linear",
        )

    out = jax.vmap(per_image)(x, f, tx, ty)

    fb = f[:, None, None]
    shift = jnp.stack([tx, ty, tx, ty], axis=-1)[:, None, :]
    boxes = gt_boxes * fb + shift
    x1 = jnp.clip(boxes[..., 0], 0.0, float(w))
    y1 = jnp.clip(boxes[..., 1], 0.0, float(h))
    x2 = jnp.clip(boxes[..., 2], 0.0, float(w))
    y2 = jnp.clip(boxes[..., 3], 0.0, float(h))
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    visible = ((x2 - x1) >= min_visible) & ((y2 - y1) >= min_visible)
    valid = gt_valid & visible
    boxes = jnp.where(valid[..., None], boxes, 0.0)
    return out, boxes, valid
