"""Greedy IoU-affinity clustering as a single Pallas TPU kernel.

The jnp reference implementation (bayes/clustering.py) expresses the greedy
loop as a `lax.fori_loop` with max_detections iterations; each iteration is a
masked argmax + row update over K candidates. XLA runs that as a serial loop
of small fused kernels — correct, but each iteration pays kernel dispatch and
HBM round-trips for the [K] state vector.

This kernel runs the WHOLE thing on-chip: one program per image loads boxes +
scores into VMEM, computes the K x K IoU matrix (VPU, fp32), then executes the
D-step greedy loop entirely out of VMEM/SMEM. State never touches HBM until
the final membership matrix is written out.

Semantics are bit-identical to the jnp path (same argmax tie-breaking toward
the lowest index) — tests/test_pallas.py asserts parity; the jnp fallback
stays the default off-TPU (SURVEY.md §7 step 8 "keep jnp fallbacks").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesod_tpu.bayes.clustering import Clusters

_NEG_INF = -1e30


def _cluster_kernel(
    boxes_ref,  # [K, 4] fp32 VMEM (padded K)
    scores_ref,  # [1, K] fp32 VMEM (invalid candidates pre-masked to -inf)
    member_ref,  # [D, K] fp32 VMEM out (1.0 = member)
    center_ref,  # [1, D] int32 VMEM out
    valid_ref,  # [1, D] fp32 VMEM out
    *,
    max_detections: int,
    affinity_threshold: float,
):
    k = boxes_ref.shape[0]
    d_pad = center_ref.shape[1]  # lane-padded detection slots
    boxes = boxes_ref[:]  # [K, 4]

    # Pairwise IoU in fp32 on the VPU. [K, K]
    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area + area.T - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-9), 0.0)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    d = max_detections
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)

    def body(i, state):
        # avail: [1, K] scores with claimed/invalid at -inf. centers/valid are
        # [1, D] vectors carried through the loop (Mosaic VMEM stores must be
        # vector-shaped; scalars land in the carry instead).
        avail, centers, valid = state
        m = jnp.max(avail)
        # argmax with lowest-index tie-break (matches jnp.argmax).
        is_max = avail >= m
        c = jnp.min(jnp.where(is_max, col_ids, k))  # scalar int32
        has_center = m > _NEG_INF
        # Row c of the IoU matrix via a masked reduction (Mosaic here has no
        # dynamic_slice lowering; one [K,K] VPU pass per step is VMEM-cheap).
        iou_row = jnp.sum(
            jnp.where(row_ids == c, iou, 0.0), axis=0, keepdims=True
        )  # [1, K]
        members = (
            (iou_row >= affinity_threshold) & (avail > _NEG_INF) & has_center
        )
        member_ref[i, :] = members[0].astype(jnp.float32)
        centers = jnp.where(d_ids == i, c, centers)
        valid = jnp.where(
            d_ids == i, has_center.astype(jnp.float32), valid
        )
        return jnp.where(members, _NEG_INF, avail), centers, valid

    init = (
        scores_ref[:],
        jnp.zeros((1, d_pad), jnp.int32),
        jnp.zeros((1, d_pad), jnp.float32),
    )
    _, centers, valid = jax.lax.fori_loop(0, d, body, init, unroll=False)
    center_ref[:] = centers
    valid_ref[:] = valid


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("affinity_threshold", "max_detections", "interpret")
)
def iou_affinity_clustering_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    affinity_threshold: float,
    max_detections: int,
    interpret: bool = False,
) -> Clusters:
    """Drop-in replacement for bayes.clustering.iou_affinity_clustering."""
    k = boxes.shape[0]
    kp = _round_up(k, 128)  # lane-align the candidate axis
    d = max_detections
    dp = _round_up(d, 128)  # lane-align the detection-slot axis

    boxes_p = jnp.zeros((kp, 4), jnp.float32).at[:k].set(
        boxes.astype(jnp.float32)
    )
    masked = jnp.where(valid_mask, scores.astype(jnp.float32), _NEG_INF)
    scores_p = jnp.full((1, kp), _NEG_INF, jnp.float32).at[0, :k].set(masked)

    member, center, valid = pl.pallas_call(
        functools.partial(
            _cluster_kernel,
            max_detections=d,
            affinity_threshold=affinity_threshold,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_round_up(d, 8), kp), jnp.float32),
            jax.ShapeDtypeStruct((1, dp), jnp.int32),
            jax.ShapeDtypeStruct((1, dp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(boxes_p, scores_p)

    return Clusters(
        centers=center[0, :d],
        membership=member[:d, :k] > 0.5,
        valid=valid[0, :d] > 0.5,
    )


# ---------------------------------------------------------------------------
# Batch-blocked variant: several images advance their greedy loops TOGETHER.
#
# The single-image kernel under jax.vmap becomes a grid of B independent
# programs; on a 1-TensorCore chip they run back to back, so a batch-128
# detect pays 128 x D serial greedy steps. Blocking IMG_BLK images into one
# program vectorizes the per-step work across images ([blk, K] state rows,
# [blk, K, K] IoU slab in VMEM) and cuts the serial step count by IMG_BLK.
#
# Two structural changes vs the single-image kernel, both value-preserving:
#   * Row extraction uses IoU SYMMETRY: column c == row c, so the selected
#     row is a lane-axis masked sum in which exactly one lane matches —
#     bit-identical to the sublane reduction (no float reordering: one term).
#   * The membership matrix is not stored per step (Mosaic dislikes dynamic
#     middle-dim stores on 3D refs); instead each candidate carries the step
#     index that claimed it ("assigned"), and the [blk, D, K] matrix is ONE
#     broadcast-compare store at the end.
# ---------------------------------------------------------------------------


def _cluster_kernel_batched(
    boxes_ref,  # [blk, K, 4] fp32 VMEM
    scores_ref,  # [blk, 1, K] fp32 VMEM (invalid pre-masked to -inf)
    member_ref,  # [blk, D8, K] fp32 VMEM out
    center_ref,  # [blk, 1, Dp] int32 VMEM out
    valid_ref,  # [blk, 1, Dp] fp32 VMEM out
    *,
    max_detections: int,
    affinity_threshold: float,
):
    # All per-candidate state is [blk, 1, K] and per-slot state [blk, 1, Dp]
    # so every ref's LAST TWO dims equal the full array dims (Mosaic's block
    # rule: last-two divisible by (8,128) or full-size — blk can then be
    # any size the VMEM budget allows).
    blk, k, _ = boxes_ref.shape
    d8 = member_ref.shape[1]
    d_pad = center_ref.shape[2]
    boxes = boxes_ref[:]  # [blk, K, 4]

    x1 = boxes[:, :, 0:1]  # [blk, K, 1]
    y1 = boxes[:, :, 1:2]
    x2 = boxes[:, :, 2:3]
    y2 = boxes[:, :, 3:4]
    x1t = jnp.swapaxes(x1, 1, 2)  # [blk, 1, K]
    y1t = jnp.swapaxes(y1, 1, 2)
    x2t = jnp.swapaxes(x2, 1, 2)
    y2t = jnp.swapaxes(y2, 1, 2)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [blk,K,1]
    inter = jnp.maximum(jnp.minimum(x2, x2t) - jnp.maximum(x1, x1t), 0.0) * (
        jnp.maximum(jnp.minimum(y2, y2t) - jnp.maximum(y1, y1t), 0.0)
    )  # [blk, K, K]
    union = area + jnp.swapaxes(area, 1, 2) - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-9), 0.0)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1, k), 2)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, k, 1), 1)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1, d_pad), 2)
    d = max_detections

    def body(i, state):
        avail, assigned, centers, valid = state  # [blk,1,K] x2, [blk,1,Dp] x2
        m = jnp.max(avail, axis=2, keepdims=True)  # [blk, 1, 1]
        is_max = avail >= m
        c = jnp.min(
            jnp.where(is_max, lane_ids, k), axis=2, keepdims=True
        )  # [blk, 1, 1]
        has_center = m > _NEG_INF  # [blk, 1, 1]
        # IoU is symmetric: column c == row c. The sublane mask matches
        # exactly one row, so the sum IS iou[b, c, :] — bit-identical (one
        # term, no float reordering).
        sel = (sub_ids == c).astype(jnp.float32)  # [blk, K, 1]
        iou_row = jnp.sum(iou * sel, axis=1, keepdims=True)  # [blk, 1, K]
        members = (
            (iou_row >= affinity_threshold) & (avail > _NEG_INF) & has_center
        )
        assigned = jnp.where(members, i, assigned)
        centers = jnp.where(d_ids == i, c, centers)
        valid = jnp.where(d_ids == i, has_center.astype(jnp.float32), valid)
        return (
            jnp.where(members, _NEG_INF, avail),
            assigned,
            centers,
            valid,
        )

    init = (
        scores_ref[:],
        jnp.full((blk, 1, k), -1, jnp.int32),
        jnp.zeros((blk, 1, d_pad), jnp.int32),
        jnp.zeros((blk, 1, d_pad), jnp.float32),
    )
    _, assigned, centers, valid = jax.lax.fori_loop(
        0, d, body, init, unroll=False
    )
    member_ref[:] = (
        assigned
        == jax.lax.broadcasted_iota(jnp.int32, (blk, d8, k), 1)
    ).astype(jnp.float32)
    center_ref[:] = centers
    valid_ref[:] = valid


def _images_per_program(k: int, d8: int, vmem_budget: int = 13 << 20) -> int:
    """Largest power-of-two image block whose VMEM working set fits.

    Peak live set during the IoU build is THREE [blk,K,K] fp32 slabs
    (inter, union, iou) — not one; Mosaic allocates each HLO buffer on the
    scoped-vmem stack (measured: blk=8 @ K=512 asked for 22.8 MB against
    the 16 MB limit). Budget 13 MB leaves headroom for the in/out blocks
    and loop state -> blk=4 at the default K=512."""
    per_img = 3 * k * k * 4 + d8 * k * 4 + 16 * k * 4
    blk = 8
    while blk > 1 and blk * per_img > vmem_budget:
        blk //= 2
    return blk


@functools.partial(
    jax.jit, static_argnames=("affinity_threshold", "max_detections", "interpret")
)
def iou_affinity_clustering_pallas_batched(
    boxes: jnp.ndarray,  # [B, K, 4]
    scores: jnp.ndarray,  # [B, K]
    valid_mask: jnp.ndarray,  # [B, K]
    affinity_threshold: float,
    max_detections: int,
    interpret: bool = False,
) -> Clusters:
    """Batched `iou_affinity_clustering_pallas`: one program per IMG_BLK
    images (grid over ceil(B/blk)), value-identical per image."""
    bsz, k = scores.shape
    kp = _round_up(k, 128)
    d = max_detections
    dp = _round_up(d, 128)
    d8 = _round_up(d, 8)
    blk = _images_per_program(kp, d8)
    g = -(-bsz // blk)
    bp = g * blk

    boxes_p = jnp.zeros((bp, kp, 4), jnp.float32).at[:bsz, :k].set(
        boxes.astype(jnp.float32)
    )
    masked = jnp.where(valid_mask, scores.astype(jnp.float32), _NEG_INF)
    scores_p = jnp.full((bp, 1, kp), _NEG_INF, jnp.float32).at[
        :bsz, 0, :k
    ].set(masked)

    member, center, valid = pl.pallas_call(
        functools.partial(
            _cluster_kernel_batched,
            max_detections=d,
            affinity_threshold=affinity_threshold,
        ),
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((bp, d8, kp), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1, dp), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1, dp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((blk, kp, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((blk, 1, kp), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((blk, d8, kp), lambda i: (i, 0, 0)),
            pl.BlockSpec((blk, 1, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((blk, 1, dp), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(boxes_p, scores_p)

    return Clusters(
        centers=center[:bsz, 0, :d],
        membership=member[:bsz, :d, :k] > 0.5,
        valid=valid[:bsz, 0, :d] > 0.5,
    )


@functools.lru_cache(maxsize=None)
def _auto_fn(affinity_threshold: float, max_detections: int, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(boxes, scores, valid_mask):
        return iou_affinity_clustering_pallas(
            boxes, scores, valid_mask, affinity_threshold, max_detections,
            interpret=interpret,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, boxes, scores, valid_mask):
        bb, sb, vb = in_batched
        if not bb:
            boxes = jnp.broadcast_to(boxes, (axis_size, *boxes.shape))
        if not sb:
            scores = jnp.broadcast_to(scores, (axis_size, *scores.shape))
        if not vb:
            valid_mask = jnp.broadcast_to(
                valid_mask, (axis_size, *valid_mask.shape)
            )
        # Nested vmaps stack extra leading axes; images are independent, so
        # flatten them into one batch for the blocked kernel and restore.
        lead = boxes.shape[:-2]
        k = scores.shape[-1]
        out = iou_affinity_clustering_pallas_batched(
            boxes.reshape(-1, k, 4),
            scores.reshape(-1, k),
            valid_mask.reshape(-1, k),
            affinity_threshold, max_detections, interpret=interpret,
        )
        d = max_detections
        out = Clusters(
            centers=out.centers.reshape(*lead, d),
            membership=out.membership.reshape(*lead, d, k),
            valid=out.valid.reshape(*lead, d),
        )
        return out, Clusters(centers=True, membership=True, valid=True)

    return f


def iou_affinity_clustering_pallas_auto(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    affinity_threshold: float,
    max_detections: int,
    interpret: bool = False,
) -> Clusters:
    """cluster_fn drop-in that routes jax.vmap to the batch-blocked kernel.

    Called unbatched it is exactly `iou_affinity_clustering_pallas`; under
    jax.vmap the custom batching rule dispatches ONE blocked pallas_call for
    the whole image batch (IMG_BLK greedy loops advance together per
    program) instead of a grid of B serial single-image programs."""
    return _auto_fn(affinity_threshold, max_detections, interpret)(
        boxes, scores, valid_mask
    )
