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
