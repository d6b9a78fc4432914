"""Fused MC-dropout + 3x3 prediction conv as one Pallas TPU kernel.

The per-sample cost of MC inference with `dropout_layers="last"` is:
  mask = bernoulli(rng, [B,H,W,256])        (materialized in HBM)
  y_n  = conv3x3(x * mask / keep, W)        (re-reads the masked copy)
per sample n — measured ~4.1 ms / 16-image batch / sample on v5e, dominated
by HBM traffic for the masked activations and lane-underfilled final convs.

This kernel runs the whole thing on-chip, one program per (image, sample):
  * the shared trunk activation block (padded, bf16) is DMA'd to VMEM once,
  * the dropout mask is generated IN REGISTERS from the TPU hardware PRNG
    (pltpu.prng_*) — nothing ever hits HBM,
  * the 3x3 conv is computed as 9 shifted [H*W, Cin] @ [Cin, Cout] MXU
    matmuls accumulated in fp32,
  * only the [H, W, Cout] result is written back.

Cout for RetinaNet finals is 36/72 (<128 lanes); cls+reg are still separate
kernels because their inputs differ, but the padding waste now rides VMEM,
not HBM. Semantics: same Bernoulli(keep)/keep scaling as flax Dropout; the
RNG stream differs (hardware PRNG vs threefry), which changes *which* masks
are drawn, not their distribution — MC estimates are statistically
equivalent, and tests assert exact conv parity at rate=0 plus mask-rate /
moment statistics at rate>0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _compute_block(
    slab,  # [RB+2, W+2, Cin] padded input rows (bf16)
    seed_ref,
    w_ref,
    b_ref,
    wscale_ref,
    *,
    b_idx,
    n_idx,
    n_total,
    row0,
    rb: int,
    w: int,
    cin: int,
    cp: int,
    keep_prob: float,
    threshold: int,
    quantized: bool,
):
    """Mask + (optional int8 quantize) + 9 shifted MXU matmuls.

    Returns the fp32 [RB*W, Cp] pre-activation block (callers write it back
    or feed the softmax-mean epilogue). Shared by the resident-input and
    DMA-slab kernels (their grids order the axes differently, so the caller
    passes b/n/row indices explicitly); the dropout mask is addressed by
    ABSOLUTE element index, so both produce bit-identical outputs for the
    same (seed, image, sample, row block)."""

    # DMA mode pads the slab's width axis to a DMA-tileable multiple of 8;
    # the extra zero columns are outside every conv window and the mask
    # keeps the logical (w+2)-stride addressing, so outputs stay
    # bit-identical to the resident path.
    wp = slab.shape[1]

    def keep_mask(row0, hb):
        """Stateless counter-based dropout mask for padded rows
        [row0, row0+hb): a splitmix32-style integer mixer over (seed, image,
        sample, absolute element index). Pure VPU integer ops — identical in
        interpret mode and on hardware, reproducible across backends, never
        touches HBM — and because it is addressed by absolute index, the
        overlapping halo rows of adjacent row blocks mask identically."""
        stream = (
            seed_ref[0, 0] * jnp.int32(1000003)
            + (b_idx * n_total + n_idx) * jnp.int32(-1640531527)  # 0x9E3779B9
        ).astype(jnp.uint32)
        idx = (
            (
                jax.lax.broadcasted_iota(jnp.int32, (hb, wp, cin), 0)
                + jnp.int32(row0)
            )
            * jnp.int32((w + 2) * cin)
            + jax.lax.broadcasted_iota(jnp.int32, (hb, wp, cin), 1)
            * jnp.int32(cin)
            + jax.lax.broadcasted_iota(jnp.int32, (hb, wp, cin), 2)
        ).astype(jnp.uint32)
        z = idx + stream
        z = z ^ (z >> jnp.uint32(16))
        z = z * jnp.uint32(0x85EBCA6B)
        z = z ^ (z >> jnp.uint32(13))
        z = z * jnp.uint32(0xC2B2AE35)
        z = z ^ (z >> jnp.uint32(16))
        return (z >> jnp.uint32(1)) < jnp.uint32(threshold)

    if quantized:
        # Dynamic per-slab activation scale; the mask multiplies int8 values
        # by 0/1 and the Bernoulli 1/keep correction folds into the dequant
        # scale, so quantization cost is one pass per slab.
        sf = slab.astype(jnp.float32)
        x_scale = jnp.maximum(jnp.max(jnp.abs(sf)), 1e-6) / 127.0
        slab = jnp.clip(
            jnp.round(sf * (1.0 / x_scale)), -127.0, 127.0
        ).astype(jnp.int8)
        acc_dtype = jnp.int32
    else:
        acc_dtype = jnp.float32

    if keep_prob < 1.0:
        keep = keep_mask(row0, rb + 2)
        if quantized:
            slab = jnp.where(keep, slab, jnp.int8(0))
        else:
            slab = jnp.where(keep, slab * (1.0 / keep_prob), 0.0).astype(
                slab.dtype
            )

    acc = jnp.zeros((rb * w, cp), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            # out[i, j] += x[i+dy, j+dx] @ W[dy*3+dx] (SAME, pad=1)
            window = jax.lax.slice(slab, (dy, dx, 0), (dy + rb, dx + w, cin))
            acc = acc + jnp.dot(
                window.reshape(rb * w, cin),
                w_ref[dy * 3 + dx],
                preferred_element_type=acc_dtype,
            )
    if quantized:
        scale = (x_scale / keep_prob) * wscale_ref[0][None, :]
        return acc.astype(jnp.float32) * scale + b_ref[0][None, :]
    return acc + b_ref[0][None, :]


def _kernel_resident(
    seed_ref,  # [1, 3] int32 SMEM: (seed, sample base, batch base)
    x_ref,  # [1, Hp+2, W+2, Cin] bf16 VMEM (zero-padded borders)
    w_ref,  # [9, Cin, Cp] bf16 or int8 VMEM
    b_ref,  # [1, Cp] fp32 VMEM
    wscale_ref,  # [1, Cp] fp32 VMEM (int8 path; ones otherwise)
    out_ref,  # [1, 1, RB, W, Cp] bf16 VMEM (one row block)
    *,
    rb: int,
    n_total: int,
    **kw,
):
    # Row-blocked via the grid: each program computes RB output rows from the
    # (RB+2)-row padded slab. Only the slab is ever loaded from the resident
    # input block (ref indexing, not a full-map materialization), keeping the
    # working set ~2 MB — the whole-map form blew the 16 MB VMEM budget at
    # production shapes. Grid: (image, sample, row block). The sample/batch
    # bases shift the mask stream to ABSOLUTE indices so a shard computing
    # samples [base, base+k) of n_total draws bit-identical masks to the
    # unsharded launch (shard_map sample-parallel serving).
    row0 = pl.program_id(2) * rb
    slab = x_ref[0, pl.ds(row0, rb + 2)]  # [RB+2, W+2, Cin]
    accf = _compute_block(
        slab, seed_ref, w_ref, b_ref, wscale_ref,
        b_idx=pl.program_id(0) + seed_ref[0, 2],
        n_idx=pl.program_id(1) + seed_ref[0, 1],
        n_total=n_total, row0=row0, rb=rb, **kw,
    )
    out_ref[0, 0] = accf.reshape(
        rb, kw["w"], kw["cp"]
    ).astype(out_ref.dtype)


def _kernel_dma(
    seed_ref,  # [1, 3] int32 SMEM: (seed, sample base, batch base)
    x_ref,  # [B, Hp+2, W+2, Cin] bf16 in HBM (memory_space=ANY)
    w_ref,  # [9, Cin, Cp] VMEM
    b_ref,  # [1, Cp] VMEM
    wscale_ref,  # [1, Cp] VMEM
    out_ref,  # [1, 1, RB, W, Cp] VMEM
    slab_ref,  # [2, RB+2, W+2, Cin] VMEM scratch (double buffer)
    sem,  # DMA semaphores (2,)
    *,
    rb: int,
    n_total: int,
    **kw,
):
    """Large-image variant: the padded input never becomes VMEM-resident.

    Grid (image, row block, SAMPLE) — samples innermost, because the slab
    does not depend on the sample: it is DMA'd HBM->VMEM once per (image,
    row block) and reused for all N masked convs, so HBM input traffic is
    1x the feature map (like the resident path), not Nx. Double-buffered
    across blocks: the n==0 program of each block prefetches the NEXT
    block's slab into the other slot, giving it N compute steps to land.
    Only the n==0 program waits on the semaphore — grid steps run
    sequentially on the core, so later samples see the slab ready. Lifts
    the whole-image VMEM bound that kept BDD-scale P3 levels (90x160x256
    and up) on the vmapped-XLA fallback."""
    b_idx = pl.program_id(0) + seed_ref[0, 2]
    n_idx = pl.program_id(2) + seed_ref[0, 1]
    slab = _acquire_slab_dma(x_ref, slab_ref, sem, rb)
    accf = _compute_block(
        slab, seed_ref, w_ref, b_ref, wscale_ref,
        b_idx=b_idx, n_idx=n_idx, n_total=n_total,
        row0=pl.program_id(1) * rb, rb=rb, **kw,
    )
    out_ref[0, 0] = accf.reshape(
        rb, kw["w"], kw["cp"]
    ).astype(out_ref.dtype)


def _acquire_slab_dma(x_ref, slab_ref, sem, rb: int):
    """Double-buffered slab fetch for grid (image, row block, sample) — see
    _kernel_dma. Returns the current program's [RB+2, Wp, Cin] slab."""
    b_idx = pl.program_id(0)
    r_idx = pl.program_id(1)
    n_idx = pl.program_id(2)
    nb = pl.num_programs(0)
    nr = pl.num_programs(1)
    block = b_idx * nr + r_idx  # (image, row-block) serial index
    slot = jax.lax.rem(block, 2)

    def slab_dma(slot_i, bb, rr):
        return pltpu.make_async_copy(
            x_ref.at[bb, pl.ds(rr * rb, rb + 2)],
            slab_ref.at[slot_i],
            sem.at[slot_i],
        )

    @pl.when((block == 0) & (n_idx == 0))
    def _():
        slab_dma(0, b_idx, r_idx).start()

    r_next = jnp.where(r_idx + 1 < nr, r_idx + 1, 0)
    b_next = jnp.clip(b_idx + (r_idx + 1 == nr), 0, nb - 1)

    @pl.when((n_idx == 0) & (block + 1 < nb * nr))
    def _():
        slab_dma(1 - slot, b_next, r_next).start()

    @pl.when(n_idx == 0)
    def _():
        slab_dma(slot, b_idx, r_idx).wait()

    return slab_ref[slot]


def _kernel_probs(
    seed_ref,  # [1, 3] int32 SMEM: (seed, sample base, batch base)
    x_ref,  # resident: [1, Hp+2, W+2, Cin] VMEM block; dma: [B, ...] HBM
    w_ref,  # [9, Cin, Cp] VMEM
    b_ref,  # [1, Cp] VMEM
    wscale_ref,  # [1, Cp] VMEM
    g_ref,  # [Cp, Cp] fp32 VMEM: block-diagonal group-sum matrix
    out_ref,  # [1, RB, W, Cp] fp32 VMEM — REVISITED across the n axis
    *scratch,  # dma mode: (slab_ref, sem)
    rb: int,
    dma: bool,
    **kw,
):
    """Fused MC classification head: dropout + final conv + mean softmax.

    Grid (image, row block, sample) with the OUTPUT block indexed by (image,
    row block) only — consecutive sample steps accumulate mean softmax into
    the same VMEM-resident block, so the [N, B, H, W, C] per-sample logits
    NEVER reach HBM (at N=10/batch 128 that tensor plus its re-read is
    ~5.4 GB of the graph's HBM traffic; DESIGN.md §8 — the graph is
    HBM-bound, bytes are the budget).

    Grouped softmax without minor-dim reshapes: channels are k anchors x
    (C+1) classes packed in the lane dim; exp(logits - groupmax) is summed
    per group by ONE [Cp, Cp] matmul with a block-diagonal 0/1 matrix.
    The max is PER GROUP (a static loop of masked maxes over the k groups),
    not per row: a shared row max cancels mathematically but underflows a
    group sitting ~88+ logits below the row's hottest anchor, emitting an
    all-zero "categorical" for that group. With the per-group max the
    group's own max lane is exp(0)=1, so every valid group's denom >= 1.
    Padded lanes carry garbage and are masked to zero; the host slices them
    off."""
    cout = kw.pop("cout")
    group_size = kw.pop("group_size")
    # Absolute sample/image indices: the seed scalars carry shard offsets
    # (zero for an unsharded launch) so a shard_map shard draws exactly the
    # masks the unsharded kernel would (see dropout_final_conv).
    b_idx = pl.program_id(0) + seed_ref[0, 2]
    n_idx = pl.program_id(2) + seed_ref[0, 1]
    nn = pl.num_programs(2)
    row0 = pl.program_id(1) * rb
    if dma:
        slab_ref, sem = scratch
        slab = _acquire_slab_dma(x_ref, slab_ref, sem, rb)
    else:
        slab = x_ref[0, pl.ds(row0, rb + 2)]
    accf = _compute_block(
        slab, seed_ref, w_ref, b_ref, wscale_ref,
        b_idx=b_idx, n_idx=n_idx, n_total=nn, row0=row0, rb=rb, **kw,
    )  # [RB*W, Cp] fp32 logits (padded lanes: bias-only garbage)
    cp = kw["cp"]
    w = kw["w"]
    lane = jax.lax.broadcasted_iota(jnp.int32, accf.shape, 1)
    valid = lane < jnp.int32(cout)
    x = jnp.where(valid, accf, -jnp.inf)
    # Per-group max via log-step segmented suffix/prefix scans built from
    # LANE ROLLS — purely lane-local VPU work. (A loop of k masked
    # jnp.max(axis=1) reductions measured a 10% whole-graph regression at
    # the flagship shape: each cross-lane tree reduction is ~an order of
    # magnitude pricier than a roll+select.) Groups are contiguous
    # `group_size`-lane blocks; after ceil(log2(gs)) doubling steps
    # suffix[j] = max(x[j..block_end]) and prefix[j] = max(x[start..j]), so
    # their max is the block max at every lane. Exact grouped softmax even
    # for groups far below the row max (exp(0)=1 at each group's max lane).
    pos = jax.lax.rem(lane, jnp.int32(group_size))
    suffix, prefix = x, x
    offset = 1
    while offset < group_size:
        fwd = pltpu.roll(suffix, (cp - offset) % cp, 1)  # lane j+offset
        suffix = jnp.where(
            pos + offset < group_size, jnp.maximum(suffix, fwd), suffix
        )
        bwd = pltpu.roll(prefix, offset, 1)  # lane j-offset
        prefix = jnp.where(pos >= offset, jnp.maximum(prefix, bwd), prefix)
        offset *= 2
    m = jnp.maximum(suffix, prefix)
    e = jnp.where(valid, jnp.exp(x - m), 0.0)
    denom = jnp.dot(e, g_ref[...], preferred_element_type=jnp.float32)
    probs = jnp.where(denom > 0.0, e / denom, 0.0)
    contrib = (probs * (1.0 / nn)).reshape(rb, w, cp)

    @pl.when(n_idx == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(n_idx > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


# Per-anchor regression sufficient statistics (see dropout_final_reg_stats):
# order matters — bayes/moments.moments_from_stats indexes by position.
REG_STATS = 18
# 0:tx 1:ty 2:ew 3:eh | 4:tx2 5:ty2 6:ew2 7:eh2 | 8:txty 9:txew 10:txeh
# 11:tyew 12:tyeh 13:eweh | 14:v1 15:v2 16:v3ew2 17:v4eh2
# where ew=exp(tw/sw), eh=exp(th/sh), vj=exp(clip(lv_j)).


def _reg_stat_matrices(k: int, cp_in: int, cp_out: int, one_lane: int):
    """Constant [Cp_in, Cp_out] selectors for the stats epilogue:
    contrib = (X @ P1) * (X @ P2) * exp(Xc @ E). Input lanes a*8+j
    (j<4 deltas, j>=4 log-vars); output lanes a*REG_STATS+s. The kernel
    pre-divides the tw/th lanes by their scale factors, so every matrix
    entry is in {0, 1, 2} — EXACT in bf16, letting the three epilogue
    matmuls run on the MXU's fast bf16 path (fp32 selector matmuls
    measured away the whole win)."""
    p1 = np.zeros((cp_in, cp_out), np.float32)
    p2 = np.zeros((cp_in, cp_out), np.float32)
    e = np.zeros((cp_in, cp_out), np.float32)
    for a in range(k):
        tx, ty, tw, th = (a * 8 + j for j in range(4))
        lv = [a * 8 + 4 + j for j in range(4)]
        o = a * REG_STATS

        def put(s, f1=None, f2=None, exps=()):
            p1[f1 if f1 is not None else one_lane, o + s] = 1.0
            p2[f2 if f2 is not None else one_lane, o + s] = 1.0
            for lane, coef in exps:
                e[lane, o + s] = coef

        put(0, f1=tx)
        put(1, f1=ty)
        put(2, exps=[(tw, 1.0)])
        put(3, exps=[(th, 1.0)])
        put(4, f1=tx, f2=tx)
        put(5, f1=ty, f2=ty)
        put(6, exps=[(tw, 2.0)])
        put(7, exps=[(th, 2.0)])
        put(8, f1=tx, f2=ty)
        put(9, f1=tx, exps=[(tw, 1.0)])
        put(10, f1=tx, exps=[(th, 1.0)])
        put(11, f1=ty, exps=[(tw, 1.0)])
        put(12, f1=ty, exps=[(th, 1.0)])
        put(13, exps=[(tw, 1.0), (th, 1.0)])
        put(14, exps=[(lv[0], 1.0)])
        put(15, exps=[(lv[1], 1.0)])
        put(16, exps=[(lv[2], 1.0), (tw, 2.0)])
        put(17, exps=[(lv[3], 1.0), (th, 2.0)])
    return p1, p2, e


def _kernel_reg_stats(
    seed_ref,
    x_ref,
    w_ref,
    b_ref,
    wscale_ref,
    p1_ref,  # [Cp_in, Cp_out] fp32 VMEM
    p2_ref,
    e_ref,
    out_ref,  # [1, RB, W, Cp_out] fp32 VMEM — REVISITED across the n axis
    *scratch,
    rb: int,
    dma: bool,
    **kw,
):
    """Fused MC regression head: dropout + final conv + per-anchor moment
    accumulation. Like _kernel_probs, the grid is (image, row block,
    sample) with the output block revisited across n — the per-sample
    [N, B, cells, 8k] regression maps NEVER reach HBM; only the REG_STATS
    sufficient statistics do, once, in fp32. The decoded-corner moments
    (bayes/moments.moments_from_stats) are EXACTLY mc_box_moments on the
    same samples: corners are affine in (tx, ty, exp(tw/sw), exp(th/sh))
    per anchor, so sample moments commute with the decode."""
    cout = kw.pop("cout")
    lv_clip = kw.pop("lv_clip")
    tw_clip = kw.pop("tw_clip")
    th_clip = kw.pop("th_clip")
    inv_sw = kw.pop("inv_sw")
    inv_sh = kw.pop("inv_sh")
    # Shard offsets from the seed scalars (see _kernel_probs).
    b_idx = pl.program_id(0) + seed_ref[0, 2]
    n_idx = pl.program_id(2) + seed_ref[0, 1]
    nn = pl.num_programs(2)
    row0 = pl.program_id(1) * rb
    if dma:
        slab_ref, sem = scratch
        slab = _acquire_slab_dma(x_ref, slab_ref, sem, rb)
    else:
        slab = x_ref[0, pl.ds(row0, rb + 2)]
    accf = _compute_block(
        slab, seed_ref, w_ref, b_ref, wscale_ref,
        b_idx=b_idx, n_idx=n_idx, n_total=nn, row0=row0, rb=rb, **kw,
    )  # [RB*W, Cp_in] fp32 head outputs (padded lanes: bias garbage)
    cp = kw["cp"]
    w = kw["w"]
    lane = jax.lax.broadcasted_iota(jnp.int32, accf.shape, 1)
    valid = lane < jnp.int32(cout)
    # Lane `cout` is forced to exactly 1 — the constant factor for stats
    # with fewer than two polynomial terms (see _reg_stat_matrices).
    x = jnp.where(valid, accf, 0.0)
    x = jnp.where(lane == jnp.int32(cout), 1.0, x)
    j8 = jax.lax.rem(lane, 8)
    # Per-lane pre-transforms matching ops/boxes decode EXACTLY:
    # log-variances clip to +-log_var_clip; tw/th upper-clamp at
    # scale*BBOX_XFORM_CLIP then divide by the scale (min(tw, s*C)/s =
    # min(tw/s, C); the clamps distribute over the exponent's linear
    # combination because each term is transformed before the matmul).
    xc = jnp.where(valid & (j8 >= 4), jnp.clip(x, -lv_clip, lv_clip), x)
    xc = jnp.where(
        valid & (j8 == 2), jnp.minimum(xc, tw_clip) * inv_sw, xc
    )
    xc = jnp.where(
        valid & (j8 == 3), jnp.minimum(xc, th_clip) * inv_sh, xc
    )
    # bf16 selector matmuls: P/E entries are {0,1,2} (bf16-exact) and the
    # bf16 rounding of x matches the dense kernel's bf16 outputs.
    xb = x.astype(jnp.bfloat16)
    xcb = xc.astype(jnp.bfloat16)
    f1 = jnp.dot(xb, p1_ref[...], preferred_element_type=jnp.float32)
    f2 = jnp.dot(xb, p2_ref[...], preferred_element_type=jnp.float32)
    ec = jnp.dot(xcb, e_ref[...], preferred_element_type=jnp.float32)
    # exp guard: legitimate exponents are <= lv_clip + O(|deltas|); 40 only
    # truncates absurd boxes (decoded w ~ anchor * e^20+) the image clip
    # discards anyway.
    contrib = f1 * f2 * jnp.exp(jnp.clip(ec, -40.0, 40.0))
    cp_out = out_ref.shape[-1]
    contrib = (contrib * (1.0 / nn)).reshape(rb, w, cp_out)

    @pl.when(n_idx == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(n_idx > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def vmem_resident_bytes(h: int, w: int, cin: int) -> int:
    """VMEM footprint of the resident-input mode for an [h, w, cin] level:
    double-buffered whole-image bf16 block + slab/mask/acc staging."""
    return (h + 2) * (w + 2) * cin * 2 * 2 + 3 * 1024 * 1024


VMEM_BUDGET = 12 * 1024 * 1024


def _prep(x, kernel, bias, seed, keep_prob, dtype, input_mode, row_block,
          interpret, sample_base=0, batch_base=0):
    """Shared trace-time setup for the fused-final kernels: mode/shape
    resolution, padded input, packed (and optionally int8-quantized)
    weights, seed scalars, kernel kwargs.

    sample_base/batch_base (traced int32 scalars) shift the dropout-mask
    stream to absolute sample/image indices — a shard_map shard computing a
    slice of the samples or images passes its offsets and draws exactly the
    masks the unsharded launch would (see dropout_final_conv)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dtype not in ("bf16", "int8"):
        raise ValueError(f"unknown fused-final dtype '{dtype}'")
    quantized = dtype == "int8"
    b, h, w, cin = x.shape
    if input_mode == "auto":
        input_mode = (
            "resident"
            if vmem_resident_bytes(h, w, cin) <= VMEM_BUDGET
            else "dma"
        )
    if input_mode not in ("resident", "dma"):
        raise ValueError(f"unknown fused-final input_mode '{input_mode}'")
    cout = kernel.shape[-1]
    cp = _round_up(cout, 128)
    # Output rows per program: rb*W rows of the 9 accumulated MXU matmuls.
    # 16 measured best on v5e across KITTI/BDD level shapes (8 = launch
    # overhead dominates, 32+ = no further MXU utilization gain, more VMEM);
    # row_block overrides for tuning.
    rb = row_block or min(16, _round_up(h, 8))
    hp = _round_up(h, rb)

    # DMA mode: Mosaic memref slices must be tile-aligned in the second-minor
    # dim, so the slab's width axis is padded up to a multiple of 16; the
    # extra zero columns sit beyond every conv window (see _compute_block).
    wpad = _round_up(w + 2, 16) if input_mode == "dma" else w + 2
    x_pad = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 1 + (hp - h)), (1, 1 + (wpad - (w + 2))), (0, 0)),
    )
    kernel9 = kernel.reshape(9, cin, cout).astype(jnp.float32)
    if quantized:
        w_absmax = jnp.maximum(jnp.max(jnp.abs(kernel9), axis=(0, 1)), 1e-8)
        w_scale = w_absmax / 127.0  # [Cout]
        wq = jnp.clip(
            jnp.round(kernel9 / w_scale[None, None, :]), -127, 127
        ).astype(jnp.int8)
        w9 = jnp.zeros((9, cin, cp), jnp.int8).at[:, :, :cout].set(wq)
        wscale_pad = jnp.zeros((1, cp), jnp.float32).at[0, :cout].set(w_scale)
    else:
        w9 = jnp.zeros((9, cin, cp), jnp.bfloat16).at[:, :, :cout].set(
            kernel9.astype(jnp.bfloat16)
        )
        wscale_pad = jnp.ones((1, cp), jnp.float32)
    b_pad = jnp.zeros((1, cp), jnp.float32).at[0, :cout].set(
        bias.astype(jnp.float32)
    )
    seed_arr = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32).reshape(()),
            jnp.asarray(sample_base, jnp.int32).reshape(()),
            jnp.asarray(batch_base, jnp.int32).reshape(()),
        ]
    ).reshape(1, 3)
    # P[keep] = threshold / 2^31
    threshold = min(int(keep_prob * 2147483648.0), 2147483647)
    kernel_kw = dict(
        rb=rb, w=w, cin=cin, cp=cp,
        keep_prob=float(keep_prob),
        threshold=threshold,
        quantized=quantized,
    )
    return (input_mode, interpret, b, h, w, cin, cout, cp, rb, hp, wpad,
            x_pad, w9, b_pad, wscale_pad, seed_arr, kernel_kw)


def _weight_specs(cin, cp):
    return [
        pl.BlockSpec(
            (9, cin, cp), lambda bi, si, ti, sref: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, cp), lambda bi, si, ti, sref: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, cp), lambda bi, si, ti, sref: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "keep_prob", "interpret", "dtype", "input_mode",
        "row_block", "total_samples",
    ),
)
def dropout_final_conv(
    x: jnp.ndarray,  # [B, H, W, Cin] shared trunk activations
    kernel: jnp.ndarray,  # [3, 3, Cin, Cout] conv weights (HWIO)
    bias: jnp.ndarray,  # [Cout]
    seed: jnp.ndarray,  # scalar int32
    num_samples: int,
    keep_prob: float,
    interpret: Optional[bool] = None,
    dtype: str = "bf16",
    input_mode: str = "auto",
    row_block: Optional[int] = None,
    sample_base: jnp.ndarray | int = 0,
    batch_base: jnp.ndarray | int = 0,
    total_samples: Optional[int] = None,
) -> jnp.ndarray:
    """[B,H,W,Cin] -> [N,B,H,W,Cout]: N dropout samples x 3x3 SAME conv.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (identical results — the mask is a stateless integer hash).
    dtype: "bf16" (exact) or "int8" — dynamic per-block activation scale +
    per-output-channel weight scale; the MXU's int8 path doubles throughput
    on the lane-padded final matmuls at <1% relative logit error.
    input_mode: "resident" = whole padded image as a pipelined VMEM block;
    "dma" = image stays in HBM, per-row-block slabs manually DMA'd (no
    whole-image VMEM bound — BDD-scale P3 and larger); "auto" picks
    resident when it fits the VMEM budget. Both produce BIT-IDENTICAL
    outputs (same absolute-index dropout mask).

    Sharded launches (shard_map sample/data-parallel serving,
    models.retinanet.mc_forward_fused_sp): `sample_base`/`batch_base`
    (traced scalars) shift the mask stream to absolute indices and
    `total_samples` pins the global sample count the stream is keyed on, so
    a shard computing samples [base, base+num_samples) of total_samples —
    or images [batch_base, batch_base+B) of the global batch — returns
    exactly the corresponding slice of the unsharded launch's output.
    """
    (input_mode, interpret, b, h, w, cin, cout, cp, rb, hp, wpad,
     x_pad, w9, b_pad, wscale_pad, seed_arr, kernel_kw) = _prep(
        x, kernel, bias, seed, keep_prob, dtype, input_mode, row_block,
        interpret, sample_base=sample_base, batch_base=batch_base,
    )
    kernel_kw = dict(kernel_kw, n_total=total_samples or num_samples)
    weight_specs = _weight_specs(cin, cp)
    if input_mode == "resident":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, num_samples, hp // rb),
            in_specs=[
                pl.BlockSpec(
                    (1, hp + 2, w + 2, cin),
                    lambda bi, ni, ri, sref: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rb, w, cp),
                lambda bi, ni, ri, sref: (ni, bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kernel_fn = _kernel_resident
    else:  # dma: grid (image, row block, sample) — see _kernel_dma
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hp // rb, num_samples),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rb, w, cp),
                lambda bi, ri, ni, sref: (ni, bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rb + 2, wpad, cin), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel_fn = _kernel_dma
    out = pl.pallas_call(
        functools.partial(kernel_fn, **kernel_kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_samples, b, hp, w, cp), jnp.bfloat16
        ),
        interpret=interpret,
    )(seed_arr, x_pad, w9, b_pad, wscale_pad)
    return out[:, :, :h, :, :cout]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "keep_prob", "group_size", "interpret", "dtype",
        "input_mode", "row_block",
    ),
)
def dropout_final_probs(
    x: jnp.ndarray,  # [B, H, W, Cin] shared cls-trunk activations
    kernel: jnp.ndarray,  # [3, 3, Cin, K*(C+1)] final cls conv (HWIO)
    bias: jnp.ndarray,  # [K*(C+1)]
    seed: jnp.ndarray,  # scalar int32
    num_samples: int,
    keep_prob: float,
    group_size: int,  # C+1 classes per anchor group
    interpret: Optional[bool] = None,
    dtype: str = "bf16",
    input_mode: str = "auto",
    row_block: Optional[int] = None,
    sample_base: jnp.ndarray | int = 0,
    batch_base: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """[B,H,W,Cin] -> [B,H,W,K*(C+1)] fp32 MEAN SOFTMAX over N dropout
    samples — the fused MC classification head (see _kernel_probs).

    Same dropout-mask stream as dropout_final_conv, so
    mean(softmax(dropout_final_conv(...))) is the reference oracle.
    sample_base/batch_base shift the mask stream to absolute indices for
    shard_map shards (see dropout_final_conv) — note the mean here is over
    ALL N samples locally, so only batch_base is useful for data-parallel
    shards; sample sharding of the mean needs the conv kernel + reduction.
    """
    if input_mode == "auto":
        # Tighter resident budget than the plain conv kernel: the softmax
        # epilogue adds several fp32 [RB*W, Cp] temporaries plus the fp32
        # accumulated output block (KITTI-P3 resident measured 17.1 MB —
        # over the 16 MB scoped-vmem limit).
        bh, bw, bc = x.shape[1], x.shape[2], x.shape[3]
        input_mode = (
            "resident"
            if vmem_resident_bytes(bh, bw, bc) <= 6 * 1024 * 1024
            else "dma"
        )
    (input_mode, interpret, b, h, w, cin, cout, cp, rb, hp, wpad,
     x_pad, w9, b_pad, wscale_pad, seed_arr, kernel_kw) = _prep(
        x, kernel, bias, seed, keep_prob, dtype, input_mode, row_block,
        interpret, sample_base=sample_base, batch_base=batch_base,
    )
    if cout % group_size:
        raise ValueError(f"cout {cout} not divisible by C+1={group_size}")
    kernel_kw["cout"] = cout
    kernel_kw["group_size"] = group_size
    # Block-diagonal group-sum matrix: denom = exp(logits) @ G gives every
    # channel its anchor-group's softmax normalizer in one MXU op.
    lanes = np.arange(cp)
    same_group = (lanes[:, None] // group_size == lanes[None, :] // group_size)
    valid = (lanes < cout)
    g = jnp.asarray(
        same_group & valid[:, None] & valid[None, :], jnp.float32
    )

    weight_specs = _weight_specs(cin, cp)
    g_spec = pl.BlockSpec(
        (cp, cp), lambda bi, ri, ni, sref: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, rb, w, cp),
        lambda bi, ri, ni, sref: (bi, ri, 0, 0),  # revisited across n
        memory_space=pltpu.VMEM,
    )
    if input_mode == "resident":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hp // rb, num_samples),
            in_specs=[
                pl.BlockSpec(
                    (1, hp + 2, w + 2, cin),
                    lambda bi, ri, ni, sref: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *weight_specs,
                g_spec,
            ],
            out_specs=out_spec,
        )
        scratch = []
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hp // rb, num_samples),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                *weight_specs,
                g_spec,
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, rb + 2, wpad, cin), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        scratch = None  # carried via scratch_shapes
    out = pl.pallas_call(
        functools.partial(
            _kernel_probs, dma=(input_mode == "dma"), **kernel_kw
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cp), jnp.float32),
        interpret=interpret,
    )(seed_arr, x_pad, w9, b_pad, wscale_pad, g)
    return out[:, :h, :, :cout]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "keep_prob", "anchors_per_cell", "scale_factors",
        "log_var_clip", "interpret", "dtype", "input_mode", "row_block",
    ),
)
def dropout_final_reg_stats(
    x: jnp.ndarray,  # [B, H, W, Cin] shared reg-trunk activations
    kernel: jnp.ndarray,  # [3, 3, Cin, K*8] final reg conv (HWIO)
    bias: jnp.ndarray,  # [K*8]
    seed: jnp.ndarray,  # scalar int32
    num_samples: int,
    keep_prob: float,
    anchors_per_cell: int,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    interpret: Optional[bool] = None,
    dtype: str = "bf16",
    input_mode: str = "auto",
    row_block: Optional[int] = None,
    sample_base: jnp.ndarray | int = 0,
    batch_base: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """[B,H,W,Cin] -> [B,H,W,K*REG_STATS] fp32 per-anchor regression
    sufficient statistics averaged over N dropout samples (_kernel_reg_stats;
    consumed by bayes.moments.moments_from_stats).

    Same dropout-mask stream as dropout_final_conv with the same seed, so
    mc_box_moments over dropout_final_conv's samples is the exact oracle.
    sample_base/batch_base: see dropout_final_probs.
    """
    if input_mode == "auto":
        bh, bw, bc = x.shape[1], x.shape[2], x.shape[3]
        # Tighter than the conv kernel: the epilogue holds several fp32
        # [RB*W, 256] temporaries (cf. dropout_final_probs).
        input_mode = (
            "resident"
            if vmem_resident_bytes(bh, bw, bc) <= 6 * 1024 * 1024
            else "dma"
        )
    if row_block is None and x.shape[1] >= 8:
        row_block = 8  # halve the fp32 epilogue temporaries
    (input_mode, interpret, b, h, w, cin, cout, cp, rb, hp, wpad,
     x_pad, w9, b_pad, wscale_pad, seed_arr, kernel_kw) = _prep(
        x, kernel, bias, seed, keep_prob, dtype, input_mode, row_block,
        interpret, sample_base=sample_base, batch_base=batch_base,
    )
    k = anchors_per_cell
    if cout != k * 8:
        raise ValueError(f"reg cout {cout} != anchors_per_cell*8 = {k * 8}")
    if cout >= cp:
        raise ValueError("stats kernel needs a free lane for the constant 1")
    s_out = k * REG_STATS
    cp_out = _round_up(s_out, 128)
    p1, p2, e = _reg_stat_matrices(k, cp, cp_out, cout)
    kernel_kw["cout"] = cout
    kernel_kw["lv_clip"] = float(log_var_clip)
    from bayesod_tpu.ops.boxes import BBOX_XFORM_CLIP

    sx, sy, sw, sh = (float(s) for s in scale_factors)
    kernel_kw["tw_clip"] = sw * float(BBOX_XFORM_CLIP)
    kernel_kw["th_clip"] = sh * float(BBOX_XFORM_CLIP)
    kernel_kw["inv_sw"] = 1.0 / sw
    kernel_kw["inv_sh"] = 1.0 / sh

    weight_specs = _weight_specs(cin, cp)
    mat_spec = lambda: pl.BlockSpec(
        (cp, cp_out), lambda bi, ri, ni, sref: (0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, rb, w, cp_out),
        lambda bi, ri, ni, sref: (bi, ri, 0, 0),  # revisited across n
        memory_space=pltpu.VMEM,
    )
    common = dict(
        num_scalar_prefetch=1,
        grid=(b, hp // rb, num_samples),
        out_specs=out_spec,
    )
    if input_mode == "resident":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            in_specs=[
                pl.BlockSpec(
                    (1, hp + 2, w + 2, cin),
                    lambda bi, ri, ni, sref: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *weight_specs,
                mat_spec(), mat_spec(), mat_spec(),
            ],
            **common,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                *weight_specs,
                mat_spec(), mat_spec(), mat_spec(),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, rb + 2, wpad, cin), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel_reg_stats, dma=(input_mode == "dma"), **kernel_kw
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cp_out), jnp.float32),
        interpret=interpret,
    )(
        seed_arr, x_pad, w9, b_pad, wscale_pad,
        jnp.asarray(p1, jnp.bfloat16), jnp.asarray(p2, jnp.bfloat16),
        jnp.asarray(e, jnp.bfloat16),
    )
    return out[:, :h, :, :s_out]
