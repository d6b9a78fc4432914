"""Fully-fused candidates-only regression finals: one Pallas kernel from
trunk row table to per-candidate moment statistics.

Composition of three validated pieces (each previously measured/tested
separately) into a single per-image kernel so NOTHING intermediate touches
HBM:

  1. window gather as chunked one-hot MXU matmuls (ops/pallas/gather.py)
     with the table STREAMED chunk-by-chunk via double-buffered DMA — no
     whole-table VMEM residency, so BDD-scale pyramids fit;
  2. per-sample dropout masks from the same stateless splitmix hash as
     ops/candidate_reg.py (absolute row*C+channel addressing -> overlapping
     candidate windows mask consistently; bit-compatible with the XLA
     composition, which stays as the CPU/interpret fallback and oracle);
  3. the 9-tap final conv per candidate (window rows are ordered TAP-MAJOR
     by the host so each tap is a static [K, C] slice), the candidate's own
     anchor slice selected by a mask + constant segment-sum matmul, and the
     REG_STATS moment statistics (fused_final._reg_stat_matrices with k=1)
     accumulated over samples in registers.

Output: [B, K, REG_STATS] fp32 — bayes.moments.moments_from_stats turns it
into exactly mc_box_moments' decoded mean/covariance.

HBM traffic per image: one table read (~5 MB) + a [K, 128] write, versus
the XLA composition's ~10x masked-window round trips; per-sample work is
all VMEM/MXU-resident.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesod_tpu.ops.pallas.fused_final import REG_STATS, _reg_stat_matrices


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    seed_ref,  # [1, 2] int32 SMEM (scalar prefetch): (seed, batch base)
    rows_ref,  # [1, 1, K9] int32 — tap-major window row ids (-1 = off-map)
    aidx_ref,  # [1, 1, Kp] int32 — anchor-in-cell per candidate
    flat_ref,  # dma: [B, Rp, C] HBM (ANY); resident: [1, Rp, C] VMEM block
    w_ref,  # [9, C, CPH] bf16 — final conv taps (lane-padded)
    b_ref,  # [1, CPH] fp32
    s_ref,  # [CPH, CPH] bf16 — segment-sum selector (lane l -> lane l%8)
    p1_ref,  # [CPH, CPH] bf16 — stats selectors (_reg_stat_matrices, k=1)
    p2_ref,
    e_ref,
    out_ref,  # [1, Kp, CPH] fp32
    *scratch,  # dma: (chunk_ref [2, CHUNK, C], win_ref [K9, C], sem (2,));
    #            resident: (win_ref,) — the table block is pipeline-managed
    resident: bool,
    gated: bool,
    kp: int,
    rp: int,
    c: int,
    chunk: int,
    cout: int,
    num_samples: int,
    keep_prob: float,
    threshold: int,
    lv_clip: float,
    tw_clip: float,
    th_clip: float,
    inv_sw: float,
    inv_sh: float,
    mode: str,  # "stats" (reg moments) | "probs" (cls mean softmax)
    group: int,  # lanes per anchor group (8 for reg, C+1 for cls)
    table_scale: Optional[float],  # int8 table: dequant scale (None = bf16)
    gather_block: int,  # rows per gated gather block (divides 9*kp)
    dma_slots: int,  # outstanding table-stream copies (parallel DMA engines)
    debug_skip: Optional[str],  # perf attribution: skip "gather"|"samples"
):
    if resident:
        (win_ref,) = scratch
    else:
        chunk_ref, win_ref, sem = scratch
    b_idx = pl.program_id(0)
    # Absolute image index for the mask stream: seed_ref[0, 1] carries the
    # shard's batch offset (zero unsharded) so a data-parallel shard_map
    # shard draws exactly the unsharded launch's masks.
    b_abs = b_idx + seed_ref[0, 1]
    k9 = 9 * kp
    n_chunks = rp // chunk

    if not resident:

        def chunk_dma(slot, ci):
            return pltpu.make_async_copy(
                flat_ref.at[b_idx, pl.ds(ci * chunk, chunk)],
                chunk_ref.at[slot],
                sem.at[slot],
            )

    rows = rows_ref[0, 0, :].reshape(k9, 1)  # [K9, 1] int32
    # Lane-packed view for the chunk/block HIT predicates: a [K9, 1]
    # reduction occupies K9/8 near-empty (8, 128) vregs and pays a
    # cross-sublane reduce per chunk — on a 25-chunk stream x 128 grid
    # steps that scalar-ish loop was the kernel's occupancy-INDEPENDENT
    # floor (round-5 microbench: ~8 ms/launch with ~zero occupied
    # chunks, identical under dma/resident delivery). The same predicate
    # over a [K9/128, 128] view is 16x fewer vregs and a cheap lane
    # reduce. The one-hot builds keep the [K9, 1] broadcast form (they
    # need rows against a [*, chunk] iota) and only run at HIT chunks.
    rows_lp = rows_ref[0, 0, :].reshape(k9 // 128, 128)

    # ---- streamed one-hot gather: win[j] = flat[b, rows[j]] --------------
    # int8 table (table_scale set): the one-hot matmul runs int8 x int8 ->
    # int32 on the MXU — 2x the bf16 rate and half the DMA bytes. Row
    # selection is EXACT (one-hot times int8 values = the values; each row
    # lives in exactly one chunk, so the bf16 accumulation adds one integer
    # |v| <= 127 — exactly representable — to zeros). One dequant multiply
    # at the end replaces the per-chunk bf16 matmuls.
    # Sparse-chunk skip (round 4): candidates' 3x3 windows touch only a
    # fraction of the table's row chunks (score-ranked candidates cluster
    # on objects), and a row outside this chunk contributes an exact zero
    # to the one-hot matmul — so when NO window row lands in
    # [base, base+chunk) the chunk's matmul is skipped. Gather MACs scale
    # with occupancy instead of table size; worst case (every chunk
    # occupied) is the old cost plus n_chunks [K9] compare+reduces. The
    # hit scalar is computed INLINE per iteration and the DMA stays
    # unconditional: a precomputed hits list + conditional DMA starts blew
    # the 16 MB scoped-VMEM stack at topk 512 (every iteration's
    # temporaries live at once; measured 18.8 MB).
    # Block-gated gather (round 5): the one-hot work is issued per
    # (row BLOCK, chunk) pair, each block gated on whether its row RANGE
    # overlaps the chunk. With candidates pre-sorted by table row (the
    # caller's candidate_sort, ops/candidate_reg.py), the blocks of one
    # tap partition a sorted sequence — their ranges are DISJOINT — so the
    # total number of firing (block, chunk) pairs is ~(9 x candidate row
    # span)/chunk + n_blocks instead of n_blocks x occupied chunks: both
    # the [blk, chunk] iota+compare VPU work and the MXU MACs scale with
    # how spread the candidates actually are. Unsorted callers are merely
    # ungated (worst case = round-4 cost + cheap range reductions).
    n_blocks = k9 // gather_block
    if not resident and not gated and debug_skip != "gather":
        # Issue dma_slots copies up front and keep that many outstanding:
        # with ~2 in flight the stream measured only ~50-120 GB/s (DMA
        # engines underfed — round-5 microbench: time scales with BYTES,
        # not transfer count, and is identical at chunk 256 vs 512);
        # deeper occupancy engages engines in parallel.
        for ci in range(min(dma_slots, n_chunks)):
            chunk_dma(ci % dma_slots, ci).start()
    win_ref[...] = jnp.zeros((k9, c), jnp.bfloat16)
    for ci in range(0 if debug_skip == "gather" else n_chunks):
        if not resident and not gated:
            chunk_dma(ci % dma_slots, ci).wait()
        base = ci * chunk
        chunk_hit = jnp.any((rows_lp >= base) & (rows_lp < base + chunk))

        @pl.when(chunk_hit)
        def _(base=base, ci=ci):
            if gated:
                # Gated stream (round 5): copy ONLY occupied chunks — at
                # production occupancy (~2-8 of ~25 chunks) the table
                # stream was the kernel's byte floor (skip-samples probe:
                # 7.3 of 10.3 ms int8, dtype delta = bytes); the start is
                # issued under the SAME predicate as its wait, so the
                # semaphore discipline holds. Latency of the synchronous
                # copy is paid only per hit chunk.
                chunk_dma(0, ci).start()
                chunk_dma(0, ci).wait()
            for bj in range(n_blocks):
                blk = jax.lax.slice(
                    rows, (bj * gather_block, 0), ((bj + 1) * gather_block, 1)
                )

                def _gather(blk=blk, bj=bj, base=base, ci=ci):
                    # Resident mode: the whole per-image table is a
                    # pipeline-managed VMEM block — chunks are static
                    # slices of it (no manual DMA waits on the gather
                    # path). dma mode: the double-buffered stream scratch.
                    if resident:
                        cdata = flat_ref[0, base : base + chunk]
                    elif gated:
                        cdata = chunk_ref[0]
                    else:
                        cdata = chunk_ref[ci % dma_slots]
                    onehot_bool = blk == base + jax.lax.broadcasted_iota(
                        jnp.int32, (gather_block, chunk), 1
                    )
                    lo, hi = bj * gather_block, (bj + 1) * gather_block
                    if table_scale is None:
                        win_ref[lo:hi] = win_ref[lo:hi] + jnp.dot(
                            onehot_bool.astype(jnp.bfloat16), cdata,
                            preferred_element_type=jnp.float32,
                        ).astype(jnp.bfloat16)
                    else:
                        win_ref[lo:hi] = win_ref[lo:hi] + jax.lax.dot_general(
                            onehot_bool.astype(jnp.int8), cdata,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.bfloat16)

                if n_blocks == 1:
                    # Monolithic gather: the single block IS the chunk-hit
                    # set — the outer predicate already gates it.
                    _gather()
                else:
                    blk_lp = jax.lax.slice(
                        rows_lp,
                        (bj * gather_block // 128, 0),
                        ((bj + 1) * gather_block // 128, 128),
                    )
                    pl.when(
                        jnp.any((blk_lp >= base) & (blk_lp < base + chunk))
                    )(_gather)

        if not resident and not gated and ci + dma_slots < n_chunks:
            # Refill the slot just consumed — AFTER the gather that read
            # it; the other dma_slots-1 copies stay in flight meanwhile.
            chunk_dma(ci % dma_slots, ci + dma_slots).start()
    if table_scale is not None and debug_skip != "gather":
        win_ref[...] = (
            win_ref[...].astype(jnp.float32) * jnp.float32(table_scale)
        ).astype(jnp.bfloat16)

    # ---- per-sample finals + epilogue accumulation -----------------------
    a_idx = aidx_ref[0, 0, :].reshape(kp, 1)  # [Kp, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (kp, out_ref.shape[-1]), 1)
    sel_mask = (lane < jnp.int32(cout)) & (
        lane // group == a_idx
    )  # candidate's own anchor lanes
    # Stats-epilogue lane roles on the selected values (j = lane index).
    valid8 = lane < group
    j2 = valid8 & (lane == 2)
    j3 = valid8 & (lane == 3)
    jlv = valid8 & (lane >= 4)
    one_lane = lane == 8  # constant factor for _reg_stat_matrices(k=1)

    elem = (
        rows.astype(jnp.uint32) * jnp.uint32(c)
        + jax.lax.broadcasted_iota(jnp.uint32, (k9, c), 1)
    )
    acc_stats = jnp.zeros((kp, out_ref.shape[-1]), jnp.float32)
    for n in range(0 if debug_skip == "samples" else num_samples):
        if keep_prob < 1.0:
            stream = (
                seed_ref[0, 0] * jnp.int32(1000003)
                + jnp.int32(-1640531527)
                * (b_abs * jnp.int32(num_samples) + jnp.int32(n))
            ).astype(jnp.uint32)
            z = elem + stream
            z = z ^ (z >> jnp.uint32(16))
            z = z * jnp.uint32(0x85EBCA6B)
            z = z ^ (z >> jnp.uint32(13))
            z = z * jnp.uint32(0xC2B2AE35)
            z = z ^ (z >> jnp.uint32(16))
            keep = (z >> jnp.uint32(1)) < jnp.uint32(threshold)
            xw = jnp.where(
                keep, win_ref[...] * (1.0 / keep_prob), 0.0
            ).astype(jnp.bfloat16)
        else:
            xw = win_ref[...]
        acc72 = jnp.zeros((kp, out_ref.shape[-1]), jnp.float32)
        for p in range(9):
            acc72 = acc72 + jnp.dot(
                jax.lax.slice(xw, (p * kp, 0), ((p + 1) * kp, c)),
                w_ref[p],
                preferred_element_type=jnp.float32,
            )
        acc72 = acc72 + b_ref[0][None, :]
        # Segment-sum the single surviving anchor group into lanes
        # [0, group) — each selected lane l lands on lane l % group.
        x8 = jnp.dot(
            jnp.where(sel_mask, acc72, 0.0).astype(jnp.bfloat16),
            s_ref[...],
            preferred_element_type=jnp.float32,
        )
        if mode == "stats":
            x8 = jnp.where(one_lane, 1.0, x8)
            xc = jnp.where(jlv, jnp.clip(x8, -lv_clip, lv_clip), x8)
            xc = jnp.where(j2, jnp.minimum(xc, tw_clip) * inv_sw, xc)
            xc = jnp.where(j3, jnp.minimum(xc, th_clip) * inv_sh, xc)
            f1 = jnp.dot(
                x8.astype(jnp.bfloat16), p1_ref[...],
                preferred_element_type=jnp.float32,
            )
            f2 = jnp.dot(
                x8.astype(jnp.bfloat16), p2_ref[...],
                preferred_element_type=jnp.float32,
            )
            ec = jnp.dot(
                xc.astype(jnp.bfloat16), e_ref[...],
                preferred_element_type=jnp.float32,
            )
            contrib = f1 * f2 * jnp.exp(jnp.clip(ec, -40.0, 40.0))
        else:  # "probs": softmax over the candidate's (C+1) logits
            # p1_ref doubles as the group-sum matrix: denom[j] = sum of
            # lanes [0, group) for every j < group (see host builder).
            logits = jnp.where(valid8, x8, -jnp.inf)
            m = jnp.max(logits, axis=1, keepdims=True)
            e_x = jnp.where(valid8, jnp.exp(logits - m), 0.0)
            denom = jnp.dot(
                e_x.astype(jnp.float32), p1_ref[...],
                preferred_element_type=jnp.float32,
            )
            contrib = jnp.where(denom > 0.0, e_x / denom, 0.0)
        acc_stats = acc_stats + contrib * (1.0 / num_samples)
    out_ref[0] = acc_stats


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "keep_prob", "anchors_per_cell", "scale_factors",
        "log_var_clip", "interpret", "chunk", "mode", "group_size",
        "table_scale", "gather_block", "table_input", "dma_slots",
        "debug_skip",
    ),
)
def _candidate_finals(
    flat: jnp.ndarray,  # [B, R, C] bf16 trunk row table (levels flattened)
    rows: jnp.ndarray,  # [B, K*9] int32 tap-major window rows (-1 = off-map)
    a_idx: jnp.ndarray,  # [B, K] int32 anchor-in-cell
    kernel: jnp.ndarray,  # [3, 3, C, k*8] final reg conv
    bias: jnp.ndarray,  # [k*8]
    seed,  # python int or traced scalar folded by caller into rows stream
    num_samples: int,
    keep_prob: float,
    anchors_per_cell: int,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    interpret: Optional[bool] = None,
    chunk: int = 512,
    mode: str = "stats",
    group_size: int = 8,
    batch_base: jnp.ndarray | int = 0,
    table_scale: Optional[float] = None,
    gather_block: Optional[int] = None,
    table_input: str = "dma",
    dma_slots: int = 2,
    debug_skip: Optional[str] = None,
) -> jnp.ndarray:
    """mode="stats": [B, K, REG_STATS] reg moment statistics;
    mode="probs": [B, K, group_size] mean softmax over each candidate's
    own (C+1)-logit group. See module docstring.

    `rows` must be TAP-MAJOR: rows[b, p*K + k] = window tap p of candidate
    k; off-map taps marked -1 (never matched by the one-hot compare, so
    they contribute exact zeros — SAME-conv border semantics). `seed` is a
    traced int32 scalar (scalar-prefetched into SMEM); the mask stream is
    bit-identical to ops/candidate_reg.candidate_reg_outputs with the same
    seed.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (flat.dtype == jnp.int8) != (table_scale is not None):
        raise ValueError(
            "int8 tables require table_scale (and bf16 tables must not "
            f"pass one): flat.dtype={flat.dtype}, table_scale={table_scale}"
        )
    b, r, c = flat.shape
    k = a_idx.shape[1]
    kp = _round_up(k, 128)
    if kp != k:
        raise ValueError(f"pre_cluster_topk {k} must be a multiple of 128")
    if gather_block is None:
        # Monolithic gather (one block = the round-4 formulation): the
        # measured default — finer blocks only pay when the caller also
        # row-sorts the candidates, and even then the gating overhead ate
        # the savings at production scale (DESIGN.md §8 round-5 ledger:
        # blocks+sort 842.5 vs monolithic 853.2 img/s).
        gather_block = 9 * kp
    if (9 * kp) % gather_block != 0:
        raise ValueError(
            f"gather_block {gather_block} must divide 9*topk = {9 * kp}"
        )
    rp = _round_up(r, chunk)
    cout = kernel.shape[-1]
    if cout != anchors_per_cell * group_size:
        raise ValueError("cout != anchors_per_cell * group_size")
    cph = 128
    if cout >= cph:
        raise ValueError("anchor groups exceed one lane tile")

    table_dtype = jnp.int8 if table_scale is not None else jnp.bfloat16
    if table_input not in ("auto", "resident", "dma", "gated"):
        raise ValueError(
            "table_input must be auto|resident|dma|gated, got "
            f"{table_input!r}"
        )
    # Resident tables (round 5): deliver the whole per-image table as a
    # pipeline-managed VMEM block instead of manually streaming CHUNK-row
    # slabs — Pallas overlaps the next image's table copy with this
    # image's compute, and the gather loop loses all n_chunks serial DMA
    # waits. Auto gates on the double-buffered footprint (2x table) plus
    # the win/weight blocks staying well inside the 48 MB VMEM budget:
    # KITTI int8 2.6 MB / bf16 5.2 MB and BDD int8 4.8 MB resident;
    # BDD bf16 (9.6 MB; 2x = 19.2) also fits under the 12 MB gate.
    itemsize = 1 if table_scale is not None else 2
    resident = table_input == "resident" or (
        table_input == "auto" and rp * c * itemsize <= 12 * 1024 * 1024
    )
    gated = table_input == "gated"
    flat_p = jnp.pad(flat.astype(table_dtype), ((0, 0), (0, rp - r), (0, 0)))
    w9 = jnp.zeros((9, c, cph), jnp.bfloat16).at[:, :, :cout].set(
        kernel.reshape(9, c, cout).astype(jnp.bfloat16)
    )
    b_pad = jnp.zeros((1, cph), jnp.float32).at[0, :cout].set(
        bias.astype(jnp.float32)
    )
    lanes = np.arange(cph)
    s_mat = (
        (lanes[:, None] < cout)
        & (lanes[None, :] == lanes[:, None] % group_size)
    )
    if mode == "stats":
        p1, p2, e = _reg_stat_matrices(1, cph, cph, 8)
        p1 = jnp.asarray(p1, jnp.bfloat16)
        p2 = jnp.asarray(p2, jnp.bfloat16)
        e = jnp.asarray(e, jnp.bfloat16)
    else:  # probs: p1 is the fp32 group-sum matrix; p2/e unused (zeros)
        g = ((lanes[:, None] < group_size) & (lanes[None, :] < group_size))
        p1 = jnp.asarray(g, jnp.float32)
        p2 = jnp.zeros((cph, cph), jnp.bfloat16)
        e = jnp.zeros((cph, cph), jnp.bfloat16)
    from bayesod_tpu.ops.boxes import BBOX_XFORM_CLIP

    sx, sy, sw, sh = (float(v) for v in scale_factors)
    threshold = min(int(keep_prob * 2147483648.0), 2147483647)
    seed_arr = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32).reshape(()),
            jnp.asarray(batch_base, jnp.int32).reshape(()),
        ]
    ).reshape(1, 2)

    vec_spec = lambda n: pl.BlockSpec(
        (1, 1, n), lambda bi, sref: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    mat_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, sref: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            kp=kp, rp=rp, c=c, chunk=chunk, cout=cout,
            num_samples=num_samples, keep_prob=float(keep_prob),
            threshold=threshold, lv_clip=float(log_var_clip),
            tw_clip=sw * float(BBOX_XFORM_CLIP),
            th_clip=sh * float(BBOX_XFORM_CLIP),
            inv_sw=1.0 / sw, inv_sh=1.0 / sh,
            mode=mode, group=group_size,
            table_scale=(
                None if table_scale is None else float(table_scale)
            ),
            gather_block=gather_block,
            resident=resident,
            gated=gated,
            dma_slots=dma_slots,
            debug_skip=debug_skip,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                vec_spec(9 * kp),  # rows (tap-major)
                vec_spec(kp),  # a_idx
                (
                    pl.BlockSpec(
                        (1, rp, c), lambda bi, sref: (bi, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    if resident
                    else pl.BlockSpec(memory_space=pltpu.ANY)
                ),  # flat table
                mat_spec((9, c, cph)),
                mat_spec((1, cph)),
                mat_spec((cph, cph)),
                mat_spec((cph, cph)),
                mat_spec((cph, cph)),
                mat_spec((cph, cph)),
            ],
            out_specs=pl.BlockSpec(
                (1, kp, cph), lambda bi, sref: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=(
                [pltpu.VMEM((9 * kp, c), jnp.bfloat16)]
                if resident
                else [
                    pltpu.VMEM(
                        ((1 if gated else dma_slots), chunk, c), table_dtype
                    ),
                    pltpu.VMEM((9 * kp, c), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(((1 if gated else dma_slots),)),
                ]
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, kp, cph), jnp.float32),
        # The unrolled chunk loop's live matmul temporaries can exceed the
        # default 16 MB scoped-VMEM stack at topk 512 (chunk-skip branches
        # add bool masks per iteration); headroom is cheap — v5e has
        # 128 MB VMEM and this kernel's persistent blocks use < 8 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(
        seed_arr,
        rows.astype(jnp.int32)[:, None, :],
        a_idx.astype(jnp.int32)[:, None, :],
        flat_p, w9, b_pad,
        jnp.asarray(s_mat, jnp.bfloat16),
        p1, p2, e,
    )
    return out[:, :, : (REG_STATS if mode == "stats" else group_size)]


def candidate_finals_stats(*args, **kwargs):
    """Reg-moment statistics at candidates (mode="stats"); see
    _candidate_finals. Pass table_scale for an int8 row table."""
    return _candidate_finals(*args, **kwargs, mode="stats", group_size=8)


def candidate_finals_probs(
    flat, rows, a_idx, kernel, bias, seed, num_samples, keep_prob,
    anchors_per_cell, group_size, interpret=None, chunk=512, batch_base=0,
    table_scale=None, gather_block=None, table_input="dma", dma_slots=2,
):
    """Mean-softmax class probabilities at candidates (mode="probs"):
    [B, K, C+1] — the MC categorical (paper §III.A) computed only where
    fusion reads it. Pass table_scale for an int8 row table."""
    return _candidate_finals(
        flat, rows, a_idx, kernel, bias, seed, num_samples, keep_prob,
        anchors_per_cell, interpret=interpret, chunk=chunk,
        mode="probs", group_size=group_size, batch_base=batch_base,
        table_scale=table_scale, gather_block=gather_block,
        table_input=table_input, dma_slots=dma_slots,
    )
