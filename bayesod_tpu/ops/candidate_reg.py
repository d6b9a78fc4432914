"""Candidates-only MC regression finals.

The dense fused path computes per-sample regression outputs for EVERY anchor
cell ([N, B, cells, 72->128 lanes] in HBM, then a flat [N, B, A, 8] concat)
— yet BayesOD's moment stage only ever reads the `pre_cluster_topk` (~512)
preselected candidates per image, 0.6% of the anchors. On an HBM-bound graph
(DESIGN.md §8) those dense tensors are pure waste: a bench experiment that
faked the reg finals at one sample ran 801.7 vs 598.5 img/s — a 34% ceiling.

This module computes the per-sample reg outputs ONLY at the preselected
candidates:

  1. candidate global anchor index -> (level, cell y/x, anchor-in-cell a)
     by static level boundaries (pure int32 arithmetic, no branches);
  2. ONE gather of the 3x3 trunk windows [B, K, 9, C] from the levels
     flattened row-major into a single [B, R, C] view (out-of-map window
     taps are clamped + zeroed — SAME-conv border semantics);
  3. per-sample dropout masks from the same stateless splitmix32 hash the
     Pallas kernels use, addressed by ABSOLUTE (row, channel) index — so
     overlapping candidate windows mask consistently within a sample;
  4. 9 masked [K, C] @ [C, 72] contractions per sample, then the
     candidate's own anchor slice (8 of 72) via take_along_axis.

Cost: ~0.3 GB of gathers + ~0.2 TFLOP per batch-128 step — versus the
~3.4 GB of dense kernel writes plus the [N, B, A, 8] concat it replaces.

RNG: a distinct stream from the dense kernels (masks are statistically
equivalent Bernoulli draws, not bit-identical to the dense path — at
keep_prob=1.0 the two paths agree exactly, which is what the parity tests
pin).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LevelTables:
    """Static per-level index tables for a fixed image shape.

    `tile_hw=(th, tw)` switches the flattened [R, C] table view from
    level-major/row-major to level-major/TILE-major: each level's grid is
    padded to tile multiples and rows are ordered tile-by-tile (row-major
    over tiles, row-major within a tile). With the candidate kernels'
    stream chunk set to th*tw, a table chunk then corresponds to an IMAGE
    TILE instead of a full-width band — so spatially clustered candidates
    leave most chunks without a window row and the kernels' sparse-chunk
    skip (ops/pallas/candidate_finals.py) actually skips. The round-4
    measurement that motivates this: row-major 512-row chunks span entire
    image-width bands at P3, defeating the skip (+1.3%; DESIGN.md §8).
    """

    def __init__(
        self,
        level_hw: Sequence[Tuple[int, int]],
        anchors_per_cell: int,
        tile_hw: "Tuple[int, int] | None" = None,
        sort_candidates: bool = True,
        table_input: str = "dma",
    ):
        # Reorder each image's candidates by table row before the fused
        # kernels (outputs restored to the caller's order afterwards —
        # see candidate_sort / candidate_unsort): sorted candidates make
        # the kernels' gather blocks span disjoint row ranges, so the
        # block-gated gather fires on ~(row span)/chunk pairs instead of
        # blocks x occupied-chunks. Numerics are EXACT either way (masks
        # key on absolute row ids; unsort is a one-hot matmul).
        self.sort_candidates = bool(sort_candidates)
        # Table delivery policy for the fused kernels ("dma" | "gated" |
        # "resident" | "auto") — carried here like chunk/tile/sort so every
        # candidate path of one detector uses one policy.
        self.table_input = str(table_input)
        self.level_hw = tuple((int(h), int(w)) for h, w in level_hw)
        self.k = int(anchors_per_cell)
        cells = [h * w for h, w in self.level_hw]
        # Anchor-index boundaries (level-major layout, matching
        # ops/anchors.generate_anchors and heads.flatten_levels).
        self.anchor_bounds = np.cumsum([c * self.k for c in cells])
        self.tile_hw = (
            (int(tile_hw[0]), int(tile_hw[1])) if tile_hw else None
        )
        if self.tile_hw is None:
            # Row offsets of each level's cells in the flattened [R, C] view.
            self.row_offsets = np.concatenate([[0], np.cumsum(cells)[:-1]])
            self.total_rows = int(np.sum(cells))
            self.chunk = 512
        else:
            th, tw = self.tile_hw
            self.pad_hw = tuple(
                (-(-h // th) * th, -(-w // tw) * tw) for h, w in self.level_hw
            )
            cells_p = [hp * wp for hp, wp in self.pad_hw]
            self.row_offsets = np.concatenate([[0], np.cumsum(cells_p)[:-1]])
            self.total_rows = int(np.sum(cells_p))
            self.chunk = th * tw

    def decompose(self, idx: jnp.ndarray):
        """Global anchor idx [..] -> (level, cy, cx, a, h_level, w_level)."""
        bounds = jnp.asarray(self.anchor_bounds[:-1], jnp.int32)
        level = jnp.sum(idx[..., None] >= bounds[None, :], axis=-1)
        starts = jnp.asarray(
            np.concatenate([[0], self.anchor_bounds[:-1]]), jnp.int32
        )
        local = idx - starts[level]
        cell = local // self.k
        a = local - cell * self.k
        ws = jnp.asarray([w for _, w in self.level_hw], jnp.int32)
        hs = jnp.asarray([h for h, _ in self.level_hw], jnp.int32)
        w_l = ws[level]
        cy = cell // w_l
        cx = cell - cy * w_l
        return level, cy, cx, a, hs[level], w_l

    def cell_rows(self, level, cy, cx):
        """Flat-table row id of cell (cy, cx) at `level` — the layout
        contract shared by `flatten` and every candidate path (row-major or
        tiled; (cy, cx) must already be in-map/clamped)."""
        row_off = jnp.asarray(self.row_offsets, jnp.int32)[level]
        if self.tile_hw is None:
            ws = jnp.asarray([w for _, w in self.level_hw], jnp.int32)
            return row_off + cy * ws[level] + cx
        th, tw = self.tile_hw
        tiles_w = jnp.asarray(
            [wp // tw for _, wp in self.pad_hw], jnp.int32
        )[level]
        return (
            row_off
            + ((cy // th) * tiles_w + cx // tw) * (th * tw)
            + (cy % th) * tw
            + (cx % tw)
        )

    def window_rows(self, idx: jnp.ndarray):
        """3x3 window rows for global anchor indices [B, K].

        Returns (rows [B, K, 3, 3] int32 — flat-table row ids at CLAMPED
        window coordinates, in_map [B, K, 3, 3] bool — False for taps
        outside the level map (SAME-conv borders), a_idx [B, K] int32 —
        anchor-in-cell)."""
        level, cy, cx, a_idx, h_l, w_l = self.decompose(idx)
        dy = jnp.arange(-1, 2, dtype=jnp.int32)
        dx = jnp.arange(-1, 2, dtype=jnp.int32)
        wy = cy[..., None, None] + dy[None, None, :, None]  # [B, K, 3, 3]
        wx = cx[..., None, None] + dx[None, None, None, :]
        in_map = (
            (wy >= 0) & (wy < h_l[..., None, None])
            & (wx >= 0) & (wx < w_l[..., None, None])
        )
        rows = self.cell_rows(
            level[..., None, None],
            jnp.clip(wy, 0, h_l[..., None, None] - 1),
            jnp.clip(wx, 0, w_l[..., None, None] - 1),
        )
        return rows, in_map, a_idx

    def flatten(self, levels: List[jnp.ndarray]) -> jnp.ndarray:
        """Per-level [B, h, w, C] activations -> the flat [B, R, C] table in
        this layout. Row-major: a free reshape+concat. Tiled: pad each level
        to tile multiples and reorder via reshape/transpose — real data
        movement, but ONE streaming pass over table bytes (~0.5 ms/batch at
        production int8 shapes), bought back many times over by the
        chunk-skip MAC cut; crucially NOT an indexed gather (XLA lowers
        those to serial dynamic-slice loops on TPU — DESIGN.md §8 rule)."""
        b = levels[0].shape[0]
        c = levels[0].shape[-1]
        if self.tile_hw is None:
            return jnp.concatenate(
                [t.reshape(b, -1, c) for t in levels], axis=1
            )
        th, tw = self.tile_hw
        parts = []
        for t, (h, w), (hp, wp) in zip(levels, self.level_hw, self.pad_hw):
            tp = jnp.pad(t, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            tp = tp.reshape(b, hp // th, th, wp // tw, tw, c)
            tp = tp.transpose(0, 1, 3, 2, 4, 5)
            parts.append(tp.reshape(b, hp * wp, c))
        return jnp.concatenate(parts, axis=1)


def parse_tile(spec: "str | None") -> "Tuple[int, int] | None":
    """BayesConfig.candidate_tile "THxTW" -> (th, tw); None/"" -> None."""
    if not spec:
        return None
    try:
        th, tw = (int(v) for v in str(spec).lower().split("x"))
    except ValueError as e:
        raise ValueError(
            f"candidate_tile must look like '16x32', got {spec!r}"
        ) from e
    if th <= 0 or tw <= 0 or (th * tw) % 128 != 0:
        raise ValueError(
            f"candidate_tile {spec!r}: th*tw must be a positive multiple "
            "of 128 (it becomes the kernels' stream-chunk size)"
        )
    return th, tw


def tables_for(cfg, anchors_per_cell: int) -> LevelTables:
    """LevelTables for an ExperimentConfig: feature shapes at the padded
    image size + the configured candidate-table layout."""
    from bayesod_tpu.ops.anchors import feature_shapes

    return LevelTables(
        feature_shapes(cfg.data.image_hw, cfg.anchors),
        anchors_per_cell,
        tile_hw=parse_tile(cfg.bayes.candidate_tile),
        sort_candidates=cfg.bayes.candidate_sort,
        table_input=cfg.bayes.candidate_table_input,
    )


def _splitmix(z: jnp.ndarray) -> jnp.ndarray:
    z = z ^ (z >> jnp.uint32(16))
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> jnp.uint32(13))
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> jnp.uint32(16))
    return z


def candidate_reg_outputs(
    reg_t_levels: List[jnp.ndarray],  # per level [B, h, w, C] trunk acts
    kernel: jnp.ndarray,  # [3, 3, C, k*8] final reg conv (HWIO)
    bias: jnp.ndarray,  # [k*8]
    idx: jnp.ndarray,  # [B, K] global anchor indices (preselected)
    seed: jnp.ndarray,  # scalar int32
    num_samples: int,
    keep_prob: float,
    tables: LevelTables,
    batch_base: "jnp.ndarray | int" = 0,
) -> jnp.ndarray:
    """[N, B, K, 8] per-sample (deltas, log_vars) at the candidates.

    batch_base shifts the dropout-mask stream to absolute image indices so
    a data-parallel shard_map shard draws exactly the masks the unsharded
    call would (zero when unsharded)."""
    b = reg_t_levels[0].shape[0]
    c = reg_t_levels[0].shape[-1]
    kk = idx.shape[1]
    n_a = tables.k

    flat = tables.flatten(reg_t_levels)  # [B, R, C]

    # 3x3 window rows in the flat view; taps outside the level map are
    # clamped for the gather and zeroed afterwards (SAME-conv borders).
    rows, in_map, a_idx = tables.window_rows(idx)
    rows = rows.reshape(b, kk * 9)

    # TPU gathers lower to a serial dynamic-slice loop (~124 ms/batch at
    # production shapes); the one-hot-matmul Pallas kernel does the same
    # lookup as MXU work (ops/pallas/gather.py).
    from bayesod_tpu.ops.pallas.gather import gather_rows

    win = gather_rows(flat, rows)  # [B, K*9, C] bf16
    win = jnp.where(in_map.reshape(b, kk * 9, 1), win, 0)

    # Stateless per-sample dropout mask on absolute (row, channel) indices:
    # overlapping windows of different candidates mask identically.
    # Layout: [B, K*9, C] -> [B*K, 9*C] is a contiguous (free) reshape, so
    # each sample is ONE [B*K, 9C] @ [9C, k*8] MXU matmul — a batched
    # "bkpc,pcd" einsum lowers to B separate small matmuls instead.
    cout = kernel.shape[-1]
    win2 = win.reshape(b * kk, 9 * c)
    elem = (
        rows.reshape(b, kk * 9)[..., None].astype(jnp.uint32) * jnp.uint32(c)
        + jnp.arange(c, dtype=jnp.uint32)[None, None, :]
    ).reshape(b, kk, 9 * c)  # absolute (row, channel) ids
    b_ids = jnp.arange(b, dtype=jnp.int32) + jnp.asarray(
        batch_base, jnp.int32
    )
    threshold = jnp.uint32(min(int(keep_prob * 2147483648.0), 2147483647))
    w9f = kernel.reshape(9 * c, cout)
    compute_dtype = reg_t_levels[0].dtype
    bias_f = bias.astype(jnp.float32)[None, :]

    outs = []
    for n in range(num_samples):  # static unroll: XLA schedules freely
        if keep_prob < 1.0:
            stream = (
                jnp.asarray(seed, jnp.int32) * jnp.int32(1000003)
                + jnp.int32(-1640531527)
                * (b_ids * jnp.int32(num_samples) + jnp.int32(n))
            ).astype(jnp.uint32)[:, None, None]
            keep = (
                (_splitmix(elem + stream) >> jnp.uint32(1)) < threshold
            ).reshape(b * kk, 9 * c)
            xw = jnp.where(keep, win2 * (1.0 / keep_prob), 0).astype(
                compute_dtype
            )
        else:
            xw = win2
        outs.append(
            jnp.dot(
                xw, w9f.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).reshape(b, kk, cout)
            + bias_f
        )
    all_out = jnp.stack(outs)  # [N, B, K, k*8]

    # Each candidate keeps only its own anchor's group of outputs —
    # selected with a one-hot multiply+reduce, NOT take_along_axis (XLA
    # lowers indexed gathers to serial dynamic-slice loops on TPU; see
    # gather.py). group = 8 for reg finals, C+1 for cls finals.
    group = cout // n_a
    oh = (
        a_idx[..., None] == jnp.arange(n_a, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # [B, K, k]
    per_anchor = all_out.reshape(num_samples, b, kk, n_a, group)
    # HIGHEST: the one-hot pick must not round the fp32 payload through
    # TPU's default one-bf16-pass fp32 matmul (see candidate_unsort).
    return jnp.einsum(
        "nbkag,bka->nbkg", per_anchor, oh,
        precision=jax.lax.Precision.HIGHEST,
    )


def _stats_from_candidate_samples(
    samples: jnp.ndarray,  # [N, B, K, 8]
    scale_factors,
    log_var_clip: float,
) -> jnp.ndarray:
    """[B, K, 18] REG_STATS from per-sample outputs (fused_final.REG_STATS
    layout) — the XLA fallback/oracle for candidate_finals_stats."""
    from bayesod_tpu.ops.boxes import BBOX_XFORM_CLIP

    r = samples.astype(jnp.float32)
    sx, sy, sw, sh = scale_factors
    tx, ty = r[..., 0], r[..., 1]
    ew = jnp.exp(jnp.minimum(r[..., 2] / sw, BBOX_XFORM_CLIP))
    eh = jnp.exp(jnp.minimum(r[..., 3] / sh, BBOX_XFORM_CLIP))
    v = jnp.exp(jnp.clip(r[..., 4:8], -log_var_clip, log_var_clip))
    return jnp.stack(
        [
            tx, ty, ew, eh, tx * tx, ty * ty, ew * ew, eh * eh,
            tx * ty, tx * ew, tx * eh, ty * ew, ty * eh, ew * eh,
            v[..., 0], v[..., 1], v[..., 2] * ew * ew, v[..., 3] * eh * eh,
        ],
        axis=-1,
    ).mean(0)


def candidate_reg_stats(
    reg_t_levels: List[jnp.ndarray],
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    idx: jnp.ndarray,  # [B, K]
    seed: jnp.ndarray,
    num_samples: int,
    keep_prob: float,
    tables: LevelTables,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
    backend: str = "auto",
    batch_base: "jnp.ndarray | int" = 0,
    table_scale: "float | None" = None,
    table_input: "str | None" = None,
) -> jnp.ndarray:
    """[B, K, 18] per-candidate moment statistics.

    backend "pallas" (TPU default): the fully-fused kernel
    (ops/pallas/candidate_finals.py) — gather, masks, finals, and stats
    never leave VMEM. "xla": candidate_reg_outputs' per-sample path +
    stats reduction (same masks -> the two agree to bf16 tolerance; the
    parity oracle).

    table_scale (ModelConfig.head_table_dtype="int8"): the trunk row table
    is quantized to int8 at this static scale before the kernel streams it
    — the one-hot gather matmuls run int8 x int8 -> int32 at 2x the bf16
    MXU rate on half the DMA bytes. XLA fuses the requant into the trunk's
    last conv epilogue, so the bf16 table never reaches HBM when this is
    its only consumer. The XLA oracle consumes dequant(quant(table)) —
    same numerics, so parity tests cover the quantized route too."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        if table_scale is not None:
            reg_t_levels = [
                _fake_quant_table(t, table_scale) for t in reg_t_levels
            ]
        samples = candidate_reg_outputs(
            reg_t_levels, kernel, bias, idx, seed, num_samples, keep_prob,
            tables, batch_base=batch_base,
        )
        return _stats_from_candidate_samples(
            samples, scale_factors, log_var_clip
        )

    from bayesod_tpu.ops.pallas.candidate_finals import candidate_finals_stats

    if table_scale is not None:
        # Quantize per level BEFORE the tile-major flatten: the per-tensor
        # scale commutes with pad/transpose (quantize(0) == 0), so the
        # result is bit-identical while the flatten's real data movement
        # runs on int8 — half the transpose bytes, and XLA can fuse the
        # requant into each trunk conv's epilogue instead of materializing
        # the bf16 table first.
        from bayesod_tpu.models.quant import quantize_act

        reg_t_levels = [
            quantize_act(t, float(table_scale)) for t in reg_t_levels
        ]
    flat = tables.flatten(reg_t_levels)
    orig_pos = None
    if tables.sort_candidates:
        idx, orig_pos = candidate_sort(idx, tables)
    rows_pm, a_idx = tap_major_rows(idx, tables)
    out = candidate_finals_stats(
        flat, rows_pm, a_idx, kernel, bias, seed, num_samples, keep_prob,
        tables.k, scale_factors=tuple(scale_factors),
        log_var_clip=log_var_clip, batch_base=batch_base, chunk=tables.chunk,
        table_scale=(
            None if table_scale is None else float(table_scale)
        ),
        gather_block=128 if tables.sort_candidates else None,
        table_input=(
            tables.table_input if table_input is None else table_input
        ),
    )
    return out if orig_pos is None else candidate_unsort(out, orig_pos)


def _fake_quant_table(t: jnp.ndarray, scale: float) -> jnp.ndarray:
    """dequant(quant(t)) in the table's own dtype — the XLA-oracle
    simulation of the int8 row table the Pallas kernels stream."""
    from bayesod_tpu.models.quant import quantize_act

    return (
        quantize_act(t, float(scale)).astype(jnp.float32) * float(scale)
    ).astype(t.dtype)


def candidate_sort(idx: jnp.ndarray, tables: LevelTables):
    """Reorder each image's candidate list by flat-table row of the center
    cell. Returns (idx_sorted [B, K], orig_pos [B, K]) where orig_pos[b, i]
    is sorted-candidate i's position in the ORIGINAL (score-ranked) order;
    restore per-candidate outputs with candidate_unsort. Implemented with a
    multi-operand lax.sort — TPU-native, never an indexed gather."""
    level, cy, cx, _, _, _ = tables.decompose(idx)
    center = tables.cell_rows(level, cy, cx)
    pos = jnp.broadcast_to(
        jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :], idx.shape
    )
    _, idx_sorted, orig_pos = jax.lax.sort(
        (center, idx.astype(jnp.int32), pos), dimension=-1, num_keys=1
    )
    return idx_sorted, orig_pos


def candidate_unsort(vals: jnp.ndarray, orig_pos: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate outputs [B, K, D] (sorted order) -> original order.
    One-hot matmul — MXU-friendly per the no-indexed-gathers-on-TPU rule
    (DESIGN.md §8). precision=HIGHEST is REQUIRED for exactness: TPU's
    default fp32 matmul precision is one bf16 pass, which silently rounds
    the payload to 8 mantissa bits — enough to flip the downstream
    epistemic covariance E[x^2]-E[x]^2 NEGATIVE by catastrophic
    cancellation (round-5 eval regression: fused boxes off by 50 px,
    gauss NLL x5000, root-caused to exactly this). With HIGHEST the
    product 1.0 * value is reconstructed in full fp32 and each output row
    is exactly one input row."""
    k = vals.shape[1]
    onehot = (
        orig_pos[:, None, :] == jnp.arange(k, dtype=jnp.int32)[None, :, None]
    )
    return jnp.einsum(
        "bji,bid->bjd", onehot.astype(vals.dtype), vals,
        precision=jax.lax.Precision.HIGHEST,
    )


def tap_major_rows(idx: jnp.ndarray, tables: LevelTables):
    """(rows_pm [B, 9K] tap-major window row ids with -1 off-map, a_idx
    [B, K]) for the fused candidate kernels."""
    b, kk = idx.shape
    rows, in_map, a_idx = tables.window_rows(idx)
    # off-map: one-hot never matches -> exact zero tap
    rows = jnp.where(in_map, rows, -1)
    rows_pm = rows.reshape(b, kk, 9).transpose(0, 2, 1).reshape(b, 9 * kk)
    return rows_pm, a_idx


def candidate_cls_probs(
    cls_t_levels: List[jnp.ndarray],
    kernel: jnp.ndarray,  # [3, 3, C, k*(C+1)] final cls conv
    bias: jnp.ndarray,
    idx: jnp.ndarray,  # [B, K]
    seed: jnp.ndarray,
    num_samples: int,
    keep_prob: float,
    tables: LevelTables,
    num_classes_incl_bg: int,
    backend: str = "auto",
    batch_base: "jnp.ndarray | int" = 0,
    table_scale: "float | None" = None,
    table_input: "str | None" = None,
) -> jnp.ndarray:
    """[B, K, C+1] MC mean-softmax categoricals at the candidates only.

    Companion to candidate_reg_stats for BayesConfig.preselect_source=
    "deterministic": preselection runs on a single deterministic pass, so
    the N-sample cls work shrinks to the K candidates (paper §III.A's mean
    softmax, computed exactly where fusion reads it). table_scale: see
    candidate_reg_stats."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        if table_scale is not None:
            cls_t_levels = [
                _fake_quant_table(t, table_scale) for t in cls_t_levels
            ]
        samples = candidate_reg_outputs(
            cls_t_levels, kernel, bias, idx, seed, num_samples, keep_prob,
            tables, batch_base=batch_base,
        )  # [N, B, K, C+1] logits
        return jnp.mean(
            jax.nn.softmax(samples.astype(jnp.float32), axis=-1), axis=0
        )

    from bayesod_tpu.ops.pallas.candidate_finals import candidate_finals_probs

    if table_scale is not None:
        # Per-level quantize before flatten — bit-identical, int8-bytes
        # transpose; see candidate_reg_stats.
        from bayesod_tpu.models.quant import quantize_act

        cls_t_levels = [
            quantize_act(t, float(table_scale)) for t in cls_t_levels
        ]
    flat = tables.flatten(cls_t_levels)
    orig_pos = None
    if tables.sort_candidates:
        idx, orig_pos = candidate_sort(idx, tables)
    rows_pm, a_idx = tap_major_rows(idx, tables)
    out = candidate_finals_probs(
        flat, rows_pm, a_idx, kernel, bias, seed, num_samples, keep_prob,
        tables.k, num_classes_incl_bg, batch_base=batch_base,
        chunk=tables.chunk,
        table_scale=(
            None if table_scale is None else float(table_scale)
        ),
        gather_block=128 if tables.sort_candidates else None,
        table_input=(
            tables.table_input if table_input is None else table_input
        ),
    )
    return out if orig_pos is None else candidate_unsort(out, orig_pos)
