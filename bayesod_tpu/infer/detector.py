"""End-to-end BayesOD detector: ONE jit graph from image batch to detections.

Rebuild of the reference's inference driver
(ref: src/retina_net/experiments/run_inference.py; SURVEY.md §3.2): the
reference runs N forward passes in host Python, aggregates moments in NumPy,
then clusters/fuses on host per image. Here the whole path — MC sampling,
candidate preselection, moment aggregation, IoU-affinity clustering, Bayesian
fusion — is a single fixed-shape XLA program per image in the batch:

  images [B,H,W,3]
    -> mc_forward (trunk once, heads vmapped over N dropout rngs)
    -> per-anchor mean scores -> masked static top-k preselect (k << A)
    -> MC box moments on the k candidates only (fp32 islands)
    -> greedy IoU-affinity clustering (static trip count D)
    -> precision-weighted Gaussian + Dirichlet fusion
    -> Detections(boxes [B,D,4], covs [B,D,4,4], probs [B,D,C+1], ...)

Post-processing modes (SURVEY.md §2 "Baseline post-processing modes";
paper §IV comparison estimators):
  * "bayes_od"         — MC sampling + clustering + Bayesian fusion (flagship)
  * "nms"              — MC sampling + greedy NMS (mean boxes, no fusion)
  * "single_pass_nms"  — one deterministic pass + greedy NMS (vanilla RetinaNet)
  * "black_box"        — MC sampling + clustering + empirical member moments
  * "sampling_free"    — one pass + greedy NMS + decoded aleatoric covariance
  * "anchor_redundancy"— one pass + clustering + empirical anchor moments
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from bayesod_tpu.bayes import clustering as clus
from bayesod_tpu.bayes import fusion as fus
from bayesod_tpu.bayes import moments as mom
from bayesod_tpu.models.retinanet import (
    RetinaNet,
    mc_forward,
    mc_forward_probs,
    single_forward,
)
from bayesod_tpu.ops import anchors as anchor_ops
from bayesod_tpu.ops import boxes as box_ops
from bayesod_tpu.utils.config import ExperimentConfig


class Detections(NamedTuple):
    """Fixed-shape per-image detection sets (D = bayes.max_detections)."""

    boxes: jnp.ndarray  # [B, D, 4] corner boxes, pixel space
    covs: jnp.ndarray  # [B, D, 4, 4] full corner-space covariance
    probs: jnp.ndarray  # [B, D, C+1] categorical incl. background (class 0)
    scores: jnp.ndarray  # [B, D] max foreground probability
    entropy: jnp.ndarray  # [B, D] categorical entropy (nats)
    classes: jnp.ndarray  # [B, D] int32 argmax foreground class (1-based)
    valid: jnp.ndarray  # [B, D] bool


def _preselect(
    probs: jnp.ndarray, k: int, score_threshold: float, approx: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static top-k candidate selection by max foreground probability.

    probs: [A, C+1] mean categorical per anchor. Returns (idx [k], valid [k]).
    Fixed-shape replacement for the reference's boolean-mask preselect
    (SURVEY.md §7 step 4): top-k always returns k indices; candidates below
    the score threshold are carried along but masked invalid.

    approx=True uses the TPU-native approx_max_k (recall 0.99 against the
    exact top-k) instead of the sort-based exact top-k — preselection is a
    heuristic candidate filter, and any anchor good enough to matter is far
    above the recall boundary.
    """
    fg = jnp.max(probs[:, 1:], axis=-1)  # [A]
    if approx:
        top_scores, idx = jax.lax.approx_max_k(fg, k, recall_target=0.99)
    else:
        top_scores, idx = jax.lax.top_k(fg, k)
    return idx, top_scores >= score_threshold


def _postprocess_single(
    probs_all: jnp.ndarray,  # [A, C+1] mean categorical (fp32)
    deltas: jnp.ndarray,  # [N, A, 4]
    log_vars: jnp.ndarray,  # [N, A, 4]
    anchors: jnp.ndarray,  # [A, 4]
    cfg: ExperimentConfig,
) -> fus.FusedDetections:
    """Per-image post-processing from DENSE per-sample outputs.

    Takes the sample-MEAN categorical (the only statistic BayesOD uses of
    the class logits) so the [N, A, C+1] per-sample logits never reach this
    stage — see models.retinanet.mc_forward_probs.
    """
    bayes = cfg.bayes
    idx, valid = _preselect(
        probs_all, bayes.pre_cluster_topk, bayes.score_threshold,
        approx=bayes.approx_topk,
    )
    # Gather the k candidates' per-sample box outputs, then aggregate
    # moments on k anchors instead of all ~100k (SURVEY.md §7 step 4).
    return _postprocess_candidates(
        probs_all[idx],
        deltas[:, idx],
        log_vars[:, idx],
        anchors[idx],
        valid,
        cfg,
    )


# Linear part of the corner-box mirror x1' = W - x2, x2' = W - x1 (y fixed):
# flipped-view covariances map as L Sigma L^T (the offset W drops out).
_FLIP_L = _np.asarray(
    [[0.0, 0.0, -1.0, 0.0],
     [0.0, 1.0, 0.0, 0.0],
     [-1.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    _np.float32,
)  # numpy on purpose — module-scope jnp would init the backend at import.


def _flip_posteriors_back(
    boxes: jnp.ndarray, covs: jnp.ndarray, width: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map flipped-view box posteriors to original coordinates.

    boxes [k, 4] corners, covs [k, 4, 4]. Exact affine pushforward of the
    Gaussian: mean mirrors, covariance conjugates by the mirror's linear
    part (tested against empirically flipped sample clouds)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    boxes_b = jnp.concatenate([width - x2, y1, width - x1, y2], axis=-1)
    covs_b = jnp.einsum("ij,kjl,ml->kim", _FLIP_L, covs, _FLIP_L)
    return boxes_b, covs_b


def _postprocess_single_tta(
    probs_a: jnp.ndarray,  # [A, C+1] original view mean categorical
    deltas_a: jnp.ndarray,  # [N, A, 4]
    log_vars_a: jnp.ndarray,
    probs_b: jnp.ndarray,  # flipped view
    deltas_b: jnp.ndarray,
    log_vars_b: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: ExperimentConfig,
) -> fus.FusedDetections:
    """Flip-TTA post-processing (BayesConfig.tta_flip): candidates from BOTH
    views enter ONE clustering + fusion pass — the flipped view contributes
    independent measurements of each object (its dropout masks and anchor
    geometry differ), so fused posteriors integrate 2x evidence instead of
    being averaged post hoc like conventional TTA."""
    bayes = cfg.bayes
    width = float(cfg.data.image_hw[1])

    def view_candidates(probs, deltas, log_vars):
        idx, valid = _preselect(
            probs, bayes.pre_cluster_topk, bayes.score_threshold,
            approx=bayes.approx_topk,
        )
        boxes_c, covs_c = mom.mc_box_moments(
            deltas[:, idx].astype(jnp.float32),
            log_vars[:, idx].astype(jnp.float32),
            anchors[idx],
            bayes.box_scale_factors,
            bayes.log_var_clip,
        )
        return boxes_c, covs_c, probs[idx], valid

    boxes1, covs1, p1, v1 = view_candidates(probs_a, deltas_a, log_vars_a)
    boxes2, covs2, p2, v2 = view_candidates(probs_b, deltas_b, log_vars_b)
    boxes2, covs2 = _flip_posteriors_back(boxes2, covs2, width)
    cand = mom.AnchorPosteriors(
        boxes=jnp.concatenate([boxes1, boxes2]),
        covs=jnp.concatenate([covs1, covs2]),
        probs=jnp.concatenate([p1, p2]),
    )
    return _postprocess_posteriors(cand, jnp.concatenate([v1, v2]), cfg)


def _postprocess_candidates(
    probs_sel: jnp.ndarray,  # [k, C+1] candidate mean categoricals
    deltas_c: jnp.ndarray,  # [N, k, 4] per-sample deltas at candidates
    log_vars_c: jnp.ndarray,  # [N, k, 4]
    anchors_sel: jnp.ndarray,  # [k, 4]
    valid: jnp.ndarray,  # [k] bool
    cfg: ExperimentConfig,
) -> fus.FusedDetections:
    """Moments -> clustering -> fusion on pre-gathered candidates; shared
    by the dense route (gathers from [N, A, .] tensors) and the
    candidates-only route (models.retinanet.mc_forward_candidates, which
    never materializes the dense tensors)."""
    bayes = cfg.bayes
    boxes_c, covs_c = mom.mc_box_moments(
        deltas_c.astype(jnp.float32),
        log_vars_c.astype(jnp.float32),
        anchors_sel,
        bayes.box_scale_factors,
        bayes.log_var_clip,
    )
    cand = mom.AnchorPosteriors(boxes=boxes_c, covs=covs_c, probs=probs_sel)
    return _postprocess_posteriors(cand, valid, cfg)


def _postprocess_posteriors(
    cand: mom.AnchorPosteriors,  # [k, ...] candidate posteriors
    valid: jnp.ndarray,  # [k] bool
    cfg: ExperimentConfig,
) -> fus.FusedDetections:
    """Clustering + fusion on per-candidate posteriors (all reg routes end
    here: dense / candidates-only / in-kernel stats)."""
    bayes = cfg.bayes
    boxes_px = box_ops.clip_boxes(cand.boxes, cfg.data.image_hw)
    scores = jnp.max(cand.probs[:, 1:], axis=-1)

    backend = bayes.clustering_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from bayesod_tpu.ops.pallas.clustering import (
            iou_affinity_clustering_pallas_auto,
        )

        # The auto wrapper's custom-vmap rule turns the per-image kernel
        # into ONE batch-blocked pallas_call under the image vmap (several
        # greedy loops advance together per program) — the per-image
        # semantics are bit-identical.
        cluster_fn = iou_affinity_clustering_pallas_auto
    else:
        cluster_fn = clus.iou_affinity_clustering

    if bayes.mode in ("bayes_od", "black_box", "anchor_redundancy"):
        # Grouping modes: every overlapping candidate joins as a measurement.
        groups = cluster_fn(
            boxes_px, scores, valid, bayes.affinity_threshold, bayes.max_detections
        )
    else:  # "nms" | "single_pass_nms" | "sampling_free": suppression modes
        groups = clus.greedy_nms_with(
            cluster_fn,
            boxes_px, scores, valid, bayes.nms_iou_threshold,
            bayes.max_detections,
        )
    if bayes.mode in ("black_box", "anchor_redundancy"):
        # Paper §IV comparison estimators: empirical member moments, no
        # conjugate update (bayes/fusion.fuse_clusters_mean).
        return fus.fuse_clusters_mean(groups, boxes_px, cand.covs, cand.probs)
    prior = (
        jnp.asarray(bayes.category_prior, jnp.float32)
        if bayes.category_prior is not None
        else None
    )
    return fus.fuse_clusters(
        groups, boxes_px, cand.covs, cand.probs,
        cov_jitter=bayes.cov_jitter,
        prior_logits=prior,
        category_fusion=bayes.category_fusion,
        box_fusion_prior=bayes.box_fusion_prior,
    )


def _candidate_fused_ok(cfg, anchors_per_cell: int = 9) -> bool:
    """Shape constraints of ops/pallas/candidate_finals._candidate_finals:
    K must tile the 128-lane dim exactly, and under deterministic preselect
    the per-candidate class groups (anchors_per_cell * (C+1) lanes) must fit
    one lane tile."""
    if cfg.bayes.pre_cluster_topk % 128 != 0:
        return False
    if (
        cfg.bayes.preselect_source == "deterministic"
        and anchors_per_cell * (cfg.model.num_classes + 1) >= 128
    ):
        return False
    return True


def _reg_route(cfg, images, anchors_per_cell: int = 9, batch=None) -> str:
    """Resolve ModelConfig.reg_finals at trace time (ModelConfig docstring
    for the measured trade-offs). SAMPLE-axis mesh sharding
    (build_detect_fn mesh arg, sample_parallel > 1) always uses the dense
    route — the reduced paths have no shardable sample tensor. A pure
    DATA-parallel mesh (sample_parallel == 1) takes the candidates_fused
    fast path via shard_map over the data axis (see build_detect_fn).

    The reduced routes (stats/candidates/candidates_fused) build on
    deterministic head trunks with dropout only at the final conv, so they
    require dropout_layers='last' — with 'all' they would silently compute
    an under-dispersed MC posterior. 'auto' falls back to 'dense' (which
    supports every dropout placement); explicit reduced modes raise,
    mirroring mc_forward's pallas guard."""
    mode = cfg.model.reg_finals
    if cfg.bayes.tta_flip:
        # TTA pairs each image with its flipped view and merges candidate
        # sets in the dense tail; the reduced kernels have no seam for that.
        if mode in ("candidates", "candidates_fused", "stats"):
            raise ValueError(
                f"reg_finals='{mode}' does not support bayes.tta_flip "
                "(the reduced routes fuse per-view; use 'dense' or 'auto')"
            )
        return "dense"
    dropout_last = cfg.model.dropout_layers == "last"
    pallas_ok = (
        cfg.model.head_final_backend in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and dropout_last
    )
    if mode == "auto":
        # `batch` overrides the batch the >=8 heuristic sees — a DP
        # shard_map launches the kernels at the LOCAL batch B/dp, which is
        # the regime the threshold was measured for.
        eff_batch = images.shape[0] if batch is None else batch
        return (
            "candidates_fused"
            if (
                pallas_ok
                and eff_batch >= 8
                and _candidate_fused_ok(cfg, anchors_per_cell)
            )
            else "dense"
        )
    if mode in ("candidates", "candidates_fused", "stats"):
        if not dropout_last:
            raise ValueError(
                f"reg_finals='{mode}' requires dropout_layers='last' "
                "(the reduced routes apply dropout only at the final conv; "
                "with 'all' they would silently drop trunk dropout)"
            )
        return mode
    if mode == "dense":
        return mode
    raise ValueError(f"unknown reg_finals '{mode}'")


def _as_detections(
    f: fus.FusedDetections, image_hw, output_temperature: float = 1.0
) -> Detections:
    boxes = box_ops.clip_boxes(f.boxes, image_hw)
    probs, scores, entropy = f.probs, f.scores, f.entropy
    if output_temperature != 1.0:
        # Exact in-graph mirror of eval.uncertainty.apply_temperature:
        # softmax(log p / T) on the FUSED categorical, scores/entropy
        # recomputed from the tempered distribution.
        logp = (
            jnp.log(jnp.clip(probs.astype(jnp.float32), 1e-12, 1.0))
            / output_temperature
        )
        probs = jax.nn.softmax(logp, axis=-1)
        scores = jnp.max(probs[..., 1:], axis=-1)
        entropy = -jnp.sum(
            probs * jnp.log(jnp.clip(probs, 1e-12, 1.0)), axis=-1
        )
    classes = (jnp.argmax(probs[..., 1:], axis=-1) + 1).astype(jnp.int32)
    return Detections(
        boxes=boxes,
        covs=f.covs,
        probs=probs,
        scores=scores,
        entropy=entropy,
        classes=jnp.where(f.valid, classes, 0),
        valid=f.valid,
    )


def build_detect_fn(
    cfg: ExperimentConfig,
    model: Optional[RetinaNet] = None,
    mesh=None,
    mesh_cfg=None,
):
    """Build `(variables, images [B,H,W,3], rng) -> Detections`, jittable.

    The returned function closes over static config + trace-time anchor
    constants; it contains no host round-trips (SURVEY.md §7 step 5, the
    minimum slice) and is the unit `bench.py` times.

    mesh/mesh_cfg (optional): a `jax.sharding.Mesh` + MeshConfig for
    latency-oriented serving — pins the MC-sample axis of the sampled head
    outputs to the mesh's `sample` axis, so the N stochastic head passes
    split across devices instead of replicating (SURVEY.md §2 "Sample
    parallelism"). With the XLA head path (`head_final_backend="xla"`)
    this is pure GSPMD sharding constraints; with the Pallas path the
    unsharded kernel would be one opaque custom call GSPMD cannot
    partition, so the mesh route launches the kernel PER SHARD via
    shard_map with absolute mask offsets (mc_forward_fused_sp) — each
    device computes its N/sp samples of its B/dp images with bit-identical
    masks to the unsharded kernel launch. Results match the unsharded
    graph up to reduction order in either backend.
    """
    _MODES = (
        "bayes_od", "nms", "single_pass_nms",
        "black_box", "sampling_free", "anchor_redundancy",
    )
    if cfg.bayes.mode not in _MODES:
        raise ValueError(
            f"unknown post-processing mode '{cfg.bayes.mode}' "
            f"(expected one of {' | '.join(_MODES)})"
        )
    model = model or RetinaNet(cfg=cfg.model, train=False)
    anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
    n_mc = cfg.bayes.num_mc_samples
    # Single-deterministic-pass estimators (dropout off, N=1: zero epistemic
    # covariance, decoded aleatoric only — the paper's sampling-free setup).
    single_pass = cfg.bayes.mode in (
        "single_pass_nms", "sampling_free", "anchor_redundancy"
    )
    if cfg.bayes.epistemic not in ("mc_dropout", "ensemble", "ensemble_mc"):
        raise ValueError(
            f"unknown epistemic source '{cfg.bayes.epistemic}' "
            "(mc_dropout | ensemble | ensemble_mc)"
        )
    # Deep-ensemble sampling: variables carry a leading member axis and the
    # sample axis comes from independent weight sets (models.retinanet.
    # ensemble_forward). Dense post-processing route — members own their
    # backbones, so none of the shared-trunk fast paths apply.
    ensemble = cfg.bayes.epistemic != "mc_dropout" and not single_pass
    if cfg.bayes.epistemic != "mc_dropout" and single_pass:
        raise ValueError(
            f"bayes.mode='{cfg.bayes.mode}' is a single-deterministic-pass "
            "estimator; epistemic='ensemble*' has no effect there — use a "
            "sampled mode (bayes_od | nms | black_box)"
        )

    def detect(variables, images: jnp.ndarray, rng: jax.Array) -> Detections:
        if cfg.bayes.category_temperature != 1.0:
            # Fold the pre-fusion temperature into the cls final conv:
            # softmax((W x + b)/T) tempers the member categoricals BEFORE
            # mean-softmax / clustering / category fusion on every route
            # (weights are jit inputs — two tiny elementwise scales).
            inv_t = 1.0 / float(cfg.bayes.category_temperature)
            params = dict(variables["params"])
            heads = dict(params["heads"])
            cls_out = dict(heads["cls_out"])
            cls_out["kernel"] = cls_out["kernel"] * inv_t
            cls_out["bias"] = cls_out["bias"] * inv_t
            heads["cls_out"] = cls_out
            params["heads"] = heads
            variables = {**dict(variables), "params": params}
        if tuple(images.shape[1:3]) != tuple(cfg.data.image_hw):
            # Trace-time guard: a transposed H/W still yields the same anchor
            # count (h*w commutes), so without this the graph runs and emits
            # garbage boxes against a mismatched anchor grid.
            raise ValueError(
                f"images {images.shape[1:3]} != config image_hw {cfg.data.image_hw}"
            )
        tta = cfg.bayes.tta_flip
        if tta:
            if mesh is not None:
                raise ValueError(
                    "bayes.tta_flip under a mesh is not supported yet "
                    "(run the TTA graph per shard instead)"
                )
            # Both views in ONE batched forward: rows [B:] are the flipped
            # images; the tail pairs row b with row b+B.
            images = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
        if single_pass:
            logits, deltas, log_vars = single_forward(model, variables, images)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            deltas, log_vars = deltas[None], log_vars[None]  # N=1 sample axis
        elif ensemble:
            mc_per_member = (
                n_mc if cfg.bayes.epistemic == "ensemble_mc" else 0
            )
            # Pure-ensemble fused fast path: members have no dropout, so
            # each member is one deterministic pass and the fused
            # candidate-stats kernel (one weight set per launch) runs per
            # member; member-mean stats == M-sample moments (linearity).
            # ensemble_mc keeps the dense route (per-member dropout inside
            # the reduced kernels would need per-member sample offsets).
            dp_here = 1 if mesh is None else mesh.shape[mesh_cfg.data_axis]
            ens_fast = (
                mc_per_member == 0
                and images.shape[0] % dp_here == 0
                and _reg_route(
                    cfg, images, model.anchors_per_cell,
                    batch=images.shape[0] // dp_here,
                )
                == "candidates_fused"
            )
            if ens_fast and mesh is not None:
                n_members = jax.tree_util.tree_leaves(variables)[0].shape[0]
                ens_fast = n_members % mesh.shape[mesh_cfg.sample_axis] == 0
            if ens_fast:
                from bayesod_tpu.models.retinanet import (
                    ensemble_forward_candidates,
                    ensemble_forward_candidates_sp,
                )
                from bayesod_tpu.ops.candidate_reg import tables_for

                tables = tables_for(cfg, model.anchors_per_cell)
                if mesh is None:
                    idx, valid_sel, cand_probs, cand_stats = (
                        ensemble_forward_candidates(
                            model, variables, images,
                            cfg.bayes.pre_cluster_topk,
                            cfg.bayes.score_threshold,
                            cfg.bayes.approx_topk, tables,
                            cfg.bayes.box_scale_factors,
                            cfg.bayes.log_var_clip,
                        )
                    )
                else:
                    idx, valid_sel, cand_probs, cand_stats = (
                        ensemble_forward_candidates_sp(
                            model, variables, images,
                            cfg.bayes.pre_cluster_topk,
                            cfg.bayes.score_threshold,
                            cfg.bayes.approx_topk, tables,
                            mesh, mesh_cfg.data_axis, mesh_cfg.sample_axis,
                            cfg.bayes.box_scale_factors,
                            cfg.bayes.log_var_clip,
                        )
                    )

                def per_image_ens(idx_b, valid_b, probs_b, stats_b):
                    boxes_c, covs_c = mom.moments_from_stats(
                        stats_b, anchors[idx_b], cfg.bayes.box_scale_factors
                    )
                    cand = mom.AnchorPosteriors(
                        boxes=boxes_c, covs=covs_c, probs=probs_b
                    )
                    return _postprocess_posteriors(cand, valid_b, cfg)

                fused = jax.vmap(per_image_ens)(
                    idx, valid_sel, cand_probs, cand_stats
                )
                return _as_detections(
                    fused, cfg.data.image_hw, cfg.bayes.output_temperature
                )
            if mesh is not None:
                # Member-parallel serving: each device runs its member
                # shard's full forwards under shard_map (one psum for the
                # mean softmax). NOT GSPMD sharding constraints — letting
                # GSPMD partition the vmapped-over-weights graph miscompiles
                # the FPN top-down chain (ensemble_forward_sp docstring).
                from bayesod_tpu.models.retinanet import ensemble_forward_sp

                probs, deltas, log_vars = ensemble_forward_sp(
                    model, variables, images, rng, mc_per_member,
                    mesh, mesh_cfg.data_axis, mesh_cfg.sample_axis,
                )
            else:
                from bayesod_tpu.models.retinanet import ensemble_forward

                logits, deltas, log_vars = ensemble_forward(
                    model, variables, images, rng,
                    mc_per_member=mc_per_member,
                )
                probs = jnp.mean(
                    jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                    axis=0,
                )
        elif mesh is None and _reg_route(cfg, images, model.anchors_per_cell) == "stats":
            # In-kernel moment accumulation on both heads: no per-sample
            # tensor reaches HBM (models.retinanet.mc_forward_stats).
            from bayesod_tpu.models.retinanet import mc_forward_stats

            probs, stats = mc_forward_stats(
                model, variables, images, rng, n_mc,
                cfg.bayes.box_scale_factors, cfg.bayes.log_var_clip,
            )

            def per_image_stats(probs_b, stats_b):
                idx, valid = _preselect(
                    probs_b, cfg.bayes.pre_cluster_topk,
                    cfg.bayes.score_threshold, approx=cfg.bayes.approx_topk,
                )
                boxes_c, covs_c = mom.moments_from_stats(
                    stats_b[idx], anchors[idx], cfg.bayes.box_scale_factors
                )
                cand = mom.AnchorPosteriors(
                    boxes=boxes_c, covs=covs_c, probs=probs_b[idx]
                )
                return _postprocess_posteriors(cand, valid, cfg)

            fused = jax.vmap(per_image_stats)(probs, stats)
            return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)
        elif (
            mesh is None
            and _reg_route(cfg, images, model.anchors_per_cell)
            == "candidates_fused"
        ) or (
            mesh is not None
            and mesh.shape[mesh_cfg.sample_axis] == 1
            and images.shape[0] % mesh.shape[mesh_cfg.data_axis] == 0
            and _reg_route(
                cfg, images, model.anchors_per_cell,
                batch=images.shape[0] // mesh.shape[mesh_cfg.data_axis],
            )
            == "candidates_fused"
        ):
            # Fully-fused candidate finals (ops/pallas/candidate_finals.py):
            # gather + masks + finals + moment stats in one kernel; moments
            # reconstructed via moments_from_stats. On a pure data-parallel
            # mesh (sample_parallel=1, batch divisible) the WHOLE body is
            # per-image independent, so it runs under shard_map over the
            # data axis — each device executes the single-chip fast path on
            # its batch slice, with `batch_base` shifting the kernels' mask
            # streams to absolute image indices (bit-identical masks to the
            # unsharded launch; no collectives anywhere in the body).
            from bayesod_tpu.models.retinanet import (
                mc_forward_candidates,
                mc_forward_candidates_det,
            )
            from bayesod_tpu.ops.candidate_reg import tables_for

            tables = tables_for(cfg, model.anchors_per_cell)

            def candidates_fused_body(variables, images, rng, batch_base):
                if cfg.bayes.preselect_source == "deterministic":
                    # Preselect on one dropout-off pass; ALL N-sample work
                    # (both heads) runs only at the K candidates.
                    idx, valid_sel, cand_probs, cand_stats = (
                        mc_forward_candidates_det(
                            model, variables, images, rng, n_mc,
                            cfg.bayes.pre_cluster_topk,
                            cfg.bayes.score_threshold,
                            cfg.bayes.approx_topk, tables,
                            cfg.bayes.box_scale_factors,
                            cfg.bayes.log_var_clip,
                            batch_base=batch_base,
                            scoring=cfg.bayes.preselect_scoring,
                        )
                    )

                    def per_image_det(idx_b, valid_b, probs_b, stats_b):
                        boxes_c, covs_c = mom.moments_from_stats(
                            stats_b, anchors[idx_b],
                            cfg.bayes.box_scale_factors,
                        )
                        cand = mom.AnchorPosteriors(
                            boxes=boxes_c, covs=covs_c, probs=probs_b
                        )
                        return _postprocess_posteriors(cand, valid_b, cfg)

                    fused = jax.vmap(per_image_det)(
                        idx, valid_sel, cand_probs, cand_stats
                    )
                    return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)
                preselect = lambda p: _preselect(
                    p, cfg.bayes.pre_cluster_topk, cfg.bayes.score_threshold,
                    approx=cfg.bayes.approx_topk,
                )
                probs, idx, valid_sel, cand_stats = mc_forward_candidates(
                    model, variables, images, rng, n_mc, preselect, tables,
                    stats=True, scale_factors=cfg.bayes.box_scale_factors,
                    log_var_clip=cfg.bayes.log_var_clip,
                    batch_base=batch_base,
                )

                def per_image_cs(probs_b, idx_b, valid_b, stats_b):
                    boxes_c, covs_c = mom.moments_from_stats(
                        stats_b, anchors[idx_b], cfg.bayes.box_scale_factors
                    )
                    cand = mom.AnchorPosteriors(
                        boxes=boxes_c, covs=covs_c, probs=probs_b[idx_b]
                    )
                    return _postprocess_posteriors(cand, valid_b, cfg)

                fused = jax.vmap(per_image_cs)(
                    probs, idx, valid_sel, cand_stats
                )
                return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)

            if mesh is None:
                return candidates_fused_body(variables, images, rng, 0)

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            local_b = images.shape[0] // mesh.shape[mesh_cfg.data_axis]

            def shard_body(v, im, r):
                base = jax.lax.axis_index(mesh_cfg.data_axis) * local_b
                return candidates_fused_body(v, im, r, base)

            return shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P(), P(mesh_cfg.data_axis), P()),
                out_specs=P(mesh_cfg.data_axis),
                # pallas_call emits outputs without varying-mesh-axis
                # metadata; the out_specs state the layout contract.
                check_vma=False,
            )(variables, images, rng)
        elif mesh is None and _reg_route(cfg, images, model.anchors_per_cell) == "candidates":
            # Candidates-only reg finals: per-sample reg outputs exist ONLY
            # at the preselected anchors (models.retinanet.
            # mc_forward_candidates) — the dense [N, B, A, 8] tensors never
            # reach HBM. (Measured SLOWER than dense end-to-end on v5e —
            # the XLA window gather dominates; kept as an option, the
            # "stats" route is the production reduced path.)
            from bayesod_tpu.models.retinanet import mc_forward_candidates
            from bayesod_tpu.ops.candidate_reg import tables_for

            tables = tables_for(cfg, model.anchors_per_cell)
            preselect = lambda p: _preselect(
                p, cfg.bayes.pre_cluster_topk, cfg.bayes.score_threshold,
                approx=cfg.bayes.approx_topk,
            )
            probs, idx, valid_sel, cand_reg = mc_forward_candidates(
                model, variables, images, rng, n_mc, preselect, tables
            )

            def per_image_cand(probs_b, idx_b, valid_b, cand_b):
                return _postprocess_candidates(
                    probs_b[idx_b],
                    cand_b[..., :4],
                    cand_b[..., 4:],
                    anchors[idx_b],
                    valid_b,
                    cfg,
                )

            fused = jax.vmap(per_image_cand, in_axes=(0, 0, 0, 1))(
                probs, idx, valid_sel, cand_reg
            )
            return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)
        else:
            backend = cfg.model.head_final_backend
            if backend == "auto":
                sp_ok = (
                    mesh is None
                    or (
                        n_mc % mesh.shape[mesh_cfg.sample_axis] == 0
                        and images.shape[0] % mesh.shape[mesh_cfg.data_axis]
                        == 0
                    )
                )
                backend = (
                    "pallas"
                    if jax.default_backend() == "tpu"
                    and cfg.model.dropout_layers == "last"
                    and sp_ok
                    else "xla"
                )
            if mesh is not None and backend == "pallas":
                # Fused kernels per shard (shard_map): each device launches
                # the Pallas dropout+final-conv for its (sample, data)
                # slice with absolute mask offsets — bit-identical samples
                # to the unsharded kernel path, already laid out with the
                # mesh sharding (models.retinanet.mc_forward_fused_sp).
                from bayesod_tpu.models.retinanet import mc_forward_fused_sp

                logits, deltas, log_vars = mc_forward_fused_sp(
                    model, variables, images, rng, n_mc, mesh,
                    mesh_cfg.data_axis, mesh_cfg.sample_axis,
                )
                probs = jnp.mean(
                    jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                    axis=0,
                )
            else:
                probs, deltas, log_vars = mc_forward_probs(
                    model, variables, images, rng, n_mc
                )  # probs [B, A, C+1]; deltas/log_vars [N, B, A, 4]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                mc = mesh_cfg
                sample_nb = NamedSharding(
                    mesh, PartitionSpec(mc.sample_axis, mc.data_axis)
                )
                deltas = jax.lax.with_sharding_constraint(deltas, sample_nb)
                log_vars = jax.lax.with_sharding_constraint(
                    log_vars, sample_nb
                )
                probs = jax.lax.with_sharding_constraint(
                    probs, NamedSharding(mesh, PartitionSpec(mc.data_axis))
                )

        # vmap the per-image post-processing over the batch axis.
        if tta:
            b = probs.shape[0] // 2
            per_image_tta = functools.partial(
                _postprocess_single_tta, anchors=anchors, cfg=cfg
            )
            fused = jax.vmap(per_image_tta, in_axes=(0, 1, 1, 0, 1, 1))(
                probs[:b], deltas[:, :b], log_vars[:, :b],
                probs[b:], deltas[:, b:], log_vars[:, b:],
            )
            return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)
        per_image = functools.partial(_postprocess_single, anchors=anchors, cfg=cfg)
        fused = jax.vmap(per_image, in_axes=(0, 1, 1))(probs, deltas, log_vars)
        return _as_detections(fused, cfg.data.image_hw, cfg.bayes.output_temperature)

    return detect


def jit_detect_fn(cfg: ExperimentConfig, model: Optional[RetinaNet] = None):
    """`build_detect_fn` wrapped in jax.jit (variables/images/rng traced)."""
    return jax.jit(build_detect_fn(cfg, model))
