"""Typed experiment configuration with YAML load + dotted CLI overrides.

The reference drives experiments from per-experiment YAML files plus a few
argparse flags (ref: src/retina_net/experiments/*.py, --yaml_path;
SURVEY.md §5.6). The rebuild keeps the same knob surface (dataset, anchors,
dropout rate, MC sample count, thresholds, schedule) but as frozen nested
dataclasses: hashable, so they can be passed as static args to jit, and typed,
so a misspelled YAML key fails loudly instead of silently training wrong.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import yaml

from bayesod_tpu.ops.anchors import AnchorConfig


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """RetinaNet-with-variance-head architecture knobs (SURVEY.md §2 L4)."""

    num_classes: int = 3  # foreground classes; background handled separately
    backbone: str = "resnet50"
    # Stem layer: "space_to_depth" (TPU-efficient 2x2-block 4x4 conv, the
    # default) or "conv7" (canonical 7x7/s2) — see models/resnet.py.
    stem: str = "space_to_depth"
    fpn_channels: int = 256
    head_depth: int = 4
    head_channels: int = 256
    # MC-dropout site: in both subnet trunks (SURVEY.md §2 "Classification
    # subnet"), active at inference for sampling.
    dropout_rate: float = 0.3
    # Final-layer MC execution: "xla" = vmap over dropout rngs (portable);
    # "pallas" = fused on-chip dropout+final-conv kernel (TPU; requires
    # dropout_layers="last"); "auto" = pallas on TPU else xla.
    head_final_backend: str = "auto"
    # Head-trunk conv precision: "bf16" (exact), "int8" (inside-quant,
    # dynamic scales — measured neutral), or "int8_resident" (activations
    # stay int8 in HBM between the trunk convs, bias+relu+requant fused into
    # each conv epilogue — models/heads.py; needs head_trunk_act_scales and
    # dropout_layers="last". The trunk is ~50% of the serving graph's FLOPs).
    head_trunk_dtype: str = "bf16"
    # Per-site scales for head_trunk_dtype="int8_resident": sorted tuple of
    # ("{cls|reg}/p{level}_{in|conv{i}}", scale) pairs from
    # models/calibration.py:calibrate_serving_scales (YAML dicts coerce).
    head_trunk_act_scales: Optional[Tuple[Tuple[str, float], ...]] = None
    # Candidate-route trunk ROW-TABLE precision: "bf16" (exact), "int8"
    # (both heads), or "int8_reg" (reg table only — for checkpoints whose
    # cls trunk range int8 cannot hold; models/retinanet.head_table_scale).
    # int8 quantizes the trunk outputs the fused candidate kernels stream
    # (one static scale per head — the trunk convs are level-shared, so
    # level ranges match): the kernels' one-hot gather matmuls run
    # int8 x int8 -> int32 at 2x the bf16 MXU rate on half the DMA bytes,
    # and XLA fuses the requant into the trunk's last conv epilogue.
    # Orthogonal to head_trunk_dtype (works on the bf16 graph too); only
    # the candidates_fused routes consume it — dense routes stay bf16.
    head_table_dtype: str = "bf16"
    # Scales for head_table_dtype="int8": (("cls", s), ("reg", s)) from
    # models/calibration.py (trunk-output absmax over the calib batch).
    head_table_scales: Optional[Tuple[Tuple[str, float], ...]] = None
    # FPN conv precision: "bf16" (exact) or "int8_resident" (serving —
    # int8 convs with fused dequant+bias epilogues, adds in fp32;
    # models/fpn.py). Completes the quantized single-pass graph together
    # with backbone_dtype/head_trunk_dtype="int8_resident".
    fpn_dtype: str = "bf16"
    # Per-site scales for fpn_dtype="int8_resident": sites
    # c3,c4,c5,l3,l4,l5,p6r (models/calibration.py).
    fpn_act_scales: Optional[Tuple[Tuple[str, float], ...]] = None
    # Backbone residual-block conv precision:
    #   "bf16"          — exact (training + default serving);
    #   "int8"          — round-1 inside-quant path (block I/O stays bf16 in
    #     HBM; measured neutral end-to-end — kept for comparison);
    #   "int8_resident" — activations LIVE in HBM as int8 between layers:
    #     conv int8xint8->int32, folded-batchnorm scale/shift + relu +
    #     requant fused into the conv epilogue (models/resnet.py). Needs
    #     norm=batchnorm and per-site calibrated scales
    #     (backbone_act_scales; models/calibration.py). Microbench: 1.82x
    #     over bf16 at C3 shape, bytes 5.30 -> 2.90 GB (DESIGN.md §8).
    backbone_dtype: str = "bf16"
    # Static int8 activation scale for the backbone (None = dynamic absmax).
    # Dynamic is robust but costs an extra activation pass; a calibrated
    # static scale keeps quantization fully fused (models/quant.py).
    backbone_act_scale: Optional[float] = None
    # Per-site activation scales for backbone_dtype="int8_resident": sorted
    # tuple of ("stem" | "<block>/q1|q2|out", scale) pairs produced by
    # models/calibration.py:calibrate_backbone_scales (YAML dicts coerce).
    backbone_act_scales: Optional[Tuple[Tuple[str, float], ...]] = None
    # Fused-final matmul precision: "bf16" (exact) or "int8" (2x MXU
    # throughput; dynamic activation + per-channel weight scales, <1%
    # relative logit error — negligible next to MC-dropout noise).
    head_final_dtype: str = "bf16"
    # Regression-final execution:
    #   "dense"      — per-sample reg maps for every anchor cell;
    #   "stats"      — per-anchor moment statistics accumulated INSIDE the
    #     fused kernel across samples (dropout_final_reg_stats +
    #     moments_from_stats; exactly mc_box_moments' math, no per-sample
    #     tensor in HBM);
    #   "candidates" — per-sample outputs computed ONLY at the preselected
    #     top-k anchors (ops/candidate_reg.py + the one-hot-matmul Pallas
    #     gather): 0.6% of the cells do reg work instead of all of them.
    #     750.8 vs 598.5 img/s dense on v5e (batch 128; pre-hoist-fix
    #     absolutes — the ratio is the honest part, BASELINE.md) once every indexed
    #     access was de-gather-ified — XLA's TPU gather lowers to serial
    #     dynamic slices and one take_along_axis cost 130 ms/batch;
    #   "candidates_fused" — ONE Pallas kernel per image: streamed one-hot
    #     gather + in-register masks + finals + moment statistics
    #     (ops/pallas/candidate_finals.py): 799.8 img/s pre-hoist-fix
    #     (tail-knob ratios honest, absolutes inflated — BASELINE.md);
    #   "auto" (default) — candidates_fused for batch >= 8 on the pallas
    #     backend, dense otherwise (small batches favor the simpler graph).
    reg_finals: str = "auto"
    # MC class-probability reduction on the pallas backend: "flat" =
    # materialize per-sample logits, reduce in XLA; "fused" = mean softmax
    # accumulated inside the final-conv kernel (the [N,B,A,C+1] tensor never
    # reaches HBM — models/retinanet.py mc_forward_probs). Measured on v5e:
    # fused wins throughput (598.5 vs 560.9 img/s @ batch 128; +33% at BDD
    # shapes) but loses batch-1 latency (4.8 vs 3.8 ms — the output-block
    # accumulation serializes samples with no batch to overlap). "auto"
    # (default) picks fused for batch >= 8, flat below.
    probs_reduce: str = "auto"
    # Dropout placement: "last" = one dropout after the final trunk conv
    # (MC samples share the whole deterministic trunk; ~10x cheaper sampling
    # — the TPU-first flagship default), "all" = dropout after every trunk
    # conv (reference-style interleaving; SURVEY.md §2 [R:med]).
    dropout_layers: str = "last"
    prior_prob: float = 0.01  # focal-loss final-bias init pi
    norm: str = "batchnorm"  # "batchnorm" | "groupnorm"
    # Normalization in the FPN convs / head-trunk convs ("none" |
    # "batchnorm"). The reference's FPN+heads are norm-free (canonical
    # RetinaNet trained with SGD); under AdamW's scale-free updates a
    # norm-free conv stack inflates without bound — the round-3 flagship run
    # reached |logit| ~ 5.9e6 (bf16 resolution ~4096 at that magnitude), so
    # class-discriminative gradients were quantized away and the classifier
    # froze at uniform (runs/flagship_eval, DESIGN.md §8). BatchNorm bounds
    # the activations by construction and — unlike GroupNorm — folds into
    # the conv epilogues at serving (models/quant.py BNFold), so the bf16
    # AND int8-resident serving graphs keep their measured cost. Head-trunk
    # BN is per-LEVEL (params + stats) while the convs stay level-shared:
    # P3 and P7 activation statistics differ by orders of magnitude.
    fpn_norm: str = "batchnorm"
    head_norm: str = "batchnorm"
    # Model-side clamp on the regression log-variance outputs (encoded
    # space). The loss clips tighter (log_var_clip=10) so training is
    # unaffected; this bounds what DETECT-time consumers exp() at anchors
    # the regression loss never supervised (negatives), where the raw head
    # output is unconstrained (round-3 flagship: raw log_vars hit -8640,
    # exploding black_box's gaussian NLL to ~2e5 — runs/flagship_eval).
    log_var_bound: float = 16.0
    compute_dtype: str = "bfloat16"  # conv/matmul dtype; stats stay fp32

    def uses_batch_stats(self) -> bool:
        return "batchnorm" in (self.norm, self.fpn_norm, self.head_norm)


@dataclasses.dataclass(frozen=True)
class BayesConfig:
    """MC-dropout sampling + BayesOD post-processing knobs (paper §III)."""

    num_mc_samples: int = 10
    # Epistemic-uncertainty source for the sampled estimators (bayes_od /
    # nms / black_box). The reference supports MC dropout only; deep
    # ensembles are the standard alternative the paper compares against in
    # spirit (independent weight sets instead of shared-weight dropout):
    #   "mc_dropout"  — N dropout passes of ONE weight set (reference
    #                   semantics; all fused fast paths available)
    #   "ensemble"    — one deterministic pass per ensemble member; the
    #                   detect fn then expects variables stacked on a
    #                   leading member axis (Detector.from_ensemble /
    #                   models.retinanet.stack_variables). Sample axis
    #                   S = M members.
    #   "ensemble_mc" — num_mc_samples dropout passes PER member
    #                   (S = M * num_mc_samples), composing both sources.
    # Ensemble modes vmap the FULL network over the member axis (members
    # have independent backbones, so there is no shared trunk to amortize)
    # and post-process on the dense route.
    epistemic: str = "mc_dropout"
    # Flip test-time augmentation, fused BAYESIANLY: the horizontally
    # flipped view's per-anchor posteriors are mapped back to original
    # coordinates (boxes mirrored, covariances L Sigma L^T) and join the
    # same clustering + fusion as ADDITIONAL MEASUREMENTS of each object —
    # 2x candidates per cluster, sharper fused posteriors, 2x head compute
    # (both views run in ONE batched forward). Dense route only (the
    # reduced fused kernels skip it; reg_finals='auto' falls back).
    tta_flip: bool = False
    # Post-hoc calibration temperature applied to the FUSED output
    # categoricals (probs^(1/T) renormalized; scores/entropy recomputed).
    # This is exactly eval.uncertainty.apply_temperature, so a T fitted by
    # fit_temperature on dumped detections reproduces the report's
    # ece_calibrated at serving time. 1.0 = off. (Detector.with_temperature
    # sets it; the 'logits' variant there tempers per-sample logits instead,
    # which does NOT commute with softmax-mean + fusion.)
    output_temperature: float = 1.0
    # PRE-fusion calibration temperature on the classification logits
    # (logits/T before every softmax): unlike output_temperature it reshapes
    # the MEMBER categoricals that clustering scores and category fusion
    # (likelihood product / Dirichlet counts) consume, so it changes the
    # fusion weights themselves — the knob eval.uncertainty.fit_temperature's
    # measured T (flagship: ~6.5, heavily overconfident) plugs into.
    # Implemented by scaling the cls_out kernel/bias by 1/T at detect time
    # (exact: softmax((Wx+b)/T)), so every route — dense, fused Pallas,
    # candidates, ensembles — tempers identically. NOTE score_threshold and
    # preselection then act on tempered scores (inherent to tempering).
    # 1.0 = off.
    category_temperature: float = 1.0
    score_threshold: float = 0.5
    pre_cluster_topk: int = 512  # static k kept after score preselect
    # Preselection score source (candidates_fused route only):
    #   "mc_mean" (default) — top-k on the N-sample mean-softmax scores,
    #     the reference's exact semantics (requires dense MC cls finals);
    #   "deterministic" — top-k on ONE dropout-off pass; the N-sample mean
    #     softmax is then computed only at the K candidates (fusion's
    #     categoricals stay exact MC means — only the *ordering* of
    #     borderline candidates can differ). Measured 1039.8 vs 799.8
    #     img/s on v5e (batch 128; pre-hoist-fix absolutes — deterministic
    #     preselect is itself hoistable, so the honest delta needs the
    #     round-3 bench; BASELINE.md).
    preselect_source: str = "mc_mean"
    # Score function for the DETERMINISTIC preselect's anchor ordering:
    #   "softmax" (default) — max foreground softmax (reference semantics);
    #   "margin" — max foreground logit minus background logit: the exact
    #     same ordering for num_classes == 1 (softmax is monotone in the
    #     one margin) and an ordering surrogate otherwise, skipping the
    #     dense [B, A, C+1] softmax entirely (VPU work on every anchor).
    #     Selection is ordering-only — the validity gate downstream reads
    #     the exact MC-mean categorical either way (see preselect_source).
    preselect_scoring: str = "softmax"
    # TPU-native approximate top-k for the candidate preselect (recall 0.99
    # vs exact; preselection is a heuristic filter). False = exact sort.
    approx_topk: bool = True
    # Candidate-kernel table layout (candidates_fused route): None = level-
    # major/row-major (a 512-row stream chunk at P3 spans a full image-width
    # band, so clustered candidates still touch most chunks and the kernels'
    # sparse-chunk skip is neutral — measured +1.3%, DESIGN.md §8). "THxTW"
    # (e.g. "16x32") reorders the flat table tile-major with stream chunk
    # TH*TW, making a chunk an image TILE so the skip's gather MACs scale
    # with spatial candidate occupancy. Same numerics either way (layout is
    # a bijection on real rows; the dropout-mask stream keys on row ids, so
    # draws differ between layouts but are distributionally identical).
    candidate_tile: Optional[str] = None
    # Reorder each image's candidates by table row before the fused
    # candidate kernels (outputs restored to score-ranked order by an
    # exact HIGHEST-precision one-hot matmul) and gate the gather in
    # 128-row blocks so its MACs/VPU work scale with the candidates' row
    # SPAN. Numerically exact either way (dropout masks key on absolute
    # row ids; sorted==unsorted pinned bit-exact by
    # tools/tpu_detect_parity_probe.py). MEASURED NEUTRAL-NEGATIVE at
    # production scale (842.5 vs 853.2 img/s — the gating overhead eats
    # the savings; the 45.8 ms finals segment is NOT gather-dominated,
    # DESIGN.md §8 round-5 ledger), so the default stays off; the knob
    # ships for candidate distributions sparser than the flagship's.
    candidate_sort: bool = False
    # Candidate-kernel table delivery (ops/pallas/candidate_finals.py):
    #   "dma"      — unconditional double-buffered chunk stream (round-3
    #                formulation; reads the WHOLE table every launch)
    #   "gated"    — chunk copy issued ONLY for occupied chunks: stream
    #                bytes scale with spatial candidate occupancy like the
    #                skip's MACs (round-5; the skip-samples probe showed
    #                the unconditional stream was the kernel's byte floor)
    #   "resident" — whole per-image table as a pipeline-managed VMEM
    #                block (measured neutral vs dma; for big-VMEM parts)
    #   "auto"     — resident when the table fits a 12 MB gate, else dma
    # All four are BIT-identical (same chunk loop and math; pinned by
    # TestResidentTable + tools/tpu_detect_parity_probe.py).
    candidate_table_input: str = "dma"
    affinity_threshold: float = 0.7  # IoU to join a cluster (paper §III.B)
    max_detections: int = 100  # static cluster/output count
    nms_iou_threshold: float = 0.5  # greedy-NMS baseline mode
    # Post-processing estimator (paper §III-IV; SURVEY.md §2 "Baseline
    # post-processing modes"):
    #   "bayes_od"         — MC sampling + clustering + Bayesian fusion
    #   "nms"              — MC sampling + greedy NMS (no fusion)
    #   "single_pass_nms"  — one deterministic pass + greedy NMS
    #   "black_box"        — MC sampling + clustering + EMPIRICAL mean/cov
    #                        over members (paper §IV "Black Box" estimator)
    #   "sampling_free"    — one deterministic pass + greedy NMS, decoded
    #                        aleatoric covariance as the box uncertainty
    #                        (paper §IV sampling-free baseline)
    #   "anchor_redundancy"— one deterministic pass + clustering + empirical
    #                        mean/cov over the redundant anchors per object
    mode: str = "bayes_od"
    # Gaussian fusion prior (paper §III.B): "measurement" treats every
    # member as a measurement; "center" makes the cluster center's posterior
    # the explicit prior. Algebraically identical (center is one member) —
    # see bayes/fusion.fuse_clusters.
    box_fusion_prior: str = "measurement"
    # Greedy-clustering implementation: "auto" = Pallas kernel on TPU, jnp
    # elsewhere; "pallas" / "xla" force one (SURVEY.md §7 step 8).
    clustering_backend: str = "auto"
    # Category fusion rule (paper §III.C): "likelihood" (conjugate product)
    # or "dirichlet" (pseudo-count sum -> Dirichlet mean).
    category_fusion: str = "likelihood"
    # Informative category prior (paper §III.C): per-class values fused into
    # every cluster posterior — log-probabilities for "likelihood" fusion,
    # Dirichlet concentration offsets for "dirichlet". None = non-informative
    # (uniform / unit). Use fusion.category_prior_from_frequencies to build
    # one from training-set class counts.
    category_prior: Optional[Tuple[float, ...]] = None
    box_scale_factors: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    cov_jitter: float = 1e-3  # fp32 jitter added before 4x4 precision inverse
    log_var_clip: float = 10.0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "kitti"  # "kitti" | "bdd" | "coco" | "synthetic"
    data_dir: str = "data/kitti"
    # Static padded shape; must divide 2^max_level (fixed shapes for XLA).
    image_hw: Tuple[int, int] = (384, 1280)
    max_gt_boxes: int = 64  # GT padded to fixed count per image
    synthetic_size: int = 512  # examples per split for dataset="synthetic"
    # Max rectangles per synthetic image (uniform 1..N). Round-3 postmortem:
    # this was silently unplumbed — make_dataset always built the handler at
    # its default 4 regardless of config (runs/flagship_eval had 240 GT over
    # 96 images where the config implied ~12/image).
    synthetic_max_objects: int = 4
    # Memoize prepared (resized/padded) examples in host RAM across epochs.
    # Semantically identical for deterministic handlers (all of ours);
    # costs ~1.5 MB/image at flagship shape. Essential for synthetic
    # benchmark/training runs on few-core hosts: regeneration measured
    # 15-65 ms/img (loader-bound at 7.7 img/s on the 1-vCPU bench host vs
    # the 130 img/s device rate); from cache the loader feeds at device
    # rate from epoch 2. Off by default (real datasets can exceed RAM).
    cache_examples: bool = False
    augment_flip: bool = True
    # SSD-style brightness/contrast/saturation jitter inside the train jit
    # (data/preprocess.photometric_jitter_batch; boxes untouched). The
    # reference augments with flips only — off by default for parity.
    augment_photometric: bool = False
    # Random zoom in/out range (min, max) at fixed canvas shape via
    # jax.image.scale_and_translate — traced scale, static output shape
    # (data/preprocess.random_scale_jitter_batch). None = off (parity).
    augment_scale: Optional[Tuple[float, float]] = None
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8  # global batch (sharded over the mesh data axis)
    optimizer: str = "sgd"  # "sgd" | "adamw"
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_steps: int = 500
    total_steps: int = 90000
    # LR schedule after warmup: "step" (piecewise decay at lr_decay_steps by
    # lr_decay_factor — the reference-style detection schedule, SURVEY.md §2
    # "Trainer") or "cosine" (decay to base_lr*lr_min_factor over
    # total_steps; lr_decay_steps/factor ignored).
    lr_schedule: str = "step"
    lr_decay_steps: Tuple[int, ...] = (60000, 80000)
    lr_decay_factor: float = 0.1
    lr_min_factor: float = 0.0  # cosine floor, as a fraction of base_lr
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Focal-loss backward implementation: "autodiff" (checkpointed reverse
    # mode; XLA auto-compresses its saves on this build) or "custom" (the
    # hand-derived closed-form VJP in losses.py — one fused elementwise
    # pass recomputed from the bf16 logits). Gradient-parity pinned by
    # tests/test_losses.py; measured on TPU in DESIGN.md §8 (VERDICT r4
    # weak 6: measure, don't relabel untried as irreducible).
    focal_backward: str = "autodiff"
    # Anchor<->GT matching thresholds (canonical RetinaNet; SURVEY.md §2).
    match_iou_positive: float = 0.5
    match_iou_negative: float = 0.4
    regression_weight: float = 1.0
    # Attenuated-NLL residual: "huber" (smooth-L1, detection standard — keeps
    # the exp(-s)-amplified error term Lipschitz in mu) or "l2" (pure
    # Kendall-Gal Gaussian NLL). SURVEY.md §2 "Regression NLL" notes the
    # reference's exact residual is unverifiable; both ship.
    residual: str = "huber"
    # Linear ramp of the loss-attenuation weight from plain residual (step 0)
    # to the full Kendall-Gal NLL (this step). Early residuals are large, so
    # the NLL's ds gradient otherwise dominates and trips grad clipping every
    # step; 0 disables the ramp (attenuation on from step 0).
    variance_warmup_steps: int = 2000
    # z-loss (PaLM-style): zloss_weight * mean(logsumexp(logits)^2) over all
    # anchors. Softmax losses are invariant to the logit common mode, so
    # nothing else anchors the classifier's output scale; under AdamW the
    # scale random-walks upward until bf16/fp32 rounding kills the class
    # gradients (the round-3 flagship failure — ModelConfig.head_norm note).
    # This term pins logsumexp ~ 0 with negligible force at healthy scales
    # (penalty ~ 1e-4 * 100 at |logit| ~ 10). 0 disables.
    zloss_weight: float = 1e-4
    grad_clip_norm: float = 10.0
    # Gradient accumulation (optax.MultiSteps): average grads over this many
    # train_step calls before ONE optimizer update — an effective batch of
    # batch_size*grad_accum_steps in batch_size memory. All step quantities
    # in this config (warmup/total/decay/variance_warmup) keep counting
    # train-step CALLS; make_lr_schedule converts spans to optimizer-update
    # counts internally so the anneal completes at total_steps for any
    # value here. 1 = off.
    grad_accum_steps: int = 1
    # Rematerialization of the forward pass in the backward ("none" |
    # "full" | "blocks"). "full" wraps the whole model apply in
    # jax.checkpoint — measured dead end (XLA materializes the recomputed
    # forward to HBM, bytes go UP; DESIGN.md §8). "blocks" wraps each
    # backbone residual block in nn.remat instead: only block-boundary
    # tensors stay saved, each block's inner conv/bn/relu intermediates are
    # recomputed in the backward at a granularity small enough to stay
    # fused into its consumers. The train step is HBM-bound, so bytes are
    # the budget; measured effect documented in DESIGN.md §8.
    remat: str = "none"
    # Exponential moving average of the weights (0 = off). With decay d the
    # state carries ema_params updated as e <- d*e + (1-d)*p every step
    # (initialized AT the init params, no debias term); checkpoints include
    # them, and Detector.from_checkpoint(..., use_ema=True) serves them.
    # Standard production-serving smoother; the reference has no equivalent.
    ema_decay: float = 0.0
    checkpoint_every: int = 2500
    checkpoint_dir: str = "data/outputs/default/checkpoints"
    log_every: int = 100
    # Periodic val-loss evaluation (train/step.build_eval_step): every
    # `eval_every` steps run `eval_batches` fixed val batches through a
    # no-update, no-dropout, no-augmentation forward and log mean losses
    # under val/. 0 = off (reference behavior: no in-training eval).
    eval_every: int = 0
    eval_batches: int = 8
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (no reference counterpart; SURVEY.md §5.8)."""

    data_axis: str = "data"
    sample_axis: str = "sample"
    data_parallel: int = -1  # -1: all devices on the data axis
    sample_parallel: int = 1  # shard MC samples across devices (serving mode)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "retinanet_kitti"
    model: ModelConfig = ModelConfig()
    anchors: AnchorConfig = AnchorConfig()
    bayes: BayesConfig = BayesConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()


_SECTIONS = {
    "model": ModelConfig,
    "anchors": AnchorConfig,
    "bayes": BayesConfig,
    "data": DataConfig,
    "train": TrainConfig,
    "mesh": MeshConfig,
}


def _coerce(field: dataclasses.Field, value: Any) -> Any:
    """Coerce YAML/CLI values into the declared field type: lists -> tuples,
    dicts -> sorted tuples of pairs (configs must stay hashable for jit)."""
    if isinstance(value, list):
        return tuple(
            tuple(v) if isinstance(v, list) else v for v in value
        )
    if isinstance(value, dict):
        return tuple(sorted(value.items()))
    return value


def _build_section(cls, overrides: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in overrides.items():
        if key not in fields:
            raise KeyError(f"unknown config key {cls.__name__}.{key}")
        kwargs[key] = _coerce(fields[key], value)
    return cls(**kwargs)


def config_from_dict(raw: Dict[str, Any]) -> ExperimentConfig:
    """Build an ExperimentConfig from a nested dict (YAML-shaped)."""
    kwargs: Dict[str, Any] = {}
    for key, value in raw.items():
        if key in _SECTIONS:
            kwargs[key] = _build_section(_SECTIONS[key], value or {})
        elif key == "name":
            kwargs["name"] = value
        else:
            raise KeyError(f"unknown config section '{key}'")
    return ExperimentConfig(**kwargs)


def load_config(yaml_path: str, overrides: Optional[Dict[str, Any]] = None):
    """Load YAML config, then apply dotted `section.key=value` overrides."""
    with open(yaml_path) as f:
        raw = yaml.safe_load(f) or {}
    for dotted, value in (overrides or {}).items():
        section, _, key = dotted.partition(".")
        if not key:
            raw[section] = value
        else:
            raw.setdefault(section, {})[key] = value
    return config_from_dict(raw)


def config_to_dict(cfg: ExperimentConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _yamlable(value):
    """Tuples -> lists recursively (yaml.safe_dump rejects python tuples);
    load_config's _coerce restores them."""
    if isinstance(value, tuple):
        return [_yamlable(v) for v in value]
    if isinstance(value, dict):
        return {k: _yamlable(v) for k, v in value.items()}
    return value


def save_config(cfg: ExperimentConfig, yaml_path: str) -> str:
    """Dump a config to YAML such that load_config round-trips it exactly —
    including calibrated int8-resident activation scales, so a quantized
    serving config can be saved once and reused without recalibrating."""
    with open(yaml_path, "w") as f:
        yaml.safe_dump(_yamlable(config_to_dict(cfg)), f, sort_keys=False)
    return yaml_path


def parse_override(text: str) -> Tuple[str, Any]:
    """Parse a CLI `section.key=value` override, YAML-decoding the value."""
    dotted, _, raw_value = text.partition("=")
    if not raw_value:
        raise ValueError(f"override '{text}' is not of the form key=value")
    return dotted, yaml.safe_load(raw_value)
