"""Headline benchmark: BayesOD images/sec/chip @ 10 MC-dropout samples.

Measures the flagship path (BASELINE.json:2): RetinaNet-ResNet50 on KITTI
shapes (384x1280), 10 MC samples, full BayesOD post-processing (clustering +
fusion) — everything inside one jit graph, batched. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is the ratio to the driver-set north-star target of 500
images/sec/chip on TPU v5e (the reference publishes no throughput numbers —
SURVEY.md §6; architecturally it runs ~O(seconds/image) on one GPU).

Flags: --batch N --iters N --warmup N --samples N --tiny (CI-sized model).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: repeat bench runs skip the multi-minute
# TPU-tunnel compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bayesod")

import jax
import jax.numpy as jnp
import numpy as np


def _load_calibration(path: str, key: str):
    """Committed int8 calibration cache: the capture pass is deterministic
    in (init seed, calib batch, model config), so its result ships in
    configs/bench_calibration.yaml instead of being recomputed over the
    tunnel every bench run (~183 s of BENCH_r03's wall time)."""
    import yaml

    try:
        with open(path) as fh:
            data = yaml.safe_load(fh) or {}
    except FileNotFoundError:
        return None
    entry = data.get(key)
    if entry is None:
        return None

    def t(d):
        return tuple(sorted((str(k), float(v)) for k, v in d.items()))

    return (
        t(entry["backbone"]), t(entry["fpn"]),
        t(entry["trunk"]), t(entry["table"]),
    )


def _save_calibration(path: str, key: str, scales) -> None:
    import yaml

    try:
        with open(path) as fh:
            data = yaml.safe_load(fh) or {}
    except FileNotFoundError:
        data = {}
    backbone, fpn, trunk, table = scales
    data[key] = {
        "backbone": {k: float(v) for k, v in backbone},
        "fpn": {k: float(v) for k, v in fpn},
        "trunk": {k: float(v) for k, v in trunk},
        "table": {k: float(v) for k, v in table},
    }
    with open(path, "w") as fh:
        yaml.safe_dump(data, fh, sort_keys=True)


def main() -> None:
    p = argparse.ArgumentParser()
    # Honest (hoist-proofed) batch sweep on v5e-1: bf16 128 -> 476.3,
    # 160 -> 445.2, 256 -> 463.3; full int8-resident 128 -> 622.0 (best).
    # Default = 128, the measured optimum for both graphs.
    # None resolves post-parse: 32 for --train (batch 128's train graph
    # does not fit 16 GB HBM — measured OOM 30.7G), 128 otherwise (the
    # serving optimum).
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--samples", type=int, default=10)
    p.add_argument(
        # None resolves to 256 for the plain/--segment throughput bench
        # (775.0 img/s with int8 tables = 1.55x; halving topk is accuracy-
        # POSITIVE on the ablation — the deep score-ranked candidate tail
        # is junk that degrades fusion, tools/topk_ablation.py + DESIGN.md
        # §8) and 512 (the library config default) everywhere else.
        "--topk", type=int, default=None,
        help="bayes.pre_cluster_topk — candidate count for the fused "
        "finals (multiple of 128); the candidate kernels' one-hot gather "
        "FLOPs scale linearly in it",
    )
    p.add_argument("--tiny", action="store_true", help="CI-sized model")
    p.add_argument(
        "--weights_npz", default=None,
        help="load trained weights (tools/export_weights.py archive) into "
        "the bench model and feed synthetic SCENES instead of uniform "
        "noise — trained weights on scenes give the production candidate "
        "distribution (random-init scores degenerate-tie-break the top-k "
        "into the first table chunks, a spuriously EASY case for the "
        "chunk skip). None resolves to the committed flagship checkpoint "
        "(data/outputs/flagship_r4/weights.npz) for the plain/--segment "
        "KITTI-shape bench when the file exists; 'none' forces random "
        "init",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force CPU backend (mechanics check; not a perf number)",
    )
    p.add_argument("--mode", default="bayes_od")
    p.add_argument(
        "--hw", type=int, nargs=2, default=None, metavar=("H", "W"),
        help="padded image shape (default 384 1280 KITTI; 768 1280 = BDD)",
    )
    p.add_argument(
        "--classes", type=int, default=3,
        help="foreground classes (3 KITTI, 10 BDD)",
    )
    p.add_argument(
        "--train", action="store_true",
        help="measure the training step instead of inference",
    )
    p.add_argument(
        "--loader", action="store_true",
        help="measure host input-pipeline throughput (no TPU touched)",
    )
    p.add_argument(
        "--focal_backward", default="autodiff",
        choices=["autodiff", "custom"],
        help="--train: focal-loss backward (custom = hand-derived VJP)",
    )
    p.add_argument(
        "--remat", default="none", choices=["none", "full", "blocks"],
        help="train-step forward rematerialization (TrainConfig.remat; "
        "'blocks' = per-residual-block nn.remat, the selective variant)",
    )
    p.add_argument(
        "--latency", action="store_true",
        help="single-image serving latency (batch 1, flat/dense route): "
        "chained-iterations mean ms/image (the tunnel makes per-iteration "
        "percentiles unmeasurable; the graph is deterministic-shape, so "
        "mean ~= p50)",
    )
    p.add_argument(
        "--roofline", action="store_true",
        help="compile-only: print XLA cost analysis + v5e compute/HBM "
        "floors for the configured graph (Pallas custom-call bytes are NOT "
        "counted by XLA — add kernel I/O manually, see DESIGN.md §8)",
    )
    p.add_argument(
        "--loader_format", default="png", choices=["png", "jpg"],
        help="on-disk image codec for --loader (KITTI ships PNG, BDD JPEG)",
    )
    p.add_argument(
        "--loader_images", type=int, default=192,
        help="distinct images materialized for --loader",
    )
    p.add_argument(
        "--workers", type=int, default=8,
        help="loader decode threads (--loader)",
    )
    p.add_argument(
        # int8 default: the fused final convs quantize with dynamic
        # activation + per-channel weight scales (<=3% relative logit error,
        # identical dropout masks — pinned by tests/test_fused_final.py);
        # --head_dtype bf16 gives the exact-numerics figure.
        "--head_dtype", default="int8", choices=["bf16", "int8"],
        help="fused final-conv matmul precision",
    )
    p.add_argument(
        # int8_resident: trunk activations stay int8 in HBM (bias+relu+
        # requant conv epilogues, calibrated at startup). The trunks are
        # ~50% of the serving graph's FLOPs. "int8" is the round-1
        # inside-quant path (measured neutral). DEFAULT int8_resident:
        # the production serving graph (622.0 img/s @ b128 = 1.24x target;
        # PTQ ablation mAP -0.002 / PDQ -0.001 vs bf16, DESIGN.md §8).
        # Pass bf16 for the exact-numerics graph (476.3 @ b128). The
        # LIBRARY default stays bf16 — this is the perf bench's default,
        # and it applies only to the plain/--segment throughput bench:
        # --train/--latency/--serve/--ensemble/--tiny resolve a None
        # default to bf16 (see post-parse resolution below).
        "--trunk_dtype", default=None,
        choices=["bf16", "int8", "int8_resident"],
        help="head-trunk conv precision",
    )
    p.add_argument(
        # int8_resident: activations stay int8 in HBM between layers with
        # folded-batchnorm conv epilogues (calibrated on the bench batch at
        # startup; models/calibration.py). "int8" is the round-1
        # inside-quant path, kept for comparison (measured neutral).
        # Default int8_resident — see --trunk_dtype note.
        "--backbone_dtype", default=None,
        choices=["bf16", "int8", "int8_resident"],
        help="backbone residual-block conv precision",
    )
    p.add_argument(
        "--backbone_act_scale", type=float, default=None,
        help="static int8 activation scale (None = dynamic absmax)",
    )
    p.add_argument(
        # int8 row tables for the fused candidate kernels: the one-hot
        # gather matmuls (K9 x R x C MACs, THE finals cost) run int8 at 2x
        # MXU rate on half the DMA bytes; one calibrated scale per head.
        # Orthogonal to the other dtype knobs (works on the bf16 graph).
        # None resolves to int8 for the plain/--segment throughput bench
        # (670.0 alone, 775.0 with topk 256 @ b128), bf16 elsewhere.
        "--table_dtype", default=None,
        choices=["bf16", "int8", "int8_reg"],
        help="candidate-kernel trunk row-table precision",
    )
    p.add_argument(
        "--fpn_dtype", default=None,
        choices=["bf16", "int8_resident"],
        help="FPN conv precision (int8_resident calibrates at startup; "
        "default int8_resident — see --trunk_dtype note)",
    )
    p.add_argument(
        "--probs_reduce", default="auto", choices=["auto", "flat", "fused"],
        help="MC class-prob reduction: XLA flat or in-kernel softmax-mean",
    )
    p.add_argument(
        # deterministic preselect default: honest 1.22x (476.3 vs 391.0 at
        # bf16 b128) with no measurable accuracy cost (DESIGN.md
        # "deterministic preselect" — mAP/MUE/PDQ deltas inside the route
        # noise band on the trained synthetic model). --preselect mc_mean
        # gives the reference-exact candidate ordering.
        "--preselect", default="deterministic",
        choices=["mc_mean", "deterministic"],
        help="preselection score source (bayes.preselect_source)",
    )
    p.add_argument(
        "--preselect_scoring", default="softmax",
        choices=["softmax", "margin"],
        help="deterministic-preselect anchor ordering "
        "(bayes.preselect_scoring; margin skips the dense softmax)",
    )
    p.add_argument(
        "--reg_finals", default="auto",
        choices=["auto", "dense", "stats", "candidates", "candidates_fused"],
        help="regression-final execution strategy",
    )
    p.add_argument(
        "--ensemble", type=int, default=0, metavar="M",
        help="bench the deep-ensemble estimator: M random members, one "
        "deterministic pass each (bayes.epistemic='ensemble'; dense route)",
    )
    p.add_argument(
        "--serve", action="store_true",
        help="online-serving bench: concurrent clients -> DetectionServer "
        "dynamic batching -> device; reports sustained img/s + request "
        "latency percentiles (includes host resize/pad + D2H fetch per "
        "batch — the end-to-end serving number, not the device-only rate)",
    )
    p.add_argument(
        "--clients", type=int, default=None,
        help="concurrent serve clients (default 2x batch)",
    )
    p.add_argument(
        "--serve_seconds", type=float, default=10.0,
        help="measured window for --serve (after a 30%% warm period)",
    )
    p.add_argument(
        "--serve_delay_ms", type=float, default=5.0,
        help="DetectionServer max_delay_ms batching window",
    )
    p.add_argument(
        "--segment", default="full",
        choices=["full", "backbone", "features", "trunks", "preselect",
                 "preselect_conv", "preselect_score", "finals"],
        help="chain only a prefix of the serving graph (hoist-proofed, same "
        "harness): honest per-stage decomposition. 'features' = backbone+"
        "FPN; 'trunks' adds the deterministic head trunks; 'finals' adds "
        "preselect + the fused N-sample candidate finals (everything except "
        "clustering/fusion); full-minus-finals is the post-processing tail",
    )
    p.add_argument(
        "--candidate_sort", default="off", choices=["on", "off"],
        help="row-sort candidates + 128-row block-gated gather "
        "(bayes.candidate_sort; measured neutral-negative at production "
        "scale — 842.5 vs 853.2 — default off)",
    )
    p.add_argument(
        "--tile", default=None, metavar="THxTW",
        help="candidate-table tile layout (bayes.candidate_tile, e.g. "
        "'16x32'): tile-major table rows + stream chunk TH*TW so the "
        "candidate kernels' sparse-chunk skip scales gather MACs with "
        "spatial candidate occupancy (round-5 lever; default row-major)",
    )
    p.add_argument(
        "--calibration_yaml", default="configs/bench_calibration.yaml",
        help="committed int8 calibration cache (capture is deterministic "
        "in init seed + calib batch + model config; see _load_calibration)",
    )
    p.add_argument(
        "--recalibrate", action="store_true",
        help="force a fresh capture pass and refresh the YAML entry",
    )
    p.add_argument(
        "--linearity", action="store_true",
        help="after the measurement, verify elapsed time scales linearly "
        "in --iters (iters/2 and 2x iters under the same compile) and "
        "cross-check with per-iteration scalar fetches — catches any "
        "residual loop-invariant hoisting or early-return tunnel artifacts",
    )
    args = p.parse_args()
    if args.batch is None:
        args.batch = 32 if args.train else 128

    # Dtype-default resolution: the plain / --segment throughput bench
    # defaults to the production int8-resident serving graph (the honest
    # best, 622.0 img/s @ b128 = 1.24x target); every other mode defaults
    # to bf16 — training IS bf16 by design, --ensemble is exclusive with
    # calibration (one weight set), --tiny uses groupnorm (no BN folding),
    # and --latency/--serve keep their recorded bf16 semantics. Explicit
    # flags always win.
    bf16_default = (
        args.train or args.ensemble or args.latency or args.serve
        or args.tiny or args.loader
    )
    default_dtype = "bf16" if bf16_default else "int8_resident"
    for _flag in ("trunk_dtype", "backbone_dtype", "fpn_dtype"):
        if getattr(args, _flag) is None:
            setattr(args, _flag, default_dtype)
    # Round-3 finals levers (same resolution rule): int8 candidate row
    # tables + topk 256 are the production throughput operating point
    # (775.0 img/s @ b128 = 1.55x; accuracy evidence in DESIGN.md §8 —
    # PTQ-pinned tables, accuracy-positive topk ablation). Other modes
    # keep bf16 tables and the library default topk 512.
    if args.table_dtype is None:
        args.table_dtype = "bf16" if bf16_default else "int8"
    if args.topk is None:
        args.topk = 512 if bf16_default else 256
    # Round-5 resolution: the plain/--segment bench measures the PRODUCTION
    # candidate distribution — committed flagship weights + scene images —
    # with tile-major candidate tables (853.5 img/s; random-init row-major
    # numbers are spuriously fast for the chunk skip because near-tied
    # random scores tie-break the top-k into the first chunks, and
    # row-major on REAL clustered candidates is 12.9% slower than tiled:
    # 756.0 vs 853.6, DESIGN.md §8 round-5 ledger). 'none' disables either.
    _FLAGSHIP_NPZ = "data/outputs/flagship_r4/weights.npz"
    if args.weights_npz is None:
        args.weights_npz = (
            _FLAGSHIP_NPZ
            if (not bf16_default and args.hw is None
                and args.classes == 3 and os.path.exists(_FLAGSHIP_NPZ))
            else ""
        )
    elif args.weights_npz.lower() == "none":
        args.weights_npz = ""
    if args.tile is None:
        args.tile = None if bf16_default else "16x32"
    elif args.tile.lower() == "none":
        args.tile = None

    if args.loader:
        _bench_loader(args)
        return

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bayesod_tpu.infer import build_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    if args.tiny:
        model_cfg = ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="groupnorm",
            compute_dtype="float32", head_final_dtype=args.head_dtype,
            head_trunk_dtype=args.trunk_dtype,
            backbone_dtype=args.backbone_dtype,
            backbone_act_scale=args.backbone_act_scale,
            probs_reduce=args.probs_reduce,
            reg_finals=args.reg_finals,
        )
        image_hw = (128, 256)
    else:
        model_cfg = ModelConfig(
            num_classes=args.classes, backbone="resnet50", norm="batchnorm",
            head_final_dtype=args.head_dtype,
            head_trunk_dtype=args.trunk_dtype,
            backbone_dtype=args.backbone_dtype,
            backbone_act_scale=args.backbone_act_scale,
            probs_reduce=args.probs_reduce,
            reg_finals=args.reg_finals,
        )
        image_hw = (384, 1280)
    if args.hw:
        image_hw = tuple(args.hw)

    cfg = ExperimentConfig(
        name="bench",
        model=model_cfg,
        bayes=BayesConfig(
            num_mc_samples=args.samples, mode=args.mode,
            preselect_source=args.preselect,
            preselect_scoring=args.preselect_scoring,
            epistemic="ensemble" if args.ensemble else "mc_dropout",
            pre_cluster_topk=args.topk,
            candidate_tile=args.tile,
            candidate_sort=args.candidate_sort == "on",
        ),
        data=DataConfig(dataset="synthetic", image_hw=image_hw),
    )
    if args.ensemble and "int8_resident" in (
        args.backbone_dtype, args.trunk_dtype, args.fpn_dtype
    ):
        raise SystemExit("--ensemble and int8_resident are exclusive "
                         "(calibration assumes one weight set)")

    dev = _probe_backend()
    print(f"[bench] device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    if args.train:
        _bench_train(cfg, args)
        return

    if args.latency:
        # Serving-latency configuration: batch 1 routes to the dense reg
        # path + flat probs reduce (the measured-fastest batch-1 graph;
        # reg_finals/probs_reduce "auto" pick these below batch 8).
        args.batch = 1
        args.iters = max(args.iters, 50)

    def _apply_weights_npz(variables):
        """Overlay --weights_npz onto an init tree (dtype-preserving)."""
        import numpy as _np
        from flax import traverse_util as _tu

        arch = _np.load(args.weights_npz)
        new_vars = dict(variables)
        for coll in ("params", "batch_stats"):
            if coll not in variables:
                continue
            flat = _tu.flatten_dict(dict(variables[coll]), sep="/")
            missing = [k for k in flat if f"{coll}/{k}" not in arch.files]
            if missing:
                raise SystemExit(
                    f"--weights_npz misses {len(missing)} {coll} arrays "
                    f"(config/archive mismatch), e.g. {missing[:3]}"
                )
            loaded = {
                k: jnp.asarray(arch[f"{coll}/{k}"]).astype(flat[k].dtype)
                for k in flat
            }
            new_vars[coll] = _tu.unflatten_dict(
                {tuple(k.split("/")): v for k, v in loaded.items()}
            )
        print(f"[bench] loaded weights: {args.weights_npz} "
              f"(step {int(arch['_step'])})", file=sys.stderr)
        return new_vars

    quantized_graph = "int8_resident" in (
        args.backbone_dtype, args.trunk_dtype, args.fpn_dtype
    ) or args.table_dtype != "bf16"
    if quantized_graph:
        # init + calibrate through the bf16 path, then rebuild with static
        # per-site scales (backbone/fpn/head_trunk act_scales + row tables).
        import dataclasses

        from bayesod_tpu.models.calibration import (
            calibrate_serving_scales,
            quantized_serving_config,
        )

        bf16_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, backbone_dtype="bf16", head_trunk_dtype="bf16",
                fpn_dtype="bf16",
            )
        )
        model = RetinaNet(cfg=bf16_cfg.model, train=False)
        variables = init_variables(model, jax.random.PRNGKey(0), image_hw)
        if args.weights_npz:
            # BEFORE calibration: the capture must see the weights it will
            # serve — random-init scales clip a trained model's activation
            # distribution (round-4 advisor finding).
            variables = _apply_weights_npz(variables)
        calib = jnp.asarray(
            np.random.default_rng(0).uniform(
                0, 1, (min(args.batch, 8), *image_hw, 3)
            ),
            jnp.float32,
        )
        # Everything the capture depends on, so a stale entry can't be
        # silently reused; "v2" = the BN-in-FPN/trunks era. v3 adds the
        # "proj" backbone sites (round-5 s32-spill fix) and folds the
        # weights source in.
        wtag = ""
        if args.weights_npz:
            import os as _os

            wtag = f"|w:{_os.path.basename(args.weights_npz)}"
        calib_key = (
            f"v3|{'tiny' if args.tiny else 'r50'}|"
            f"{image_hw[0]}x{image_hw[1]}|c{args.classes}|"
            f"b{min(args.batch, 8)}{wtag}"
        )
        t0 = time.time()
        scales = (
            None
            if args.recalibrate
            else _load_calibration(args.calibration_yaml, calib_key)
        )
        if scales is None:
            scales = calibrate_serving_scales(bf16_cfg, variables, calib)
            _save_calibration(args.calibration_yaml, calib_key, scales)
            how = "captured"
        else:
            how = f"loaded from {args.calibration_yaml}"
        cfg = quantized_serving_config(
            bf16_cfg, variables, calib,
            backbone=args.backbone_dtype == "int8_resident",
            trunk=args.trunk_dtype == "int8_resident",
            fpn=args.fpn_dtype == "int8_resident",
            table=(
                args.table_dtype
                if args.table_dtype == "int8_reg"
                else args.table_dtype == "int8"
            ),
            scales=scales,
        )
        n_sites = (
            len(cfg.model.backbone_act_scales or ())
            + len(cfg.model.fpn_act_scales or ())
            + len(cfg.model.head_trunk_act_scales or ())
            + len(cfg.model.head_table_scales or ())
        )
        print(
            f"[bench] int8_resident calibration ({calib_key}): {n_sites} "
            f"sites {how} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
        # Quantized param trees are identical to bf16 (pinned by
        # test_param_tree_identical) — reuse the calibration init instead
        # of paying a second full-model init over the tunnel.
        model = RetinaNet(cfg=cfg.model, train=False)
    elif args.ensemble:
        from bayesod_tpu.models.retinanet import stack_variables

        model = RetinaNet(cfg=cfg.model, train=False)
        variables = stack_variables([
            init_variables(model, jax.random.PRNGKey(i), image_hw)
            for i in range(args.ensemble)
        ])
    else:
        model = RetinaNet(cfg=cfg.model, train=False)
        variables = init_variables(model, jax.random.PRNGKey(0), image_hw)
    if args.weights_npz and not quantized_graph:
        # (The quantized branch loads BEFORE its calibration capture.)
        variables = _apply_weights_npz(variables)
    if args.serve:
        _bench_serve(cfg, variables, args)
        return

    detect = build_detect_fn(cfg, model)

    rng = jax.random.PRNGKey(7)
    if args.weights_npz:
        # Scenes from the training distribution -> realistic (clustered)
        # candidate sets for the tail kernels.
        from bayesod_tpu.data.preprocess import normalize_images
        from bayesod_tpu.data.synthetic import SyntheticDataset

        _ds = SyntheticDataset(size=args.batch, image_hw=image_hw)
        images = normalize_images(jnp.asarray(np.stack(
            [_ds.example(i)["image"] for i in range(args.batch)]
        )), cfg.data.mean, cfg.data.std)
    else:
        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (args.batch, *image_hw, 3)),
            jnp.float32,
        )

    # Measurement note: this environment's remote-PJRT tunnel neither blocks
    # reliably in block_until_ready nor executes dropped results, so
    # per-iteration host timing is untrustworthy. Instead ITERS detect steps
    # are CHAINED inside one compiled graph and the whole chain is fetched
    # once — one D2H round-trip amortized over all steps, serial execution
    # guaranteed by the data dependency.
    #
    # HOIST-PROOFING (round-3 fix): the carry must feed the IMAGES, not just
    # the rng fold. With carry->rng only, `variables` and `images` are
    # loop-invariant, and everything that does not depend on the dropout rng
    # (backbone, FPN, head trunks — and under deterministic preselect, the
    # candidate selection too) is eligible for loop-invariant code motion:
    # the compiler may run the trunk ONCE and replay only the rng-dependent
    # tail per iteration, inflating the reported rate. Adding acc*1e-24 to
    # the pixels is numerically invisible (<=1e-21 on [0,1) f32 pixels,
    # below f32 resolution) but makes every iteration's trunk input a fresh
    # data-dependent tensor, so nothing can be hoisted.
    if args.segment != "full":
        # Prefix-of-the-graph segment: same hoist-proofed chain, but the
        # body runs only the deterministic prefix (backbone / +FPN /
        # +head-trunks). Differences between consecutive segments give the
        # honest per-stage times; full minus 'trunks' is the stochastic
        # finals + post-processing tail.
        def _seg_backbone(m, im):
            return m.backbone(im)

        def _seg_trunks(m, im):
            return m.head_trunk_outputs(m.features(im))

        if args.segment in ("preselect_conv", "preselect_score"):
            # Sub-decomposition of the dense deterministic selection
            # (VERDICT r4 item 3a): 'preselect_conv' = trunk + the dense
            # cls-final conv only; 'preselect_score' adds softmax + the
            # per-anchor foreground max. Consecutive deltas vs 'trunks'
            # and 'preselect' split selection into conv / score / top-k.
            from bayesod_tpu.models.retinanet import (
                RetinaNet as _RN,
                head_table_scale,
                preselect_scores,
            )

            _want_scores = args.segment == "preselect_score"

            def call(variables, imgs, r):
                feats = model.apply(variables, imgs, method=_RN.features)
                cls_t, _ = model.apply(
                    variables, feats, method=_RN.head_trunk_outputs
                )
                params = variables["params"]["heads"]
                out = preselect_scores(
                    cls_t, params["cls_out"]["kernel"],
                    params["cls_out"]["bias"], model.anchors_per_cell,
                    cfg.model.num_classes + 1,
                    table_scale=head_table_scale(cfg.model, "cls"),
                    scores=_want_scores,
                )
                return sum(
                    jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-9)
                    for x in jax.tree_util.tree_leaves(out)
                )
        elif args.segment == "preselect":
            # Trunk + the dense deterministic cls pass + top-k, nothing
            # per-sample: finals-minus-preselect isolates the N-sample
            # candidate kernels from the dense selection work.
            from bayesod_tpu.models.retinanet import (
                RetinaNet as _RN,
                deterministic_preselect_idx,
                head_table_scale,
            )

            def call(variables, imgs, r):
                feats = model.apply(variables, imgs, method=_RN.features)
                cls_t, _ = model.apply(
                    variables, feats, method=_RN.head_trunk_outputs
                )
                params = variables["params"]["heads"]
                idx = deterministic_preselect_idx(
                    cls_t, params["cls_out"]["kernel"],
                    params["cls_out"]["bias"], model.anchors_per_cell,
                    cfg.model.num_classes + 1, cfg.bayes.pre_cluster_topk,
                    cfg.bayes.approx_topk,
                    table_scale=head_table_scale(cfg.model, "cls"),
                )
                return jnp.sum(idx.astype(jnp.float32)) * jnp.float32(1e-9)
        elif args.segment == "finals":
            # Trunk + preselect + the fused candidate finals (both heads,
            # N samples, moment stats) — everything EXCEPT clustering +
            # fusion + output marshalling. full-minus-finals isolates the
            # post-processing tail honestly.
            from bayesod_tpu.models.retinanet import (
                mc_forward_candidates,
                mc_forward_candidates_det,
            )
            from bayesod_tpu.ops.candidate_reg import tables_for

            tables = tables_for(cfg, model.anchors_per_cell)

            def call(variables, imgs, r):
                if cfg.bayes.preselect_source == "deterministic":
                    out = mc_forward_candidates_det(
                        model, variables, imgs, r, cfg.bayes.num_mc_samples,
                        cfg.bayes.pre_cluster_topk,
                        cfg.bayes.score_threshold,
                        cfg.bayes.approx_topk, tables,
                        cfg.bayes.box_scale_factors,
                        cfg.bayes.log_var_clip,
                    )
                else:
                    from bayesod_tpu.infer.detector import _preselect

                    out = mc_forward_candidates(
                        model, variables, imgs, r, cfg.bayes.num_mc_samples,
                        lambda p: _preselect(
                            p, cfg.bayes.pre_cluster_topk,
                            cfg.bayes.score_threshold,
                            approx=cfg.bayes.approx_topk,
                        ),
                        tables, stats=True,
                        scale_factors=cfg.bayes.box_scale_factors,
                        log_var_clip=cfg.bayes.log_var_clip,
                    )
                return sum(
                    jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-9)
                    for x in jax.tree_util.tree_leaves(out)
                )
        else:
            _method = {
                "backbone": _seg_backbone,
                "features": type(model).features,
                "trunks": _seg_trunks,
            }[args.segment]

            def call(variables, imgs, r):
                out = model.apply(variables, imgs, method=_method)
                return sum(
                    jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-9)
                    for x in jax.tree_util.tree_leaves(out)
                )
    else:
        def call(variables, imgs, r):
            out = detect(variables, imgs, r)
            return jnp.sum(out.scores) + jnp.sum(out.boxes) * 1e-9

    if args.roofline:
        # Composes with --segment: cost analysis of exactly the subgraph
        # the segment bench times (full graph when segment == "full").
        _roofline(
            (lambda v, im, r: detect(v, im, r))
            if args.segment == "full" else call,
            variables, images, rng, args,
        )
        return

    def chained(variables, images, rng, iters):
        def body(i, acc):
            imgs = images + acc * jnp.float32(1e-24)
            return acc + call(
                variables, imgs, jax.random.fold_in(rng, i + (acc == 0.5))
            )
        # traced trip count -> one compile serves warmup and timed runs
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    run = jax.jit(chained)

    t0 = time.time()
    np.asarray(run(variables, images, rng, 1))
    print(f"[bench] compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    np.asarray(run(variables, images, rng, args.warmup))  # warm steady state
    t0 = time.time()
    np.asarray(run(variables, images, rng, args.iters))
    elapsed = time.time() - t0

    per_batch = elapsed / args.iters

    if args.linearity:
        # 1) same compile, different trip counts: elapsed must scale ~1:2:4.
        # A hoisted trunk would show up as a large iter-independent constant
        # (sublinear scaling); tunnel early-return would show as noise.
        rows = []
        for it in (max(args.iters // 2, 1), args.iters, 2 * args.iters):
            t0 = time.time()
            np.asarray(run(variables, images, rng, it))
            rows.append((it, time.time() - t0))
        base = rows[0][1] / rows[0][0]
        for it, el in rows:
            print(
                f"[linearity] iters={it:4d} elapsed={el:7.3f}s "
                f"per_iter={el / it * 1e3:7.1f}ms "
                f"ratio_vs_smallest={el / it / base:.3f}",
                file=sys.stderr,
            )
        # 2) cross-check: per-iteration scalar fetch (each np.asarray is a
        # true D2H sync), RTT measured separately on a trivial graph and
        # subtracted. Slower method, but immune to chaining artifacts.
        one = jax.jit(lambda v, im, r: chained(v, im, r, 1))
        np.asarray(one(variables, images, rng))  # warm
        trivial = jax.jit(lambda x: x + 1.0)
        np.asarray(trivial(jnp.float32(0.0)))
        t0 = time.time()
        n_rtt = 10
        for i in range(n_rtt):
            np.asarray(trivial(jnp.float32(i)))
        rtt = (time.time() - t0) / n_rtt
        t0 = time.time()
        n_x = 8
        for i in range(n_x):
            np.asarray(one(variables, images, jax.random.fold_in(rng, i)))
        per_fetch = (time.time() - t0) / n_x
        print(
            f"[linearity] per-iteration-fetch={per_fetch * 1e3:.1f}ms "
            f"(rtt={rtt * 1e3:.1f}ms -> net {(per_fetch - rtt) * 1e3:.1f}ms) "
            f"vs chained {per_batch * 1e3:.1f}ms",
            file=sys.stderr,
        )
    imgs_per_sec = args.batch / per_batch
    target = 500.0
    if args.latency:
        result = {
            "metric": f"p50_latency_ms@{args.samples}mc_bayesod",
            "value": round(per_batch * 1e3, 2),
            "unit": "ms/image",
            "vs_baseline": round(imgs_per_sec / target, 4),
        }
    else:
        seg = "" if args.segment == "full" else f"_{args.segment}_segment"
        result = {
            "metric": f"images_per_sec_per_chip@{args.samples}mc_bayesod{seg}",
            "value": round(imgs_per_sec, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(imgs_per_sec / target, 4),
        }
    print(
        f"[bench] batch={args.batch} iters={args.iters} "
        f"batch_latency={per_batch * 1e3:.1f}ms "
        f"per_image={per_batch / args.batch * 1e3:.2f}ms",
        file=sys.stderr,
    )
    print(json.dumps(result))


def _probe_backend(timeout_s: float = 600.0):
    """First backend touch with a watchdog: the remote-TPU tunnel's init
    HANGS indefinitely when the tunnel is down (observed 2026-08-17/18),
    which would stall the whole bench run silently. Probe jax.devices() in
    a thread; on timeout, exit nonzero with a clear message instead."""
    import threading

    out = []
    t = threading.Thread(target=lambda: out.append(jax.devices()[0]),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print(
            f"[bench] FATAL: backend init did not complete in {timeout_s:.0f}s "
            "— the TPU tunnel is likely down (retry later or use --cpu for a "
            "mechanics check)",
            file=sys.stderr,
        )
        os._exit(2)
    return out[0]


def _bench_serve(cfg, variables, args) -> None:
    """Online-serving throughput: concurrent clients submit camera-sized
    frames through DetectionServer's dynamic batching. Unlike the chained
    device bench, every request pays host resize/pad, the batching wait,
    and a real per-batch D2H fetch (np.asarray inside Detector.__call__
    truly syncs, so wall-clock timing is trustworthy even over the
    tunnel) — this is the number an online deployment sees."""
    import threading

    from bayesod_tpu.infer.api import Detector
    from bayesod_tpu.infer.server import DetectionServer

    det = Detector(cfg, variables, batch_size=args.batch)
    rng = np.random.default_rng(0)
    # KITTI-native camera frames: the host resize/pad to image_hw is part
    # of the measured work.
    frames = [
        rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        for _ in range(8)
    ]
    t0 = time.time()
    det([frames[0]] * args.batch)
    print(f"[bench] compile+first run: {time.time() - t0:.1f}s",
          file=sys.stderr)

    n_clients = args.clients or 2 * args.batch
    stop = threading.Event()
    lock = threading.Lock()
    latencies: list = []

    def client(i: int, srv: DetectionServer) -> None:
        k = 0
        while not stop.is_set():
            t = time.monotonic()
            srv.detect(frames[(i + k) % len(frames)], timeout=600)
            with lock:
                latencies.append(time.monotonic() - t)
            k += 1

    with DetectionServer(det, max_delay_ms=args.serve_delay_ms) as srv:
        threads = [
            threading.Thread(target=client, args=(i, srv), daemon=True)
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        # Over the remote-PJRT tunnel one batch cycle (host resize on a
        # 1-vCPU box + H2D over ~10-130 MB/s + a true D2H sync) can exceed
        # any fixed wall window, so a pure time.sleep window can measure
        # ZERO completed batches (observed: 15 s window, 0 reqs -> rps 0.0).
        # Warm up by BATCHES, then measure until BOTH the requested window
        # elapsed AND >= 3 batches completed, with a hard cap.
        def _wait_batches(target: int, cap_s: float) -> None:
            t_cap = time.monotonic() + cap_s
            while srv.stats.batches < target and time.monotonic() < t_cap:
                time.sleep(0.05)

        _wait_batches(2, 900.0)  # steady state: the first batches are warmup
        with lock:
            latencies.clear()
        req0, bat0, t0 = (
            srv.stats.requests, srv.stats.batches, time.monotonic()
        )
        t_min = t0 + args.serve_seconds
        t_cap = t0 + max(args.serve_seconds * 20, 600.0)
        # Snap the window to whole-batch boundaries: (reqs, elapsed) are
        # sampled at the moment the batch counter last advanced, so a
        # half-finished batch at the deadline can't bias the rate down.
        reqs, nbatches, elapsed = 0, 0, float("nan")
        seen = bat0
        while time.monotonic() < t_cap:
            b = srv.stats.batches
            if b > seen:
                seen = b
                reqs = srv.stats.requests - req0
                nbatches = b - bat0
                elapsed = time.monotonic() - t0
            if time.monotonic() >= t_min and nbatches >= 3:
                break
            time.sleep(0.05)
        with lock:
            lat = sorted(latencies)
        fill = reqs / nbatches if nbatches else float("nan")
        stop.set()
        for t in threads:
            t.join(timeout=120)

    rps = reqs / elapsed
    p50 = lat[len(lat) // 2] * 1e3 if lat else float("nan")
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1e3 if lat else float("nan")
    print(
        f"[bench] serve clients={n_clients} batch={args.batch} "
        f"fill={fill:.1f} p50={p50:.1f}ms p99={p99:.1f}ms",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"serve_images_per_sec@{args.samples}mc_bayesod",
        "value": round(rps, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rps / 500.0, 4),
    }))


def _bench_train(cfg, args) -> None:
    """Training-step throughput (BASELINE config #5): focal + attenuated-NLL
    end-to-end on device, synthetic fixed batch, chained like inference."""
    import dataclasses

    from bayesod_tpu.data.synthetic import SyntheticDataset
    from bayesod_tpu.data import Loader
    from bayesod_tpu.models.retinanet import RetinaNet
    from bayesod_tpu.ops import anchors as anchor_ops
    from bayesod_tpu.train import (
        build_train_step,
        create_train_state,
        make_train_model,
    )

    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch, remat=args.remat,
            focal_backward=args.focal_backward
        ),
    )
    model = make_train_model(cfg)
    anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
    state = create_train_state(
        model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
    )
    ds = SyntheticDataset(size=args.batch, image_hw=cfg.data.image_hw)
    batch = next(
        iter(
            Loader(
                ds, batch_size=args.batch, image_hw=cfg.data.image_hw,
                max_gt_boxes=cfg.data.max_gt_boxes, num_epochs=1,
                num_workers=1,
            )
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_fn = build_train_step(cfg, anchors, model)

    if args.roofline:
        t0 = time.time()
        compiled = jax.jit(step_fn).lower(state, batch).compile()
        print(f"[roofline] train compile: {time.time() - t0:.1f}s", file=sys.stderr)
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        acc = float(ca.get("bytes accessed", 0.0))
        print(
            f"[roofline] train batch={args.batch}: "
            f"{flops / args.batch / 1e9:.1f} GFLOP/img, "
            f"{acc / args.batch / 1e9:.3f} GB/img | floors: compute "
            f"{flops / 197e12 * 1e3:.1f} ms/step, HBM "
            f"{acc / 819e9 * 1e3:.1f} ms/step",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "train_roofline_hbm_floor_ms_per_step",
                    "value": round(acc / 819e9 * 1e3, 2),
                    "unit": "ms",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    def chained(state, batch, iters):
        def body(_, s):
            s2, metrics = step_fn(s, batch)
            return s2
        return jax.lax.fori_loop(0, iters, body, state)

    run = jax.jit(chained)
    t0 = time.time()
    s = run(state, batch, 1)
    np.asarray(s.step)
    print(f"[bench] train compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    np.asarray(run(s, batch, args.warmup).step)
    t0 = time.time()
    np.asarray(run(s, batch, args.iters).step)
    elapsed = time.time() - t0
    per_batch = elapsed / args.iters
    result = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(args.batch / per_batch, 2),
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }
    print(
        f"[bench] train batch={args.batch} step_latency={per_batch * 1e3:.1f}ms",
        file=sys.stderr,
    )
    print(json.dumps(result))


def _roofline(detect, variables, images, rng, args) -> None:
    """Compile the detect graph and print XLA cost analysis + v5e floors.

    v5e-1 peaks used: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM. Caveat: XLA's
    cost analysis reports 0 for Pallas custom calls, so on kernel-heavy
    routes the true byte count is higher — the analysis bounds the XLA
    portion; kernel I/O must be added by hand (slab DMA + outputs, see
    DESIGN.md §8)."""
    t0 = time.time()
    compiled = jax.jit(detect).lower(variables, images, rng).compile()
    print(f"[roofline] compile: {time.time() - t0:.1f}s", file=sys.stderr)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax: one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    acc = float(ca.get("bytes accessed", 0.0))
    b = args.batch
    peak_flops = 197e12
    peak_bw = 819e9
    t_compute = flops / peak_flops
    t_mem = acc / peak_bw
    print(
        f"[roofline] batch={b}: {flops / b / 1e9:.1f} GFLOP/img, "
        f"{acc / b / 1e9:.3f} GB/img | floors: compute "
        f"{t_compute * 1e3:.1f} ms/batch, HBM {t_mem * 1e3:.1f} ms/batch "
        f"(XLA ops only — Pallas custom-call bytes excluded)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "roofline_hbm_floor_ms_per_batch"
                + ("" if args.segment == "full"
                   else f"_{args.segment}_segment"),
                "value": round(t_mem * 1e3, 2),
                "unit": "ms",
                "vs_baseline": 0.0,
            }
        )
    )


def _bench_loader(args) -> None:
    """Host input-pipeline throughput (SURVEY.md §7 hard part (e)): decode
    KITTI-sized frames from a tmpfs-backed on-disk dataset through the real
    Loader (persistent pool, cross-batch lookahead) and report img/s.

    The budget is the DEVICE rate (~800 img/s/chip at the round-1 default),
    so vs_baseline here is loader_rate / 800 — >= 1.0 means the host can
    feed one chip. Images are synthetic street-scene-complexity rectangles
    over mild noise (realistic PNG/JPEG entropy, not worst-case noise)."""
    import shutil

    from bayesod_tpu.data import Loader
    from bayesod_tpu.data.kitti import KittiDataset

    hw = (375, 1242)  # native KITTI frame
    root = f"/tmp/bayesod_loader_bench_{args.loader_format}"
    image_dir = os.path.join(root, "training", "image_2")
    label_dir = os.path.join(root, "training", "label_2")
    marker = os.path.join(root, f"ok_{args.loader_images}_{hw[0]}x{hw[1]}")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(image_dir)
        os.makedirs(label_dir)
        import cv2

        rng = np.random.default_rng(0)
        ext = args.loader_format
        t0 = time.time()
        for i in range(args.loader_images):
            img = rng.integers(0, 50, (*hw, 3), dtype=np.uint8)
            for _ in range(6):
                x1, y1 = rng.integers(0, hw[1] - 200), rng.integers(0, hw[0] - 120)
                w, h = rng.integers(40, 200), rng.integers(30, 120)
                img[y1 : y1 + h, x1 : x1 + w] = rng.integers(
                    0, 255, 3, dtype=np.uint8
                )
            cv2.imwrite(os.path.join(image_dir, f"{i:06d}.{ext}"), img)
            with open(os.path.join(label_dir, f"{i:06d}.txt"), "w") as f:
                f.write(
                    "Car 0.0 0 -10 100.0 150.0 300.0 250.0 -1 -1 -1 "
                    "-1000 -1000 -1000 -10\n"
                )
        open(marker, "w").close()
        print(
            f"[bench] materialized {args.loader_images} {ext} frames "
            f"in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )

    ds = KittiDataset(root)
    if args.loader_format == "jpg":
        ds_ext_dir = image_dir  # KittiDataset assumes .png paths
        ds.image_path = lambda i: os.path.join(ds_ext_dir, f"{ds.ids[i]}.jpg")
    loader = Loader(
        ds, batch_size=args.batch, image_hw=(384, 1280),
        max_gt_boxes=64, shuffle=True, num_workers=args.workers,
        num_epochs=None,
    )
    it = iter(loader)
    next(it)  # warmup: thread pool up, page cache hot
    n_batches = max(4, (3 * args.loader_images) // args.batch)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    elapsed = time.perf_counter() - t0
    rate = n_batches * args.batch / elapsed
    device_rate = 800.0
    result = {
        "metric": f"loader_images_per_sec_{args.loader_format}",
        "value": round(rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(rate / device_rate, 4),
    }
    print(
        f"[bench] loader batch={args.batch} workers={args.workers} "
        f"format={args.loader_format} cpus={os.cpu_count()} "
        f"batch_latency={elapsed / n_batches * 1e3:.0f}ms",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
