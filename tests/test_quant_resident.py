"""int8-resident backbone tests (models/resnet.py int8_resident path,
models/quant.py primitives, models/calibration.py).

The contract under test: a bf16-trained checkpoint serves the int8_resident
path UNCHANGED (param-path compatibility), features stay close to the bf16
reference (PTQ-grade error), and the guards reject configurations the path
cannot honor (groupnorm, training, missing scales).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.models.calibration import (
    calibrate_backbone_scales,
    with_int8_resident_backbone,
)
from bayesod_tpu.models.resnet import ResNet
from bayesod_tpu.utils.config import ExperimentConfig, ModelConfig


def _backbone(variant, conv_dtype="bf16", **kw):
    return ResNet(
        variant=variant, norm="batchnorm", stem="space_to_depth",
        dtype=jnp.float32, train=False, conv_dtype=conv_dtype, **kw,
    )


def _full_vars(v):
    return {
        "params": {"backbone": v["params"]},
        "batch_stats": {"backbone": v["batch_stats"]},
    }


def _cfg(variant):
    return ExperimentConfig(
        model=ModelConfig(backbone=variant, norm="batchnorm",
                          compute_dtype="float32")
    )


class TestInt8Resident:
    @pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
    def test_feature_parity_with_bf16(self, variant):
        """Same checkpoint through both paths: int8-resident features must
        track the fp32 reference at PTQ-grade error (few % of absmax)."""
        bk = _backbone(variant)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 3))
        v = bk.init(jax.random.PRNGKey(1), x)
        scales = calibrate_backbone_scales(_cfg(variant), _full_vars(v), x)
        bk8 = _backbone(variant, "int8_resident", act_scales=scales)
        out, out8 = bk.apply(v, x), bk8.apply(v, x)
        for k in ("c3", "c4", "c5"):
            a = np.asarray(out[k], np.float32)
            b = np.asarray(out8[k], np.float32)
            assert b.dtype == a.dtype and a.shape == b.shape
            rel = np.abs(a - b).max() / np.abs(a).max()
            assert rel < 0.10, (k, rel)
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.99, (k, corr)

    def test_param_tree_identical(self):
        """init through the int8 path must create EXACTLY the bf16 tree
        (names, shapes, dtypes) — the checkpoint-compat guarantee."""
        x = jnp.zeros((1, 64, 64, 3))
        bk = _backbone("resnet50")
        v = bk.init(jax.random.PRNGKey(0), x)
        scales = calibrate_backbone_scales(
            _cfg("resnet50"), _full_vars(v), jnp.ones((1, 64, 64, 3))
        )
        v8 = _backbone("resnet50", "int8_resident", act_scales=scales).init(
            jax.random.PRNGKey(0), x
        )
        flat = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
        flat8 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v8)
        assert flat == flat8

    def test_calibration_sites_cover_all_blocks(self):
        x = jnp.ones((1, 64, 64, 3))
        bk = _backbone("resnet50")
        v = bk.init(jax.random.PRNGKey(0), x)
        scales = dict(
            calibrate_backbone_scales(_cfg("resnet50"), _full_vars(v), x)
        )
        assert "stem" in scales
        # resnet50: 16 bottleneck blocks x 3 sites + stem + 4 projection
        # ("proj") sites (one per stageN_block0) = 53
        assert len(scales) == 53
        assert all(s > 0 for s in scales.values())
        assert "stage5_block2/out" in scales
        for stage in (2, 3, 4, 5):
            assert f"stage{stage}_block0/proj" in scales
        assert "stage2_block1/proj" not in scales

    def test_proj_scale_fallback(self):
        """A pre-round-5 scale set (no 'proj' sites) must still serve: the
        projection branch falls back to a bf16 epilogue."""
        bk = _backbone("resnet18")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 3))
        v = bk.init(jax.random.PRNGKey(1), x)
        scales = calibrate_backbone_scales(_cfg("resnet18"), _full_vars(v), x)
        legacy = tuple((k, s) for k, s in scales if not k.endswith("/proj"))
        bk8 = _backbone("resnet18", "int8_resident", act_scales=legacy)
        out, out8 = bk.apply(v, x), bk8.apply(v, x)
        for k in ("c3", "c4", "c5"):
            a = np.asarray(out[k], np.float32)
            b = np.asarray(out8[k], np.float32)
            rel = np.abs(a - b).max() / np.abs(a).max()
            assert rel < 0.10, (k, rel)

    def test_margin_scales_linearly(self):
        x = jnp.ones((1, 64, 64, 3))
        bk = _backbone("resnet18")
        v = bk.init(jax.random.PRNGKey(0), x)
        s1 = dict(calibrate_backbone_scales(_cfg("resnet18"), _full_vars(v), x))
        s2 = dict(
            calibrate_backbone_scales(
                _cfg("resnet18"), _full_vars(v), x, margin=2.0
            )
        )
        for k in s1:
            assert s2[k] == pytest.approx(2.0 * s1[k], rel=1e-6)

    def test_groupnorm_rejected(self):
        bk = ResNet(variant="resnet18", norm="groupnorm", dtype=jnp.float32,
                    train=False, conv_dtype="int8_resident",
                    act_scales=(("stem", 0.1),))
        with pytest.raises(ValueError, match="batchnorm"):
            bk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def test_train_rejected(self):
        bk = ResNet(variant="resnet18", norm="batchnorm", dtype=jnp.float32,
                    train=True, conv_dtype="int8_resident",
                    act_scales=(("stem", 0.1),))
        with pytest.raises(ValueError, match="serving"):
            bk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def test_missing_scales_rejected(self):
        bk = ResNet(variant="resnet18", norm="batchnorm", dtype=jnp.float32,
                    train=False, conv_dtype="int8_resident")
        with pytest.raises(ValueError, match="calibrate"):
            bk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


class TestEndToEnd:
    def test_detect_with_int8_resident(self):
        """Full detect() graph on the int8-resident backbone: finite outputs,
        and detections track the bf16 run on the same weights."""
        from bayesod_tpu.infer import build_detect_fn
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables
        from bayesod_tpu.utils.config import BayesConfig, DataConfig

        cfg = ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=32, norm="batchnorm",
                compute_dtype="float32",
            ),
            bayes=BayesConfig(num_mc_samples=4, score_threshold=0.0,
                              pre_cluster_topk=64, max_detections=10),
            data=DataConfig(image_hw=(128, 256)),
        )
        model = RetinaNet(cfg=cfg.model, train=False)
        v = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
        images = jax.random.uniform(
            jax.random.PRNGKey(2), (1, 128, 256, 3), jnp.float32
        )
        out_bf16 = build_detect_fn(cfg, model)(v, images, jax.random.PRNGKey(1))

        cfg8 = with_int8_resident_backbone(cfg, v, images)
        assert cfg8.model.backbone_act_scales is not None
        model8 = RetinaNet(cfg=cfg8.model, train=False)
        out8 = build_detect_fn(cfg8, model8)(v, images, jax.random.PRNGKey(1))
        assert bool(jnp.all(jnp.isfinite(out8.boxes)))
        assert bool(jnp.all(jnp.isfinite(out8.probs)))
        # same valid count and box agreement on the shared valid prefix
        n, n8 = int(out_bf16.valid.sum()), int(out8.valid.sum())
        assert abs(n - n8) <= 2, (n, n8)


class TestInt8ResidentTrunk:
    """int8-resident head trunks (models/heads.py SubnetTrunk)."""

    def _cfg(self, **model_kw):
        from bayesod_tpu.utils.config import (
            BayesConfig, DataConfig, ExperimentConfig, ModelConfig,
        )

        return ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=2, head_channels=32, norm="batchnorm",
                compute_dtype="float32", **model_kw,
            ),
            bayes=BayesConfig(num_mc_samples=2, score_threshold=0.0,
                              pre_cluster_topk=32, max_detections=8),
            data=DataConfig(image_hw=(128, 256)),
        )

    def _model_and_vars(self, cfg):
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables

        model = RetinaNet(cfg=cfg.model, train=False)
        v = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
        return model, v

    def test_serving_scales_cover_both_trunks_and_all_levels(self):
        from bayesod_tpu.models.calibration import calibrate_serving_scales

        cfg = self._cfg()
        _, v = self._model_and_vars(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 256, 3))
        backbone, fpn, trunk, table = calibrate_serving_scales(cfg, v, x)
        assert set(dict(table)) == {"cls", "reg"}
        assert all(s > 0 for _, s in table)
        tsc = dict(trunk)
        # 5 levels x (in + conv0) x 2 trunks at depth 2 = 20 sites
        assert len(tsc) == 20
        for prefix in ("cls", "reg"):
            for lvl in range(5):
                assert f"{prefix}/p{lvl}_in" in tsc
                assert f"{prefix}/p{lvl}_conv0" in tsc
        assert all(s > 0 for s in tsc.values())
        assert dict(backbone)  # backbone sites came from the same pass
        assert set(dict(fpn)) == {"c3", "c4", "c5", "l3", "l4", "l5", "p6r"}

    def test_trunk_parity_with_bf16(self):
        """Same checkpoint through bf16 and int8-resident trunks: logits
        must track at PTQ-grade error."""
        import dataclasses

        from bayesod_tpu.models.calibration import quantized_serving_config
        from bayesod_tpu.models.retinanet import RetinaNet

        cfg = self._cfg()
        model, v = self._model_and_vars(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 256, 3))
        logits, deltas, log_vars = model.apply(v, x, stochastic=False)

        cfg8 = quantized_serving_config(
            cfg, v, x, backbone=False, trunk=True, fpn=False
        )
        assert cfg8.model.head_trunk_dtype == "int8_resident"
        assert cfg8.model.backbone_dtype == "bf16"  # trunk-only
        model8 = RetinaNet(cfg=cfg8.model, train=False)
        logits8, deltas8, _ = model8.apply(v, x, stochastic=False)
        for a, b in ((logits, logits8), (deltas, deltas8)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
            assert rel < 0.12, rel
            assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99

    def test_param_tree_identical(self):
        from bayesod_tpu.models.calibration import quantized_serving_config
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables

        cfg = self._cfg()
        model, v = self._model_and_vars(cfg)
        x = jnp.ones((1, 128, 256, 3))
        cfg8 = quantized_serving_config(cfg, v, x)
        v8 = init_variables(
            RetinaNet(cfg=cfg8.model, train=False),
            jax.random.PRNGKey(0), cfg.data.image_hw,
        )
        flat = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
        flat8 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v8)
        assert flat == flat8

    def test_dropout_all_rejected(self):
        cfg = self._cfg(dropout_layers="all",
                        head_trunk_dtype="int8_resident",
                        head_trunk_act_scales=(("cls/p0_in", 0.1),
                                               ("reg/p0_in", 0.1)))
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables

        with pytest.raises(ValueError, match="dropout_layers"):
            init_variables(
                RetinaNet(cfg=cfg.model, train=False),
                jax.random.PRNGKey(0), cfg.data.image_hw,
            )

    def test_missing_scales_rejected(self):
        cfg = self._cfg(head_trunk_dtype="int8_resident")
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables

        with pytest.raises(ValueError, match="calibrate"):
            init_variables(
                RetinaNet(cfg=cfg.model, train=False),
                jax.random.PRNGKey(0), cfg.data.image_hw,
            )

    def test_train_rejected(self):
        cfg = self._cfg(head_trunk_dtype="int8_resident",
                        head_trunk_act_scales=(("cls/p0_in", 0.1),))
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables

        with pytest.raises(ValueError, match="serving"):
            init_variables(
                RetinaNet(cfg=cfg.model, train=True),
                jax.random.PRNGKey(0), cfg.data.image_hw,
            )

    def test_detect_end_to_end_backbone_and_trunk(self):
        """Full detect() with BOTH int8-resident backbone and trunks."""
        from bayesod_tpu.infer import build_detect_fn
        from bayesod_tpu.models.calibration import quantized_serving_config
        from bayesod_tpu.models.retinanet import RetinaNet

        cfg = self._cfg()
        model, v = self._model_and_vars(cfg)
        images = jax.random.uniform(
            jax.random.PRNGKey(3), (1, 128, 256, 3), jnp.float32
        )
        out = build_detect_fn(cfg, model)(v, images, jax.random.PRNGKey(1))

        cfg8 = quantized_serving_config(cfg, v, images)
        assert cfg8.model.backbone_dtype == "int8_resident"
        assert cfg8.model.head_trunk_dtype == "int8_resident"
        assert cfg8.model.fpn_dtype == "int8_resident"
        model8 = RetinaNet(cfg=cfg8.model, train=False)
        out8 = build_detect_fn(cfg8, model8)(v, images, jax.random.PRNGKey(1))
        assert bool(jnp.all(jnp.isfinite(out8.boxes)))
        assert bool(jnp.all(jnp.isfinite(out8.probs)))
        n, n8 = int(out.valid.sum()), int(out8.valid.sum())
        assert abs(n - n8) <= 2, (n, n8)

    def test_detect_quantized_on_mesh(self):
        """Quantized serving composes with the (data, sample) mesh: the
        int8-resident trunks/backbone are sample-independent (replicated
        pre-sharding work), so GSPMD sharding must not change results
        semantics — finite outputs, same valid count as unsharded."""
        import dataclasses

        from bayesod_tpu.infer import build_detect_fn
        from bayesod_tpu.models.calibration import quantized_serving_config
        from bayesod_tpu.models.retinanet import RetinaNet
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg = self._cfg()
        cfg = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, num_mc_samples=4)
        )
        model, v = self._model_and_vars(cfg)
        images = jax.random.uniform(
            jax.random.PRNGKey(5), (2, 128, 256, 3), jnp.float32
        )
        cfg8 = quantized_serving_config(cfg, v, images)
        model8 = RetinaNet(cfg=cfg8.model, train=False)
        out = build_detect_fn(cfg8, model8)(v, images, jax.random.PRNGKey(1))

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect_m = jax.jit(
            build_detect_fn(cfg8, model8, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out_m = detect_m(
            jax.device_put(v, mesh_lib.replicated(mesh)),
            images, jax.random.PRNGKey(1),
        )
        assert bool(jnp.all(jnp.isfinite(out_m.boxes)))
        assert int(out_m.valid.sum()) == int(out.valid.sum())


class TestInt8ResidentFPN:
    """int8-resident FPN (models/fpn.py)."""

    def test_fpn_parity_with_bf16(self):
        """Same params through bf16 and int8-resident FPN: P3..P7 must
        track at PTQ-grade error."""
        from bayesod_tpu.models.fpn import FPN

        rng = jax.random.PRNGKey(0)
        feats = {
            "c3": jax.random.normal(rng, (1, 16, 32, 64)),
            "c4": jax.random.normal(rng, (1, 8, 16, 128)),
            "c5": jax.random.normal(rng, (1, 4, 8, 256)),
        }
        fpn = FPN(channels=64, dtype=jnp.float32, capture=True)
        v = fpn.init(jax.random.PRNGKey(1), feats)
        outs, state = fpn.apply(
            {"params": v["params"]}, feats, mutable=["intermediates"]
        )
        scales = tuple(
            sorted(
                (site, max(float(np.asarray(val[0])), 1e-6) / 127.0)
                for site, val in state["intermediates"].items()
            )
        )
        assert set(dict(scales)) == {"c3", "c4", "c5", "l3", "l4", "l5", "p6r"}

        fpn8 = FPN(
            channels=64, dtype=jnp.float32,
            conv_dtype="int8_resident", act_scales=scales,
        )
        outs8 = fpn8.apply({"params": v["params"]}, feats)
        for i, (a, b) in enumerate(zip(outs, outs8)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
            assert rel < 0.15, (i, rel)
            assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.985, i

    def test_param_tree_identical(self):
        from bayesod_tpu.models.fpn import FPN

        feats = {
            "c3": jnp.zeros((1, 16, 32, 64)),
            "c4": jnp.zeros((1, 8, 16, 128)),
            "c5": jnp.zeros((1, 4, 8, 256)),
        }
        v = FPN(channels=64, dtype=jnp.float32).init(
            jax.random.PRNGKey(0), feats
        )
        sites = ("c3", "c4", "c5", "l3", "l4", "l5", "p6r")
        v8 = FPN(
            channels=64, dtype=jnp.float32, conv_dtype="int8_resident",
            act_scales=tuple((s, 0.1) for s in sites),
        ).init(jax.random.PRNGKey(0), feats)
        flat = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
        flat8 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v8)
        assert flat == flat8

    def test_missing_scales_rejected(self):
        from bayesod_tpu.models.fpn import FPN

        feats = {
            "c3": jnp.zeros((1, 16, 32, 64)),
            "c4": jnp.zeros((1, 8, 16, 128)),
            "c5": jnp.zeros((1, 4, 8, 256)),
        }
        with pytest.raises(ValueError, match="calibrate"):
            FPN(channels=64, conv_dtype="int8_resident").init(
                jax.random.PRNGKey(0), feats
            )


def test_quantized_config_yaml_roundtrip(tmp_path):
    """A calibrated serving config saved with save_config must load back
    EXACTLY (scales included), so calibration can be done once and the
    quantized config shipped as a plain YAML."""
    from bayesod_tpu.models.calibration import quantized_serving_config
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig, DataConfig, ExperimentConfig, ModelConfig,
        load_config, save_config,
    )

    cfg = ExperimentConfig(
        name="yaml_roundtrip_q",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="batchnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(num_mc_samples=2, pre_cluster_topk=32,
                          max_detections=8),
        data=DataConfig(image_hw=(64, 128)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3))
    cfg8 = quantized_serving_config(cfg, v, x)
    assert cfg8.model.backbone_act_scales  # non-trivial payload

    path = save_config(cfg8, str(tmp_path / "quantized.yaml"))
    cfg_back = load_config(path)
    assert cfg_back == cfg8


def test_unprefixed_trunk_scales_rejected():
    """head_trunk_act_scales without the cls/reg prefixes must raise the
    informative calibration error, not a KeyError deep in tracing."""
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import ExperimentConfig, ModelConfig

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="batchnorm",
            compute_dtype="float32", head_trunk_dtype="int8_resident",
            head_trunk_act_scales=(("p0_in", 0.1),),  # missing cls/reg
        )
    )
    with pytest.raises(ValueError, match="cls/"):
        init_variables(
            RetinaNet(cfg=cfg.model, train=False),
            jax.random.PRNGKey(0), (128, 256),
        )


def test_quantized_dp_mesh_serving():
    """The full production serving stack COMBINED: int8-resident backbone+
    FPN+trunks under a pure-DP shard_map mesh on the candidates_fused fast
    path. Root cause of the residual set-level (not bit-level) agreement —
    pinned quantitatively in test_quant_divergence.py: the int8 tensors are
    bit-identical across contexts; the final fp32 head convs differ by 1-2
    ulps under batch-extent-dependent XLA conv lowering (batch B vs B/8 per
    shard — reproducible with no mesh at all), which can reorder near-tied
    NOISE detections from these random weights. The bf16 graph pins
    bit-tight above (TestDataParallelFastPath) because bf16 rounding
    absorbs the ulp wiggle. Here we assert semantic equivalence: same
    valid counts, and the detection sets agree (IoU-matched, same class)
    with near-identical matched boxes."""
    import dataclasses

    from bayesod_tpu.infer import build_detect_fn
    from bayesod_tpu.models.calibration import quantized_serving_config
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.ops import boxes as box_ops
    from bayesod_tpu.parallel import mesh as mesh_lib
    from bayesod_tpu.utils.config import (
        BayesConfig, DataConfig, ExperimentConfig, MeshConfig, ModelConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="batchnorm",
            compute_dtype="float32", reg_finals="candidates_fused",
            dropout_rate=0.2,
        ),
        bayes=BayesConfig(
            num_mc_samples=4, score_threshold=0.0, pre_cluster_topk=128,
            max_detections=10, preselect_source="deterministic",
        ),
        data=DataConfig(image_hw=(128, 256)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    images = jax.random.uniform(
        jax.random.PRNGKey(1), (8, 128, 256, 3), jnp.float32
    )
    rng = jax.random.PRNGKey(2)

    cfg8 = quantized_serving_config(cfg, v, images)
    model8 = RetinaNet(cfg=cfg8.model, train=False)
    out = build_detect_fn(cfg8, model8)(v, images, rng)

    mesh_cfg = MeshConfig(data_parallel=8, sample_parallel=1)
    mesh = mesh_lib.make_mesh(mesh_cfg)
    detect_dp = jax.jit(
        build_detect_fn(cfg8, model8, mesh=mesh, mesh_cfg=mesh_cfg),
        in_shardings=(
            mesh_lib.replicated(mesh),
            mesh_lib.batch_sharding(mesh, mesh_cfg),
            mesh_lib.replicated(mesh),
        ),
    )
    out_dp = detect_dp(
        jax.device_put(v, mesh_lib.replicated(mesh)), images, rng
    )
    np.testing.assert_array_equal(
        np.asarray(out_dp.valid).sum(-1), np.asarray(out.valid).sum(-1)
    )
    total, matched, matched_ious = 0, 0, []
    for b in range(images.shape[0]):
        m = np.asarray(out.valid[b])
        bx = np.asarray(out.boxes[b])[m]
        cl = np.asarray(out.classes[b])[m]
        m2 = np.asarray(out_dp.valid[b])
        bx2 = np.asarray(out_dp.boxes[b])[m2]
        cl2 = np.asarray(out_dp.classes[b])[m2]
        iou = np.asarray(
            box_ops.pairwise_iou(jnp.asarray(bx), jnp.asarray(bx2))
        )
        for i in range(len(bx)):
            total += 1
            j = int(np.argmax(iou[i]))
            if iou[i, j] > 0.8 and cl[i] == cl2[j]:
                matched += 1
                matched_ious.append(iou[i, j])
    assert matched / total >= 0.7, (matched, total)
    assert np.mean(matched_ious) > 0.98


class TestInt8Handoff:
    """Round-5 backbone->FPN raw-int8 handoff: enabled exactly when both
    sides are int8-resident with matching c-scales; numerics unchanged
    (the replaced bf16 dequant->requant was an identity on the int8
    values up to one bf16 rounding)."""

    def _quant_cfg(self):
        import jax.numpy as jnp

        from bayesod_tpu.models.calibration import quantized_serving_config
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables
        from bayesod_tpu.utils.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
        )

        cfg = ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=32, norm="batchnorm",
                compute_dtype="float32",
            ),
            data=DataConfig(image_hw=(64, 128)),
        )
        model = RetinaNet(cfg=cfg.model, train=False)
        v = init_variables(model, jax.random.PRNGKey(0), (64, 128))
        calib = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 128, 3))
        return quantized_serving_config(cfg, v, calib), v

    def test_handoff_active_and_int8(self):
        from bayesod_tpu.models.retinanet import RetinaNet

        qcfg, v = self._quant_cfg()
        qmodel = RetinaNet(cfg=qcfg.model, train=False)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 128, 3))
        feats = qmodel.apply(v, x, method=lambda m, im: m.backbone(im))
        assert all(feats[k].dtype == jnp.int8 for k in ("c3", "c4", "c5"))
        # full features still run and produce finite pyramid levels
        pyr = qmodel.apply(v, x, method=RetinaNet.features)
        assert all(np.isfinite(np.asarray(p, np.float32)).all() for p in pyr)

    def test_mismatched_scales_fall_back(self):
        import dataclasses

        from bayesod_tpu.models.retinanet import RetinaNet

        qcfg, v = self._quant_cfg()
        fsc = dict(qcfg.model.fpn_act_scales)
        fsc["c5"] = fsc["c5"] * 2.0  # hand-edited mismatch
        mcfg = dataclasses.replace(
            qcfg.model, fpn_act_scales=tuple(sorted(fsc.items()))
        )
        qmodel = RetinaNet(cfg=mcfg, train=False)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 128, 3))
        feats = qmodel.apply(v, x, method=lambda m, im: m.backbone(im))
        assert all(
            feats[k].dtype != jnp.int8 for k in ("c3", "c4", "c5")
        )  # bf16 dequant handoff

    def test_handoff_matches_dequant_path(self):
        """Pyramid through the raw-int8 handoff == the bf16 dequant
        handoff to float tolerance (the requant was identity +- 1 ulp of
        bf16 on the c tensors)."""
        import dataclasses

        from bayesod_tpu.models.retinanet import RetinaNet

        qcfg, v = self._quant_cfg()
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 128, 3))
        pyr_fast = RetinaNet(cfg=qcfg.model, train=False).apply(
            v, x, method=RetinaNet.features
        )
        # force the fallback by perturbing one scale infinitesimally at
        # the comparison level: rebuild with fpn scales cast through
        # float32 str roundtrip mismatch — simpler: monkeypatch via a
        # model whose backbone raw flag is off by construction
        from bayesod_tpu.models.fpn import FPN
        from bayesod_tpu.models.resnet import ResNet

        fsc = dict(qcfg.model.fpn_act_scales)
        fsc["c5"] = fsc["c5"] * (1 + 1e-6)  # disables handoff only
        mcfg = dataclasses.replace(
            qcfg.model, fpn_act_scales=tuple(sorted(fsc.items()))
        )
        pyr_ref = RetinaNet(cfg=mcfg, train=False).apply(
            v, x, method=RetinaNet.features
        )
        for a, b in zip(pyr_fast, pyr_ref):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = max(np.abs(b).max(), 1e-6)
            assert np.abs(a - b).max() / denom < 0.02
