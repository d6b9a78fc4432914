"""End-to-end detect() tests on a tiny config (SURVEY.md §7 step 5 slice).

Uses a small image + resnet18 so CPU compile time stays sane; the graph shape
is identical to the flagship config (same ops, smaller sizes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.infer import build_detect_fn, jit_detect_fn
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from bayesod_tpu.utils.config import (
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
)


def tiny_config(mode="bayes_od", num_mc=4):
    return ExperimentConfig(
        name="tiny",
        model=ModelConfig(
            num_classes=3,
            backbone="resnet18",
            fpn_channels=32,
            head_depth=1,
            head_channels=32,
            norm="groupnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(
            num_mc_samples=num_mc,
            score_threshold=0.0,  # random weights -> keep everything
            pre_cluster_topk=32,
            max_detections=8,
            mode=mode,
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
    )


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    cfg = tiny_config()
    model = RetinaNet(cfg=cfg.model, train=False)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    return cfg, model, variables


class TestDetectEndToEnd:
    def test_shapes_and_finiteness(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        detect = jit_detect_fn(cfg, model)
        images = jnp.zeros((2, 128, 128, 3), jnp.float32)
        out = detect(variables, images, jax.random.PRNGKey(1))
        d = cfg.bayes.max_detections
        assert out.boxes.shape == (2, d, 4)
        assert out.covs.shape == (2, d, 4, 4)
        assert out.probs.shape == (2, d, 4)  # 3 classes + background
        assert out.scores.shape == (2, d)
        assert out.entropy.shape == (2, d)
        assert out.classes.shape == (2, d)
        assert out.valid.shape == (2, d)
        for field in (out.boxes, out.covs, out.probs, out.scores, out.entropy):
            assert bool(jnp.all(jnp.isfinite(field)))

    def test_probs_normalized_and_boxes_clipped(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        detect = jit_detect_fn(cfg, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.5
        out = detect(variables, images, jax.random.PRNGKey(2))
        sums = np.array(jnp.sum(out.probs, axis=-1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)
        h, w = cfg.data.image_hw
        b = np.array(out.boxes)
        assert (b[..., 0] >= 0).all() and (b[..., 2] <= w).all()
        assert (b[..., 1] >= 0).all() and (b[..., 3] <= h).all()

    def test_covariances_symmetric_psd(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        detect = jit_detect_fn(cfg, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32)
        out = detect(variables, images, jax.random.PRNGKey(3))
        covs = np.array(out.covs[0])
        valid = np.array(out.valid[0])
        for c, v in zip(covs, valid):
            if not v:
                continue
            np.testing.assert_allclose(c, c.T, atol=1e-4)
            eig = np.linalg.eigvalsh(c)
            assert (eig > -1e-3).all(), eig

    def test_deterministic_given_rng(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        detect = jit_detect_fn(cfg, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32)
        o1 = detect(variables, images, jax.random.PRNGKey(7))
        o2 = detect(variables, images, jax.random.PRNGKey(7))
        np.testing.assert_allclose(np.array(o1.boxes), np.array(o2.boxes))
        np.testing.assert_allclose(np.array(o1.probs), np.array(o2.probs))

    def test_mc_samples_differ_across_rng(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        detect = jit_detect_fn(cfg, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32)
        o1 = detect(variables, images, jax.random.PRNGKey(7))
        o2 = detect(variables, images, jax.random.PRNGKey(8))
        # Dropout sampling must actually happen: outputs differ across rngs.
        assert not np.allclose(np.array(o1.probs), np.array(o2.probs))

    def test_nms_mode_runs(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        cfg_nms = tiny_config(mode="nms")
        detect = jit_detect_fn(cfg_nms, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32)
        out = detect(variables, images, jax.random.PRNGKey(1))
        assert bool(jnp.all(jnp.isfinite(out.boxes)))

    def test_sample_axis_sharding_matches_unsharded(
        self, tiny_model_and_vars, cpu_devices
    ):
        """Latency-serving mode: MC-sample axis sharded over the mesh's
        `sample` axis gives the same detections as the unsharded graph
        (masks depend only on the rng fold index, not placement)."""
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, variables = tiny_model_and_vars
        images = jnp.ones((2, 128, 128, 3), jnp.float32)
        rng = jax.random.PRNGKey(7)
        base = jit_detect_fn(cfg, model)(variables, images, rng)

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(
            jax.device_put(variables, mesh_lib.replicated(mesh)), images, rng
        )
        np.testing.assert_allclose(
            np.array(out.boxes), np.array(base.boxes), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.array(out.probs), np.array(base.probs), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.array(out.valid), np.array(base.valid)
        )

    def test_sample_sharded_pallas_matches_unsharded_pallas(
        self, tiny_model_and_vars, cpu_devices
    ):
        """Fused-kernel serving on the mesh (mc_forward_fused_sp): the
        Pallas head-final kernel launched per (sample, data) shard with
        absolute mask offsets draws bit-identical per-sample outputs to
        the unsharded kernel launch, so detections match to reduction
        order."""
        import dataclasses

        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, variables = tiny_model_and_vars
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                head_final_backend="pallas",
                probs_reduce="flat",
                reg_finals="dense",
            ),
        )
        model = RetinaNet(cfg=cfg.model, train=False)
        images = jnp.ones((2, 128, 128, 3), jnp.float32)
        images = images.at[:, 40:80, 30:90, :].set(0.2)
        rng = jax.random.PRNGKey(7)
        base = jit_detect_fn(cfg, model)(variables, images, rng)

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(
            jax.device_put(variables, mesh_lib.replicated(mesh)), images, rng
        )
        np.testing.assert_allclose(
            np.array(out.boxes), np.array(base.boxes), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.array(out.probs), np.array(base.probs), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.array(out.valid), np.array(base.valid)
        )

    def test_mesh_auto_backend_falls_back_when_samples_not_divisible(
        self, tiny_model_and_vars, cpu_devices
    ):
        """auto head backend on a mesh with N % sp != 0 must fall back to
        the GSPMD XLA path (which handles uneven sample sharding) instead
        of raising from mc_forward_fused_sp."""
        import dataclasses

        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, variables = tiny_model_and_vars
        cfg = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, num_mc_samples=5)
        )
        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(
            jax.device_put(variables, mesh_lib.replicated(mesh)),
            jnp.ones((2, 128, 128, 3), jnp.float32),
            jax.random.PRNGKey(3),
        )
        assert bool(jnp.all(jnp.isfinite(out.boxes)))

    def test_single_pass_mode_ignores_rng(self, tiny_model_and_vars):
        cfg, model, variables = tiny_model_and_vars
        cfg_sp = tiny_config(mode="single_pass_nms")
        detect = jit_detect_fn(cfg_sp, model)
        images = jnp.ones((1, 128, 128, 3), jnp.float32)
        o1 = detect(variables, images, jax.random.PRNGKey(1))
        o2 = detect(variables, images, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.array(o1.boxes), np.array(o2.boxes))


class TestRegRouteGuards:
    """ADVICE r1: reduced reg routes must not silently drop trunk dropout,
    and 'auto' must respect the fused kernel's shape constraints."""

    def _cfg(self, **model_kw):
        import dataclasses

        cfg = tiny_config()
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_kw)
        )

    @pytest.mark.parametrize("mode", ["stats", "candidates", "candidates_fused"])
    def test_explicit_reduced_mode_rejects_dropout_all(self, mode):
        from bayesod_tpu.infer.detector import _reg_route

        cfg = self._cfg(reg_finals=mode, dropout_layers="all")
        with pytest.raises(ValueError, match="dropout_layers='last'"):
            _reg_route(cfg, jnp.zeros((8, 128, 128, 3)))

    def test_auto_with_dropout_all_falls_back_to_dense(self):
        from bayesod_tpu.infer.detector import _reg_route

        cfg = self._cfg(
            reg_finals="auto", dropout_layers="all",
            head_final_backend="pallas",
        )
        assert _reg_route(cfg, jnp.zeros((8, 128, 128, 3))) == "dense"

    def test_auto_falls_back_when_topk_not_lane_multiple(self):
        import dataclasses

        from bayesod_tpu.infer.detector import _candidate_fused_ok

        cfg = self._cfg()
        bad = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, pre_cluster_topk=500)
        )
        ok = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, pre_cluster_topk=512)
        )
        assert not _candidate_fused_ok(bad)
        assert _candidate_fused_ok(ok)

    def test_auto_falls_back_when_class_groups_blow_lane_budget(self):
        import dataclasses

        from bayesod_tpu.infer.detector import _candidate_fused_ok

        cfg = self._cfg(num_classes=14)  # 9 * 15 = 135 >= 128 lanes
        det = dataclasses.replace(
            cfg,
            bayes=dataclasses.replace(
                cfg.bayes, pre_cluster_topk=128,
                preselect_source="deterministic",
            ),
        )
        assert not _candidate_fused_ok(det)
        mc = dataclasses.replace(
            det, bayes=dataclasses.replace(det.bayes, preselect_source="mc_mean")
        )
        assert _candidate_fused_ok(mc)  # mc_mean path: reg groups only (72 lanes)

    def test_mc_forward_probs_explicit_pallas_rejects_dropout_all(self):
        from bayesod_tpu.models.retinanet import (
            RetinaNet,
            init_variables,
            mc_forward_probs,
        )

        cfg = self._cfg(
            dropout_layers="all", head_final_backend="pallas",
            probs_reduce="fused",
        )
        model = RetinaNet(cfg=cfg.model, train=False)
        variables = init_variables(
            model, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        with pytest.raises(ValueError, match="dropout_layers='last'"):
            mc_forward_probs(
                model, variables, jnp.ones((1, 128, 128, 3)),
                jax.random.PRNGKey(1), 2,
            )


@pytest.mark.parametrize(
    "mode", ["black_box", "sampling_free", "anchor_redundancy"]
)
def test_comparison_baseline_modes_run(tiny_model_and_vars, mode):
    """Paper §IV comparison estimators produce finite, valid detections
    end-to-end (VERDICT r1 missing item 2)."""
    cfg, model, variables = tiny_model_and_vars
    import dataclasses

    c = dataclasses.replace(cfg, bayes=dataclasses.replace(cfg.bayes, mode=mode))
    out = jit_detect_fn(c, model)(
        variables, jnp.ones((1, 128, 128, 3)), jax.random.PRNGKey(3)
    )
    assert bool(jnp.any(out.valid))
    for f in (out.boxes, out.covs, out.probs):
        assert bool(jnp.all(jnp.isfinite(f)))
    # probs normalized; covariances symmetric
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out.probs, -1)[out.valid]), 1.0, atol=1e-4
    )
    c_ = np.asarray(out.covs)
    np.testing.assert_allclose(c_, np.swapaxes(c_, -1, -2), atol=1e-4)


def test_sampling_free_ignores_rng(tiny_model_and_vars):
    cfg, model, variables = tiny_model_and_vars
    import dataclasses

    c = dataclasses.replace(
        cfg, bayes=dataclasses.replace(cfg.bayes, mode="sampling_free")
    )
    fn = jit_detect_fn(c, model)
    img = jnp.ones((1, 128, 128, 3))
    a = fn(variables, img, jax.random.PRNGKey(0))
    b = fn(variables, img, jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))


def test_center_prior_mode_matches_default_end_to_end(tiny_model_and_vars):
    cfg, model, variables = tiny_model_and_vars
    import dataclasses

    c = dataclasses.replace(
        cfg,
        bayes=dataclasses.replace(cfg.bayes, box_fusion_prior="center"),
    )
    img = jnp.ones((1, 128, 128, 3))
    a = jit_detect_fn(cfg, model)(variables, img, jax.random.PRNGKey(1))
    b = jit_detect_fn(c, model)(variables, img, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(a.boxes), np.asarray(b.boxes), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.covs), np.asarray(b.covs), atol=1e-4
    )


@pytest.mark.slow
def test_sample_parallel_batch1_latency_graph(cpu_devices):
    """Serving-latency story (VERDICT r1 item 9): batch-1 detect with the MC
    sample axis sharded over sp=4 devices must (a) compile to a program
    whose per-device head work is N/sp samples (sharded sample tensors),
    (b) contain cross-device collectives ONLY at the moment reductions, and
    (c) reproduce the unsharded detections."""
    import re

    from bayesod_tpu.parallel import mesh as mesh_lib
    from bayesod_tpu.utils.config import MeshConfig

    cfg = tiny_config(num_mc=8)
    model = RetinaNet(cfg=cfg.model, train=False)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    images = jnp.ones((1, 128, 128, 3), jnp.float32)
    rng = jax.random.PRNGKey(7)
    base = jit_detect_fn(cfg, model)(variables, images, rng)

    mesh_cfg = MeshConfig(data_parallel=1, sample_parallel=4)
    mesh = mesh_lib.make_mesh(mesh_cfg, jax.devices()[:4])
    detect = jax.jit(
        build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
        in_shardings=(
            mesh_lib.replicated(mesh),
            mesh_lib.batch_sharding(mesh, mesh_cfg),
            mesh_lib.replicated(mesh),
        ),
    )
    lowered = detect.lower(
        jax.device_put(variables, mesh_lib.replicated(mesh)), images, rng
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    # (a) the sample axis is actually partitioned: the dense per-sample reg
    # tensors appear with leading dim N/sp = 2, not 8.
    n_anchors = 3069  # P3-P7 at 128x128, 9 anchors/cell
    assert re.search(rf"2,1,{n_anchors},4", hlo), "sample axis not sharded"
    # (b) collectives exist (moment reductions ride the sample axis)...
    assert ("all-reduce" in hlo) or ("all-gather" in hlo), "no collectives"
    # ...and the big head convolutions are NOT wrapped in collectives: count
    # collective ops, expect a small number (reductions only, not per-conv).
    n_coll = len(re.findall(r"all-(reduce|gather|to-all)", hlo))
    assert n_coll <= 40, f"collective explosion: {n_coll}"

    out = detect(
        jax.device_put(variables, mesh_lib.replicated(mesh)), images, rng
    )
    np.testing.assert_allclose(
        np.array(out.boxes), np.array(base.boxes), atol=1e-3, rtol=1e-4
    )
    np.testing.assert_array_equal(np.array(out.valid), np.array(base.valid))


class TestDataParallelFastPath:
    """Pure-DP mesh serving on the candidates_fused fast path: the whole
    per-image body runs under shard_map over the data axis with absolute
    batch offsets into the kernels' mask streams — results must match the
    unsharded fast path (same masks, same candidates, same fusion)."""

    def _cfg(self, preselect):
        import dataclasses

        from bayesod_tpu.utils.config import (
            BayesConfig, DataConfig, ExperimentConfig, ModelConfig,
        )

        return ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=32, norm="groupnorm",
                compute_dtype="float32", reg_finals="candidates_fused",
                dropout_rate=0.2,
            ),
            bayes=BayesConfig(
                num_mc_samples=4, score_threshold=0.0,
                pre_cluster_topk=128, max_detections=10,
                preselect_source=preselect,
            ),
            data=DataConfig(image_hw=(128, 256)),
        )

    @pytest.mark.parametrize("preselect", ["deterministic", "mc_mean"])
    def test_dp_mesh_matches_unsharded(self, preselect, cpu_devices):
        from bayesod_tpu.infer import build_detect_fn
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg = self._cfg(preselect)
        model = RetinaNet(cfg=cfg.model, train=False)
        variables = init_variables(
            model, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (8, 128, 256, 3), jnp.float32
        )
        rng = jax.random.PRNGKey(2)

        out = build_detect_fn(cfg, model)(variables, images, rng)

        mesh_cfg = MeshConfig(data_parallel=8, sample_parallel=1)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect_dp = jax.jit(
            build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out_dp = detect_dp(
            jax.device_put(variables, mesh_lib.replicated(mesh)),
            images, rng,
        )

        # same masks + same per-image work -> same detections (tolerance
        # for conv batch-size-dependent reduction order on CPU).
        np.testing.assert_array_equal(
            np.asarray(out_dp.valid), np.asarray(out.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(out_dp.classes), np.asarray(out.classes)
        )
        np.testing.assert_allclose(
            np.asarray(out_dp.boxes), np.asarray(out.boxes),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_dp.probs), np.asarray(out.probs),
            rtol=1e-4, atol=1e-4,
        )
