"""High-level Detector API tests: arbitrary-size numpy images round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.infer import Detector
from bayesod_tpu.utils.config import (
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
)


@pytest.fixture(scope="module")
def det():
    cfg = ExperimentConfig(
        name="api_tiny",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="groupnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(
            num_mc_samples=2, score_threshold=0.0, pre_cluster_topk=32,
            max_detections=8,
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
    )
    return Detector.from_config(cfg, batch_size=2)


def test_mixed_sizes_and_coordinate_unscaling(det):
    imgs = [
        np.random.default_rng(0).integers(0, 255, (256, 256, 3), dtype=np.uint8),
        np.random.default_rng(1).integers(0, 255, (64, 200, 3), dtype=np.uint8),
        np.random.default_rng(2).integers(0, 255, (128, 128, 3), dtype=np.uint8),
    ]
    out = det(imgs)
    assert len(out) == 3
    # Boxes must land inside each ORIGINAL image (coordinates unscaled).
    for img, rec in zip(imgs, out):
        h, w = img.shape[:2]
        if len(rec["boxes"]):
            assert rec["boxes"][:, 2].max() <= w + 1e-3
            assert rec["boxes"][:, 3].max() <= h + 1e-3
        assert rec["probs"].shape[-1] == 4
        assert rec["covs"].shape[-2:] == (4, 4)


def test_fold_in_rng_advances(det):
    img = [np.zeros((128, 128, 3), np.uint8)]
    a = det(img)
    b = det(img)
    # MC sampling differs call to call unless an explicit rng is passed.
    same = np.array_equal(a[0]["probs"], b[0]["probs"])
    c = det(img, rng=jax.random.PRNGKey(5))
    d = det(img, rng=jax.random.PRNGKey(5))
    assert np.array_equal(c[0]["probs"], d[0]["probs"])
    assert not same


class TestDispatchCollect:
    """Detector.dispatch/collect — the async split __call__ and the server
    pipeline build on."""

    def test_equals_call(self, det):
        imgs = [
            np.random.default_rng(30 + i).integers(
                0, 255, (64, 96, 3), dtype=np.uint8
            )
            for i in range(2)
        ]
        rng = jax.random.PRNGKey(11)
        want = det(imgs, rng=rng)
        got = det.collect(det.dispatch(imgs, rng=rng))
        for g, w in zip(got, want):
            for k in w:
                np.testing.assert_array_equal(g[k], w[k])

    def test_oversized_chunk_raises(self, det):
        imgs = [np.zeros((32, 32, 3), np.uint8)] * (det.batch_size + 1)
        with pytest.raises(ValueError, match="at most batch_size"):
            det.dispatch(imgs)

    def test_overlapped_dispatches_preserve_order(self, det):
        """Two in-flight handles collect independently and in either
        order (the double-buffer invariant)."""
        a = [np.full((40, 40, 3), 10, np.uint8)]
        b = [np.full((40, 40, 3), 200, np.uint8)]
        ha = det.dispatch(a, rng=jax.random.PRNGKey(1))
        hb = det.dispatch(b, rng=jax.random.PRNGKey(2))
        ra = det.collect(ha)
        rb = det.collect(hb)
        wa = det(a, rng=jax.random.PRNGKey(1))
        wb = det(b, rng=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(ra[0]["probs"], wa[0]["probs"])
        np.testing.assert_array_equal(rb[0]["probs"], wb[0]["probs"])


class TestMeshDetector:
    """Detector(mesh=...): multi-device online serving through the same
    high-level API — results must match the single-device Detector."""

    def _cfg(self):
        import dataclasses

        from bayesod_tpu.utils.config import MeshConfig

        return ExperimentConfig(
            name="api_mesh",
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=32, norm="groupnorm",
                compute_dtype="float32",
            ),
            bayes=BayesConfig(
                num_mc_samples=2, score_threshold=0.0, pre_cluster_topk=32,
                max_detections=8,
            ),
            data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
            mesh=MeshConfig(data_parallel=4, sample_parallel=1),
        )

    def test_parity_with_single_device(self):
        from bayesod_tpu.parallel import mesh as mesh_lib

        cfg = self._cfg()
        mesh = mesh_lib.make_mesh(cfg.mesh, jax.devices()[:4])
        det_mesh = Detector.from_config(cfg, batch_size=4, mesh=mesh)
        det_one = Detector.from_config(cfg, batch_size=4)
        imgs = [
            np.random.default_rng(i).integers(
                0, 255, (100, 180, 3), dtype=np.uint8
            )
            for i in range(4)
        ]
        rng = jax.random.PRNGKey(3)
        a = det_mesh(imgs, rng=rng)
        b = det_one(imgs, rng=rng)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                x["boxes"], y["boxes"], rtol=1e-5, atol=1e-4
            )
            np.testing.assert_array_equal(x["classes"], y["classes"])
            np.testing.assert_allclose(
                x["probs"], y["probs"], rtol=1e-5, atol=1e-6
            )

    def test_batch_must_divide_data_axis(self):
        from bayesod_tpu.parallel import mesh as mesh_lib

        cfg = self._cfg()
        mesh = mesh_lib.make_mesh(cfg.mesh, jax.devices()[:4])
        with pytest.raises(ValueError, match="divide the mesh data axis"):
            Detector.from_config(cfg, batch_size=3, mesh=mesh)

    def test_server_over_mesh_detector(self):
        from bayesod_tpu.infer.server import DetectionServer
        from bayesod_tpu.parallel import mesh as mesh_lib

        cfg = self._cfg()
        mesh = mesh_lib.make_mesh(cfg.mesh, jax.devices()[:4])
        det = Detector.from_config(cfg, batch_size=4, mesh=mesh)
        imgs = [
            np.random.default_rng(10 + i).integers(
                0, 255, (128, 128, 3), dtype=np.uint8
            )
            for i in range(8)
        ]
        with DetectionServer(det, max_delay_ms=500.0) as srv:
            out = srv.detect_many(imgs, timeout=300)
        assert len(out) == 8
        for rec in out:
            assert np.isfinite(rec["boxes"]).all()
            assert rec["covs"].shape[-2:] == (4, 4)


def test_from_checkpoint_missing_raises(tmp_path):
    cfg = ExperimentConfig(
        name="api_missing",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="groupnorm",
            compute_dtype="float32",
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
    )
    with pytest.raises(FileNotFoundError):
        Detector.from_checkpoint(cfg, checkpoint_dir=str(tmp_path / "none"))


def test_quantized_detector_roundtrip():
    """Detector.quantized(): same weights through the int8-resident
    backbone, calibrated on raw uint8 frames, still produces finite
    original-coordinate detections."""
    cfg = ExperimentConfig(
        name="api_tiny_q",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="batchnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(
            num_mc_samples=2, score_threshold=0.0, pre_cluster_topk=32,
            max_detections=8,
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
    )
    det = Detector.from_config(cfg, batch_size=1)
    frames = [
        (np.random.default_rng(i).uniform(0, 255, (96, 160, 3))).astype(
            np.uint8
        )
        for i in range(2)
    ]
    det8 = det.quantized(frames)
    assert det8.cfg.model.backbone_dtype == "int8_resident"
    assert det8.cfg.model.backbone_act_scales is not None
    out = det8(frames[:1])
    assert len(out) == 1
    assert np.isfinite(out[0]["boxes"]).all()
    assert np.isfinite(out[0]["probs"]).all()


class TestWithTemperature:
    def test_logits_mode_sets_config_not_weights(self):
        """where='logits' sets bayes.category_temperature; the 1/T fold
        into the cls final conv happens INSIDE the detect graph (one
        mechanism for API and YAML-config users), so the Detector's stored
        variables stay untouched."""
        from tests.test_detector import tiny_config

        cfg = tiny_config()
        det = Detector.from_config(cfg)
        det2 = det.with_temperature(2.0, where="logits")
        assert det2.cfg.bayes.category_temperature == 2.0
        k1 = det.variables["params"]["heads"]["cls_out"]["kernel"]
        k2 = det2.variables["params"]["heads"]["cls_out"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_category_temperature_flattens_members(self):
        """Pre-fusion tempering raises output entropy (flatter member
        categoricals flow through mean-softmax + fusion) and keeps
        detections finite."""
        from tests.test_detector import tiny_config

        cfg = tiny_config()
        det = Detector.from_config(cfg)
        img = np.random.default_rng(7).integers(
            0, 256, (96, 160, 3), np.uint8
        )
        rng = jax.random.PRNGKey(5)
        base = det([img], rng=rng)[0]
        hot = det.with_temperature(4.0, where="logits")([img], rng=rng)[0]
        assert np.isfinite(hot["probs"]).all()
        assert hot["entropy"].mean() > base["entropy"].mean()

    def test_entropy_rises_with_t(self):
        from tests.test_detector import tiny_config

        cfg = tiny_config()
        det = Detector.from_config(cfg)
        img = np.random.default_rng(0).integers(
            0, 256, (96, 160, 3), np.uint8
        )
        base = det([img], rng=jax.random.PRNGKey(5))[0]
        hot = det.with_temperature(4.0)([img], rng=jax.random.PRNGKey(5))[0]
        assert hot["entropy"].mean() > base["entropy"].mean()

    def test_output_mode_matches_apply_temperature(self):
        """where='output' (default) is the exact serving mirror of
        eval.uncertainty.apply_temperature: same boxes/selection, probs
        tempered row-wise."""
        from bayesod_tpu.eval.uncertainty import apply_temperature
        from tests.test_detector import tiny_config

        det = Detector.from_config(tiny_config())
        img = np.random.default_rng(3).integers(
            0, 256, (96, 160, 3), np.uint8
        )
        rng = jax.random.PRNGKey(5)
        base = det([img], rng=rng)[0]
        temp = det.with_temperature(2.0)([img], rng=rng)[0]
        np.testing.assert_allclose(temp["boxes"], base["boxes"], atol=1e-4)
        np.testing.assert_allclose(
            temp["probs"], apply_temperature(base["probs"], 2.0),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            temp["scores"], temp["probs"][:, 1:].max(-1), atol=1e-5
        )

    def test_guard(self):
        from tests.test_detector import tiny_config

        det = Detector.from_config(tiny_config())
        with pytest.raises(ValueError, match="positive"):
            det.with_temperature(0.0)
        with pytest.raises(ValueError, match="'output' or 'logits'"):
            det.with_temperature(2.0, where="probs")
