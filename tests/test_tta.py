"""Flip test-time augmentation fused Bayesianly (BayesConfig.tta_flip):
the flipped view's per-anchor posteriors are mapped back (exact affine
Gaussian pushforward) and join the SAME clustering+fusion as additional
measurements. Pins: the covariance mirror math against empirically flipped
sample clouds, detect-level mirror equivariance, and the route guards."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.infer import build_detect_fn
from bayesod_tpu.infer.detector import _flip_posteriors_back
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from tests.test_detector import tiny_config


def tta_config(**bayes_overrides):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        bayes=dataclasses.replace(
            cfg.bayes, tta_flip=True, approx_topk=False, **bayes_overrides
        ),
    )


class TestFlipBackMath:
    def test_involution(self):
        rng = np.random.default_rng(0)
        boxes = jnp.asarray(rng.uniform(0, 100, (7, 4)), jnp.float32)
        a = rng.normal(size=(7, 4, 4)).astype(np.float32)
        covs = jnp.asarray(a @ a.transpose(0, 2, 1) + np.eye(4))
        b1, c1 = _flip_posteriors_back(boxes, covs, 128.0)
        b2, c2 = _flip_posteriors_back(b1, c1, 128.0)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(boxes), atol=1e-4)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(covs), atol=1e-4)

    def test_covariance_matches_flipped_sample_cloud(self):
        """L Sigma L^T must equal the covariance of mirror-mapped samples."""
        rng = np.random.default_rng(1)
        w = 200.0
        mean = np.array([30.0, 10.0, 80.0, 50.0])
        a = rng.normal(size=(4, 4))
        cov = a @ a.T + np.eye(4)
        samples = rng.multivariate_normal(mean, cov, size=200_000)
        flipped = np.stack(
            [w - samples[:, 2], samples[:, 1], w - samples[:, 0], samples[:, 3]],
            axis=-1,
        )
        emp_mean = flipped.mean(0)
        emp_cov = np.cov(flipped.T)
        got_b, got_c = _flip_posteriors_back(
            jnp.asarray(mean[None], jnp.float32),
            jnp.asarray(cov[None], jnp.float32),
            w,
        )
        np.testing.assert_allclose(np.asarray(got_b)[0], emp_mean, atol=0.05)
        np.testing.assert_allclose(np.asarray(got_c)[0], emp_cov, atol=0.15)


class TestTtaDetect:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tta_config()
        model = RetinaNet(cfg=cfg.model, train=False)
        variables = init_variables(
            model, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        return cfg, model, variables

    def test_runs_and_normalized(self, setup):
        cfg, model, variables = setup
        detect = jax.jit(build_detect_fn(cfg, model))
        images = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
        out = detect(variables, images, jax.random.PRNGKey(1))
        assert out.boxes.shape[0] == 2  # per original image, not per view
        assert np.isfinite(np.asarray(out.boxes)).all()
        valid = np.asarray(out.valid)
        assert valid.any()
        np.testing.assert_allclose(
            np.asarray(out.probs)[valid].sum(-1), 1.0, atol=1e-4
        )

    def test_mirror_equivariance(self, setup):
        """detect_tta(flip(I)) == mirror(detect_tta(I)): the TTA candidate
        set of the flipped image is exactly the mirror of the original's
        (views swap roles), so fused detections mirror — up to clustering
        tie order, removed here by sorting on score. Deterministic
        single-pass estimator keeps the two runs dropout-free."""
        cfg, model, variables = setup
        cfg1 = tta_config(mode="anchor_redundancy", score_threshold=0.0)
        detect = jax.jit(build_detect_fn(cfg1, model))
        rng = jax.random.PRNGKey(1)
        images = jax.random.uniform(jax.random.PRNGKey(5), (1, 128, 128, 3))
        out_a = detect(variables, images, rng)
        out_b = detect(variables, images[:, :, ::-1, :], rng)

        va, vb = np.asarray(out_a.valid)[0], np.asarray(out_b.valid)[0]
        assert va.sum() == vb.sum()
        sa = np.asarray(out_a.scores)[0][va]
        sb = np.asarray(out_b.scores)[0][vb]
        ia, ib = np.argsort(-sa), np.argsort(-sb)
        np.testing.assert_allclose(sa[ia], sb[ib], atol=1e-5)
        boxes_a = np.asarray(out_a.boxes)[0][va][ia]
        boxes_b = np.asarray(out_b.boxes)[0][vb][ib]
        w = cfg1.data.image_hw[1]
        mirrored_b = np.stack(
            [w - boxes_b[:, 2], boxes_b[:, 1], w - boxes_b[:, 0], boxes_b[:, 3]],
            axis=-1,
        )
        np.testing.assert_allclose(boxes_a, mirrored_b, atol=1e-2)

    def test_guards(self, setup):
        cfg, model, variables = setup
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect = build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg)
        with pytest.raises(ValueError, match="tta_flip under a mesh"):
            detect(
                variables, jnp.ones((2, 128, 128, 3)), jax.random.PRNGKey(0)
            )

        bad = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, reg_finals="stats")
        )
        detect_bad = build_detect_fn(bad, model)
        with pytest.raises(ValueError, match="does not support bayes.tta_flip"):
            detect_bad(
                variables, jnp.ones((1, 128, 128, 3)), jax.random.PRNGKey(0)
            )
