"""Serving-artifact roundtrip (infer/export.py): the jitted detect graph —
weights baked in — serializes to one StableHLO zip, reloads, and reproduces
the live graph's outputs. A fresh-subprocess load proves the artifact is
self-contained (no in-process state, no model rebuild)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.infer import (
    ServingArtifact,
    build_detect_fn,
    export_serving_artifact,
)
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from tests.test_detector import tiny_config

OUT_KEYS = ("boxes", "covs", "probs", "scores", "entropy", "classes", "valid")


@pytest.fixture(scope="module")
def artifact_path(tmp_path_factory):
    cfg = tiny_config(num_mc=3)
    model = RetinaNet(cfg=cfg.model, train=False)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    path = str(tmp_path_factory.mktemp("artifact") / "tiny.bayesod.zip")
    export_serving_artifact(cfg, variables, path, batch_size=2)
    return cfg, model, variables, path


class TestServingArtifact:
    def test_roundtrip_matches_live_graph(self, artifact_path):
        cfg, model, variables, path = artifact_path
        art = ServingArtifact.load(path)
        assert art.batch_size == 2
        assert tuple(art.cfg.data.image_hw) == tuple(cfg.data.image_hw)

        rng = jnp.asarray([7, 11], jnp.uint32)
        images_u8 = np.random.default_rng(0).integers(
            0, 256, (2, 128, 128, 3), np.uint8
        )
        got = art(images_u8, rng)
        assert set(got) == set(OUT_KEYS)

        from bayesod_tpu.data.preprocess import normalize_images

        detect = jax.jit(build_detect_fn(cfg, model))
        live = detect(
            variables,
            normalize_images(jnp.asarray(images_u8), cfg.data.mean, cfg.data.std),
            rng,
        )
        np.testing.assert_array_equal(got["valid"], np.asarray(live.valid))
        valid = got["valid"]
        for k in ("boxes", "covs", "probs", "scores", "entropy"):
            np.testing.assert_allclose(
                got[k][valid], np.asarray(getattr(live, k))[valid],
                rtol=1e-5, atol=1e-5,
            )

    def test_shape_guard(self, artifact_path):
        _, _, _, path = artifact_path
        art = ServingArtifact.load(path)
        with pytest.raises(ValueError, match="artifact expects images"):
            art(np.zeros((1, 128, 128, 3), np.uint8))

    @pytest.mark.slow
    def test_fresh_process_load(self, artifact_path):
        """The consumer needs only the loader — no model build, no weights."""
        _, _, _, path = artifact_path
        code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from bayesod_tpu.infer import ServingArtifact
art = ServingArtifact.load({path!r})
out = art(np.zeros((2, 128, 128, 3), np.uint8))
assert out["boxes"].shape[0] == 2
assert np.isfinite(out["boxes"]).all()
print("ARTIFACT_OK", int(out["valid"].sum()))
"""
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=600, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ARTIFACT_OK" in r.stdout
