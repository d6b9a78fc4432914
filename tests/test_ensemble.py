"""Deep-ensemble epistemic mode (BayesConfig.epistemic — the framework's
extension beyond the reference's MC dropout; SURVEY.md §2 lists MC dropout
as the reference's only epistemic source).

Semantics pinned here:
- identical members carry ZERO epistemic spread (ensemble_forward output
  variance across the sample axis is exactly 0, and equals single_forward);
- distinct members disagree (positive spread);
- ensemble_mc composes member x dropout axes (S = M * mc, member-major);
- the detect() pipeline runs end-to-end on stacked variables and the
  Detector.from_ensemble API round-trips raw uint8 images;
- misuse (single-pass estimator + ensemble, quantizing a stacked tree,
  1-member stacks) fails loudly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.infer import build_detect_fn
from bayesod_tpu.infer.api import Detector
from bayesod_tpu.models.retinanet import (
    RetinaNet,
    ensemble_forward,
    init_variables,
    member_variables,
    single_forward,
    stack_variables,
)
from tests.test_detector import tiny_config


def ens_config(epistemic="ensemble", mode="bayes_od", num_mc=2):
    cfg = tiny_config(mode=mode, num_mc=num_mc)
    return dataclasses.replace(
        cfg, bayes=dataclasses.replace(cfg.bayes, epistemic=epistemic)
    )


@pytest.fixture(scope="module")
def three_members():
    cfg = ens_config()
    model = RetinaNet(cfg=cfg.model, train=False)
    trees = [
        init_variables(model, jax.random.PRNGKey(i), cfg.data.image_hw)
        for i in range(3)
    ]
    return cfg, model, trees


class TestEnsembleForward:
    def test_identical_members_zero_epistemic(self, three_members):
        cfg, model, trees = three_members
        stacked = stack_variables([trees[0], trees[0], trees[0]])
        images = jax.random.uniform(jax.random.PRNGKey(9), (1, 128, 128, 3))
        logits, deltas, log_vars = jax.jit(
            lambda v, im: ensemble_forward(
                model, v, im, jax.random.PRNGKey(0), mc_per_member=0
            )
        )(stacked, images)
        assert logits.shape[0] == 3
        for t in (logits, deltas, log_vars):
            spread = jnp.abs(t - t[0]).max()
            assert float(spread) == 0.0
        # vmap batches the convs (different XLA tiling), so parity with the
        # unbatched pass is numerical, not bitwise.
        ref_logits, ref_deltas, _ = single_forward(model, trees[0], images)
        np.testing.assert_allclose(
            np.asarray(logits[0]), np.asarray(ref_logits), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(deltas[0]), np.asarray(ref_deltas), atol=1e-5
        )

    def test_distinct_members_disagree(self, three_members):
        cfg, model, trees = three_members
        stacked = stack_variables(trees)
        images = jax.random.uniform(jax.random.PRNGKey(9), (1, 128, 128, 3))
        logits, _, _ = ensemble_forward(
            model, stacked, images, jax.random.PRNGKey(0), mc_per_member=0
        )
        assert float(jnp.abs(logits[1] - logits[0]).max()) > 0.0

    def test_ensemble_mc_axis_layout(self, three_members):
        cfg, model, trees = three_members
        stacked = stack_variables(trees)
        images = jax.random.uniform(jax.random.PRNGKey(9), (1, 128, 128, 3))
        logits, deltas, log_vars = ensemble_forward(
            model, stacked, images, jax.random.PRNGKey(0), mc_per_member=2
        )
        # S = M * mc, member-major: rows {0,1} share member 0's weights.
        assert logits.shape[0] == 6 and deltas.shape[0] == 6
        # dropout makes the two samples of one member differ...
        assert float(jnp.abs(logits[1] - logits[0]).max()) > 0.0
        # ...but much less than two different members do (same trunk feats).
        inner = float(jnp.abs(deltas[1] - deltas[0]).mean())
        cross = float(jnp.abs(deltas[2] - deltas[0]).mean())
        assert cross > inner

    def test_member_roundtrip(self, three_members):
        _, _, trees = three_members
        stacked = stack_variables(trees)
        back = member_variables(stacked, 1)
        a = jax.tree_util.tree_leaves(back)
        b = jax.tree_util.tree_leaves(trees[1])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_stack_requires_two(self, three_members):
        _, _, trees = three_members
        with pytest.raises(ValueError, match=">= 2 members"):
            stack_variables(trees[:1])


class TestEnsembleDetect:
    def test_detect_end_to_end(self, three_members):
        cfg, model, trees = three_members
        stacked = stack_variables(trees)
        detect = jax.jit(build_detect_fn(cfg, model))
        images = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
        out = detect(stacked, images, jax.random.PRNGKey(1))
        d = cfg.bayes.max_detections
        assert out.boxes.shape == (2, d, 4)
        assert np.isfinite(np.asarray(out.boxes)).all()
        assert np.isfinite(np.asarray(out.covs)).all()
        probs = np.asarray(out.probs)
        valid = np.asarray(out.valid)
        assert valid.any()
        np.testing.assert_allclose(
            probs[valid].sum(-1), 1.0, atol=1e-4
        )

    def test_ensemble_mc_detect(self, three_members):
        cfg, model, trees = three_members
        cfg_mc = ens_config(epistemic="ensemble_mc")
        stacked = stack_variables(trees)
        detect = jax.jit(build_detect_fn(cfg_mc, model))
        images = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 3))
        out = detect(stacked, images, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out.boxes)).all()

    def test_identical_members_match_zero_rate_mc(self, three_members):
        """Identical members through 'ensemble' == mc_dropout at
        dropout_rate=0: both produce 3 identical samples, so the whole
        BayesOD posterior (boxes, covariances, categoricals) must agree —
        pins that the ensemble route feeds the same moments/clustering/
        fusion machinery, with epistemic spread exactly zero."""
        cfg, model, trees = three_members
        cfg0 = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dropout_rate=0.0)
        )
        cfg_mc = dataclasses.replace(
            cfg0,
            bayes=dataclasses.replace(
                cfg0.bayes, epistemic="mc_dropout", num_mc_samples=3
            ),
        )
        cfg_ens = dataclasses.replace(
            cfg0, bayes=dataclasses.replace(cfg0.bayes, epistemic="ensemble")
        )
        model0 = RetinaNet(cfg=cfg0.model, train=False)
        images = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 3))
        out_mc = jax.jit(build_detect_fn(cfg_mc, model0))(
            trees[0], images, jax.random.PRNGKey(1)
        )
        out_ens = jax.jit(build_detect_fn(cfg_ens, model0))(
            stack_variables([trees[0]] * 3), images, jax.random.PRNGKey(1)
        )
        np.testing.assert_array_equal(
            np.asarray(out_mc.valid), np.asarray(out_ens.valid)
        )
        valid = np.asarray(out_mc.valid)
        for a, b in ((out_mc.boxes, out_ens.boxes),
                     (out_mc.covs, out_ens.covs),
                     (out_mc.probs, out_ens.probs)):
            np.testing.assert_allclose(
                np.asarray(a)[valid], np.asarray(b)[valid],
                rtol=1e-4, atol=1e-4,
            )

    def test_single_pass_plus_ensemble_raises(self, three_members):
        cfg, model, _ = three_members
        bad = ens_config(mode="sampling_free")
        with pytest.raises(ValueError, match="single-deterministic-pass"):
            build_detect_fn(bad, model)

    def test_bad_epistemic_raises(self, three_members):
        cfg, model, _ = three_members
        bad = ens_config(epistemic="laplace")
        with pytest.raises(ValueError, match="unknown epistemic"):
            build_detect_fn(bad, model)


class TestDetectorFromEnsemble:
    def test_random_members_api(self):
        cfg = ens_config()
        det = Detector.from_ensemble(cfg, members=3, batch_size=1)
        img = (np.random.default_rng(0).uniform(0, 255, (96, 160, 3))).astype(
            np.uint8
        )
        out = det([img])
        assert len(out) == 1
        assert out[0]["boxes"].shape[-1] == 4

    def test_auto_sets_epistemic(self):
        cfg = tiny_config()  # epistemic defaults to mc_dropout
        det = Detector.from_ensemble(cfg, members=2)
        assert det.cfg.bayes.epistemic == "ensemble"

    def test_quantized_guard(self):
        cfg = ens_config()
        det = Detector.from_ensemble(cfg, members=2)
        with pytest.raises(ValueError, match="ONE weight set"):
            det.quantized([np.zeros((64, 64, 3), np.uint8)])


class TestEnsembleMeshServing:
    def test_member_parallel_matches_unsharded(self, three_members, cpu_devices):
        """Member-parallel serving: shard the stacked member-weights axis
        over the mesh's `sample` axis — each device runs its members' full
        forwards (weights AND compute local), GSPMD inserts only the final
        mean-softmax / moment collectives. Must match the unsharded
        ensemble bit-for-bit up to reduction order."""
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, trees = three_members
        # 4 members so the member axis splits evenly over sample_parallel=4.
        trees4 = trees + [trees[0]]
        stacked = stack_variables(trees4)
        images = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
        rng = jax.random.PRNGKey(1)
        base = jax.jit(build_detect_fn(cfg, model))(stacked, images, rng)

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        member_sharding = mesh_lib.sample_sharding(mesh, mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                member_sharding,
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(
            jax.device_put(stacked, member_sharding), images, rng
        )
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(base.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out.boxes), np.asarray(base.boxes), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.probs), np.asarray(base.probs), atol=1e-5
        )

    def test_member_parallel_ensemble_mc(self, three_members, cpu_devices):
        """ensemble_mc under a PURE member-parallel mesh (dp=1): dropout
        keys are split from GLOBAL member indices outside the shard_map
        and each device sees the full batch, so every (member, sample)
        mask stream is placement-independent — sharded == unsharded.
        (dp>1 shards the batch axis, which re-blocks the flax dropout
        draws within an image: distributionally identical but not
        bit-equal — ensemble_forward_sp docstring.)"""
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, trees = three_members
        cfg_mc = ens_config(epistemic="ensemble_mc")
        trees8 = [trees[i % 3] for i in range(8)]
        stacked = stack_variables(trees8)
        images = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
        rng = jax.random.PRNGKey(1)
        base = jax.jit(build_detect_fn(cfg_mc, model))(stacked, images, rng)

        mesh_cfg = MeshConfig(data_parallel=1, sample_parallel=8)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        member_sharding = mesh_lib.sample_sharding(mesh, mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg_mc, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                member_sharding,
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(jax.device_put(stacked, member_sharding), images, rng)
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(base.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out.boxes), np.asarray(base.boxes), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.probs), np.asarray(base.probs), atol=1e-5
        )

    def test_member_mesh_divisibility_guard(self, three_members, cpu_devices):
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg, model, trees = three_members
        stacked = stack_variables(trees)  # 3 members, sp=4 -> indivisible
        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        detect = build_detect_fn(cfg, model, mesh=mesh, mesh_cfg=mesh_cfg)
        images = jnp.ones((2, 128, 128, 3), jnp.float32)
        with pytest.raises(ValueError, match="divisible"):
            detect(stacked, images, jax.random.PRNGKey(1))


class TestEnsembleCandidatesFastPath:
    """Pure-ensemble fused fast path (reg_finals='candidates_fused' with
    epistemic='ensemble'): per-member deterministic passes + the fused
    candidate-stats kernel per member, member-mean stats == M-sample
    moments (the REG_STATS accumulator is linear in samples). Must match
    the dense ensemble route up to float reordering."""

    def _mk(self, reg):
        cfg = ens_config()
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, reg_finals=reg, dropout_layers="last",
                head_channels=128,
            ),
            bayes=dataclasses.replace(cfg.bayes, pre_cluster_topk=128),
        )

    @pytest.fixture(scope="class")
    def members128(self):
        cfg = self._mk("dense")
        model = RetinaNet(cfg=cfg.model, train=False)
        trees = [
            init_variables(model, jax.random.PRNGKey(i), cfg.data.image_hw)
            for i in range(3)
        ]
        return trees

    def test_fast_path_matches_dense(self, members128):
        cfg_d = self._mk("dense")
        cfg_f = self._mk("candidates_fused")
        stacked = stack_variables(members128)
        images = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
        rng = jax.random.PRNGKey(1)
        out_d = jax.jit(
            build_detect_fn(cfg_d, RetinaNet(cfg=cfg_d.model, train=False))
        )(stacked, images, rng)
        out_f = jax.jit(
            build_detect_fn(cfg_f, RetinaNet(cfg=cfg_f.model, train=False))
        )(stacked, images, rng)
        np.testing.assert_array_equal(
            np.asarray(out_d.valid), np.asarray(out_f.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out_d.boxes), np.asarray(out_f.boxes), atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(out_d.probs), np.asarray(out_f.probs), atol=1e-4
        )
        scale = np.abs(np.asarray(out_d.covs)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(out_d.covs) / scale,
            np.asarray(out_f.covs) / scale,
            atol=2e-2,
        )
        # Distinct members -> real epistemic spread survives the fast path.
        assert float(np.abs(np.asarray(out_f.covs)).max()) > 0.0

    def test_member_parallel_fast_path_matches_unsharded(
        self, members128, cpu_devices
    ):
        from bayesod_tpu.parallel import mesh as mesh_lib
        from bayesod_tpu.utils.config import MeshConfig

        cfg_f = self._mk("candidates_fused")
        model = RetinaNet(cfg=cfg_f.model, train=False)
        trees4 = members128 + [members128[0]]
        stacked = stack_variables(trees4)
        images = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
        rng = jax.random.PRNGKey(1)
        base = jax.jit(build_detect_fn(cfg_f, model))(stacked, images, rng)

        mesh_cfg = MeshConfig(data_parallel=2, sample_parallel=4)
        mesh = mesh_lib.make_mesh(mesh_cfg)
        member_sharding = mesh_lib.sample_sharding(mesh, mesh_cfg)
        detect = jax.jit(
            build_detect_fn(cfg_f, model, mesh=mesh, mesh_cfg=mesh_cfg),
            in_shardings=(
                member_sharding,
                mesh_lib.batch_sharding(mesh, mesh_cfg),
                mesh_lib.replicated(mesh),
            ),
        )
        out = detect(jax.device_put(stacked, member_sharding), images, rng)
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(base.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out.boxes), np.asarray(base.boxes), atol=1e-3,
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.probs), np.asarray(base.probs), atol=1e-5
        )


class TestAverageVariables:
    def test_uniform_and_weighted(self, three_members):
        from bayesod_tpu.models.retinanet import average_variables

        _, _, trees = three_members
        avg = average_variables(trees)
        a0 = jax.tree_util.tree_leaves(trees[0])
        a1 = jax.tree_util.tree_leaves(trees[1])
        a2 = jax.tree_util.tree_leaves(trees[2])
        for got, x, y, z in zip(jax.tree_util.tree_leaves(avg), a0, a1, a2):
            np.testing.assert_allclose(
                np.asarray(got),
                (np.asarray(x, np.float32) + np.asarray(y, np.float32)
                 + np.asarray(z, np.float32)) / 3.0,
                rtol=1e-6, atol=1e-6,
            )
        # degenerate weights pick one member exactly (up to dtype roundtrip)
        one = average_variables(trees, weights=[0.0, 1.0, 0.0])
        for got, y in zip(jax.tree_util.tree_leaves(one), a1):
            np.testing.assert_allclose(np.asarray(got), np.asarray(y), atol=1e-7)

    def test_average_serves(self, three_members):
        from bayesod_tpu.models.retinanet import average_variables

        cfg, model, trees = three_members
        import dataclasses

        cfg1 = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, epistemic="mc_dropout")
        )
        detect = jax.jit(build_detect_fn(cfg1, model))
        out = detect(
            average_variables(trees),
            jnp.ones((1, 128, 128, 3), jnp.float32),
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(np.asarray(out.boxes)).all()

    def test_guards(self, three_members):
        from bayesod_tpu.models.retinanet import average_variables

        _, _, trees = three_members
        with pytest.raises(ValueError, match=">= 2"):
            average_variables(trees[:1])
        with pytest.raises(ValueError, match="len"):
            average_variables(trees, weights=[1.0])
