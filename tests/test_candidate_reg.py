"""Candidates-only regression finals (ops/candidate_reg.py).

Oracles per SURVEY.md §4: exact parity against a dense SAME-conv at
dropout 0, MC-mean convergence at dropout > 0, hash-mask determinism, and
end-to-end detect() parity between the dense and candidates routes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.ops.candidate_reg import LevelTables, candidate_reg_outputs

LEVEL_HW = [(8, 12), (4, 6), (2, 3)]
C, KA = 32, 9
A_TOTAL = sum(h * w * KA for h, w in LEVEL_HW)


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.RandomState(0)
    levels = [
        jnp.asarray(rng.randn(2, h, w, C), jnp.float32) for h, w in LEVEL_HW
    ]
    kernel = jnp.asarray(rng.randn(3, 3, C, KA * 8) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(KA * 8), jnp.float32)
    idx = jnp.asarray(rng.choice(A_TOTAL, size=(2, 50), replace=False), jnp.int32)
    tables = LevelTables(LEVEL_HW, KA)

    def dense():
        outs = []
        for t in levels:
            o = jax.lax.conv_general_dilated(
                t, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            b, h, w, _ = o.shape
            outs.append(o.reshape(b, h * w * KA, 8))
        return np.asarray(jnp.concatenate(outs, axis=1))

    ref = dense()
    gathered = np.stack([ref[b][np.asarray(idx)[b]] for b in range(2)])
    return levels, kernel, bias, idx, tables, gathered


def test_keep1_matches_dense_conv(fixture):
    levels, kernel, bias, idx, tables, gathered = fixture
    out = np.asarray(
        candidate_reg_outputs(levels, kernel, bias, idx, jnp.int32(3), 2, 1.0, tables)
    )
    # bf16-class tolerance: the Pallas gather returns bf16 windows, matching
    # the production trunks' dtype (the fp32 reference conv here is tighter
    # than anything the real model produces).
    np.testing.assert_allclose(out[0], gathered, atol=3e-2)
    np.testing.assert_allclose(out[1], gathered, atol=3e-2)  # no dropout


def test_mc_mean_converges_to_dense(fixture):
    levels, kernel, bias, idx, tables, gathered = fixture
    out = np.asarray(
        candidate_reg_outputs(
            levels, kernel, bias, idx, jnp.int32(3), 256, 0.7, tables
        )
    )
    scale = np.abs(gathered).max()
    assert np.abs(out.mean(0) - gathered).max() / scale < 0.06
    assert not np.allclose(out[0], out[1])  # samples differ


def test_deterministic_and_seed_sensitive(fixture):
    levels, kernel, bias, idx, tables, _ = fixture
    a = candidate_reg_outputs(levels, kernel, bias, idx, jnp.int32(3), 2, 0.7, tables)
    b = candidate_reg_outputs(levels, kernel, bias, idx, jnp.int32(3), 2, 0.7, tables)
    c = candidate_reg_outputs(levels, kernel, bias, idx, jnp.int32(4), 2, 0.7, tables)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_detect_candidates_route_matches_dense_at_rate0():
    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    def mk(reg):
        return ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=128, norm="groupnorm",
                compute_dtype="float32", dropout_rate=0.0,
                head_final_backend="pallas", dropout_layers="last",
                probs_reduce="fused", reg_finals=reg,
            ),
            bayes=BayesConfig(
                num_mc_samples=3, score_threshold=0.0,
                pre_cluster_topk=32, max_detections=8,
            ),
            data=DataConfig(image_hw=(128, 128)),
        )

    cfg_d = mk("dense")
    model_d = RetinaNet(cfg=cfg_d.model, train=False)
    v = init_variables(model_d, jax.random.PRNGKey(0), (128, 128))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
    rng = jax.random.PRNGKey(1)
    out_d = jit_detect_fn(cfg_d, model_d)(v, img, rng)
    cfg_c = mk("candidates")
    out_c = jit_detect_fn(cfg_c, RetinaNet(cfg=cfg_c.model, train=False))(
        v, img, rng
    )
    np.testing.assert_allclose(
        np.asarray(out_d.boxes), np.asarray(out_c.boxes), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_d.probs), np.asarray(out_c.probs), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out_d.valid), np.asarray(out_c.valid)
    )


def test_detect_candidates_route_stochastic_finite():
    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=128, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.3,
            head_final_backend="pallas", dropout_layers="last",
            reg_finals="candidates",
        ),
        bayes=BayesConfig(
            num_mc_samples=4, score_threshold=0.0,
            pre_cluster_topk=32, max_detections=8,
        ),
        data=DataConfig(image_hw=(128, 128)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
    out = jit_detect_fn(cfg, model)(
        v, jnp.ones((1, 128, 128, 3)), jax.random.PRNGKey(1)
    )
    assert bool(jnp.all(jnp.isfinite(out.boxes)))
    assert bool(jnp.all(jnp.isfinite(out.covs)))
    # epistemic variance exists: covs not all ~0 where valid
    assert float(jnp.max(jnp.abs(out.covs))) > 0


def test_candidate_reg_stats_pallas_matches_xla_composition():
    """The fully-fused kernel (ops/pallas/candidate_finals.py) equals the
    XLA composition (same mask streams) to bf16 tolerance."""
    from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

    rng = np.random.RandomState(0)
    level_hw = [(8, 16), (4, 8)]
    levels = [
        jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
        for h, w in level_hw
    ]
    kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
    a_total = sum(h * w * 9 for h, w in level_hw)
    idx = jnp.asarray(
        rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
    )
    tables = LevelTables(level_hw, 9)
    sf = (1.0, 1.0, 2.0, 2.0)
    for keep in (1.0, 0.7):
        st_x = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, sf,
            backend="xla",
        )
        st_p = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, sf,
            backend="pallas",
        )
        d = np.abs(np.asarray(st_x) - np.asarray(st_p))
        scale = np.abs(np.asarray(st_x)).max()
        assert d.max() / scale < 0.02, (keep, d.max(), scale)


def test_detect_candidates_fused_matches_candidates():
    """reg_finals="candidates_fused" (one-kernel stats) == "candidates"
    (per-sample path + mc_box_moments) end to end — same mask streams, so
    only float reordering differs."""
    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    def mk(reg):
        return ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=128, norm="groupnorm",
                compute_dtype="float32", dropout_rate=0.3,
                head_final_backend="pallas", dropout_layers="last",
                probs_reduce="fused", reg_finals=reg,
            ),
            bayes=BayesConfig(
                num_mc_samples=3, score_threshold=0.0,
                pre_cluster_topk=128, max_detections=8,
            ),
            data=DataConfig(image_hw=(128, 128)),
        )

    cfg_c = mk("candidates")
    model = RetinaNet(cfg=cfg_c.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
    rng = jax.random.PRNGKey(1)
    oc = jit_detect_fn(cfg_c, model)(v, img, rng)
    cfg_f = mk("candidates_fused")
    of = jit_detect_fn(cfg_f, RetinaNet(cfg=cfg_f.model, train=False))(
        v, img, rng
    )
    np.testing.assert_allclose(
        np.asarray(oc.boxes), np.asarray(of.boxes), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(oc.probs), np.asarray(of.probs), atol=1e-4
    )
    rel = np.abs(np.asarray(oc.covs) - np.asarray(of.covs)).max() / max(
        np.abs(np.asarray(oc.covs)).max(), 1.0
    )
    assert rel < 1e-3


def test_candidate_cls_probs_pallas_matches_xla():
    from bayesod_tpu.ops.candidate_reg import candidate_cls_probs

    rng = np.random.RandomState(0)
    level_hw = [(8, 16), (4, 8)]
    ncls = 4
    levels = [
        jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
        for h, w in level_hw
    ]
    kernel = jnp.asarray(rng.randn(3, 3, 128, 9 * ncls) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(9 * ncls) * 0.1, jnp.float32)
    a_total = sum(h * w * 9 for h, w in level_hw)
    idx = jnp.asarray(
        rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
    )
    tables = LevelTables(level_hw, 9)
    for keep in (1.0, 0.7):
        px = candidate_cls_probs(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, ncls,
            backend="xla",
        )
        pp = candidate_cls_probs(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, ncls,
            backend="pallas",
        )
        assert float(jnp.max(jnp.abs(px - pp))) < 0.02
        np.testing.assert_allclose(np.asarray(pp).sum(-1), 1.0, atol=1e-4)


def test_detect_deterministic_preselect_route():
    """preselect_source="deterministic": finite outputs, proper categorical
    posteriors, and (threshold 0 + large k) the same detection count as
    the exact mc_mean preselection."""
    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    def mk(src):
        return ExperimentConfig(
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=128, norm="groupnorm",
                compute_dtype="float32", dropout_rate=0.2,
                head_final_backend="pallas", dropout_layers="last",
                probs_reduce="fused", reg_finals="candidates_fused",
            ),
            bayes=BayesConfig(
                num_mc_samples=4, score_threshold=0.0,
                pre_cluster_topk=128, max_detections=8,
                preselect_source=src,
            ),
            data=DataConfig(image_hw=(128, 128)),
        )

    cfg_m = mk("mc_mean")
    model = RetinaNet(cfg=cfg_m.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
    rng = jax.random.PRNGKey(1)
    om = jit_detect_fn(cfg_m, model)(v, img, rng)
    cfg_d = mk("deterministic")
    od = jit_detect_fn(cfg_d, RetinaNet(cfg=cfg_d.model, train=False))(
        v, img, rng
    )
    assert bool(jnp.all(jnp.isfinite(od.boxes)))
    assert bool(jnp.all(jnp.isfinite(od.covs)))
    np.testing.assert_allclose(np.asarray(od.probs).sum(-1), 1.0, atol=1e-4)
    assert int(od.valid.sum()) == int(om.valid.sum())


def test_candidate_stats_int8_table_matches_xla_simulation():
    """head_table_dtype="int8": the Pallas kernel streaming an int8 row
    table equals the XLA oracle consuming dequant(quant(table)) — the
    gather itself is exact (one-hot selection of int8 values), so the two
    routes differ only by the usual bf16 reordering."""
    from bayesod_tpu.ops.candidate_reg import (
        candidate_cls_probs,
        candidate_reg_stats,
    )

    rng = np.random.RandomState(0)
    level_hw = [(8, 16), (4, 8)]
    levels = [
        jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
        for h, w in level_hw
    ]
    kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
    a_total = sum(h * w * 9 for h, w in level_hw)
    idx = jnp.asarray(
        rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
    )
    tables = LevelTables(level_hw, 9)
    sf = (1.0, 1.0, 2.0, 2.0)
    absmax = max(float(jnp.max(jnp.abs(t))) for t in levels)
    scale = absmax / 127.0
    for keep in (1.0, 0.7):
        st_x = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, sf,
            backend="xla", table_scale=scale,
        )
        st_p = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, sf,
            backend="pallas", table_scale=scale,
        )
        d = np.abs(np.asarray(st_x) - np.asarray(st_p))
        span = np.abs(np.asarray(st_x)).max()
        assert d.max() / span < 0.02, (keep, d.max(), span)
        # int8 quantization error vs the bf16 table stays PTQ-small.
        st_b = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables, sf,
            backend="pallas",
        )
        rel = np.abs(np.asarray(st_b) - np.asarray(st_p)).max() / span
        assert rel < 0.15, (keep, rel)

    ncls = 4
    kernel_c = jnp.asarray(rng.randn(3, 3, 128, 9 * ncls) * 0.05, jnp.float32)
    bias_c = jnp.asarray(rng.randn(9 * ncls) * 0.1, jnp.float32)
    px = candidate_cls_probs(
        levels, kernel_c, bias_c, idx, jnp.int32(5), 3, 0.7, tables, ncls,
        backend="xla", table_scale=scale,
    )
    pp = candidate_cls_probs(
        levels, kernel_c, bias_c, idx, jnp.int32(5), 3, 0.7, tables, ncls,
        backend="pallas", table_scale=scale,
    )
    assert float(jnp.max(jnp.abs(px - pp))) < 0.02
    np.testing.assert_allclose(np.asarray(pp).sum(-1), 1.0, atol=1e-4)


def test_detect_int8_table_route_close_to_bf16():
    """End to end: head_table_dtype="int8" through the deterministic-
    preselect candidates route stays close to the bf16-table graph and
    yields finite, valid detections."""
    import dataclasses

    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.calibration import calibrate_serving_scales
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=128, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.3,
            head_final_backend="pallas", dropout_layers="last",
            probs_reduce="fused", reg_finals="candidates_fused",
        ),
        bayes=BayesConfig(
            num_mc_samples=3, score_threshold=0.0,
            pre_cluster_topk=128, max_detections=8,
            preselect_source="deterministic",
        ),
        data=DataConfig(image_hw=(128, 128)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
    rng = jax.random.PRNGKey(1)
    out_bf = jit_detect_fn(cfg, model)(v, img, rng)

    _, _, _, table_scales = calibrate_serving_scales(cfg, v, img)
    cfg8 = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, head_table_dtype="int8",
            head_table_scales=table_scales,
        ),
    )
    out_q = jit_detect_fn(cfg8, RetinaNet(cfg=cfg8.model, train=False))(
        v, img, rng
    )
    assert bool(jnp.all(jnp.isfinite(out_q.boxes)))
    assert int(jnp.sum(out_q.valid)) > 0
    # Same candidate sets (preselection is table-independent), so most box
    # means agree to PTQ tolerance slot-for-slot; a BORDERLINE cluster can
    # flip membership under quantization and reshuffle one slot (the same
    # behavior the quantized shard_map graphs show — CLAUDE.md session
    # 4.3), so assert on the distribution, not the max.
    both = np.asarray(out_bf.valid) & np.asarray(out_q.valid)
    d = np.abs(
        np.asarray(out_bf.boxes) - np.asarray(out_q.boxes)
    ).max(axis=-1)[both]
    assert np.median(d) < 0.5, np.median(d)
    assert (d < 1.0).mean() >= 0.8, d


def test_candidate_finals_sparse_chunk_skip_multichunk():
    """Round-4 sparse-chunk skip: with a table spanning many 512-row
    chunks and candidates CLUSTERED in a few of them, the skipped-chunk
    kernel must still equal the XLA composition exactly (a skipped chunk
    contributes the same zeros the one-hot matmul would have). Also
    covers the spread case (every chunk occupied = old behavior)."""
    from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

    rng = np.random.RandomState(7)
    level_hw = [(32, 64), (16, 32)]  # 2048 + 512 = 2560 rows -> 5 chunks
    levels = [
        jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
        for h, w in level_hw
    ]
    kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
    tables = LevelTables(level_hw, 9)
    # Clustered: anchors from a 10x10 cell patch of level 0 (rows < 650)
    # -> chunks 2..4 have no window rows and take the skip path.
    cells = (rng.choice(10, size=128) * 64 + rng.choice(10, size=128))
    clustered = jnp.asarray(
        np.stack([cells * 9 + rng.choice(9, size=128) for _ in range(2)]),
        jnp.int32,
    )
    a_total = sum(h * w * 9 for h, w in level_hw)
    spread = jnp.asarray(
        rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
    )
    for name, idx in (("clustered", clustered), ("spread", spread)):
        st_x = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, 0.7, tables,
            backend="xla",
        )
        st_p = candidate_reg_stats(
            levels, kernel, bias, idx, jnp.int32(5), 3, 0.7, tables,
            backend="pallas",
        )
        d = np.abs(np.asarray(st_x) - np.asarray(st_p))
        scale = np.abs(np.asarray(st_x)).max()
        assert d.max() / scale < 0.02, (name, d.max(), scale)


def test_preselect_margin_scoring():
    """preselect_scoring="margin": ordering-identical to softmax for a
    binary head (C+1 == 2), and the detect route runs end to end with
    finite outputs for C > 1."""
    from bayesod_tpu.models.retinanet import preselect_scores

    rng = np.random.RandomState(3)
    # Binary case: exact ordering equality (softmax monotone in margin).
    ct = [jnp.asarray(rng.randn(2, 8, 16, 64), jnp.float32)]
    k = jnp.asarray(rng.randn(3, 3, 64, 9 * 2) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(9 * 2) * 0.1, jnp.float32)
    s_soft = preselect_scores(ct, k, b, 9, 2, scoring="softmax")
    s_marg = preselect_scores(ct, k, b, 9, 2, scoring="margin")
    assert (
        np.argsort(np.asarray(s_soft), axis=-1)
        == np.argsort(np.asarray(s_marg), axis=-1)
    ).all()

    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig, DataConfig, ExperimentConfig, ModelConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=128, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.2,
            head_final_backend="pallas", dropout_layers="last",
            probs_reduce="fused", reg_finals="candidates_fused",
        ),
        bayes=BayesConfig(
            num_mc_samples=3, score_threshold=0.0, pre_cluster_topk=128,
            max_detections=8, preselect_source="deterministic",
            preselect_scoring="margin",
        ),
        data=DataConfig(image_hw=(128, 128)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
    out = jit_detect_fn(cfg, model)(
        v, jax.random.uniform(jax.random.PRNGKey(2), (8, 128, 128, 3)),
        jax.random.PRNGKey(1),
    )
    assert bool(jnp.all(jnp.isfinite(out.boxes)))
    assert int(jnp.sum(out.valid)) > 0


class TestTiledTables:
    """Tile-major candidate-table layout (LevelTables(tile_hw=...)):
    layout bijection, cross-layout semantics, and Pallas/XLA parity."""

    def test_flatten_matches_cell_rows(self):
        """flatten()[b, cell_rows(l, y, x)] == levels[l][b, y, x] — the
        layout contract shared by the gather and the kernels."""
        rng = np.random.RandomState(1)
        level_hw = [(8, 12), (4, 6), (2, 3)]
        levels = [
            jnp.asarray(rng.randn(2, h, w, 8), jnp.float32)
            for h, w in level_hw
        ]
        t = LevelTables(level_hw, 9, tile_hw=(4, 4))
        flat = np.asarray(t.flatten(levels))
        for li, (h, w) in enumerate(level_hw):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            rows = np.asarray(
                t.cell_rows(
                    jnp.int32(li), jnp.asarray(ys, jnp.int32),
                    jnp.asarray(xs, jnp.int32),
                )
            )
            assert rows.min() >= 0 and rows.max() < t.total_rows
            assert len(np.unique(rows)) == h * w  # bijection on real rows
            np.testing.assert_array_equal(
                flat[:, rows.reshape(-1)],
                np.asarray(levels[li]).reshape(2, h * w, 8),
            )

    def test_total_rows_padded_to_tiles(self):
        t = LevelTables([(8, 12), (3, 5)], 9, tile_hw=(4, 4))
        # level 0: 8x12 exact; level 1: padded to 4x8
        assert t.total_rows == 8 * 12 + 4 * 8
        assert t.chunk == 16

    def test_tiled_equals_untiled_keep1(self, fixture):
        """Layout is a bijection on real rows -> identical outputs at
        dropout 0 (mask streams key on row ids, so only dropout draws may
        differ between layouts)."""
        levels, kernel, bias, idx, tables, gathered = fixture
        tiled = LevelTables(LEVEL_HW, KA, tile_hw=(4, 4))
        out = np.asarray(
            candidate_reg_outputs(
                levels, kernel, bias, idx, jnp.int32(3), 2, 1.0, tiled
            )
        )
        np.testing.assert_allclose(out[0], gathered, atol=3e-2)

    def test_pallas_matches_xla_tiled(self):
        """The fused kernel on a tile-major table (chunk = one tile) equals
        the XLA composition — incl. dropout (same tiled row ids feed both
        mask streams)."""
        from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

        rng = np.random.RandomState(0)
        level_hw = [(8, 16), (4, 8)]
        levels = [
            jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
            for h, w in level_hw
        ]
        kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
        a_total = sum(h * w * 9 for h, w in level_hw)
        idx = jnp.asarray(
            rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
        )
        tables = LevelTables(level_hw, 9, tile_hw=(4, 32))
        sf = (1.0, 1.0, 2.0, 2.0)
        for keep in (1.0, 0.7):
            st_x = candidate_reg_stats(
                levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables,
                sf, backend="xla",
            )
            st_p = candidate_reg_stats(
                levels, kernel, bias, idx, jnp.int32(5), 3, keep, tables,
                sf, backend="pallas",
            )
            d = np.abs(np.asarray(st_x) - np.asarray(st_p))
            scale = np.abs(np.asarray(st_x)).max()
            assert d.max() / scale < 0.02, (keep, d.max(), scale)

    def test_parse_tile(self):
        from bayesod_tpu.ops.candidate_reg import parse_tile

        assert parse_tile(None) is None
        assert parse_tile("") is None
        assert parse_tile("16x32") == (16, 32)
        with pytest.raises(ValueError, match="16x32"):
            parse_tile("16")
        with pytest.raises(ValueError, match="multiple"):
            parse_tile("3x5")

    def test_detect_route_with_candidate_tile(self):
        """End-to-end detect() on the candidates_fused route with a tiled
        table tracks the untiled run (same weights; dropout draws differ
        by layout, so tolerances are MC-level, guarded by top-score
        agreement)."""
        from bayesod_tpu.infer import jit_detect_fn
        from bayesod_tpu.models.retinanet import RetinaNet, init_variables
        from bayesod_tpu.utils.config import (
            BayesConfig,
            DataConfig,
            ExperimentConfig,
            ModelConfig,
        )

        def mk(tile):
            return ExperimentConfig(
                model=ModelConfig(
                    num_classes=3, backbone="resnet18", fpn_channels=32,
                    head_depth=1, head_channels=128, norm="groupnorm",
                    compute_dtype="float32", dropout_rate=0.0,
                    head_final_backend="pallas", dropout_layers="last",
                    probs_reduce="fused", reg_finals="candidates_fused",
                ),
                bayes=BayesConfig(
                    num_mc_samples=2, score_threshold=0.0,
                    pre_cluster_topk=128, max_detections=8,
                    candidate_tile=tile,
                ),
                data=DataConfig(image_hw=(128, 128)),
            )

        cfg = mk(None)
        model = RetinaNet(cfg=cfg.model, train=False)
        v = init_variables(model, jax.random.PRNGKey(0), (128, 128))
        img = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
        rng = jax.random.PRNGKey(1)
        o0 = jit_detect_fn(cfg, model)(v, img, rng)
        cfg_t = mk("4x32")
        ot = jit_detect_fn(cfg_t, RetinaNet(cfg=cfg_t.model, train=False))(
            v, img, rng
        )
        # dropout 0 -> layouts agree exactly up to float reassociation
        np.testing.assert_allclose(
            np.asarray(o0.boxes), np.asarray(ot.boxes), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(o0.probs), np.asarray(ot.probs), atol=1e-4
        )


def test_preselect_scoring_validated():
    """Unknown scoring values must error, not silently fall through to
    softmax (round-4 advisor finding)."""
    from bayesod_tpu.models.retinanet import preselect_scores

    rng = np.random.RandomState(3)
    ct = [jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)]
    k = jnp.asarray(rng.randn(3, 3, 16, 9 * 2) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(9 * 2) * 0.1, jnp.float32)
    with pytest.raises(ValueError, match="preselect_scoring"):
        preselect_scores(ct, k, b, 9, 2, scoring="Margin")


class TestCandidateSort:
    """Row-sorted candidates + block-gated gather (round 5): exact
    order-restoration and route-level equivalence."""

    def test_sort_unsort_roundtrip(self):
        from bayesod_tpu.ops.candidate_reg import (
            candidate_sort,
            candidate_unsort,
        )

        rng = np.random.RandomState(0)
        tables = LevelTables(LEVEL_HW, KA)
        idx = jnp.asarray(
            rng.choice(A_TOTAL, size=(3, 40), replace=False), jnp.int32
        )
        idx_s, orig_pos = candidate_sort(idx, tables)
        # sorted by center row, a permutation of the original set
        level, cy, cx, _, _, _ = tables.decompose(idx_s)
        rows = np.asarray(tables.cell_rows(level, cy, cx))
        assert (np.diff(rows, axis=-1) >= 0).all()
        assert (
            np.sort(np.asarray(idx_s), axis=-1)
            == np.sort(np.asarray(idx), axis=-1)
        ).all()
        # unsort restores any per-candidate payload exactly
        payload = jnp.asarray(rng.randn(3, 40, 5), jnp.float32)
        # payload laid out in SORTED order == original payload gathered
        gathered = np.stack([
            np.asarray(payload)[b][
                np.argsort(np.asarray(orig_pos)[b], kind="stable")
            ] for b in range(3)
        ])
        # candidate_unsort(sorted payload) must reproduce payload
        sorted_payload = np.stack([
            np.asarray(payload)[b][np.asarray(orig_pos)[b].argsort()]
            for b in range(3)
        ])
        # simpler identity: build sorted view s with s[i] = payload[?]
        # such that unsort(s)[orig_pos[i]] == s[i]
        out = np.asarray(candidate_unsort(payload, orig_pos))
        for b in range(3):
            op = np.asarray(orig_pos)[b]
            np.testing.assert_array_equal(out[b][op], np.asarray(payload)[b])

    def test_sorted_equals_unsorted_route(self):
        """candidate_reg_stats pallas route: sort on vs off is numerically
        identical (masks key on absolute rows; unsort is exact)."""
        from bayesod_tpu.ops.candidate_reg import candidate_reg_stats

        rng = np.random.RandomState(0)
        level_hw = [(8, 16), (4, 8)]
        levels = [
            jnp.asarray(rng.randn(2, h, w, 128) * 0.5, jnp.float32)
            for h, w in level_hw
        ]
        kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
        a_total = sum(h * w * 9 for h, w in level_hw)
        idx = jnp.asarray(
            rng.choice(a_total, size=(2, 128), replace=False), jnp.int32
        )
        sf = (1.0, 1.0, 2.0, 2.0)
        for keep in (1.0, 0.7):
            outs = {}
            for sort in (True, False):
                tables = LevelTables(level_hw, 9, sort_candidates=sort)
                outs[sort] = np.asarray(candidate_reg_stats(
                    levels, kernel, bias, idx, jnp.int32(5), 3, keep,
                    tables, sf, backend="pallas",
                ))
            np.testing.assert_allclose(
                outs[True], outs[False], rtol=1e-6, atol=1e-5
            )


class TestResidentTable:
    def test_resident_equals_dma_bitwise(self):
        """table_input="resident" (whole per-image table as a pipelined
        VMEM block) vs "dma" (manual chunk streaming): identical chunk
        loop and math, so outputs must be BIT-equal — stats and probs,
        bf16 and int8 tables, with and without dropout."""
        from bayesod_tpu.ops.candidate_reg import tap_major_rows
        from bayesod_tpu.ops.pallas.candidate_finals import (
            candidate_finals_probs,
            candidate_finals_stats,
        )

        rng = np.random.RandomState(3)
        level_hw = [(16, 32), (8, 16)]
        tables = LevelTables(level_hw, 9)
        b, c = 2, 128
        flat = jnp.asarray(
            rng.randn(b, tables.total_rows, c) * 0.5, jnp.bfloat16
        )
        kernel = jnp.asarray(rng.randn(3, 3, c, 72) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
        a_total = sum(h * w * 9 for h, w in level_hw)
        idx = jnp.asarray(
            np.stack([
                np.sort(rng.choice(a_total, size=128, replace=False))
                for _ in range(b)
            ]),
            jnp.int32,
        )
        rows_pm, a_idx = tap_major_rows(idx, tables)
        for scale in (None, 0.05):
            f = flat
            if scale is not None:
                from bayesod_tpu.models.quant import quantize_act

                f = quantize_act(flat, scale)
            for keep in (1.0, 0.7):
                outs = {}
                for ti in ("dma", "resident", "gated"):
                    st = candidate_finals_stats(
                        f, rows_pm, a_idx, kernel, bias, jnp.int32(5), 3,
                        keep, 9, chunk=tables.chunk, table_scale=scale,
                        table_input=ti,
                    )
                    pr = candidate_finals_probs(
                        f, rows_pm, a_idx, kernel, bias, jnp.int32(7), 3,
                        keep, 9, 8, chunk=tables.chunk, table_scale=scale,
                        table_input=ti,
                    )
                    outs[ti] = (np.asarray(st), np.asarray(pr))
                for ti in ("resident", "gated"):
                    np.testing.assert_array_equal(outs["dma"][0], outs[ti][0])
                    np.testing.assert_array_equal(outs["dma"][1], outs[ti][1])

    def test_table_input_validated(self):
        from bayesod_tpu.ops.candidate_reg import tap_major_rows
        from bayesod_tpu.ops.pallas.candidate_finals import (
            candidate_finals_stats,
        )

        rng = np.random.RandomState(0)
        level_hw = [(8, 16)]
        tables = LevelTables(level_hw, 9)
        flat = jnp.asarray(
            rng.randn(1, tables.total_rows, 128) * 0.5, jnp.bfloat16
        )
        kernel = jnp.asarray(rng.randn(3, 3, 128, 72) * 0.05, jnp.float32)
        bias = jnp.zeros((72,), jnp.float32)
        idx = jnp.asarray(
            rng.choice(8 * 16 * 9, size=(1, 128), replace=False), jnp.int32
        )
        rows_pm, a_idx = tap_major_rows(idx, tables)
        with pytest.raises(ValueError, match="table_input"):
            candidate_finals_stats(
                flat, rows_pm, a_idx, kernel, bias, jnp.int32(5), 1, 1.0,
                9, chunk=tables.chunk, table_input="vmem",
            )
