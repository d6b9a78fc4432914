"""Shape-golden + stochasticity tests for the model stack (SURVEY.md §7.2).

Uses a small resnet18 backbone + fp32 compute on CPU for speed; the module
structure (and hence param tree / output layout) is identical to resnet50.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.models import RetinaNet, init_variables, mc_forward, single_forward
from bayesod_tpu.ops.anchors import AnchorConfig, generate_anchors, level_anchor_counts
from bayesod_tpu.utils.config import ModelConfig

HW = (128, 128)
CFG = ModelConfig(
    num_classes=3, backbone="resnet18", fpn_channels=32, head_depth=2,
    head_channels=32, dropout_rate=0.5, norm="groupnorm", compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = RetinaNet(cfg=CFG, train=False)
    variables = init_variables(model, jax.random.key(0), HW)
    return model, variables


def test_forward_shapes_match_anchor_layout(model_and_vars):
    model, variables = model_and_vars
    images = jnp.zeros((2, *HW, 3))
    logits, deltas, log_vars = single_forward(model, variables, images)
    a_total = sum(level_anchor_counts(HW, AnchorConfig()))
    assert logits.shape == (2, a_total, CFG.num_classes + 1)
    assert deltas.shape == (2, a_total, 4)
    assert log_vars.shape == (2, a_total, 4)
    assert logits.dtype == jnp.float32
    anchors = generate_anchors(HW, AnchorConfig())
    assert anchors.shape[0] == a_total


def test_prior_prob_bias_init(model_and_vars):
    """At init, softmax background mass should be ~ (1 - pi) per anchor."""
    model, variables = model_and_vars
    images = jnp.zeros((1, *HW, 3))
    logits, _, _ = single_forward(model, variables, images)
    probs = jax.nn.softmax(logits, axis=-1)
    bg = np.asarray(probs[..., 0])
    # 3 fg classes at pi=0.01 each -> bg ~ 0.97; allow conv-noise slack
    assert bg.mean() > 0.9


def test_mc_forward_stochasticity(model_and_vars):
    model, variables = model_and_vars
    images = jnp.ones((1, *HW, 3)) * 0.5
    logits, deltas, log_vars = mc_forward(
        model, variables, images, jax.random.key(1), num_samples=4
    )
    assert logits.shape[0] == 4 and deltas.shape[0] == 4
    # different dropout keys -> different head outputs
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))
    # same rng -> bitwise reproducible
    logits2, _, _ = mc_forward(
        model, variables, images, jax.random.key(1), num_samples=4
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_deterministic_path_has_no_dropout(model_and_vars):
    model, variables = model_and_vars
    images = jnp.ones((1, *HW, 3)) * 0.5
    a = single_forward(model, variables, images)
    b = single_forward(model, variables, images)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_batchnorm_variant_initializes_batch_stats():
    cfg = ModelConfig(
        num_classes=2, backbone="resnet18", fpn_channels=16, head_depth=1,
        head_channels=16, norm="batchnorm", compute_dtype="float32",
    )
    model = RetinaNet(cfg=cfg, train=False)
    variables = init_variables(model, jax.random.key(0), (128, 128))
    assert "batch_stats" in variables
    logits, _, _ = single_forward(model, variables, jnp.zeros((1, 128, 128, 3)))
    assert logits.shape[1] == sum(level_anchor_counts((128, 128), AnchorConfig()))


def test_int8_backbone_serves_bf16_checkpoint(model_and_vars):
    """backbone_dtype="int8" uses the SAME parameter tree (names/shapes match
    nn.Conv) and yields near-identical outputs — train bf16, serve int8."""
    import dataclasses

    model, variables = model_and_vars
    m_q = RetinaNet(
        cfg=dataclasses.replace(CFG, backbone_dtype="int8"), train=False
    )
    x = jax.random.uniform(jax.random.key(1), (2, *HW, 3))
    logits_b, deltas_b, _ = single_forward(model, variables, x)
    logits_q, deltas_q, _ = single_forward(m_q, variables, x)
    probs_b = np.asarray(jax.nn.softmax(logits_b.astype(jnp.float32), -1))
    probs_q = np.asarray(jax.nn.softmax(logits_q.astype(jnp.float32), -1))
    assert np.abs(probs_b - probs_q).max() < 0.05
    assert np.abs(np.asarray(deltas_b) - np.asarray(deltas_q)).mean() < 0.05
