"""Unit tests for target assignment and the two training losses.

Strategy per SURVEY.md §4: hand-computed scalars on tiny inputs — the
reference has no test suite, so analytic values are the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.losses import (
    assign_targets,
    attenuated_regression_loss,
    detection_loss,
    focal_loss,
)
from bayesod_tpu.ops import boxes as box_ops


def _mk_anchors():
    # Three disjoint anchors plus one overlapping the first.
    return jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],  # IoU with gt0 high
            [50.0, 50.0, 60.0, 60.0],
            [100.0, 100.0, 110.0, 110.0],
        ],
        jnp.float32,
    )


class TestAssignTargets:
    def test_basic_pos_neg_ignore(self):
        anchors = _mk_anchors()
        gt_boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]], jnp.float32)
        gt_classes = jnp.array([2], jnp.int32)
        gt_valid = jnp.array([True])
        t = assign_targets(anchors, gt_boxes, gt_classes, gt_valid)
        # anchor0 IoU=1 -> positive class 2; anchor1 IoU ~ 0.68 -> positive.
        np.testing.assert_array_equal(np.array(t.positive), [True, True, False, False])
        np.testing.assert_array_equal(np.array(t.class_targets), [2, 2, 0, 0])
        assert not bool(t.ignored[2]) and not bool(t.ignored[3])

    def test_ignore_band(self):
        anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]], jnp.float32)
        # IoU exactly 0.45: overlap 45 out of union 100 -> ignored band.
        gt = jnp.array([[0.0, 0.0, 10.0, 4.5]], jnp.float32)
        t = assign_targets(
            anchors,
            gt,
            jnp.array([1], jnp.int32),
            jnp.array([True]),
            iou_positive=0.5,
            iou_negative=0.4,
        )
        # ...but the force-match claims this anchor (it is the GT's best).
        assert bool(t.positive[0])

    def test_ignore_band_without_force(self):
        anchors = jnp.array(
            [[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 5.0]], jnp.float32
        )
        gt = jnp.array([[0.0, 0.0, 10.0, 4.5]], jnp.float32)
        t = assign_targets(
            anchors, gt, jnp.array([1], jnp.int32), jnp.array([True])
        )
        # anchor1 (IoU=0.9) takes the force-match; anchor0 IoU=0.45 -> ignored.
        assert bool(t.positive[1])
        assert bool(t.ignored[0]) and not bool(t.positive[0])

    def test_padding_never_matches(self):
        anchors = _mk_anchors()
        gt_boxes = jnp.array(
            [[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]], jnp.float32
        )
        gt_classes = jnp.array([1, 3], jnp.int32)
        gt_valid = jnp.array([True, False])  # second row is padding
        t = assign_targets(anchors, gt_boxes, gt_classes, gt_valid)
        assert not bool(t.positive[2])  # overlaps only the padded row
        assert int(t.class_targets[2]) == 0

    def test_no_valid_gt(self):
        anchors = _mk_anchors()
        gt_boxes = jnp.zeros((2, 4), jnp.float32)
        t = assign_targets(
            anchors, gt_boxes, jnp.zeros(2, jnp.int32), jnp.zeros(2, bool)
        )
        assert not bool(jnp.any(t.positive))
        assert not bool(jnp.any(t.ignored))

    def test_box_targets_roundtrip(self):
        anchors = _mk_anchors()
        gt_boxes = jnp.array([[2.0, 1.0, 12.0, 9.0]], jnp.float32)
        t = assign_targets(
            anchors, gt_boxes, jnp.array([1], jnp.int32), jnp.array([True])
        )
        decoded = box_ops.decode_boxes(t.box_targets[:1], anchors[:1])
        np.testing.assert_allclose(np.array(decoded[0]), [2, 1, 12, 9], atol=1e-4)


def _targets(class_t, positive, ignored, box_t=None, a=4):
    from bayesod_tpu.losses.targets import AnchorTargets

    return AnchorTargets(
        class_targets=jnp.asarray(class_t, jnp.int32),
        box_targets=(
            jnp.zeros((len(class_t), 4), jnp.float32) if box_t is None else box_t
        ),
        positive=jnp.asarray(positive, bool),
        ignored=jnp.asarray(ignored, bool),
    )


class TestFocalLoss:
    def test_hand_computed_value(self):
        # One positive anchor (class 1), uniform logits over 3 classes.
        logits = jnp.zeros((1, 3), jnp.float32)
        t = _targets([1], [True], [False])
        p = 1.0 / 3.0
        expected = -0.25 * (1 - p) ** 2.0 * np.log(p)
        got = float(focal_loss(logits, t, alpha=0.25, gamma=2.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_background_alpha(self):
        logits = jnp.zeros((1, 3), jnp.float32)
        t = _targets([0], [False], [False])
        p = 1.0 / 3.0
        expected = -0.75 * (1 - p) ** 2.0 * np.log(p)  # num_pos clamps to 1
        got = float(focal_loss(logits, t))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_ignored_contributes_zero(self):
        logits = jnp.array([[5.0, -5.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
        t_ign = _targets([0, 1], [False, True], [True, False])
        t_only = _targets([1], [True], [False])
        np.testing.assert_allclose(
            float(focal_loss(logits, t_ign)),
            float(focal_loss(logits[1:], t_only)),
            rtol=1e-6,
        )

    def test_perfect_prediction_near_zero(self):
        logits = jnp.array([[0.0, 50.0, 0.0]], jnp.float32)
        t = _targets([1], [True], [False])
        assert float(focal_loss(logits, t)) < 1e-6


class TestAttenuatedRegression:
    def test_zero_error_zero_logvar(self):
        t = _targets([1], [True], [False], box_t=jnp.zeros((1, 4), jnp.float32))
        loss = attenuated_regression_loss(
            jnp.zeros((1, 4)), jnp.zeros((1, 4)), t
        )
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)

    def test_hand_computed_l2(self):
        # err = 1 per coord, s = 0 -> 0.5 per coord -> 2.0 total.
        t = _targets([1], [True], [False], box_t=jnp.ones((1, 4), jnp.float32))
        loss = attenuated_regression_loss(
            jnp.zeros((1, 4)), jnp.zeros((1, 4)), t, residual="l2"
        )
        np.testing.assert_allclose(float(loss), 2.0, rtol=1e-6)

    def test_variance_attenuates(self):
        # Larger predicted variance must reduce the error term's weight.
        t = _targets([1], [True], [False], box_t=jnp.ones((1, 4), jnp.float32))
        lo = attenuated_regression_loss(jnp.zeros((1, 4)), jnp.zeros((1, 4)), t)
        hi = attenuated_regression_loss(
            jnp.zeros((1, 4)), jnp.full((1, 4), 2.0), t
        )
        # err=1: s=0 -> 0.5/coord; s=2 -> 0.5*e^-2 + 1 = 1.068 -> larger total,
        # but the *error* part shrank; optimal s for err=1 is s=0 exactly.
        s_opt = attenuated_regression_loss(
            jnp.zeros((1, 4)), jnp.zeros((1, 4)), t
        )
        assert float(s_opt) <= float(hi)
        # For err=2, s=log(4) is optimal and beats s=0.
        t2 = _targets([1], [True], [False], box_t=jnp.full((1, 4), 2.0))
        s0 = attenuated_regression_loss(jnp.zeros((1, 4)), jnp.zeros((1, 4)), t2)
        sopt = attenuated_regression_loss(
            jnp.zeros((1, 4)), jnp.full((1, 4), float(np.log(4.0))), t2
        )
        assert float(sopt) < float(s0)

    def test_variance_warmup_weight_zero_is_plain_residual(self):
        # w=0: loss is the plain residual — no s terms, no ds gradient.
        t = _targets([1], [True], [False], box_t=jnp.full((1, 4), 2.0))
        deltas = jnp.zeros((1, 4))
        log_vars = jnp.full((1, 4), 3.0)
        loss = attenuated_regression_loss(
            deltas, log_vars, t, residual="l2", variance_weight=0.0
        )
        np.testing.assert_allclose(float(loss), 4 * 0.5 * 4.0, rtol=1e-6)
        ds = jax.grad(
            lambda s: attenuated_regression_loss(
                deltas, s, t, residual="l2", variance_weight=0.0
            )
        )(log_vars)
        np.testing.assert_allclose(np.array(ds), 0.0, atol=1e-8)

    def test_variance_warmup_interpolates_linearly(self):
        t = _targets([1], [True], [False], box_t=jnp.full((1, 4), 2.0))
        deltas = jnp.zeros((1, 4))
        log_vars = jnp.full((1, 4), 1.5)
        vals = {
            w: float(
                attenuated_regression_loss(
                    deltas, log_vars, t, residual="huber", variance_weight=w
                )
            )
            for w in (0.0, 0.5, 1.0)
        }
        np.testing.assert_allclose(
            vals[0.5], 0.5 * (vals[0.0] + vals[1.0]), rtol=1e-6
        )

    def test_variance_warmup_caps_ds_gradient(self):
        # Huge residuals: the ds gradient scales with w, so warmup caps it.
        t = _targets([1], [True], [False], box_t=jnp.full((1, 4), 50.0))
        deltas = jnp.zeros((1, 4))
        log_vars = jnp.zeros((1, 4))

        def g(w):
            ds = jax.grad(
                lambda s: attenuated_regression_loss(
                    deltas, s, t, residual="l2", variance_weight=w
                )
            )(log_vars)
            return float(jnp.max(jnp.abs(ds)))

        assert g(0.1) < 0.11 * g(1.0)

    def test_only_positives_count(self):
        t = _targets(
            [1, 0], [True, False], [False, False],
            box_t=jnp.zeros((2, 4), jnp.float32),
        )
        loss = attenuated_regression_loss(
            jnp.stack([jnp.zeros(4), jnp.full(4, 100.0)]),
            jnp.zeros((2, 4)),
            t,
        )
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_detection_loss_composes():
    logits = jnp.zeros((2, 3), jnp.float32)
    t = _targets([1, 0], [True, False], [False, False])
    total, metrics = detection_loss(
        logits, jnp.zeros((2, 4)), jnp.zeros((2, 4)), t, regression_weight=2.0
    )
    np.testing.assert_allclose(
        float(total),
        float(metrics["loss_cls"]) + 2.0 * float(metrics["loss_reg"]),
        rtol=1e-6,
    )
    assert float(metrics["num_positive"]) == 1.0


def test_losses_jit_and_grad():
    """Losses must be jit-compatible and yield finite grads (fp32 islands)."""
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (8, 4))
    deltas = jax.random.normal(key, (8, 4))
    log_vars = jax.random.normal(key, (8, 4))
    t = _targets(
        [1, 2, 0, 0, 3, 0, 0, 0],
        [True, True, False, False, True, False, False, False],
        [False] * 8,
        box_t=jax.random.normal(key, (8, 4)),
    )

    def f(lg, d, s):
        return detection_loss(lg, d, s, t)[0]

    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(logits, deltas, log_vars)
    for arr in g:
        assert bool(jnp.all(jnp.isfinite(arr)))


def test_focal_custom_vjp_matches_autodiff():
    """Hand-derived focal VJP (losses._focal_custom) == reverse-mode
    gradients to fp32 tolerance, value exactly equal (same forward)."""
    import jax

    from bayesod_tpu.losses.losses import focal_loss
    from bayesod_tpu.losses.targets import AnchorTargets

    rng = np.random.RandomState(0)
    B, A, C1 = 2, 64, 4
    logits = jnp.asarray(rng.randn(B, A, C1) * 3.0, jnp.float32)
    tgt = jnp.asarray(rng.randint(0, C1, (B, A)), jnp.int32)
    positive = tgt > 0
    ignored = jnp.asarray(rng.rand(B, A) < 0.1) & ~positive
    targets = AnchorTargets(
        class_targets=tgt,
        box_targets=jnp.zeros((B, A, 4), jnp.float32),
        positive=positive,
        ignored=ignored,
    )
    for gamma in (2.0, 1.5):
        va = focal_loss(logits, targets, 0.25, gamma, backward="autodiff")
        vc = focal_loss(logits, targets, 0.25, gamma, backward="custom")
        assert np.allclose(float(va), float(vc), rtol=1e-6)
        ga = jax.grad(
            lambda z: focal_loss(z, targets, 0.25, gamma, backward="autodiff")
        )(logits)
        gc = jax.grad(
            lambda z: focal_loss(z, targets, 0.25, gamma, backward="custom")
        )(logits)
        ga, gc = np.asarray(ga), np.asarray(gc)
        denom = max(np.abs(ga).max(), 1e-12)
        assert np.abs(ga - gc).max() / denom < 1e-4, (
            gamma, np.abs(ga - gc).max(), denom
        )
    # bf16 logits path (the production dtype)
    gb = jax.grad(
        lambda z: focal_loss(z, targets, 0.25, 2.0, backward="custom")
    )(logits.astype(jnp.bfloat16))
    assert np.isfinite(np.asarray(gb, np.float32)).all()
    with pytest.raises(ValueError, match="focal backward"):
        focal_loss(logits, targets, backward="fancy")
