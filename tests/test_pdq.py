"""Unit tests for the PDQ metric (eval/pdq.py; arXiv:1811.10800).

Pure-NumPy oracles per SURVEY.md §4: analytic limiting cases (perfect
sharp detection -> pPDQ ~ 1; label quality factorizes as sqrt), the
calibration property PDQ exists to measure (an uncertainty-honest
misplaced box must outscore an overconfident one), and assignment/count
bookkeeping.
"""

import numpy as np
import pytest

from bayesod_tpu.eval.pdq import image_pdq, pdq_score, ppdq

HW = (64, 64)
GT = np.array([10.0, 10.0, 20.0, 20.0])


def _probs(p_fg, cls=1, c=3):
    """Categorical [C+1]: p_fg on `cls`, remainder on the other foregrounds."""
    out = np.full(c + 1, (1.0 - p_fg) / (c - 1))
    out[0] = 0.0
    out[cls] = p_fg
    return out


def _sharp_cov(s=1e-4):
    return np.eye(4) * s


class TestPPDQ:
    def test_perfect_sharp_detection_is_one(self):
        q = ppdq(GT, _sharp_cov(), _probs(1.0), GT, 1, HW)
        assert q > 0.99

    def test_label_quality_factorizes(self):
        q1 = ppdq(GT, _sharp_cov(), _probs(1.0), GT, 1, HW)
        qh = ppdq(GT, _sharp_cov(), _probs(0.5), GT, 1, HW)
        np.testing.assert_allclose(qh, q1 * np.sqrt(0.5), rtol=1e-6)

    def test_wrong_label_uses_gt_class_prob(self):
        # Detection puts 0.9 on class 2; GT class is 1 with prob 0.05.
        probs = np.array([0.0, 0.05, 0.9, 0.05])
        q = ppdq(GT, _sharp_cov(), probs, GT, 1, HW)
        q_right = ppdq(GT, _sharp_cov(), probs, GT, 2, HW)
        np.testing.assert_allclose(q / q_right, np.sqrt(0.05 / 0.9), rtol=1e-6)

    def test_disjoint_detection_scores_zero(self):
        det = np.array([40.0, 40.0, 50.0, 50.0])
        assert ppdq(det, _sharp_cov(), _probs(1.0), GT, 1, HW) <= 1e-6

    def test_honest_uncertainty_beats_overconfidence(self):
        # Same 2-px-shifted box: sigma=2 covers the miss; sigma=0.01 claims
        # certainty about wrong pixels. PDQ must reward the honest one.
        det = GT + 2.0
        q_honest = ppdq(det, np.eye(4) * 4.0, _probs(1.0), GT, 1, HW)
        q_cocky = ppdq(det, _sharp_cov(), _probs(1.0), GT, 1, HW)
        assert q_honest > q_cocky

    def test_perfect_box_prefers_sharp_over_vague(self):
        # On an exact box, inflating sigma only leaks probability out.
        q_sharp = ppdq(GT, _sharp_cov(), _probs(1.0), GT, 1, HW)
        q_vague = ppdq(GT, np.eye(4) * 25.0, _probs(1.0), GT, 1, HW)
        assert q_sharp > q_vague

    def test_degenerate_gt_is_zero(self):
        gt = np.array([10.0, 10.0, 10.0, 10.0])
        assert ppdq(GT, _sharp_cov(), _probs(1.0), gt, 1, HW) == 0.0


class TestImagePDQ:
    def test_optimal_assignment(self):
        # det0 matches gt1 and det1 matches gt0; greedy-by-order would fail.
        gt_boxes = np.stack([GT, GT + 30.0])
        det_boxes = np.stack([GT + 30.0, GT])
        covs = np.stack([_sharp_cov()] * 2)
        probs = np.stack([_probs(1.0)] * 2)
        r = image_pdq(det_boxes, covs, probs, gt_boxes, np.array([1, 1]), HW)
        assert r["tp"] == 2 and r["fp"] == 0 and r["fn"] == 0
        assert r["ppdq_sum"] > 1.98

    def test_counts_unmatched(self):
        det_boxes = np.stack([GT, np.array([38.0, 38.0, 46.0, 46.0])])
        covs = np.stack([_sharp_cov()] * 2)
        probs = np.stack([_probs(1.0)] * 2)
        gt_boxes = np.stack([GT, GT + 45.0, GT + 52.0])  # two unmatched GTs
        r = image_pdq(
            det_boxes, covs, probs, gt_boxes, np.array([1, 1, 1]), HW
        )
        assert r["tp"] == 1 and r["fp"] == 1 and r["fn"] == 2

    def test_empty_sides(self):
        empty4 = np.zeros((0, 4))
        r = image_pdq(
            empty4, np.zeros((0, 4, 4)), np.zeros((0, 4)),
            GT[None], np.array([1]), HW,
        )
        assert r == {"ppdq_sum": 0.0, "tp": 0, "fp": 0, "fn": 1}
        r = image_pdq(
            GT[None], _sharp_cov()[None], _probs(1.0)[None], empty4,
            np.zeros(0, np.int64), HW,
        )
        assert r == {"ppdq_sum": 0.0, "tp": 0, "fp": 1, "fn": 0}


def test_pdq_score_aggregates_dataset_level():
    im_perfect = {
        "det_boxes": GT[None], "det_covs": _sharp_cov()[None],
        "det_probs": _probs(1.0)[None], "gt_boxes": GT[None],
        "gt_labels": np.array([1]), "hw": HW,
    }
    im_miss = {
        "det_boxes": np.zeros((0, 4)), "det_covs": np.zeros((0, 4, 4)),
        "det_probs": np.zeros((0, 4)), "gt_boxes": GT[None],
        "gt_labels": np.array([1]), "hw": HW,
    }
    r = pdq_score([im_perfect, im_miss])
    # 1 TP (pPDQ ~1) + 1 FN -> PDQ ~ 0.5, dataset-level (not mean of images).
    assert r["pdq_tp"] == 1 and r["pdq_fn"] == 1 and r["pdq_fp"] == 0
    np.testing.assert_allclose(r["pdq"], 0.5, atol=0.01)
    assert r["avg_ppdq_tp"] > 0.99


def test_pdq_score_requires_hw():
    with pytest.raises(ValueError):
        pdq_score([{k: np.zeros((0, 4)) for k in (
            "det_boxes", "det_covs", "det_probs", "gt_boxes", "gt_labels")}])


def test_image_pdq_nonfinite_detection_sanitized():
    """A detection with non-finite geometry must not crash the Hungarian
    assignment; it contributes zero pairing quality (FP if unmatched)."""
    import numpy as np
    from bayesod_tpu.eval.pdq import image_pdq

    det_boxes = np.array([[10, 10, 30, 30], [5, 5, 20, 20]], np.float64)
    det_covs = np.stack([
        np.eye(4) * np.inf,  # degenerate
        np.eye(4) * 4.0,
    ])
    det_probs = np.array([[0.1, 0.9, 0.0], [0.1, 0.8, 0.1]])
    gt_boxes = np.array([[8, 8, 28, 28]], np.float64)
    gt_labels = np.array([1])
    r = image_pdq(det_boxes, det_covs, det_probs, gt_boxes, gt_labels,
                  (64, 64))
    assert np.isfinite(r["ppdq_sum"])
    assert r["tp"] + r["fp"] == 2
