"""Evaluation diagnostic plots: PR curves, reliability diagram, TP/FP
entropy separation.

The reference's paper communicates BayesOD's value through exactly these
figures (PR curves for detection quality; uncertainty-separation / MUE for
the probabilistic claims — arXiv:1903.03838 §IV). `evaluate(plots_dir=...)`
or `cli.evaluate --plots DIR` drops the three PNGs next to the metric
tables.

Matplotlib (Agg) only at call time — importing this module is cheap and the
package never requires matplotlib unless plots are requested.

Colors: validated categorical palette (fixed slot order, never cycled;
CVD-safe adjacent pairs), neutral ink for text, recessive grids.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# Fixed categorical order (validated palette; assign by slot, never cycle).
_CATEGORICAL = (
    "#2a78d6",  # blue
    "#eb6834",  # orange
    "#1baf7a",  # aqua
    "#eda100",  # yellow
    "#e87ba4",  # magenta
    "#008300",  # green
    "#4a3aa7",  # violet
    "#e34948",  # red
)
_INK = "#333333"
_MUTED = "#8a8a8a"
_GRID = "#e3e3e3"


def _axes(ax, title: str, xlabel: str, ylabel: str) -> None:
    ax.set_title(title, color=_INK, fontsize=11)
    ax.set_xlabel(xlabel, color=_INK, fontsize=9)
    ax.set_ylabel(ylabel, color=_INK, fontsize=9)
    ax.tick_params(colors=_MUTED, labelsize=8)
    ax.grid(True, color=_GRID, linewidth=0.6)
    for s in ax.spines.values():
        s.set_color(_GRID)
    ax.set_axisbelow(True)


def _fig():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_pr_curves(
    curves: Dict[str, Tuple[np.ndarray, np.ndarray, float]],
    path: str,
) -> None:
    """Per-class precision-recall curves. curves: name -> (recall,
    precision, ap). More than 8 classes fold into small multiples rather
    than extra hues (palette rule)."""
    plt = _fig()
    names = list(curves)
    n_panels = max(1, (len(names) + 7) // 8)
    fig, axes = plt.subplots(
        1, n_panels, figsize=(5.2 * n_panels, 4.0), squeeze=False
    )
    for p in range(n_panels):
        ax = axes[0][p]
        chunk = names[p * 8 : (p + 1) * 8]
        for slot, name in enumerate(chunk):
            recall, precision, ap = curves[name]
            ax.plot(
                recall, precision, color=_CATEGORICAL[slot], linewidth=2.0,
                label=f"{name} (AP {ap:.3f})",
            )
        _axes(ax, "Precision-recall", "recall", "precision")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1.02)
        if chunk:
            ax.legend(
                frameon=False, fontsize=8, labelcolor=_INK, loc="lower left"
            )
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_reliability(
    confidence: np.ndarray,
    correct: np.ndarray,
    path: str,
    num_bins: int = 10,
    ece: Optional[float] = None,
    temperature_fit: Optional[float] = None,
) -> None:
    """Reliability diagram: per-bin accuracy vs confidence (the ECE's
    summands, drawn). The identity diagonal is perfect calibration."""
    plt = _fig()
    conf = np.clip(np.asarray(confidence, np.float64), 0.0, 1.0)
    corr = np.asarray(correct, bool)
    edges = np.linspace(0.0, 1.0, num_bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    acc = np.full(num_bins, np.nan)
    frac = np.zeros(num_bins)
    for i in range(num_bins):
        hi_ok = conf <= edges[i + 1] if i == num_bins - 1 else conf < edges[i + 1]
        m = (conf >= edges[i]) & hi_ok
        if m.any():
            acc[i] = corr[m].mean()
            frac[i] = m.mean()
    fig, ax = plt.subplots(figsize=(4.6, 4.2))
    ax.plot([0, 1], [0, 1], color=_MUTED, linewidth=1.0, linestyle="--")
    # Accuracy bars anchored to the baseline; occupancy as muted thin bars.
    width = 1.0 / num_bins
    ax.bar(
        centers, np.nan_to_num(acc), width=width * 0.86,
        color=_CATEGORICAL[0], edgecolor="white", linewidth=2.0 / 3,
        label="bin accuracy",
    )
    ax.bar(
        centers, frac, width=width * 0.4, color=_MUTED, alpha=0.45,
        label="bin occupancy",
    )
    title = "Reliability"
    if ece is not None:
        title += f"  (ECE {ece:.3f}"
        if temperature_fit is not None:
            title += f", fitted T {temperature_fit:.2f}"
        title += ")"
    _axes(ax, title, "confidence", "accuracy / occupancy")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.legend(frameon=False, fontsize=8, labelcolor=_INK, loc="upper left")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_entropy_separation(
    entropy_tp: np.ndarray,
    entropy_fp: np.ndarray,
    path: str,
    mue: Optional[float] = None,
    num_bins: int = 30,
) -> None:
    """TP vs FP categorical-entropy histograms — the paper's core
    uncertainty claim (correct detections should be confident, false ones
    uncertain; their overlap is what MUE scores)."""
    plt = _fig()
    fig, ax = plt.subplots(figsize=(5.0, 3.8))
    lo = 0.0
    hi = float(
        max(
            entropy_tp.max() if len(entropy_tp) else 1.0,
            entropy_fp.max() if len(entropy_fp) else 1.0,
            1e-6,
        )
    )
    bins = np.linspace(lo, hi, num_bins + 1)
    for data, slot, label in (
        (entropy_tp, 0, "true positives"),
        (entropy_fp, 1, "false positives"),
    ):
        if len(data):
            ax.hist(
                data, bins=bins, density=True, histtype="stepfilled",
                color=_CATEGORICAL[slot], alpha=0.55, edgecolor="white",
                linewidth=2.0 / 3, label=label,
            )
    title = "Categorical entropy: TP vs FP"
    if mue is not None:
        title += f"  (MUE {mue:.3f})"
    _axes(ax, title, "entropy (nats)", "density")
    ax.legend(frameon=False, fontsize=8, labelcolor=_INK)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def dump_diagnostics(
    out_dir: str,
    pr_curves: Dict[str, Tuple[np.ndarray, np.ndarray, float]],
    confidence: np.ndarray,
    correct: np.ndarray,
    entropy: np.ndarray,
    metrics: Dict[str, float],
) -> Sequence[str]:
    """Write the three diagnostic PNGs; returns their paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    if pr_curves:
        p = os.path.join(out_dir, "pr_curves.png")
        plot_pr_curves(pr_curves, p)
        paths.append(p)
    if len(correct):
        p = os.path.join(out_dir, "reliability.png")
        plot_reliability(
            confidence, correct, p,
            ece=metrics.get("ece"),
            temperature_fit=metrics.get("temperature_fit"),
        )
        paths.append(p)
        p = os.path.join(out_dir, "entropy_separation.png")
        plot_entropy_separation(
            entropy[np.asarray(correct, bool)],
            entropy[~np.asarray(correct, bool)],
            p,
            mue=metrics.get("categorical_mue"),
        )
        paths.append(p)
    return paths
