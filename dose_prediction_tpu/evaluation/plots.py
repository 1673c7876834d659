"""DVH curves and slice-error artifact dumps.

Parity target: plot_DVH (evaluate_openKBP.py:225-314) — cumulative DVH with
5000 bins over 0–90 Gy, solid=reference dashed=prediction per structure; and
the per-slice GT/pred/error jpg triptychs (train_light_pyfer.py:222-263).
Matplotlib is imported lazily so headless metric-only runs never touch it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from dose_prediction_tpu.evaluation.metrics import STRUCTURE_NAMES

DVH_BINS = 5000
DVH_MAX_GY = 90.0


def cumulative_dvh(dose: np.ndarray, roi_mask: np.ndarray,
                   *, bins: int = DVH_BINS, max_gy: float = DVH_MAX_GY) -> np.ndarray:
    """Volume-fraction-above-dose curve on the reference's binning
    (evaluate_openKBP.py:238-296): histogram over [-inv, max) then 1−cumsum."""
    inv = max_gy / bins
    edges = np.arange(-1, bins) * inv
    roi_dose = dose.reshape(-1)[roi_mask.reshape(-1) > 0]
    hist, _ = np.histogram(roi_dose, edges)
    c = np.cumsum(hist)
    if c[-1] == 0:
        return np.zeros(bins)
    return 1.0 - c / c.max()


def plot_dvh(pred: np.ndarray, gt: np.ndarray,
             structures: Dict[str, np.ndarray], path: str | Path,
             *, dpi: int = 300) -> None:
    """Write the per-patient DVH comparison figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    inv = DVH_MAX_GY / DVH_BINS
    x = np.arange(0, DVH_BINS) * inv
    colors = list(mcolors.TABLEAU_COLORS.values())
    fig = plt.figure(dpi=150)
    legend_handles = []
    for i, name in enumerate(STRUCTURE_NAMES):
        roi = structures.get(name)
        if roi is None or not np.any(roi):
            continue
        color = colors[i % len(colors)]
        ref_curve = cumulative_dvh(gt, roi)
        pred_curve = cumulative_dvh(pred, roi)
        line, = plt.plot(x, ref_curve * 100, color=color, linewidth=2, label=name)
        plt.plot(x, pred_curve * 100, color=color, linewidth=2, linestyle="dashed")
        legend_handles.append(line)
    plt.ylabel("volume %")
    plt.xlabel("dose (Gy)")
    plt.legend(handles=legend_handles, bbox_to_anchor=(1.1, 1.05), prop={"size": 6})
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)


def save_slice_triptychs(pred_gy: np.ndarray, gt_gy: np.ndarray, out_dir: str | Path,
                         *, axis: int = 0, every: int = 1) -> None:
    """GT / prediction / |error| jet-colormap jpgs per slice
    (train_light_pyfer.py:235-263)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = pred_gy.shape[axis]
    for i in range(0, n, every):
        p = np.take(pred_gy, i, axis=axis)
        g = np.take(gt_gy, i, axis=axis)
        err = np.abs(g - p)
        fig, axs = plt.subplots(3, 1, figsize=(4, 10))
        plt.subplots_adjust(wspace=0, hspace=0)
        for ax, img in zip(axs, (g, p, err)):
            ax.imshow(img, cmap="jet")
            ax.axis("off")
        fig.savefig(out_dir / f"{i}.jpg", bbox_inches="tight")
        plt.close(fig)
