"""Training-loss plots, matching the reference's panels and artifact names.

Reference: Training/Training_0to1k/train.py:510-566 (``training_plots.png``
at dpi 300: training-loss panel + validation-loss panel, only the panels
with data) and the standalone re-plotter plot_from_metrics.py:7-59.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List


def plot_training_metrics(logs: List[Dict], output_dir: str | Path,
                          filename: str = "training_plots.png") -> bool:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    train_step_logs = [l for l in logs if "loss" in l and "step" in l]
    train_final_logs = [l for l in logs if "train_loss" in l and "step" in l
                        and l.get("train_loss") is not None]
    eval_logs = [l for l in logs if "eval_loss" in l and "step" in l]

    if not (train_step_logs or train_final_logs or eval_logs):
        return False

    two_panels = bool((train_step_logs or train_final_logs) and eval_logs)
    plt.figure(figsize=(12, 5))

    if train_step_logs or train_final_logs:
        ax1 = plt.subplot(1, 2, 1) if two_panels else plt.gca()
        if train_step_logs:
            ax1.plot([l["step"] for l in train_step_logs],
                     [l["loss"] for l in train_step_logs],
                     "b-", marker="o", markersize=3, label="Training Loss")
        if train_final_logs:
            ax1.plot([l["step"] for l in train_final_logs],
                     [l["train_loss"] for l in train_final_logs],
                     "bx", markersize=6, label="Final Train Loss")
        ax1.set_xlabel("Steps")
        ax1.set_ylabel("Loss")
        ax1.set_title("Training Loss (masked diffusion)")
        ax1.grid(True)
        ax1.legend()

    if eval_logs:
        ax2 = plt.subplot(1, 2, 2) if two_panels else plt.gca()
        ax2.plot([l["step"] for l in eval_logs],
                 [l["eval_loss"] for l in eval_logs],
                 "r-", marker="s", markersize=3, label="Validation Loss")
        ax2.set_xlabel("Steps")
        ax2.set_ylabel("Loss")
        ax2.set_title("Validation Loss (masked diffusion)")
        ax2.grid(True)
        ax2.legend()

    plt.tight_layout()
    out = Path(output_dir) / filename
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close()
    return True


def replot_from_file(metrics_path: str | Path, output_dir: str | Path | None = None):
    """plot_from_metrics.py equivalent: re-render from training_metrics.json."""
    metrics_path = Path(metrics_path)
    with open(metrics_path) as f:
        logs = json.load(f)
    out_dir = Path(output_dir) if output_dir else metrics_path.parent
    return plot_training_metrics(logs, out_dir)
