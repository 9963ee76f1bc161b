"""Metric / system-monitoring plots (matplotlib; plotly is absent from this
image so the reference's plotly HTML output is gated off).

Counterpart of reference src/base/visualization.py.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from .storage import MetricsStorage, SystemMonitoringStorage


def plot_metrics(storage: MetricsStorage, filepath: str | Path, step_key: str = "epoch") -> None:
    names = list(storage.metrics.keys())
    if not names:
        return
    ncols = min(3, len(names))
    nrows = -(-len(names) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.5 * nrows), squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncols][i % ncols]
        for split, records in storage.metrics[name].items():
            xs = [r[step_key] for r in records]
            ys = [r["value"] for r in records]
            ax.plot(xs, ys, label=split, marker="." if len(xs) < 50 else None)
        ax.set_title(name)
        ax.set_xlabel(step_key)
        ax.legend()
        ax.grid(alpha=0.3)
    for j in range(len(names), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    Path(filepath).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(filepath, dpi=100)
    plt.close(fig)


def plot_system_monitoring(storage: SystemMonitoringStorage, filepath: str | Path) -> None:
    data = storage.to_dict()
    ts = data.pop("timestamp", None)
    if not data or ts is None:
        return
    t0 = ts[0]
    xs = [t - t0 for t in ts]
    names = list(data.keys())
    ncols = 3
    nrows = -(-len(names) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3 * nrows), squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncols][i % ncols]
        ax.plot(xs, data[name])
        ax.set_title(name)
        ax.set_xlabel("seconds")
        ax.grid(alpha=0.3)
    for j in range(len(names), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    Path(filepath).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(filepath, dpi=100)
    plt.close(fig)
