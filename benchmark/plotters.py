"""Result plotters (reference ``benchmark/plotters.py`` / ``plot.py``: a
registry of plotters rendering the collected metrics DataFrame to PNGs).

Two plotters, both driven from ``results.csv`` rows as written by
``benchmark.run``:

* ``metrics``   — one small-multiple panel per metric; models on the x axis,
  one fixed-order color per dataset, repetitions drawn as individual points
  with the mean as a bar. One y axis per panel, log scale for times.
* ``timelines`` — metric vs. repetition index per (dataset, model) series,
  for eyeballing run-to-run stability.

Colors are the Okabe-Ito colorblind-safe set in fixed assignment order (a
dataset keeps its hue regardless of which panels it appears in).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Sequence

from .metrics import METRICS
from .registry import Registry

__all__ = ["PLOTTERS", "plot_results"]

# Okabe & Ito (2008) categorical palette, fixed order, never cycled past 8.
_PALETTE = [
    "#0072B2",  # blue
    "#E69F00",  # orange
    "#009E73",  # bluish green
    "#CC79A7",  # reddish purple
    "#56B4E9",  # sky blue
    "#D55E00",  # vermillion
    "#F0E442",  # yellow
    "#000000",  # black
]

PLOTTERS: Registry = Registry("plotter")


def _color_map(names: Sequence[str]) -> Dict[str, str]:
    names = sorted(set(names))
    if len(names) > len(_PALETTE):
        raise ValueError(
            f"More than {len(_PALETTE)} datasets in one plot; facet or fold "
            "into fewer groups instead of generating extra hues."
        )
    return {n: _PALETTE[i] for i, n in enumerate(names)}


def _metric_columns(rows: Sequence[Dict[str, Any]]) -> List[str]:
    present = {k for r in rows for k in r}
    return [m.name for m in METRICS if m.name in present]


def _style_axis(ax: Any) -> None:
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    ax.grid(axis="y", color="0.9", linewidth=0.8, zorder=0)
    ax.set_axisbelow(True)


def metrics_plotter(rows: Sequence[Dict[str, Any]], dest: str) -> List[str]:
    """Small-multiple bar panels: one panel per metric, models on x, one
    color per dataset, per-repetition points over the mean bar."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    metric_names = _metric_columns(rows)
    if not metric_names:
        return []
    datasets = sorted({str(r["dataset"]) for r in rows})
    models = sorted({str(r["model"]) for r in rows})
    colors = _color_map(datasets)

    ncols = min(3, len(metric_names))
    nrows = -(-len(metric_names) // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4.2 * ncols, 3.2 * nrows), squeeze=False
    )

    width = 0.8 / len(datasets)
    for i, metric_name in enumerate(metric_names):
        ax = axes[i // ncols][i % ncols]
        _style_axis(ax)
        metric = next(m for m in METRICS if m.name == metric_name)
        labelled = set()  # label each dataset on its first DRAWN bar
        for j, ds in enumerate(datasets):
            for k, model in enumerate(models):
                vals = [
                    float(r[metric_name])
                    for r in rows
                    if str(r["dataset"]) == ds
                    and str(r["model"]) == model
                    and r.get(metric_name) not in (None, "")
                ]
                if not vals:
                    continue
                x = k + (j - (len(datasets) - 1) / 2) * width
                ax.bar(
                    x, float(np.mean(vals)), width * 0.9, color=colors[ds],
                    zorder=2, label=None if ds in labelled else ds,
                )
                labelled.add(ds)
                ax.plot(
                    [x] * len(vals), vals, "o", color="0.25", markersize=3,
                    zorder=3,
                )
        ax.set_xticks(range(len(models)))
        ax.set_xticklabels(models, rotation=30, ha="right")
        unit = f" [{metric.unit}]" if metric.unit else ""
        ax.set_title(metric.pretty_name + unit, fontsize=10)
        if "time" in metric_name and ax.get_ylim()[1] > 0:
            ax.set_yscale("log")
    for i in range(len(metric_names), nrows * ncols):
        axes[i // ncols][i % ncols].set_visible(False)
    if len(datasets) > 1:
        axes[0][0].legend(frameon=False, fontsize=8)
    fig.tight_layout()
    path = os.path.join(dest, "metrics.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return [path]


def timelines_plotter(rows: Sequence[Dict[str, Any]], dest: str) -> List[str]:
    """Metric vs repetition index per (dataset, model): run-to-run
    stability at a glance; one line per dataset in the fixed palette."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    metric_names = _metric_columns(rows)
    if not metric_names:
        return []
    datasets = sorted({str(r["dataset"]) for r in rows})
    models = sorted({str(r["model"]) for r in rows})
    colors = _color_map(datasets)

    paths = []
    for metric_name in metric_names:
        metric = next(m for m in METRICS if m.name == metric_name)
        fig, axes = plt.subplots(
            1, len(models), figsize=(3.6 * len(models), 3.0),
            squeeze=False, sharey=True,
        )
        for k, model in enumerate(models):
            ax = axes[0][k]
            _style_axis(ax)
            for ds in datasets:
                pts = sorted(
                    (int(r["repetition"]), float(r[metric_name]))
                    for r in rows
                    if str(r["dataset"]) == ds
                    and str(r["model"]) == model
                    and r.get(metric_name) not in (None, "")
                )
                if not pts:
                    continue
                ax.plot(
                    [p[0] for p in pts], [p[1] for p in pts], "-o",
                    color=colors[ds], linewidth=2, markersize=4, label=ds,
                )
            ax.set_title(model, fontsize=10)
            ax.set_xlabel("repetition")
        unit = f" [{metric.unit}]" if metric.unit else ""
        axes[0][0].set_ylabel(metric.pretty_name + unit)
        if len(datasets) > 1:
            axes[0][0].legend(frameon=False, fontsize=8)
        fig.tight_layout()
        path = os.path.join(dest, f"timeline_{metric_name}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        paths.append(path)
    return paths


PLOTTERS.register("metrics", metrics_plotter)
PLOTTERS.register("timelines", timelines_plotter)


def plot_results(
    rows: Sequence[Dict[str, Any]], dest: str, plotters: Sequence[str] = ("metrics",)
) -> List[str]:
    """Runs the named plotters over collected rows; returns written paths."""
    written: List[str] = []
    for name in plotters:
        fn: Callable = PLOTTERS.get(name)
        written.extend(fn(rows, dest))
    return written
