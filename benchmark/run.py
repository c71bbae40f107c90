"""Benchmark runner: ``python -m benchmark.run <suite> <dest> [--shard i/n]``
(reference ``benchmark/run.py`` + A.3: per task — load dataset, build model
with a seeded rng, warm-up predict, train with Scipy L-BFGS recording
iterations/time, predict (nlpd/mae/rmse), build posterior and time cached
prediction; append one row per repetition to <dest>/results.csv).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from typing import Any, Dict

import numpy as np


def _collect_metrics(task, rep: int) -> Dict[str, Any]:
    import gpflow_tpu
    from gpflow_tpu.optimizers import Scipy

    from .datasets import get_dataset
    from .models import create_model

    np.random.seed(rep)
    ds = get_dataset(task.dataset)
    (X, Y), (Xt, Yt) = ds.train, ds.test
    model = create_model(task.model, (X, Y))

    # warm-up prediction (compiles the predict path)
    model.predict_y(Xt[:2])

    from gpflow_tpu.models import training_loss_closure

    loss_closure = training_loss_closure(model, (X, Y))
    t0 = time.perf_counter()
    result = Scipy().minimize(
        lambda: loss_closure(), model.trainable_variables, options={"maxiter": task.maxiter}
    )
    training_time = time.perf_counter() - t0
    n_iter = int(result.nit)

    t0 = time.perf_counter()
    f_mean, f_var = model.predict_y(Xt)
    prediction_time = time.perf_counter() - t0

    ld = np.asarray(model.predict_log_density((Xt, Yt)))
    nlpd = float(-np.mean(ld))
    err = np.asarray(f_mean) - Yt
    mae = float(np.mean(np.abs(err)))
    rmse = float(np.sqrt(np.mean(err ** 2)))

    row: Dict[str, Any] = {
        "suite_task": f"{task.dataset}/{task.model}",
        "dataset": task.dataset,
        "model": task.model,
        "repetition": rep,
        "n_training_iterations": n_iter,
        "training_time": training_time,
        "training_iteration_time": training_time / max(n_iter, 1),
        "prediction_time": prediction_time,
        "nlpd": nlpd,
        "mae": mae,
        "rmse": rmse,
    }

    if hasattr(model, "posterior"):
        t0 = time.perf_counter()
        posterior = model.posterior()
        row["posterior_build_time"] = time.perf_counter() - t0
        posterior.predict_f(Xt[:2])  # compile
        t0 = time.perf_counter()
        posterior.predict_f(Xt)
        row["posterior_prediction_time"] = time.perf_counter() - t0
    return row


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("suite")
    parser.add_argument("dest")
    parser.add_argument("--shard", default=None, help="i/n split of the task grid")
    parser.add_argument(
        "--plot",
        nargs="*",
        default=None,
        metavar="PLOTTER",
        help="render result plots (default plotters if no names given; "
        "see benchmark.plotters.PLOTTERS)",
    )
    args = parser.parse_args()

    from .benchmarks import get_suite
    from .sharding import shard_tasks

    suite = get_suite(args.suite)
    tasks = suite.get_tasks()
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        tasks = shard_tasks(tasks, i, n)

    os.makedirs(args.dest, exist_ok=True)
    rows = []
    for task in tasks:
        for rep in range(task.repetitions):
            print(f"[benchmark] {task.dataset}/{task.model} rep {rep}", flush=True)
            rows.append(_collect_metrics(task, rep))

    out = os.path.join(args.dest, "results.csv")
    with open(out, "w", newline="") as f:
        fieldnames = sorted({k for r in rows for k in r})
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)

    metadata = {
        "suite": args.suite,
        "num_tasks": len(tasks),
        "argv": sys.argv,
    }
    try:
        import subprocess

        metadata["git_rev"] = (
            subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip()
        )
    except Exception:
        pass
    import jax

    metadata["devices"] = [str(d) for d in jax.devices()]
    with open(os.path.join(args.dest, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    print(f"[benchmark] wrote {out}")

    if args.plot is not None:
        from .plotters import plot_results

        names = args.plot or ["metrics", "timelines"]
        for path in plot_results(rows, args.dest, names):
            print(f"[benchmark] wrote {path}")


if __name__ == "__main__":
    main()
