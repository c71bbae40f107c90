"""Benchmark runner: ``python -m benchmark.run <suite> <dest> [--shard i/n]``
(reference ``benchmark/run.py`` + A.3: per task — load dataset, build model
with a seeded rng, warm-up predict, train with Scipy L-BFGS recording
iterations/time, predict (nlpd/mae/rmse), build posterior and time cached
prediction; append one row per repetition to <dest>/results.csv).

Isolation (reference A.3): each TASK runs all its repetitions in ONE
fresh subprocess with a per-rep timeout (default 3600 s,
``--task-timeout``; the process gets timeout*reps) so one hanging or
crashing task cannot poison the suite — its row records ``status:
timeout|error`` and the run continues. Per-task (not per-rep) isolation
is deliberate: reps 1..N-1 share rep 0's XLA compile, which is what the
cold_training_time vs warm columns measure. The tradeoff: a crash in rep
k abandons that task's remaining reps (the completed rows survive — the
child rewrites its results file atomically after every rep).
``--isolation inprocess`` restores the fast shared-process mode for
debugging.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Any, Dict, List

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _collect_metrics(task, rep: int) -> Dict[str, Any]:
    # test hook: lets the suite's timeout handling be exercised without a
    # real hang (see tests/integration/test_benchmark.py)
    if os.environ.get("_BENCH_TEST_HANG") == f"{task.dataset}/{task.model}":
        time.sleep(10_000)
    import gpflow_tpu
    from gpflow_tpu.optimizers import Scipy

    from .datasets import get_dataset
    from .models import create_model

    import jax

    np.random.seed(rep)
    ds = get_dataset(task.dataset)
    (X, Y), (Xt, Yt) = ds.train, ds.test
    model = create_model(task.model, (X, Y))

    # Jitted prediction entry points with the MODEL as a traced pytree
    # argument: parameters are inputs (not baked constants), so the same
    # compiled program serves before and after training. Running these
    # eagerly instead compiles every tiny op as its own server-side XLA
    # program over the TPU tunnel — measured minutes per eager predict on
    # a congested compile server vs a handful of cached programs here.
    @jax.jit
    def _predict_y(m, Xb):
        return m.predict_y(Xb)

    @jax.jit
    def _predict_log_density(m, data):
        return m.predict_log_density(data)

    # warm-up prediction at the FULL test shape (jax compiles per static
    # shape, so a smaller warm-up batch would leave the timed call paying
    # trace+compile for the real shape)
    jax.block_until_ready(_predict_y(model, Xt))

    from gpflow_tpu.models import training_loss_closure

    from .models import MODELS

    loss_closure = training_loss_closure(model, (X, Y))
    if "mc" in MODELS.tags_of(task.model):
        # Monte-Carlo likelihoods (e.g. Softmax): the MC draws re-randomize
        # with the iterate, so the objective is non-smooth and L-BFGS line
        # searches terminate before learning anything. Train with the
        # device-resident scanned Adam loop instead (one dispatch for all
        # maxiter steps).
        from gpflow_tpu.utilities import training_loop

        optimizer_name = "adam-scan"
        t0 = time.perf_counter()
        losses = training_loop(
            loss_closure,
            var_list=model.trainable_parameters,
            maxiter=task.maxiter,
            use_scan=True,
        )
        if task.maxiter > 0:  # host sync; scan returns an empty array at 0
            float(np.asarray(losses)[-1])
        training_time = time.perf_counter() - t0
        n_iter = task.maxiter
    else:
        optimizer_name = "scipy-lbfgs"
        t0 = time.perf_counter()
        result = Scipy().minimize(
            lambda: loss_closure(),
            model.trainable_variables,
            options={"maxiter": task.maxiter},
        )
        training_time = time.perf_counter() - t0
        n_iter = int(result.nit)

    t0 = time.perf_counter()
    f_mean, f_var = _predict_y(model, Xt)
    jax.block_until_ready(f_mean)
    prediction_time = time.perf_counter() - t0

    ld = np.asarray(_predict_log_density(model, (Xt, Yt)))
    nlpd = float(-np.mean(ld))
    f_mean_np = np.asarray(f_mean)
    if f_mean_np.shape[-1] != Yt.shape[-1]:
        # multiclass: predict_y returns [N, C] class probabilities while Y is
        # the [N, 1] class index — report accuracy; MAE/RMSE on class labels
        # would be meaningless
        accuracy = float(np.mean(np.argmax(f_mean_np, axis=-1) == Yt[:, 0]))
        mae = rmse = float("nan")
    else:
        accuracy = float("nan")
        err = f_mean_np - Yt
        mae = float(np.mean(np.abs(err)))
        rmse = float(np.sqrt(np.mean(err ** 2)))

    row: Dict[str, Any] = {
        "suite_task": f"{task.dataset}/{task.model}",
        "dataset": task.dataset,
        "model": task.model,
        "repetition": rep,
        "optimizer": optimizer_name,
        "n_training_iterations": n_iter,
        "training_time": training_time,
        "training_iteration_time": training_time / max(n_iter, 1),
        "prediction_time": prediction_time,
        "nlpd": nlpd,
        "mae": mae,
        "rmse": rmse,
        "accuracy": accuracy,
    }

    if hasattr(model, "posterior"):
        t0 = time.perf_counter()
        posterior = model.posterior()
        jax.block_until_ready(jax.tree_util.tree_leaves(posterior.cache))
        row["posterior_build_time"] = time.perf_counter() - t0

        @jax.jit
        def _posterior_predict(p, Xb):
            return p.predict_f(Xb)

        jax.block_until_ready(_posterior_predict(posterior, Xt))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(_posterior_predict(posterior, Xt))
        row["posterior_prediction_time"] = time.perf_counter() - t0
    return row


def _run_child_task(
    suite_name: str, task_index: int, repetitions: int, out_path: str
) -> None:
    """Entry point of the per-task subprocess: runs ALL repetitions of one
    task sequentially and rewrites ``out_path`` (a JSON list) after each
    rep, so a timeout keeps completed reps. Running reps in one process is
    what makes reps 1..k-1 skip XLA compiles *unconditionally*: jax's
    in-process executable cache needs no (backend-dependent) on-disk
    serialization support, which matters on the tunneled TPU backend where
    a cold compile of the fused L-BFGS program can take minutes."""
    plat = os.environ.get("GPFLOW_TPU_CHILD_JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    from .benchmarks import get_suite

    task = get_suite(suite_name).get_tasks()[task_index]
    maxiter_override = os.environ.get("GPFLOW_TPU_BENCH_MAXITER")
    if maxiter_override:
        task = task._replace(maxiter=int(maxiter_override))
    rows = []
    for rep in range(repetitions):
        print(f"[benchmark]   rep {rep}", flush=True)
        rows.append(_collect_metrics(task, rep))
        # atomic update: a parent-side timeout can kill this process at any
        # moment, and a partially-written JSON would lose EVERY completed
        # rep (the parent's _partial_rows would fail to parse it)
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump(rows, f)
        os.replace(tmp_path, out_path)


def _run_task_isolated(
    suite_name: str, task, task_index: int, repetitions: int, timeout: float
) -> List[Dict[str, Any]]:
    """Runs ALL reps of one task in a fresh subprocess; never raises —
    hangs and crashes become status rows (reference A.3: fresh process +
    time cap). ``timeout`` is per rep; the process gets timeout*reps.
    Completed reps survive a timeout (the child flushes after each rep)."""
    base = {
        "suite_task": f"{task.dataset}/{task.model}",
        "dataset": task.dataset,
        "model": task.model,
    }
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        out_path = tmp.name
    cmd = [
        sys.executable, "-m", "benchmark.run",
        "--_child_task", suite_name, str(task_index), str(repetitions), out_path,
    ]
    env = dict(os.environ)
    import jax

    plat = getattr(jax.config, "jax_platforms", None)
    if plat:
        env["GPFLOW_TPU_CHILD_JAX_PLATFORMS"] = plat

    def _partial_rows() -> List[Dict[str, Any]]:
        try:
            with open(out_path) as f:
                rows = json.load(f)
        except Exception:
            return []
        for row in rows:
            row["status"] = "ok"
        return rows

    try:
        proc = subprocess.run(
            cmd, timeout=timeout * repetitions, capture_output=True, text=True,
            cwd=_REPO_ROOT, env=env,
        )
        rows = _partial_rows()
        if proc.returncode != 0:
            tail = (proc.stderr or "")[-2000:]
            rows.append(
                {**base, "repetition": len(rows), "status": "error", "error": tail}
            )
        return rows
    except subprocess.TimeoutExpired:
        rows = _partial_rows()
        rows.append(
            {
                **base,
                "repetition": len(rows),
                "status": "timeout",
                "error": f"exceeded {timeout}x{repetitions}s"
                f" ({len(rows)}/{repetitions} reps completed)",
            }
        )
        return rows
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def _gather_metadata(suite_name: str, num_tasks: int) -> Dict[str, Any]:
    import platform

    metadata: Dict[str, Any] = {
        "suite": suite_name,
        "num_tasks": num_tasks,
        "argv": sys.argv,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "hostname": platform.node(),
        "platform": platform.platform(),
        "processor": platform.processor(),
        "cpu_count": os.cpu_count(),
        "python": sys.version,
    }
    try:
        metadata["git_rev"] = (
            subprocess.check_output(["git", "rev-parse", "HEAD"], cwd=_REPO_ROOT)
            .decode()
            .strip()
        )
    except Exception:
        pass
    import jax

    metadata["jax_version"] = jax.__version__
    metadata["devices"] = [str(d) for d in jax.devices()]
    metadata["device_kind"] = jax.devices()[0].device_kind
    return metadata


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--_child_task":
        _run_child_task(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("suite")
    parser.add_argument("dest")
    parser.add_argument("--shard", default=None, help="i/n split of the task grid")
    parser.add_argument(
        "--isolation",
        choices=["subprocess", "inprocess"],
        default="subprocess",
        help="subprocess (default): fresh process + timeout per task; "
        "inprocess: fast shared-process mode",
    )
    parser.add_argument(
        "--task-timeout",
        type=float,
        default=3600.0,
        help="per-(task, rep) wall-clock cap in seconds (subprocess mode)",
    )
    parser.add_argument(
        "--repetitions",
        type=int,
        default=None,
        help="override the suite's per-task repetition count (recorded in "
        "metadata.json; useful on slow/shared hardware)",
    )
    parser.add_argument(
        "--maxiter",
        type=int,
        default=None,
        help="override the suite's per-task L-BFGS iteration cap (recorded "
        "in metadata.json; wall time on tunneled chips is ~linear in it)",
    )
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
    all_tasks = suite.get_tasks()
    tasks = all_tasks
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        tasks = shard_tasks(tasks, i, n)

    os.makedirs(args.dest, exist_ok=True)
    # Persistent XLA compilation cache, shared by all task subprocesses (and
    # by concurrent shards pointing at the same directory): repetitions of a
    # task re-run an identical HLO program, so reps 2..k skip the multi-minute
    # XLA compile that otherwise dominates small-dataset training_time on a
    # 1-CPU host. Honest accounting: rep 0 still pays (and records) the real
    # compile, exactly like the reference's first tf.function trace.
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.abspath(args.dest), "jax_cache"),
    )
    # Timing comparability: if this dir already holds compiled programs
    # (re-run into the same dest, pre-warmed shared dir, concurrent shards),
    # rep 0 silently skips XLA compilation and its training_time is not
    # comparable to a cold run — record that in metadata.json.
    cache_was_warm = os.path.isdir(cache_dir) and bool(os.listdir(cache_dir))
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
    if args.maxiter is not None:
        # reaches the per-task subprocesses through the environment (tasks
        # themselves are left untouched: task_index lookups rely on equality
        # with the suite's own task list)
        os.environ["GPFLOW_TPU_BENCH_MAXITER"] = str(args.maxiter)
    rows = []
    out = os.path.join(args.dest, "results.csv")

    def _flush_rows() -> None:
        # rewrite after EVERY row: a multi-hour suite interrupted near its
        # deadline keeps everything completed so far (the fieldnames union
        # can grow as different task kinds report different metrics, so a
        # cheap full rewrite beats appending)
        with open(out, "w", newline="") as f:
            fieldnames = sorted({k for r in rows for k in r})
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            writer.writeheader()
            writer.writerows(rows)

    for task in tasks:
        task_index = all_tasks.index(task)
        repetitions = args.repetitions or task.repetitions
        print(
            f"[benchmark] {task.dataset}/{task.model} x{repetitions} reps",
            flush=True,
        )
        if args.isolation == "subprocess":
            task_rows = _run_task_isolated(
                args.suite, task, task_index, repetitions, args.task_timeout
            )
            for row in task_rows:
                if row.get("status") != "ok":
                    print(
                        f"[benchmark]   -> {row['status']}: "
                        f"{row.get('error', '')[:200]}",
                        flush=True,
                    )
            rows.extend(task_rows)
            _flush_rows()
        else:
            run_task = (
                task._replace(maxiter=args.maxiter)
                if args.maxiter is not None else task
            )
            for rep in range(repetitions):
                print(f"[benchmark]   rep {rep}", flush=True)
                rows.append({**_collect_metrics(run_task, rep), "status": "ok"})
                _flush_rows()

    _flush_rows()
    with open(os.path.join(args.dest, "metadata.json"), "w") as f:
        metadata = _gather_metadata(args.suite, len(tasks))
        if args.repetitions is not None:
            metadata["repetitions_override"] = args.repetitions
        if args.maxiter is not None:
            metadata["maxiter_override"] = args.maxiter
        metadata["xla_compilation_cache_dir"] = cache_dir
        metadata["xla_compilation_cache_was_warm"] = cache_was_warm
        json.dump(metadata, f, indent=2)
    print(f"[benchmark] wrote {out}")

    if args.plot is not None:
        from .plotters import plot_results

        names = args.plot or ["metrics", "timelines"]
        for path in plot_results(rows, args.dest, names):
            print(f"[benchmark] wrote {path}")


if __name__ == "__main__":
    main()
