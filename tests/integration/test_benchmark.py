"""Runs the integration_test benchmark suite end-to-end (pattern from
reference ``tests/integration/test_benchmark.py``)."""
import csv
import os
import sys


def test_benchmark_integration_suite(tmp_path, monkeypatch):
    from benchmark.run import main

    monkeypatch.setattr(sys, "argv", ["run", "integration_test", str(tmp_path)])
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


def test_benchmark_sharding():
    from benchmark.benchmarks import get_suite
    from benchmark.sharding import shard_tasks

    tasks = get_suite("full").get_tasks()
    shards = [shard_tasks(tasks, i, 3) for i in range(3)]
    assert sum(len(s) for s in shards) == len(tasks)
    assert not (set(shards[0]) & set(shards[1]))
