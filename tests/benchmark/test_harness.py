"""Unit tests for the benchmark harness (reference
``tests/benchmark/test_benchmark_api.py``, ``test_tag.py``,
``test_metadata.py``): registry semantics, tag-driven task filtering,
dataset determinism, model factories, sharding edge cases, metadata, and
error-row handling in the isolated runner."""
import numpy as np
import pytest

from benchmark.benchmarks import SUITES, BenchmarkSet, Task, get_suite
from benchmark.datasets import DATASETS, get_dataset
from benchmark.metrics import METRICS, MetricOrientation
from benchmark.models import MODELS, create_model
from benchmark.registry import Registry
from benchmark.sharding import shard_tasks


# ------------------------- Registry -------------------------


def test_registry_register_get_names():
    r: Registry = Registry("thing")
    r.register("a", 1, tags=["x"])
    r.register("b", 2, tags=["x", "y"])
    r.register("c", 3)
    assert r.get("b") == 2
    assert r.names() == ["a", "b", "c"]
    assert r.names("x") == ["a", "b"]
    assert r.names("y") == ["b"]
    assert r.names("z") == []
    assert r.tags_of("b") == {"x", "y"}


def test_registry_duplicate_rejected():
    r: Registry = Registry("thing")
    r.register("a", 1)
    with pytest.raises(ValueError, match="already registered"):
        r.register("a", 2)


def test_registry_unknown_name_lists_known():
    r: Registry = Registry("thing")
    r.register("alpha", 1)
    with pytest.raises(KeyError, match="alpha"):
        r.get("beta")


# ------------------------- Suites / task filtering -------------------------


def test_known_suites():
    assert {"integration_test", "ci", "full"} <= set(SUITES.names())
    assert get_suite("ci").maxiter == 100
    with pytest.raises(KeyError):
        get_suite("nope")


def test_large_datasets_exclude_dense_models():
    """N^3 models (gpr, vgp) must be filtered from LARGE datasets
    (reference tag compatibility, ``benchmark_api.py:192-219``)."""
    suite = BenchmarkSet(
        "t", datasets=["synth_large"], models=["gpr", "vgp", "sgpr", "svgp"],
        repetitions=1, maxiter=1,
    )
    models = {t.model for t in suite.get_tasks()}
    assert models == {"sgpr", "svgp"}


def test_classification_datasets_require_classification_models():
    suite = BenchmarkSet(
        "t", datasets=["banana"], models=["gpr", "vgp", "sgpr", "svgp"],
        repetitions=1, maxiter=1,
    )
    models = {t.model for t in suite.get_tasks()}
    assert models == {"vgp", "svgp"}


def test_full_suite_covers_whole_grid_minus_exclusions():
    tasks = get_suite("full").get_tasks()
    pairs = {(t.dataset, t.model) for t in tasks}
    assert len(pairs) == len(tasks)  # no duplicates
    assert ("synth_large", "gpr") not in pairs
    assert ("banana", "gpr") not in pairs
    assert ("synth_large", "svgp") in pairs
    assert ("tiny_linear", "gpr") in pairs


# ------------------------- Datasets -------------------------


@pytest.mark.parametrize("name", ["tiny_linear", "tiny_sine", "synth_medium", "banana"])
def test_dataset_shapes_and_determinism(name):
    ds1 = get_dataset(name)
    ds2 = get_dataset(name)
    (X, Y), (Xt, Yt) = ds1.train, ds1.test
    assert X.ndim == 2 and Y.ndim == 2 and Y.shape[1] == 1
    assert X.shape[0] == Y.shape[0] and Xt.shape[0] == Yt.shape[0]
    assert Xt.shape[1] == X.shape[1]
    np.testing.assert_array_equal(X, ds2.train[0])  # seeded generators
    if "classification" in DATASETS.tags_of(name):
        assert set(np.unique(Y)) <= {0.0, 1.0}


def test_dataset_split_no_overlap():
    ds = get_dataset("synth_medium")
    n_train = len(ds.train[0])
    n_test = len(ds.test[0])
    assert n_test == pytest.approx(0.2 * (n_train + n_test), rel=0.05)


# ------------------------- Model factories -------------------------


def test_model_factories_regression():
    import gpflow_tpu

    data = get_dataset("tiny_sine").train
    assert isinstance(create_model("gpr", data), gpflow_tpu.models.GPR)
    sgpr = create_model("sgpr", data)
    assert isinstance(sgpr, gpflow_tpu.models.SGPR)
    # inducing points come from the data, capped at min(100, N)
    assert sgpr.inducing_variable.num_inducing == min(100, len(data[0]))
    svgp = create_model("svgp", data)
    assert isinstance(svgp.likelihood, gpflow_tpu.likelihoods.Gaussian)
    assert svgp.num_data == len(data[0])


def test_model_factories_classification_pick_bernoulli():
    import gpflow_tpu

    data = get_dataset("banana").train
    vgp = create_model("vgp", data)
    svgp = create_model("svgp", data)
    assert isinstance(vgp.likelihood, gpflow_tpu.likelihoods.Bernoulli)
    assert isinstance(svgp.likelihood, gpflow_tpu.likelihoods.Bernoulli)


# ------------------------- Metrics -------------------------


def test_metric_definitions():
    names = [m.name for m in METRICS]
    assert len(names) == len(set(names))
    for required in (
        "training_time", "training_iteration_time", "prediction_time",
        "nlpd", "mae", "rmse", "posterior_build_time", "posterior_prediction_time",
        "accuracy",
    ):
        assert required in names
    # accuracy (classification, reference metrics.py:39-46) is the one
    # greater-is-better metric; every other one is a loss or a time
    assert all(
        m.orientation is MetricOrientation.LOWER_IS_BETTER
        for m in METRICS
        if m.name != "accuracy"
    )
    assert next(m for m in METRICS if m.name == "accuracy").orientation is (
        MetricOrientation.GREATER_IS_BETTER
    )
    time_units = {m.name: m.unit for m in METRICS}
    assert time_units["training_time"] == "s"
    assert time_units["nlpd"] is None


# ------------------------- Sharding -------------------------


def test_sharding_partitions_exactly():
    tasks = [Task("d", f"m{i}", 1, 1) for i in range(10)]
    shards = [shard_tasks(tasks, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(tasks)
    assert [len(s) for s in shards] == [4, 3, 3]


def test_sharding_bad_index():
    with pytest.raises(ValueError):
        shard_tasks([1, 2, 3], 3, 3)
    with pytest.raises(ValueError):
        shard_tasks([1, 2, 3], -1, 3)


def test_sharding_more_shards_than_tasks():
    assert shard_tasks([1], 0, 4) == [1]
    assert shard_tasks([1], 3, 4) == []


# ------------------------- Runner robustness -------------------------


def test_isolated_runner_records_error_row(monkeypatch):
    """A crashing child becomes a status=error row with the stderr tail —
    the suite must not raise (reference A.3 isolation)."""
    from benchmark.run import _run_task_isolated

    task = Task("tiny_linear", "does_not_exist", 1, 1)
    # index 999 is out of range in the child -> child exits non-zero
    rows = _run_task_isolated(
        "integration_test", task, 999, repetitions=1, timeout=240.0
    )
    assert len(rows) == 1
    row = rows[0]
    assert row["status"] == "error"
    assert row["dataset"] == "tiny_linear"
    assert row["error"]  # stderr tail captured


def test_metadata_contents():
    from benchmark.run import _gather_metadata

    md = _gather_metadata("ci", 12)
    assert md["suite"] == "ci"
    assert md["num_tasks"] == 12
    assert md["cpu_count"] >= 1
    assert "jax_version" in md and "devices" in md and md["devices"]
    assert "git_rev" in md and len(md["git_rev"]) == 40


# ------------------------- Real-data (local-file UCI) datasets -------------------------


def test_real_datasets_registered_with_reference_names():
    names = set(DATASETS.names("REAL_DATA"))
    # the reference's nine UCI file-backed sets, plus the four sklearn-bundled
    # real sets that are loadable offline (datasets.py: diabetes,
    # breast_cancer, digits, wine — the latter two multiclass)
    assert names == {
        "boston", "concrete", "energy", "naval", "power",
        "protein", "red_wine", "white_wine", "yacht",
        "diabetes", "breast_cancer", "digits", "wine",
    }


def test_missing_real_data_file_raises_with_instructions(tmp_path, monkeypatch):
    from benchmark.datasets import MissingDataFile

    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))
    with pytest.raises(MissingDataFile, match="yacht_hydrodynamics.data"):
        get_dataset("yacht")


def test_real_dataset_loads_normalises_and_splits(tmp_path, monkeypatch):
    rng = np.random.RandomState(3)
    data = np.concatenate([rng.rand(50, 6), rng.randn(50, 1) * 7 + 3], axis=1)
    np.savetxt(tmp_path / "yacht_hydrodynamics.data", data)
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))

    from benchmark.datasets import is_available

    assert is_available("yacht")
    ds = get_dataset("yacht")
    (X, Y), (Xt, Yt) = ds.train, ds.test
    assert X.shape[1] == 6 and Y.shape[1] == 1
    assert len(X) + len(Xt) == 50 and len(Xt) == 5  # test_fraction 0.1
    full = np.concatenate([Y, Yt])
    np.testing.assert_allclose(full.mean(), 0.0, atol=1e-9)
    # reference divides by (1e-6 + std), so the result's std is just shy of 1
    np.testing.assert_allclose(full.std(), 1.0, atol=1e-5)
    # determinism of the seeded shuffle-split
    np.testing.assert_array_equal(X, get_dataset("yacht").train[0])


def test_semicolon_csv_parser(tmp_path, monkeypatch):
    header = ";".join(f"c{i}" for i in range(4)) + ";quality"
    rows = ["1.0;2.0;0.5;3.0;5", "2.0;1.0;0.25;4.0;6", "0.5;3.0;1.0;2.0;7",
            "1.5;2.5;0.75;3.5;5", "2.5;0.5;0.1;1.0;8", "0.1;1.1;0.9;2.2;6",
            "1.1;2.1;0.4;3.1;5", "2.2;1.2;0.2;4.2;7", "0.6;3.1;1.1;2.1;6",
            "1.6;2.6;0.8;3.6;5"]
    (tmp_path / "winequality-red.csv").write_text(header + "\n" + "\n".join(rows))
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))
    ds = get_dataset("red_wine")
    assert ds.train[0].shape[1] == 4


def test_normalise_matches_reference_epsilon():
    # reference dataset_api.py:226-230: (A - mean) / (1e-6 + std), bit-exact
    from benchmark.datasets import _normalise

    A = np.array([[1.0, 5.0], [3.0, 5.0], [5.0, 5.0]])
    expected = (A - A.mean(axis=0)) / (1e-6 + A.std(axis=0))
    np.testing.assert_array_equal(_normalise(A), expected)


def test_energy_parser_selects_y1_and_drops_nan(tmp_path, monkeypatch):
    # reference benchmark/datasets.py:90-92: usecols 0..8, dropna, target Y1.
    # Y2 is constant -> if the parser wrongly took the last column the
    # normalised target would be all ~0; NaN padding row must be dropped.
    import pandas as pd

    rng = np.random.RandomState(0)
    cols = [f"X{i}" for i in range(1, 9)] + ["Y1", "Y2"]
    df = pd.DataFrame(rng.rand(30, 10), columns=cols)
    df["Y2"] = 5.0
    df.loc[30] = [np.nan] * 10  # xlsx padding row
    df.to_csv(tmp_path / "ENB2012_data.csv", index=False)
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))

    ds = get_dataset("energy")
    (X, Y), (Xt, Yt) = ds.train, ds.test
    assert X.shape[1] == 8  # Y1 must not leak into the features
    assert len(X) + len(Xt) == 30  # NaN row dropped
    assert np.concatenate([Y, Yt]).std() > 0.5  # target is Y1, not const Y2


def test_csv_fallback_rejected_for_text_datasets(tmp_path, monkeypatch):
    # a stray naval .csv sibling must NOT be accepted (advisor r2 finding):
    # the generic last-column parse would yield the wrong feature/target split
    from benchmark.datasets import MissingDataFile, is_available

    (tmp_path / "uci_cbm_data.csv").write_text("a,b,c\n1,2,3\n")
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))
    assert not is_available("naval")
    with pytest.raises(MissingDataFile, match="uci_cbm_data.txt"):
        get_dataset("naval")


def test_csv_fallback_accepted_for_excel_datasets(tmp_path, monkeypatch):
    import pandas as pd

    rng = np.random.RandomState(1)
    df = pd.DataFrame(rng.rand(20, 9), columns=[f"c{i}" for i in range(9)])
    df.to_csv(tmp_path / "Concrete_Data.csv", index=False)
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))

    from benchmark.datasets import is_available

    assert is_available("concrete")
    ds = get_dataset("concrete")
    (X, Y), (Xt, Yt) = ds.train, ds.test
    assert X.shape[1] == 8 and Y.shape[1] == 1
    assert len(X) + len(Xt) == 20  # header row consumed as header, not data


def test_suite_skips_unavailable_real_data_loudly(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("GPFLOW_TPU_DATA_DIR", str(tmp_path))
    tasks = get_suite("uci").get_tasks()
    # no file-backed set is available -> none scheduled, never a crash; the
    # sklearn-bundled offline sets (diabetes, breast_cancer, digits, wine)
    # are always there
    assert {t.dataset for t in tasks} == {"diabetes", "breast_cancer", "digits", "wine"}
    assert "skipping dataset" in capsys.readouterr().err

    np.savetxt(tmp_path / "yacht_hydrodynamics.data", np.random.rand(30, 7))
    tasks = get_suite("uci").get_tasks()
    assert {t.dataset for t in tasks} == {
        "yacht", "diabetes", "breast_cancer", "digits", "wine"
    }
    assert {t.model for t in tasks if t.dataset == "yacht"} == {
        "gpr", "sgpr", "vgp", "svgp",
    }


def test_report_renders_markdown(tmp_path):
    import csv as _csv
    import json as _json

    from benchmark.report import render_report

    rows = [
        {"suite_task": "d/m", "dataset": "d", "model": "m", "repetition": r,
         "status": "ok", "training_time": 1.0 + r, "n_training_iterations": 10,
         "prediction_time": 0.1, "posterior_prediction_time": 0.05,
         "nlpd": -0.5, "mae": 0.2, "rmse": 0.3}
        for r in (0, 1)
    ] + [{"suite_task": "d/m2", "dataset": "d", "model": "m2", "repetition": 0,
          "status": "timeout", "error": "exceeded 10s"}]
    with open(tmp_path / "results.csv", "w", newline="") as f:
        fieldnames = sorted({k for r in rows for k in r})
        w = _csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)
    with open(tmp_path / "metadata.json", "w") as f:
        _json.dump({"suite": "uci", "num_tasks": 2, "device_kind": "TPU v5",
                    "devices": ["TPU 0"], "git_rev": "a" * 40,
                    "jax_version": "0", "timestamp": "t",
                    "repetitions_override": 2}, f)
    md = render_report(str(tmp_path), "T")
    assert "| d/m | 2 |" in md
    # training_time: rep 0 (cold compile) goes to its own column; warm
    # reps aggregate. With reps (0, 1): cold = 1.0, warm = just rep 1 = 2.
    assert "| 1 |" in md  # cold_training_time column
    assert "cold_training_time" in md and "training_time (warm)" in md
    assert "0.1 ± 0 |" in md  # non-cold metrics still mean over ALL reps
    assert "repetitions overridden to 2" in md
    assert "Failed / timed-out" in md and "exceeded 10s" in md
