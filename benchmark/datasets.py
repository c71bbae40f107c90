"""Benchmark datasets (reference ``benchmark/datasets.py``): synthetic TINY
sets, generated MEDIUM/LARGE regression/classification tasks, and the
reference's real UCI datasets served from a LOCAL data directory.

The reference downloads UCI files over the network
(``benchmark/dataset_api.py:269-290``); this environment has no egress, so the
same dataset names (boston, naval, protein, red_wine, ... — tagged
``REAL_DATA``) instead read pre-fetched files from ``$GPFLOW_TPU_DATA_DIR``
(default ``~/.gpflow_tpu/data``). A missing file raises
:class:`MissingDataFile` naming the expected path and origin URL; suites skip
unavailable REAL_DATA sets loudly (see ``benchmarks.BenchmarkSet.get_tasks``).
Normalisation (mean 0 / var 1) and the seeded shuffle-split match the
reference (``dataset_api.py:226-266``)."""
from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, NamedTuple, Tuple

import numpy as np

from .registry import Registry

__all__ = [
    "Dataset",
    "DATASETS",
    "MissingDataFile",
    "get_dataset",
    "is_available",
]


class Dataset(NamedTuple):
    name: str
    train: Tuple[np.ndarray, np.ndarray]
    test: Tuple[np.ndarray, np.ndarray]


DATASETS: Registry = Registry("dataset")


def _split(X: np.ndarray, Y: np.ndarray, name: str, test_frac: float = 0.2) -> Dataset:
    n = len(X)
    n_test = max(1, int(n * test_frac))
    return Dataset(name, (X[:-n_test], Y[:-n_test]), (X[-n_test:], Y[-n_test:]))


def _tiny_linear() -> Dataset:
    rng = np.random.RandomState(0)
    X = rng.rand(20, 1)
    Y = 2.0 * X + 0.1 * rng.randn(20, 1)
    return _split(X, Y, "tiny_linear")


def _tiny_sine() -> Dataset:
    rng = np.random.RandomState(1)
    X = rng.rand(20, 1) * 6
    Y = np.sin(X) + 0.1 * rng.randn(20, 1)
    return _split(X, Y, "tiny_sine")


def _synth_regression(n: int, d: int, seed: int, name: str) -> Dataset:
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d) * 4
    w = rng.randn(d, 1)
    Y = np.sin(X @ w) + 0.2 * np.cos(2 * X[:, :1]) + 0.1 * rng.randn(n, 1)
    return _split(X, Y, name)


def _banana() -> Dataset:
    rng = np.random.RandomState(4)
    n = 400
    X = rng.randn(n, 2)
    p = 1 / (1 + np.exp(-(np.sin(2 * X[:, 0]) + X[:, 1])))
    Y = (rng.rand(n) < p).astype(float)[:, None]
    return _split(X, Y, "banana")


class MissingDataFile(RuntimeError):
    """A REAL_DATA dataset's file is not present in the local data dir."""


def _data_dir() -> Path:
    return Path(
        os.environ.get("GPFLOW_TPU_DATA_DIR", "~/.gpflow_tpu/data")
    ).expanduser()


def _normalise(A: np.ndarray) -> np.ndarray:
    # reference dataset_api.py:226-230: per-column (A - mean) / (1e-6 + std);
    # the 1e-6 floor also keeps zero-spread columns finite
    return (A - A.mean(axis=0, keepdims=True)) / (1e-6 + A.std(axis=0, keepdims=True))


def _shuffle_split(X: np.ndarray, Y: np.ndarray, name: str, test_fraction: float) -> Dataset:
    # seeded shuffle + split, matching reference dataset_api.py:254-266
    X = _normalise(np.asarray(X, dtype=float))
    Y = _normalise(np.asarray(Y, dtype=float))
    rng = np.random.default_rng(20220722)
    perm = rng.permutation(len(X))
    X, Y = X[perm], Y[perm]
    n_test = round(test_fraction * len(X))
    return Dataset(name, (X[n_test:], Y[n_test:]), (X[:n_test], Y[:n_test]))


def _real_dataset(
    name: str,
    filename: str,
    parse: Callable[[Path], Tuple[np.ndarray, np.ndarray]],
    url: str,
    size_tag: str,
    test_fraction: float = 0.1,
    csv_alt_parse: Callable[[Path], Tuple[np.ndarray, np.ndarray]] | None = None,
) -> None:
    """Registers a reference UCI dataset backed by a local file.

    ``parse(path) -> (X, Y)`` runs only when the file exists. For the
    Excel-format sets (this image ships no Excel reader) a CSV sibling (same
    stem, ``.csv``) is accepted IF ``csv_alt_parse`` is given; the sibling
    must be a faithful comma-separated export WITH the original header row —
    ``csv_alt_parse`` preserves that dataset's column semantics. Datasets
    whose primary file is already text never fall back (a stray ``.csv``
    sibling would silently change column selection — advisor r2 finding)."""

    def factory() -> Dataset:
        path = _data_dir() / filename
        csv_alt = path.with_suffix(".csv")
        if not path.exists() and csv_alt_parse is not None and csv_alt.exists():
            X, Y = csv_alt_parse(csv_alt)
            return _shuffle_split(X, Y, name, test_fraction)
        if not path.exists():
            hint = (
                f"; or export the sheet as {csv_alt.name} (comma-separated, "
                f"header row kept)" if csv_alt_parse is not None else ""
            )
            raise MissingDataFile(
                f"dataset {name!r} needs {path} (no network egress here; "
                f"fetch it from {url} and place it in $GPFLOW_TPU_DATA_DIR{hint})"
            )
        X, Y = parse(path)
        return _shuffle_split(X, Y, name, test_fraction)

    factory.__name__ = name
    factory.filename = filename  # type: ignore[attr-defined]
    factory.allow_csv = csv_alt_parse is not None  # type: ignore[attr-defined]
    DATASETS.register(name, factory, tags=[size_tag, "regression", "REAL_DATA"])


def is_available(name: str) -> bool:
    """True unless ``name`` is a REAL_DATA set whose local file is absent."""
    if "REAL_DATA" not in DATASETS.tags_of(name):
        return True
    factory = DATASETS.get(name)
    fn = getattr(factory, "filename", None)
    if fn is None:
        return True
    p = _data_dir() / fn
    if p.exists():
        return True
    return bool(getattr(factory, "allow_csv", False)) and p.with_suffix(".csv").exists()


def _parse_fwf_last_col(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    data = pd.read_fwf(path, header=None).values
    return data[:, :-1], data[:, -1:]


def _parse_naval(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    # whitespace table; first of the two trailing outputs is the target and
    # dims 8/11 are constant (reference datasets.py:100-108)
    data = np.loadtxt(path)
    X = np.delete(data[:, :-2], [8, 11], axis=1)
    return X, data[:, -2:-1]


def _parse_protein(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    data = pd.read_csv(path).values
    return data[:, 1:], data[:, :1]


def _parse_semicolon_csv(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    data = pd.read_csv(path, delimiter=";").values
    return data[:, :-1], data[:, -1:]


def _parse_loadtxt(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    data = np.loadtxt(path)
    return data[:, :-1], data[:, -1:]


def _read_excel(path: Path, **kwargs) -> np.ndarray:
    import pandas as pd

    try:
        return pd.read_excel(path, **kwargs)  # needs openpyxl/xlrd
    except ImportError as e:
        raise MissingDataFile(
            f"{path} is an Excel file and no Excel reader is installed; "
            f"export it as {path.with_suffix('.csv').name} (comma-separated, "
            f"header row kept) instead"
        ) from e


def _parse_excel(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    data = _read_excel(path).values
    return data[:, :-1], data[:, -1:]


def _parse_csv_last_col(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    # CSV sibling of an Excel sheet: comma-separated, header row present
    import pandas as pd

    data = pd.read_csv(path).values
    return data[:, :-1], data[:, -1:]


def _parse_energy(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    # reference benchmark/datasets.py:90-92: first 9 columns only (8 features
    # + Y1 heating load as target; Y2 and xlsx NaN padding dropped)
    data = _read_excel(path, usecols=np.arange(9)).dropna().values
    return data[:, :-1], data[:, -1:]


def _parse_energy_csv(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    data = pd.read_csv(path, usecols=np.arange(9)).dropna().values
    return data[:, :-1], data[:, -1:]


_UCI = "https://archive.ics.uci.edu/ml/machine-learning-databases/"

_real_dataset("boston", "housing.data", _parse_fwf_last_col, _UCI + "housing/housing.data", "MEDIUM")
_real_dataset("concrete", "Concrete_Data.xls", _parse_excel, _UCI + "concrete/compressive/Concrete_Data.xls", "MEDIUM", csv_alt_parse=_parse_csv_last_col)
_real_dataset("energy", "ENB2012_data.xlsx", _parse_energy, _UCI + "00242/ENB2012_data.xlsx", "MEDIUM", csv_alt_parse=_parse_energy_csv)
_real_dataset("naval", "uci_cbm_data.txt", _parse_naval, _UCI + "00316/UCI%20CBM%20Dataset.zip (member UCI CBM Dataset/data.txt)", "LARGE")
_real_dataset("power", "Folds5x2_pp.xlsx", _parse_excel, _UCI + "00294/CCPP.zip (member CCPP/Folds5x2_pp.xlsx)", "LARGE", csv_alt_parse=_parse_csv_last_col)
_real_dataset("protein", "CASP.csv", _parse_protein, _UCI + "00265/CASP.csv", "LARGE")
_real_dataset("red_wine", "winequality-red.csv", _parse_semicolon_csv, _UCI + "wine-quality/winequality-red.csv", "MEDIUM")
_real_dataset("white_wine", "winequality-white.csv", _parse_semicolon_csv, _UCI + "wine-quality/winequality-white.csv", "LARGE")
_real_dataset("yacht", "yacht_hydrodynamics.data", _parse_loadtxt, _UCI + "00243/yacht_hydrodynamics.data", "MEDIUM")


def _diabetes() -> Dataset:
    """Efron et al. diabetes (N=442, D=10) — the one REAL regression dataset
    shipped offline in this image (sklearn bundles it; the reference's UCI
    files need network egress, absent here). NOT part of the reference's
    dataset list; registered REAL_DATA so the ``uci`` suite exercises the
    real-data path end-to-end and produces committable results
    (BENCH_UCI.md) while the canonical files are unavailable."""
    from sklearn.datasets import load_diabetes

    raw = load_diabetes()
    return _shuffle_split(raw.data, raw.target.reshape(-1, 1), "diabetes", 0.1)


DATASETS.register("diabetes", _diabetes, tags=["MEDIUM", "regression", "REAL_DATA"])


def _breast_cancer() -> Dataset:
    """Wisconsin breast cancer (N=569, D=30, binary) — the REAL classification
    dataset shipped offline in this image (sklearn bundles it). Labels stay
    0/1 (only X is normalised); exercises the Bernoulli VGP/SVGP path on real
    data. Like ``diabetes``, not in the reference's list — registered so the
    real-data suite has a classification column while the canonical UCI files
    are unavailable offline."""
    from sklearn.datasets import load_breast_cancer

    raw = load_breast_cancer()
    X = _normalise(np.asarray(raw.data, dtype=float))
    Y = np.asarray(raw.target, dtype=float).reshape(-1, 1)
    rng = np.random.default_rng(20220722)
    perm = rng.permutation(len(X))
    X, Y = X[perm], Y[perm]
    n_test = round(0.1 * len(X))
    return Dataset("breast_cancer", (X[n_test:], Y[n_test:]), (X[:n_test], Y[:n_test]))


DATASETS.register(
    "breast_cancer", _breast_cancer, tags=["MEDIUM", "classification", "REAL_DATA"]
)


def _multiclass_sklearn(loader, name: str, seed: int) -> Dataset:
    """Shared loader for the offline sklearn multiclass sets: X normalised,
    Y = integer class index as a float column (the MultiClass/Softmax
    likelihoods consume the index, not one-hot)."""
    raw = loader()
    X = _normalise(np.asarray(raw.data, dtype=float))
    Y = np.asarray(raw.target, dtype=float).reshape(-1, 1)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(X))
    X, Y = X[perm], Y[perm]
    n_test = round(0.1 * len(X))
    return Dataset(name, (X[n_test:], Y[n_test:]), (X[:n_test], Y[:n_test]))


def _digits() -> Dataset:
    """sklearn digits (N=1797, D=64, 10 classes) — the offline stand-in for a
    real multiclass benchmark (VERDICT r3 #3): exercises MultiClass/RobustMax
    and Softmax SVGP at real scale."""
    from sklearn.datasets import load_digits

    return _multiclass_sklearn(load_digits, "digits", 20220722)


def _wine() -> Dataset:
    """sklearn wine (N=178, D=13, 3 classes) — small real multiclass set.
    Distinct from the reference's red_wine/white_wine UCI REGRESSION sets
    (those score wine quality 0-10; this classifies cultivars)."""
    from sklearn.datasets import load_wine

    return _multiclass_sklearn(load_wine, "wine", 20220722)


DATASETS.register("digits", _digits, tags=["MEDIUM", "multiclass", "REAL_DATA"])
DATASETS.register("wine", _wine, tags=["MEDIUM", "multiclass", "REAL_DATA"])


DATASETS.register("tiny_linear", _tiny_linear, tags=["TINY", "regression"])
DATASETS.register("tiny_sine", _tiny_sine, tags=["TINY", "regression"])
DATASETS.register(
    "synth_medium", lambda: _synth_regression(1000, 4, 2, "synth_medium"),
    tags=["MEDIUM", "regression"],
)
DATASETS.register(
    "synth_large", lambda: _synth_regression(100_000, 8, 3, "synth_large"),
    tags=["LARGE", "regression"],
)
DATASETS.register("banana", _banana, tags=["MEDIUM", "classification"])


def get_dataset(name: str) -> Dataset:
    return DATASETS.get(name)()
