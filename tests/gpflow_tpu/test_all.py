"""API hygiene meta-test (pattern from reference
``tests/gpflow/test_all.py:38-80``): every module must have a sorted
``__all__`` whose names actually exist."""
import importlib
import pkgutil

import pytest

import gpflow_tpu

MODULES = sorted(
    m.name
    for m in pkgutil.walk_packages(gpflow_tpu.__path__, prefix="gpflow_tpu.")
    if not m.name.split(".")[-1].startswith("_")
)


@pytest.mark.parametrize("module_name", MODULES)
def test_module_imports_and_all(module_name):
    module = importlib.import_module(module_name)
    if hasattr(module, "__all__"):
        names = list(module.__all__)
        assert names == sorted(names), f"{module_name}.__all__ is not sorted"
        for name in names:
            assert hasattr(module, name), f"{module_name}.__all__ lists missing {name!r}"
        # every public name a package __init__ re-exports from its submodules
        # must be listed in __all__ (ref tests/gpflow/test_all.py dir() check);
        # submodules themselves are exempt (unlike the reference we keep
        # __all__ to classes/functions/constants)
        import types
        import typing

        if hasattr(module, "__path__"):
            for name in dir(module):
                if name.startswith("_") or name in names:
                    continue
                obj = getattr(module, name)
                if isinstance(obj, (types.ModuleType, typing.TypeVar)):
                    continue
                defined_in = getattr(obj, "__module__", None)
                if defined_in is not None and defined_in.startswith(module_name + "."):
                    raise AssertionError(
                        f"{module_name} re-exports {name!r} (defined in {defined_in}) "
                        "but omits it from __all__"
                    )


def test_top_level_surface():
    # import-level API parity with the reference (SURVEY.md A.4)
    expected_subpackages = [
        "conditionals", "config", "covariances", "expectations", "experimental",
        "functions", "inducing_variables", "kernels", "kullback_leiblers",
        "likelihoods", "logdensities", "mean_functions", "models", "monitor",
        "optimizers", "posteriors", "probability_distributions", "quadrature",
        "utilities",
    ]
    for name in expected_subpackages:
        assert hasattr(gpflow_tpu, name), f"missing subpackage gpflow_tpu.{name}"
    for name in ["Module", "Parameter", "default_float", "default_int",
                 "default_jitter", "set_trainable", "__version__"]:
        assert hasattr(gpflow_tpu, name)


def test_monitor_and_checkpoints(tmp_path):
    import numpy as np

    from gpflow_tpu import kernels, monitor, utilities
    from gpflow_tpu.models import GPR

    X = np.random.RandomState(0).rand(8, 1)
    Y = np.sin(X)
    m = GPR((X, Y), kernel=kernels.SquaredExponential())

    calls = []
    task = monitor.ExecuteCallback(lambda **kw: calls.append(1))
    mon = monitor.Monitor(monitor.MonitorTaskGroup([task], period=2))
    for step in range(6):
        mon(step)
    assert len(calls) == 3  # steps 0, 2, 4

    # checkpoint round trip
    m.kernel.variance.assign(2.5)
    path = str(tmp_path / "ckpt")
    utilities.save_checkpoint(path, m)
    m2 = GPR((X, Y), kernel=kernels.SquaredExponential())
    utilities.load_checkpoint(path, m2)
    np.testing.assert_allclose(m2.kernel.variance.numpy(), 2.5, rtol=1e-12)
