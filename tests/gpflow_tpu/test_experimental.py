"""Experimental-code marker (reference ``gpflow/experimental/utils.py`` +
``tests/gpflow/experimental/test_utils.py``)."""
import warnings

from gpflow_tpu.experimental.utils import experimental


def test_experimental_warns_once_per_function():
    @experimental
    def f(x):
        return x + 1

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert f(1) == 2
        assert f(2) == 3
    messages = [str(w.message) for w in caught if "experimental" in str(w.message)]
    assert len(messages) == 1
    assert "f" in messages[0]


def test_experimental_preserves_metadata():
    @experimental
    def g(x):
        """docs"""
        return x

    assert g.__name__ == "g"
    assert g.__doc__ == "docs"
