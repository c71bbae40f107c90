"""Config behavior: dtype-aware jitter default and explicit-jitter pinning."""
import numpy as np
import pytest

from gpflow_tpu import config


@pytest.fixture(autouse=True)
def _restore_config():
    saved = config.config()
    saved_explicit = config.__config__._jitter_explicit
    yield
    config.set_config(saved)
    config.__config__._jitter_explicit = saved_explicit


def test_jitter_follows_float_dtype():
    config.set_default_float(np.float64)
    assert config.default_jitter() == 1e-6
    # float32 Cholesky at M~1000 needs more jitter; the default tracks dtype
    config.set_default_float(np.float32)
    assert config.default_jitter() == 1e-4
    config.set_default_float(np.float64)
    assert config.default_jitter() == 1e-6


def test_explicit_jitter_survives_dtype_switch():
    config.set_default_jitter(3e-5)
    config.set_default_float(np.float32)
    assert config.default_jitter() == 3e-5
    config.set_default_float(np.float64)
    assert config.default_jitter() == 3e-5


def test_set_default_jitter_validates():
    with pytest.raises(ValueError):
        config.set_default_jitter(-1.0)
