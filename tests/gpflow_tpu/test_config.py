"""Config behavior (strategy from reference ``tests/gpflow/config/test_config.py``):
env-var overrides + garbage rejection, dtype setter validation, float setter
validation, positive-bijector naming, summary_fmt validation, as_context
isolation, to_default_* conversion — plus the TPU-specific dtype-aware jitter
default (float32 needs 1e-4; see ``config/__config__.py``)."""
from unittest import mock

import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu import config
from gpflow_tpu.config import (
    Config,
    as_context,
    default_float,
    default_int,
    default_jitter,
    default_likelihood_positive_minimum,
    default_positive_bijector,
    default_positive_minimum,
    default_summary_fmt,
    positive_bijector_type_map,
    set_config,
    set_default_float,
    set_default_int,
    set_default_jitter,
    set_default_likelihood_positive_minimum,
    set_default_positive_bijector,
    set_default_positive_minimum,
    set_default_summary_fmt,
)
from gpflow_tpu.utilities import to_default_float, to_default_int

_env_values = [
    ("int", "int16", np.int16),
    ("int", "int64", np.int64),
    ("float", "float16", np.float16),
    ("float", "float32", np.float32),
    ("positive_bijector", "exp", "exp"),
    ("positive_bijector", "softplus", "softplus"),
    ("summary_fmt", "simple", "simple"),
    ("positive_minimum", "1e-3", 1e-3),
    ("likelihood_positive_minimum", "5e-4", 5e-4),
    ("jitter", "1e-2", 1e-2),
]


@pytest.fixture(autouse=True)
def _restore_config():
    saved = config.config()
    saved_explicit = config.__config__._jitter_explicit
    yield
    config.set_config(saved)
    config.__config__._jitter_explicit = saved_explicit


@pytest.mark.parametrize("attr_name, value, expected_value", _env_values)
def test_env_variables(attr_name, value, expected_value):
    env_name = f"GPFLOW_{attr_name.upper()}"
    with mock.patch.dict("os.environ", {env_name: value}):
        cfg = Config()
        assert getattr(cfg, attr_name) == expected_value


@pytest.mark.parametrize(
    "attr_name", list(dict.fromkeys(list(zip(*_env_values))[0]))
)
def test_env_variables_garbage_rejected(attr_name):
    env_name = f"GPFLOW_{attr_name.upper()}"
    with mock.patch.dict("os.environ", {env_name: "garbage"}):
        with pytest.raises(TypeError):
            Config()


def test_env_int_with_float_dtype_rejected():
    with mock.patch.dict("os.environ", {"GPFLOW_INT": "float32"}):
        with pytest.raises(TypeError):
            Config()
    with mock.patch.dict("os.environ", {"GPFLOW_FLOAT": "int32"}):
        with pytest.raises(TypeError):
            Config()


@pytest.mark.parametrize(
    "getter, setter, valid_type_1, valid_type_2",
    [
        (default_int, set_default_int, np.int64, np.int32),
        (default_float, set_default_float, np.float32, np.float64),
    ],
)
def test_dtype_setting(getter, setter, valid_type_1, valid_type_2):
    setter(valid_type_1)
    assert getter() == valid_type_1
    setter(valid_type_2)
    assert getter() == valid_type_2


@pytest.mark.parametrize(
    "setter, invalid_type",
    [
        (set_default_int, str),
        (set_default_int, np.float64),
        (set_default_float, list),
        (set_default_float, np.int32),
    ],
)
def test_dtype_errorcheck(setter, invalid_type):
    with pytest.raises(TypeError):
        setter(invalid_type)


@pytest.mark.parametrize(
    "setter, getter",
    [
        (set_default_jitter, default_jitter),
        (set_default_likelihood_positive_minimum, default_likelihood_positive_minimum),
        (set_default_positive_minimum, default_positive_minimum),
    ],
)
@pytest.mark.parametrize("value", [1e-3, 1e-6])
def test_floats_setting(setter, getter, value):
    setter(value)
    assert getter() == value


@pytest.mark.parametrize(
    "setter",
    [
        set_default_jitter,
        set_default_likelihood_positive_minimum,
        set_default_positive_minimum,
    ],
)
def test_floats_errorcheck(setter):
    with pytest.raises((TypeError, ValueError)):
        setter("not a float")
    with pytest.raises(ValueError):
        setter(-1e-10)


@pytest.mark.parametrize("value", ["Unknown", 1.0])
def test_positive_bijector_error(value):
    with pytest.raises((ValueError, AttributeError)):
        set_default_positive_bijector(value)


@pytest.mark.parametrize("value", ["exp", "SoftPlus"])
def test_positive_bijector_setting(value):
    set_default_positive_bijector(value)
    assert default_positive_bijector() == value.lower()


def test_positive_bijector_type_map_builds_parameters():
    for name, cls in positive_bijector_type_map().items():
        set_default_positive_bijector(name)
        p = gpflow_tpu.Parameter(0.5, transform=gpflow_tpu.utilities.positive())
        assert isinstance(p.transform, cls) or type(p.transform).__name__.lower().startswith(
            name
        ), (name, p.transform)


def test_default_summary_fmt_setting():
    set_default_summary_fmt("html")
    assert default_summary_fmt() == "html"
    set_default_summary_fmt(None)
    assert default_summary_fmt() is None


def test_default_summary_fmt_errorcheck():
    with pytest.raises(ValueError):
        set_default_summary_fmt("this_format_definitely_does_not_exist")


@pytest.mark.parametrize(
    "setter, getter, converter, dtype, value",
    [
        (set_default_int, default_int, to_default_int, np.int32, 3),
        (set_default_int, default_int, to_default_int, np.int64, [3, 1, 4, 1, 5, 9]),
        (set_default_float, default_float, to_default_float, np.float32, 3.14159),
        (set_default_float, default_float, to_default_float, np.float64, [3.14159] * 3),
    ],
)
def test_native_to_default_dtype(setter, getter, converter, dtype, value):
    with as_context():
        setter(dtype)
        assert converter(value).dtype == dtype
        assert converter(value).dtype == getter()


def test_as_context_restores_on_exit_and_exception():
    original = config.config()
    with as_context(Config(jitter=0.123)):
        assert default_jitter() == 0.123
    assert config.config() == original
    with pytest.raises(RuntimeError):
        with as_context(Config(jitter=0.456)):
            raise RuntimeError("boom")
    assert config.config() == original


def test_set_config_roundtrip():
    snapshot = config.config()
    set_config(Config(jitter=9e-9))
    assert default_jitter() == 9e-9
    set_config(snapshot)
    assert config.config() == snapshot


# --- TPU-specific: dtype-aware jitter default --------------------------------


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


def test_direct_config_construction_resolves_jitter_from_dtype():
    """Config(float=np.float32) must NOT keep the f64 jitter 1e-6 (the
    NaN-prone combination); jitter=None resolves from the float dtype
    (round-2 review finding)."""
    assert Config(float=np.float32).jitter == 1e-4
    assert Config(float=np.float64).jitter == 1e-6
    assert Config(float=np.float32, jitter=7e-5).jitter == 7e-5
    with as_context(Config(float=np.float32)):
        assert default_jitter() == 1e-4


def test_set_default_float_preserves_set_config_customized_jitter():
    """A jitter customized via set_config/Config(jitter=...) survives a
    dtype switch (round-2 review finding: it used to be clobbered)."""
    import dataclasses

    set_config(dataclasses.replace(config.config(), jitter=1e-8))
    set_default_float(np.float64)
    assert default_jitter() == 1e-8
    set_default_float(np.float32)
    assert default_jitter() == 1e-8


def test_as_context_restores_jitter_explicitness():
    """set_default_jitter inside as_context must not leak the explicitness
    flag: after the block, the dtype-matched jitter default is live again."""
    with as_context():
        set_default_jitter(1e-3)
        assert default_jitter() == 1e-3
    set_default_float(np.float32)
    assert default_jitter() == 1e-4  # dtype-tracking restored
    set_default_float(np.float64)
    assert default_jitter() == 1e-6
