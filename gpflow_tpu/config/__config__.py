"""Process-global configuration for gpflow_tpu.

TPU-native re-design of the reference config system
(``/root/reference/gpflow/config/__config__.py:95-384``): a frozen dataclass with
env-var overrides, getters/setters, and an ``as_context`` context manager.

Differences from the reference (documented deviations):
  * dtypes are numpy/jax dtypes (``np.float64`` etc.); ``jax_enable_x64`` is switched
    on at package import so the reference's float64-by-default numerics hold.
  * ``default_positive_bijector`` names one of our in-house bijectors
    ("softplus" | "exp") instead of a TFP bijector class.
"""
from __future__ import annotations

import contextlib
import dataclasses
import enum
import os
from typing import Any, Generator, Mapping, Optional, Union

import numpy as np

# import-level parity with reference ``config/__config__.py:177``
Float = Union[float]

__all__ = [
    "Config",
    "Float",
    "as_context",
    "config",
    "default_float",
    "default_int",
    "default_jitter",
    "default_likelihood_positive_minimum",
    "default_positive_bijector",
    "default_positive_minimum",
    "default_summary_fmt",
    "positive_bijector_type_map",
    "set_config",
    "set_default_float",
    "set_default_int",
    "set_default_jitter",
    "set_default_likelihood_positive_minimum",
    "set_default_positive_bijector",
    "set_default_positive_minimum",
    "set_default_summary_fmt",
]


class _Values(enum.Enum):
    """Setting names / env-var suffixes (reference ``__config__.py:64-77``)."""

    INT = "int"
    FLOAT = "float"
    POSITIVE_BIJECTOR = "positive_bijector"
    POSITIVE_MINIMUM = "positive_minimum"
    LIKELIHOOD_POSITIVE_MINIMUM = "likelihood_positive_minimum"
    SUMMARY_FMT = "summary_fmt"
    JITTER = "jitter"

    @property
    def env_name(self) -> str:
        return f"GPFLOW_{self.name}"


_POSITIVE_BIJECTOR_NAMES = ("softplus", "exp")


def _default(value: _Values) -> Any:
    """Checks the environment first, returns the reference default otherwise
    (reference ``__config__.py:95-104``: float64, jitter 1e-6, softplus, ...)."""
    rv = os.getenv(value.env_name)
    if rv is None:
        if value is _Values.JITTER:
            # The reference default 1e-6 assumes float64. In float32 a
            # well-conditioned M~1000 RBF Gram matrix routinely has min
            # eigenvalue below -1e-5 after rounding, so Cholesky fails and
            # every downstream quantity is NaN; 1e-4 is the working default.
            return 1e-6 if _default(_Values.FLOAT) == np.float64 else 1e-4
        return {
            _Values.INT: np.int32,
            _Values.FLOAT: np.float64,
            _Values.POSITIVE_BIJECTOR: "softplus",
            _Values.POSITIVE_MINIMUM: 0.0,
            _Values.LIKELIHOOD_POSITIVE_MINIMUM: 1e-6,
            _Values.SUMMARY_FMT: "fancy_grid",
        }[value]
    if value in (_Values.INT, _Values.FLOAT):
        try:
            dtype = np.dtype(rv).type
        except TypeError:
            raise TypeError(f"Config cannot recognize {value.value} type {rv!r}.")
        kind = np.integer if value is _Values.INT else np.floating
        if not np.issubdtype(dtype, kind):
            raise TypeError(f"Config cannot recognize {value.value} type {rv!r}.")
        return dtype
    if value in (_Values.POSITIVE_MINIMUM, _Values.LIKELIHOOD_POSITIVE_MINIMUM, _Values.JITTER):
        try:
            return float(rv)
        except ValueError:
            # reference __config__.py:135-141: non-float env values are a TypeError
            raise TypeError(
                f"Config cannot set the {value.value} value with non float type {rv!r}."
            )
    if value is _Values.POSITIVE_BIJECTOR:
        if rv not in _POSITIVE_BIJECTOR_NAMES:
            raise TypeError(
                "Config cannot set the passed value as a default positive bijector. "
                f"Available options: {set(_POSITIVE_BIJECTOR_NAMES)}"
            )
    if value is _Values.SUMMARY_FMT and rv not in _valid_summary_fmts():
        # fail at import, not much later inside print_summary (the reference
        # leaves this unvalidated; see tests/gpflow_tpu/test_config.py)
        raise TypeError(f"Config cannot recognize summary_fmt {rv!r}.")
    return rv


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable snapshot of all settings (reference ``__config__.py:180-215``)."""

    int: type = dataclasses.field(default_factory=lambda: _default(_Values.INT))
    float: type = dataclasses.field(default_factory=lambda: _default(_Values.FLOAT))
    # None = "resolve from the float dtype" (f64 -> 1e-6, else 1e-4) so that a
    # directly constructed Config(float=np.float32) cannot end up with the
    # NaN-prone (float32, 1e-6) combination; resolved in __post_init__.
    jitter: Optional[float] = None
    positive_bijector: str = dataclasses.field(
        default_factory=lambda: _default(_Values.POSITIVE_BIJECTOR)
    )
    positive_minimum: float = dataclasses.field(
        default_factory=lambda: _default(_Values.POSITIVE_MINIMUM)
    )
    likelihood_positive_minimum: float = dataclasses.field(
        default_factory=lambda: _default(_Values.LIKELIHOOD_POSITIVE_MINIMUM)
    )
    summary_fmt: Optional[str] = dataclasses.field(
        default_factory=lambda: _default(_Values.SUMMARY_FMT)
    )

    def __post_init__(self) -> None:
        if self.jitter is None:
            # env override first (validated), else the dtype-matched default
            resolved = _default(_Values.JITTER) if os.getenv(
                _Values.JITTER.env_name
            ) is not None else _dtype_matched_jitter(self.float)
            object.__setattr__(self, "jitter", resolved)


def _dtype_matched_jitter(float_dtype: Any) -> float:
    return 1e-6 if float_dtype == np.float64 else 1e-4


_config = Config()


def config() -> Config:
    return _config


def set_config(new_config: Config) -> None:
    global _config
    _config = new_config


def default_int() -> type:
    return config().int


def default_float() -> type:
    return config().float


def default_jitter() -> float:
    return config().jitter


def default_positive_bijector() -> str:
    return config().positive_bijector


def default_positive_minimum() -> float:
    return config().positive_minimum


def default_likelihood_positive_minimum() -> float:
    return config().likelihood_positive_minimum


def default_summary_fmt() -> Optional[str]:
    return config().summary_fmt


def _replace(**kwargs: Any) -> None:
    set_config(dataclasses.replace(config(), **kwargs))


def set_default_int(value_type: Any) -> None:
    dtype = np.dtype(value_type).type
    if not np.issubdtype(dtype, np.integer):
        raise TypeError(f"{value_type} is not an integer dtype")
    _replace(int=dtype)


def set_default_float(value_type: Any) -> None:
    dtype = np.dtype(value_type).type
    if not np.issubdtype(dtype, np.floating):
        raise TypeError(f"{value_type} is not a float dtype")
    kwargs: dict = {"float": dtype}
    # Keep the dtype-matched jitter default ONLY when the current jitter is
    # still the default for the CURRENT dtype. A jitter customized any other
    # way (set_default_jitter, set_config / Config(jitter=...), env var) is
    # preserved (review r2: set_config-customized jitter used to be
    # silently clobbered here).
    if not _jitter_explicit and config().jitter == _dtype_matched_jitter(config().float):
        kwargs["jitter"] = _dtype_matched_jitter(dtype)
    _replace(**kwargs)


_jitter_explicit = os.getenv(_Values.JITTER.env_name) is not None


def set_default_jitter(value: float) -> None:
    global _jitter_explicit
    if value < 0:
        raise ValueError("Jitter must be non-negative")
    _jitter_explicit = True
    _replace(jitter=float(value))


def positive_bijector_type_map() -> dict:
    """Name -> bijector-class map for the positive transform (reference
    ``config/__config__.py:120-127``; TFP classes replaced by in-house ones)."""
    from .. import bijectors

    return {"softplus": bijectors.Softplus, "exp": bijectors.Exp}


def set_default_positive_bijector(value: str) -> None:
    value = value.lower()
    if value not in _POSITIVE_BIJECTOR_NAMES:
        raise ValueError(f"positive_bijector must be one of {_POSITIVE_BIJECTOR_NAMES}")
    _replace(positive_bijector=value)


def set_default_positive_minimum(value: float) -> None:
    if value < 0:
        raise ValueError("positive_minimum must be non-negative")
    _replace(positive_minimum=float(value))


def set_default_likelihood_positive_minimum(value: float) -> None:
    if value < 0:
        raise ValueError("likelihood_positive_minimum must be non-negative")
    _replace(likelihood_positive_minimum=float(value))


def _valid_summary_fmts() -> list:
    """Accepted ``summary_fmt`` values: any tabulate format, plus None (plain)
    and "notebook" (HTML display) — reference ``__config__.py:344-353``."""
    fmts: list = [None, "notebook", "simple", "grid", "fancy_grid", "html", "plain"]
    try:  # pragma: no branch
        import tabulate

        fmts += list(tabulate.tabulate_formats)
    except ImportError:  # pragma: no cover - tabulate is usually available
        pass
    return fmts


def set_default_summary_fmt(value: Optional[str]) -> None:
    fmts = _valid_summary_fmts()
    if value not in fmts:
        raise ValueError(f"Summary does not support '{value}' format; valid: {fmts}")
    _replace(summary_fmt=value)


@contextlib.contextmanager
def as_context(temporary_config: Optional[Config] = None) -> Generator[None, None, None]:
    """Context manager swapping the global config (reference ``__config__.py:375-384``).
    Also restores the jitter-explicitness flag so a ``set_default_jitter``
    inside the block does not leak past it."""
    global _jitter_explicit
    current = config()
    current_explicit = _jitter_explicit
    temporary = temporary_config or current
    try:
        set_config(temporary)
        yield
    finally:
        set_config(current)
        _jitter_explicit = current_explicit
