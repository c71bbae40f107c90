from . import conditionals as _conditionals_impl  # registers single-output
from . import multioutput  # registers multioutput
from . import sample_conditionals as _sample_impl  # registers sampling
from .dispatch import conditional, sample_conditional
from .util import base_conditional, base_conditional_with_lm, sample_mvn

__all__ = [
    "base_conditional",
    "base_conditional_with_lm",
    "conditional",
    "sample_conditional",
    "sample_mvn",
    "uncertain_conditional",
]


def __getattr__(name: str):
    # uncertain_conditional depends on the expectations framework; import
    # lazily to avoid a hard dependency cycle at package init.
    if name == "uncertain_conditional":
        from .uncertain_conditionals import uncertain_conditional

        return uncertain_conditional
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
