"""Multioutput inducing variables (reference
``/root/reference/gpflow/inducing_variables/multioutput/inducing_variables.py``).

The Fallback classes route through the generic [L, M, M] / [M, L, N, P]
interdomain conditional; the non-fallback subclasses opt in to the cheaper
``IndependentPosteriorMultiOutput`` path (rationale at reference ``:38-66``;
posterior selection in SURVEY.md A.1).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ...utilities.shapes import check_shapes
from ..inducing_variables import InducingVariables

__all__ = [
    "FallbackSeparateIndependentInducingVariables",
    "FallbackSharedIndependentInducingVariables",
    "MultioutputInducingVariables",
    "SeparateIndependentInducingVariables",
    "SharedIndependentInducingVariables",
]


class MultioutputInducingVariables(InducingVariables):
    """Base class (reference ``multioutput/inducing_variables.py:20-36``)."""

    @property
    def inducing_variables(self) -> Tuple[InducingVariables, ...]:
        raise NotImplementedError


class FallbackSharedIndependentInducingVariables(MultioutputInducingVariables):
    """Same inducing variables shared across latent processes; generic
    Kuu [L, M, M] / Kuf [M, L, N, P] code path."""

    @check_shapes("inducing_variable: [M, D, 1]")
    def __init__(self, inducing_variable: InducingVariables):
        self.inducing_variable = inducing_variable

    @property  # type: ignore[misc]
    @check_shapes("return: []")
    def num_inducing(self) -> int:
        return self.inducing_variable.num_inducing

    @property
    def inducing_variables(self) -> Tuple[InducingVariables, ...]:
        return (self.inducing_variable,)

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        inner = self.inducing_variable.shape
        if inner is None:
            return inner
        return inner[:2] + (None,)  # type: ignore[return-value]


class FallbackSeparateIndependentInducingVariables(MultioutputInducingVariables):
    """One set of inducing variables per latent process; generic code path.
    Each child must have the same number of inducing points M."""

    @check_shapes("inducing_variable_list[all]: [., D, 1]")
    def __init__(self, inducing_variable_list: Sequence[InducingVariables]):
        self.inducing_variable_list = list(inducing_variable_list)

    @property  # type: ignore[misc]
    @check_shapes("return: []")
    def num_inducing(self) -> int:
        nums = {iv.num_inducing for iv in self.inducing_variable_list}
        if len(nums) != 1:
            raise ValueError(
                "'num_inducing' does not make sense when children have "
                "different numbers of inducing points."
            )
        return next(iter(nums))

    @property
    def inducing_variables(self) -> Tuple[InducingVariables, ...]:
        return tuple(self.inducing_variable_list)

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        inner = self.inducing_variable_list[0].shape
        if inner is None:
            return inner
        for iv in self.inducing_variable_list[1:]:
            if inner != iv.shape:
                return None
        return inner[:2] + (len(self.inducing_variable_list),)


class SharedIndependentInducingVariables(FallbackSharedIndependentInducingVariables):
    """Opts into the efficient independent-outputs conditional
    (no Kuu/Kuf shape constraints)."""


class SeparateIndependentInducingVariables(FallbackSeparateIndependentInducingVariables):
    """Opts into the efficient independent-outputs conditional."""
