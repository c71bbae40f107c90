"""Pallas TPU kernels and custom-VJP linear algebra for hot paths."""
from .linalg import chol_and_inverse, sym_jitter, triangular_inverse
from .pallas_distance import (
    PALLAS_FAMILIES,
    get_pallas_enabled,
    pallas_available,
    rbf_kernel_matrix,
    scaled_squared_distance,
    set_pallas_enabled,
    stationary_kernel_matrix,
)

__all__ = [
    "PALLAS_FAMILIES",
    "chol_and_inverse",
    "get_pallas_enabled",
    "pallas_available",
    "rbf_kernel_matrix",
    "scaled_squared_distance",
    "set_pallas_enabled",
    "stationary_kernel_matrix",
    "sym_jitter",
    "triangular_inverse",
]
