"""Pallas TPU kernels for hot covariance paths."""
from .pallas_distance import (
    pallas_available,
    rbf_kernel_matrix,
    scaled_squared_distance,
    set_pallas_enabled,
)

__all__ = [
    "pallas_available",
    "rbf_kernel_matrix",
    "scaled_squared_distance",
    "set_pallas_enabled",
]
