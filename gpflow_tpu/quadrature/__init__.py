from .base import GaussianQuadrature
from .gauss_hermite import NDiagGHQuadrature, gh_points_and_weights, ndgh_points_and_weights
from .deprecated import hermgauss, mvhermgauss, mvnquad, ndiag_mc, ndiagquad

__all__ = [
    "GaussianQuadrature",
    "NDiagGHQuadrature",
    "gh_points_and_weights",
    "hermgauss",
    "mvhermgauss",
    "mvnquad",
    "ndgh_points_and_weights",
    "ndiag_mc",
    "ndiagquad",
]
