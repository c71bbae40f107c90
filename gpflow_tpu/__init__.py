"""gpflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Gaussian-process framework.

Brand-new implementation with the capabilities of GPflow 2.9.2
(reference at /root/reference; see SURVEY.md for the blueprint). The compute
path is functional JAX over pytree modules; hot covariance kernels have Pallas
TPU implementations; multi-chip scale-out uses jax.sharding meshes.
"""
import os

import jax as _jax

# The reference defaults to float64 numerics (gpflow/config/__config__.py:98);
# we enable x64 support so the default_float()=float64 configuration works.
# Opt out (e.g. for pure bf16/f32 benchmark runs) with GPFLOW_TPU_DISABLE_X64=1.
if os.environ.get("GPFLOW_TPU_DISABLE_X64", "0") in ("0", "", "false", "False"):
    _jax.config.update("jax_enable_x64", True)

# On TPU, f32 matmuls default to bf16 input precision (~3e-3 relative error).
# GP numerics pivot on cancellation-heavy quantities (pairwise distances,
# Kff - A^T A diagonals, Cholesky inputs), where bf16 rounding produces
# indefinite covariances and NaN gradients. Force full-precision f32 matmuls
# (6-pass bf16 on the MXU) library-wide; opt out for raw-speed experiments
# with JAX_DEFAULT_MATMUL_PRECISION or GPFLOW_TPU_FAST_MATMUL:
#   0 (default) -> "highest": exact f32, safe for every model/likelihood.
#   high        -> "high" (3-pass bf16, ~1e-5 rel err): keeps quadrature
#                  likelihoods and natural-gradient training stable at
#                  M>=1024 while recovering most of the MXU throughput.
#   1           -> raw bf16-input matmuls: fastest; intended for the
#                  Gaussian-likelihood ELBO path, where the predictive
#                  variance enters linearly and rounding never NaNs. With
#                  quadrature/Monte-Carlo likelihoods at large M the
#                  variance cancellation can go negative -- quadrature
#                  clamps it, but prefer `high` there.
if "JAX_DEFAULT_MATMUL_PRECISION" not in os.environ:
    _fast = os.environ.get("GPFLOW_TPU_FAST_MATMUL", "0")
    if _fast in ("0", "", "false", "False"):
        _jax.config.update("jax_default_matmul_precision", "highest")
    elif _fast == "high":
        _jax.config.update("jax_default_matmul_precision", "high")

from . import bijectors, ci_utils, config, logdensities, priors, utilities
from .base import Module, Parameter, PriorOn, TensorType
from .config import default_float, default_int, default_jitter
from .utilities import set_trainable
from .versions import __version__

# Subpackages appended as they are built (see SURVEY.md §7.2 build order).
# NOTE(build): modules not yet implemented are skipped; the tuple below is the
# full target surface (reference gpflow/__init__.py:17-76) and test_all.py
# asserts each listed module eventually imports.
import importlib as _importlib

_SUBPACKAGES = (
    "quadrature",
    "probability_distributions",
    "functions",
    "mean_functions",
    "kernels",
    "likelihoods",
    "inducing_variables",
    "covariances",
    "conditionals",
    "kullback_leiblers",
    "posteriors",
    "models",
    "optimizers",
    "expectations",
    "monitor",
    "parallel",
    "experimental",
)
for _name in _SUBPACKAGES:
    # no ImportError suppression: a failure inside any subpackage must
    # surface at import time, not as a distant AttributeError later
    globals()[_name] = _importlib.import_module(f".{_name}", __name__)

__all__ = [
    "Module",
    "Parameter",
    "PriorOn",
    "TensorType",
    "__version__",
    "bijectors",
    "ci_utils",
    "conditionals",
    "config",
    "covariances",
    "default_float",
    "default_int",
    "default_jitter",
    "expectations",
    "experimental",
    "functions",
    "inducing_variables",
    "kernels",
    "kullback_leiblers",
    "likelihoods",
    "logdensities",
    "mean_functions",
    "models",
    "monitor",
    "optimizers",
    "parallel",
    "posteriors",
    "priors",
    "probability_distributions",
    "quadrature",
    "set_trainable",
    "utilities",
]
