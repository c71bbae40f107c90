from typing import Any

from . import bijectors
from .checkpoints import load_checkpoint, save_checkpoint
from .bucketing import bucket_size_for, bucketize, pad_to_bucket
from .serving import ServedModel, export_serving, load_serving
from .profiling import annotate, profile
from .misc import (
    is_variable,
    positive_parameter,
    set_trainable,
    to_default_float,
    to_default_int,
    training_loop,
)
from .model_utils import add_likelihood_noise_cov, add_noise_cov, assert_params_false
from .multipledispatch import Dispatcher
from .ops import (
    broadcasting_elementwise,
    difference_matrix,
    eye,
    leading_transpose,
    pca_reduce,
    square_distance,
)
from .parameter_or_function import (
    evaluate_parameter_or_function,
    prepare_parameter_or_function,
)
from .traversal import (
    deepcopy,
    freeze,
    leaf_components,
    multiple_assign,
    parameter_dict,
    print_summary,
    read_values,
    reset_cache_bijectors,
    select_dict_parameters_with_prior,
    tabulate_module_summary,
    traverse_module,
)

__all__ = [
    "Dispatcher",
    "ServedModel",
    "add_likelihood_noise_cov",
    "add_noise_cov",
    "annotate",
    "assert_params_false",
    "bijectors",
    "broadcasting_elementwise",
    "bucket_size_for",
    "bucketize",
    "deepcopy",
    "difference_matrix",
    "evaluate_parameter_or_function",
    "export_serving",
    "eye",
    "freeze",
    "is_variable",
    "leading_transpose",
    "leaf_components",
    "load_checkpoint",
    "load_serving",
    "multiple_assign",
    "pad_to_bucket",
    "parameter_dict",
    "pca_reduce",
    "positive",
    "positive_parameter",
    "prepare_parameter_or_function",
    "print_summary",
    "profile",
    "read_values",
    "reset_cache_bijectors",
    "save_checkpoint",
    "select_dict_parameters_with_prior",
    "set_trainable",
    "square_distance",
    "tabulate_module_summary",
    "to_default_float",
    "to_default_int",
    "training_loop",
    "traverse_module",
    "triangular",
    "triangular_size",
]


def __getattr__(name: str) -> Any:
    # positive/triangular/triangular_size live in gpflow_tpu.bijectors, whose
    # shape contracts import utilities.shapes — resolving them lazily breaks
    # the init cycle (see utilities/bijectors.py docstring)
    if name in ("positive", "triangular", "triangular_size"):
        from ..bijectors import positive, triangular, triangular_size

        return {"positive": positive, "triangular": triangular,
                "triangular_size": triangular_size}[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
