"""Import-path alias for reference parity: the reference exposes the
bijector helpers as ``gpflow.utilities.bijectors`` (reference
``gpflow/utilities/bijectors.py``). Ours live in ``gpflow_tpu.bijectors``
(together with the full in-house bijector set that replaces TFP); this
module re-exports the helper trio so user imports port unchanged."""
from ..bijectors import positive, triangular, triangular_size

__all__ = [
    "positive",
    "triangular",
    "triangular_size",
]
