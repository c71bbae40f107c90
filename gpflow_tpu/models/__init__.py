from .gpr import GPR, GPR_deprecated, GPR_with_posterior
from .model import BayesianModel, GPModel
from .training_mixins import ExternalDataTrainingLossMixin, InternalDataTrainingLossMixin
from .util import (
    data_input_to_tensor,
    inducingpoint_wrapper,
    maximum_log_likelihood_objective,
    training_loss,
    training_loss_closure,
)

__all__ = [
    "BayesianModel",
    "ExternalDataTrainingLossMixin",
    "GPModel",
    "GPR",
    "GPR_deprecated",
    "GPR_with_posterior",
    "InternalDataTrainingLossMixin",
    "data_input_to_tensor",
    "inducingpoint_wrapper",
    "maximum_log_likelihood_objective",
    "training_loss",
    "training_loss_closure",
]
