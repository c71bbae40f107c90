from .cglb import CGLB
from .gplvm import GPLVM, BayesianGPLVM
from .gpmc import GPMC
from .gpr import GPR, GPR_deprecated, GPR_with_posterior
from .model import BayesianModel, GPModel
from .sgpmc import SGPMC
from .sgpr import GPRFITC, SGPR, SGPRBase_deprecated, SGPR_deprecated, SGPR_with_posterior
from .svgp import SVGP, SVGP_deprecated, SVGP_with_posterior
from .vgp import (
    VGP,
    VGPOpperArchambeau,
    VGP_deprecated,
    VGP_with_posterior,
    update_vgp_data,
)
from .training_mixins import ExternalDataTrainingLossMixin, InternalDataTrainingLossMixin
from .util import (
    data_input_to_tensor,
    inducingpoint_wrapper,
    maximum_log_likelihood_objective,
    training_loss,
    training_loss_closure,
)

__all__ = [
    "BayesianGPLVM",
    "BayesianModel",
    "CGLB",
    "ExternalDataTrainingLossMixin",
    "GPLVM",
    "GPMC",
    "GPModel",
    "GPR",
    "GPRFITC",
    "GPR_deprecated",
    "GPR_with_posterior",
    "InternalDataTrainingLossMixin",
    "SGPMC",
    "SGPR",
    "SGPRBase_deprecated",
    "SGPR_deprecated",
    "SGPR_with_posterior",
    "SVGP",
    "SVGP_deprecated",
    "SVGP_with_posterior",
    "VGP",
    "VGPOpperArchambeau",
    "VGP_deprecated",
    "VGP_with_posterior",
    "data_input_to_tensor",
    "inducingpoint_wrapper",
    "maximum_log_likelihood_objective",
    "training_loss",
    "training_loss_closure",
    "update_vgp_data",
]
