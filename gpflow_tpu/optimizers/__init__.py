from .scipy import Scipy

__all__ = ["NaturalGradient", "SamplingHelper", "Scipy", "XiNat", "XiSqrtMeanVar", "XiTransform"]


def __getattr__(name: str):
    # NaturalGradient / SamplingHelper are imported lazily while the package
    # is built out in stages (they land with the variational/MCMC models).
    if name in ("NaturalGradient", "XiNat", "XiSqrtMeanVar", "XiTransform"):
        from .natgrad import NaturalGradient, XiNat, XiSqrtMeanVar, XiTransform

        return {"NaturalGradient": NaturalGradient, "XiNat": XiNat,
                "XiSqrtMeanVar": XiSqrtMeanVar, "XiTransform": XiTransform}[name]
    if name == "SamplingHelper":
        from .mcmc import SamplingHelper

        return SamplingHelper
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
