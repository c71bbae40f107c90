from .scipy import Scipy

__all__ = ["NaturalGradient", "SamplingHelper", "Scipy", "XiNat",
           "XiSqrtMeanVar", "XiTransform", "run_hmc"]


def __getattr__(name: str):
    # NaturalGradient / SamplingHelper are imported lazily while the package
    # is built out in stages (they land with the variational/MCMC models).
    if name in ("NaturalGradient", "XiNat", "XiSqrtMeanVar", "XiTransform"):
        from .natgrad import NaturalGradient, XiNat, XiSqrtMeanVar, XiTransform

        return {"NaturalGradient": NaturalGradient, "XiNat": XiNat,
                "XiSqrtMeanVar": XiSqrtMeanVar, "XiTransform": XiTransform}[name]
    if name in ("SamplingHelper", "run_hmc"):
        from .mcmc import SamplingHelper, run_hmc

        return {"SamplingHelper": SamplingHelper, "run_hmc": run_hmc}[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
