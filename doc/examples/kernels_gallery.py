"""Kernel gallery (mirrors the reference's getting_started/kernels notebook,
``doc/sphinx/notebooks/getting_started/kernels.pct.py``).

Evaluates every stock single-output kernel on a common grid, demonstrates
composition (+, *), ``active_dims``, and what lengthscale/variance/period
do to the covariance structure.

A field guide to choosing among them:

* **SquaredExponential** — infinitely smooth samples; the default for
  well-behaved continuous functions. Its extreme smoothness can
  over-confidently interpolate rough data.
* **Matern52 / Matern32 / Matern12** — decreasing smoothness (2x/1x/0x
  differentiable). Matern52 is the workhorse for physical data; Matern12
  (= Exponential) gives Ornstein-Uhlenbeck, fitting rough/noisy series.
* **RationalQuadratic** — a scale mixture of SquaredExponentials: behaves
  like several lengthscales at once; its ``alpha`` interpolates (at
  alpha -> inf it IS SquaredExponential).
* **Periodic(base, period)** — wraps any stationary base through the
  sin-warp so correlation depends on distance AROUND the circle; the
  base's lengthscale controls within-period smoothness.
* **Cosine** — pure harmonic; useful as a component, rarely alone.
* **Linear / Polynomial** — non-stationary dot-product kernels; samples
  are (polynomial) trends. `Linear + Matern52` = trend + correlated
  residual, the classic additive decomposition.
* **Constant / White** — bias and iid-noise components for composition
  (a White component inside a Sum is how you make noise explicit in the
  kernel rather than in the likelihood).
* **ArcCosine** — the infinite-width ReLU-network kernel; non-stationary,
  depth via ``order``.

Every kernel here supports ARD (one lengthscale per input dim — pass a
vector), ``active_dims`` slicing, and the checks this gallery runs:
symmetry, positive semidefiniteness on a grid, and K_diag consistency.
On TPU the whole isotropic family routes through one fused Pallas
distance-tile kernel (``ops/pallas_distance.py``), so the choice among
Materns/RBF is statistical, not computational.
"""
import numpy as np

import gpflow_tpu as gpf


def main() -> None:
    X = np.linspace(-2, 2, 16)[:, None]

    kernels = {
        "SquaredExponential": gpf.kernels.SquaredExponential(),
        "Matern12": gpf.kernels.Matern12(),
        "Matern32": gpf.kernels.Matern32(),
        "Matern52": gpf.kernels.Matern52(),
        "Exponential": gpf.kernels.Exponential(),
        "RationalQuadratic": gpf.kernels.RationalQuadratic(),
        "Cosine": gpf.kernels.Cosine(),
        "Linear": gpf.kernels.Linear(),
        "Polynomial": gpf.kernels.Polynomial(degree=2),
        "Constant": gpf.kernels.Constant(),
        "White": gpf.kernels.White(),
        "Periodic(SqExp)": gpf.kernels.Periodic(gpf.kernels.SquaredExponential(), period=1.0),
        "ArcCosine": gpf.kernels.ArcCosine(order=1),
    }
    for name, k in kernels.items():
        K = np.asarray(k(X))
        # every kernel matrix must be symmetric PSD
        assert np.allclose(K, K.T, atol=1e-8), name
        w = np.linalg.eigvalsh(K + 1e-8 * np.eye(len(X)))
        assert w.min() > -1e-6, (name, w.min())
        print(f"{name:20s} K[0,0]={K[0,0]:7.3f}  K[0,-1]={K[0,-1]:8.4f}")

    # lengthscales control wiggliness: correlation at distance 1
    for ell in (0.3, 1.0, 3.0):
        k = gpf.kernels.SquaredExponential(lengthscales=ell)
        c = float(np.asarray(k(np.array([[0.0]]), np.array([[1.0]])))[0, 0])
        print(f"SqExp lengthscale {ell}: corr at distance 1 = {c:.3f}")

    # composition: sum and product are kernels too
    comp = gpf.kernels.Linear() + gpf.kernels.Periodic(
        gpf.kernels.SquaredExponential(), period=0.5
    )
    prod = gpf.kernels.Matern32() * gpf.kernels.Cosine()
    assert np.asarray(comp(X)).shape == (16, 16)
    assert np.asarray(prod(X)).shape == (16, 16)
    print("Sum kernel members:", [type(m).__name__ for m in comp.kernels])

    # active_dims: different kernels act on different input columns
    X2 = np.hstack([X, np.linspace(0, 1, 16)[:, None]])
    k = gpf.kernels.SquaredExponential(active_dims=[0]) * gpf.kernels.Linear(active_dims=[1])
    assert np.asarray(k(X2)).shape == (16, 16)
    print("active_dims product on 2-D input: OK")

    # ARD: one lengthscale per input dimension
    ard = gpf.kernels.SquaredExponential(lengthscales=[0.5, 2.0])
    assert np.asarray(ard(X2)).shape == (16, 16)
    print("ARD lengthscales:", np.asarray(ard.lengthscales.value))


if __name__ == "__main__":
    main()
