"""Change-point kernels (mirrors the reference's advanced/changepoints
notebook, reference ``doc/sphinx/notebooks/advanced/changepoints.pct.py``).

The ``ChangePoints`` kernel blends a list of kernels through sigmoids
parameterised by locations and steepness, modelling 1-D functions with
regime changes.  We draw prior samples under several parameterisations and
then recover a change-point location from data by maximum likelihood.

How the blend works (``kernels/changepoints.py``): for K+1 kernels and K
locations c_k with steepness s_k, define per-point weights from the
sigmoids sig_k(x) = sigmoid(s_k (x - c_k)). Kernel i is active where
sig_{i-1} is ~1 and sig_i is ~0, and the covariance between x and x' uses
the PRODUCT of their activations:

    k(x, x') = sum_i  w_i(x) k_i(x, x') w_i(x')

This keeps positive-definiteness (it is a sum of rescaled PSD kernels) and
makes the transition width explicit: steepness 5 gives a soft handover
over ~1/5 of an input unit; steepness -> inf approaches a hard switch.

Three things the example demonstrates:
1. Prior samples: the same construction with different (locations,
   steepness) produces visibly different regime structure BEFORE any data
   — always sanity-check a structured kernel by sampling its prior.
2. The change-point location and steepness are Parameters: maximum
   likelihood recovers the true location from data with regime change
   (the assertion at the end), jointly with each regime's lengthscale.
3. Composition: each regime kernel is arbitrary (different families,
   different hyperpriors) — regime models like "smooth before, rough
   after" are one constructor call.

Identifiability caveat: with data only from one side of a candidate
location, the sigmoid weight is ~constant there and the location's
gradient vanishes — initialize locations inside the observed range.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(150, 25)


def prior_samples(kernel, n_samples: int = 3, n_grid: int = 80) -> np.ndarray:
    xx = np.linspace(-3, 3, n_grid)[:, None]
    K = np.asarray(kernel(xx)) + 1e-9 * np.eye(n_grid)
    rng = np.random.RandomState(1)
    return rng.multivariate_normal(np.zeros(n_grid), K, n_samples)


def main() -> None:
    # single change-point between two lengthscales
    k = gpf.kernels.ChangePoints(
        [gpf.kernels.Matern32(lengthscales=0.2), gpf.kernels.Matern32(lengthscales=2.0)],
        locations=[0.0],
        steepness=5.0,
    )
    s = prior_samples(k)
    print("single change-point sample std:", s.std().round(3))

    # change window: kernel -> Constant -> same kernel, two locations
    base = gpf.kernels.Matern32(lengthscales=0.3)
    k = gpf.kernels.ChangePoints(
        [base, gpf.kernels.Constant(), base], locations=[-1.0, 1.0], steepness=10.0
    )
    print("change-window K diag[:3]:", np.asarray(k.K_diag(np.linspace(-2, 2, 5)[:, None]))[:3].round(3))

    # per-change-point steepness
    k = gpf.kernels.ChangePoints(
        [base, gpf.kernels.Constant(), base], locations=[-1.0, 1.0], steepness=[5.0, 50.0]
    )
    assert np.asarray(k(np.zeros((2, 1)))).shape == (2, 2)

    # recover a change point from data: smooth regime then rough regime
    rng = np.random.RandomState(0)
    X = np.sort(rng.uniform(-3, 3, (120, 1)), axis=0)
    Y = np.where(
        X < 0.5, np.sin(2 * X), 0.4 * np.sin(25 * X)
    ) + 0.05 * rng.randn(120, 1)
    kernel = gpf.kernels.ChangePoints(
        [
            gpf.kernels.Matern32(lengthscales=1.0),
            gpf.kernels.Matern32(lengthscales=0.2),
        ],
        locations=[0.0],
        steepness=1.0,
    )
    model = gpf.models.GPR((X, Y), kernel=kernel, noise_variance=0.01)
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    loc = float(np.asarray(kernel.locations).squeeze())
    print("fitted change-point location:", round(loc, 3))
    if MAXITER >= 150:
        assert abs(loc - 0.5) < 0.5


if __name__ == "__main__":
    main()
