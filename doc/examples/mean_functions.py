"""Mean functions (mirrors the reference's getting_started/mean_functions
notebook, ``doc/sphinx/notebooks/getting_started/mean_functions.pct.py``).

GP models default to a zero mean; a mean function lets the model extrapolate
structure (here a linear trend) away from the data, and mean functions
compose with ``+`` and ``*``.

Why the far-field demo below works the way it does: a stationary-kernel GP
posterior reverts to its PRIOR mean at inputs far from any datum (the
kernel correlation decays, so the data stop mattering). With the default
zero mean that means predictions collapse to 0 — visibly wrong for data
with a trend. Attaching ``Linear(A, b)`` moves the reversion target: the
GP now models only the RESIDUAL around a trainable trend, and the
far-field prediction follows the trend line. The mean function's A and b
are ordinary Parameters, trained jointly with the kernel by the same
L-BFGS call — nothing special is needed.

Rules of thumb:
* A mean function changes extrapolation behaviour and frees the kernel
  from spending lengthscale/variance on global structure; for
  interpolation well inside the data it matters much less.
* Prefer the simplest mean that captures known structure (Constant for an
  offset, Linear for a trend); a flexible mean competes with the kernel
  for the same variance and can make hyperparameters unidentifiable.
* Means compose like kernels (``+``, ``*``; demonstrated below), and
  ``SwitchedMeanFunction`` pairs with ``SwitchedLikelihood``'s index
  column for per-group offsets (see coregionalisation.py).
* For a mean outside the built-in family — e.g. a neural network — any
  callable Module works; ``doc/examples/external_mean_function.py`` uses
  exactly that.

All mean functions implement ``__call__(X) -> [N, P]`` and are exercised
against the reference semantics in ``tests/gpflow_tpu/test_functions.py``.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(200, 25)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(50, 1) * 4
    Y = 1.5 * X - 1.0 + np.sin(3 * X) + 0.1 * rng.randn(50, 1)

    # zero-mean model reverts to zero far from the data...
    zero_model = gpf.models.GPR((X, Y), kernel=gpf.kernels.SquaredExponential())
    gpf.optimizers.Scipy().minimize(
        zero_model.training_loss, zero_model.trainable_variables, options={"maxiter": MAXITER}
    )

    # ...a linear mean function keeps the trend
    lin_model = gpf.models.GPR(
        (X, Y),
        kernel=gpf.kernels.SquaredExponential(),
        mean_function=gpf.functions.Linear(A=np.ones((1, 1)), b=np.zeros(1)),
    )
    gpf.optimizers.Scipy().minimize(
        lin_model.training_loss, lin_model.trainable_variables, options={"maxiter": MAXITER}
    )

    X_far = np.array([[10.0]])
    m_zero, _ = zero_model.predict_f(X_far)
    m_lin, _ = lin_model.predict_f(X_far)
    truth = 1.5 * 10 - 1.0
    print("far-field prediction: zero-mean", float(m_zero.squeeze()).__round__(2),
          "linear-mean", float(m_lin.squeeze()).__round__(2), "truth", truth)
    if MAXITER >= 200:
        assert abs(float(m_lin.squeeze()) - truth) < abs(float(m_zero.squeeze()) - truth)

    # composition: means add and multiply like kernels
    mf = gpf.functions.Constant(2.0) + gpf.functions.Polynomial(degree=2)
    prod = gpf.functions.Constant(3.0) * gpf.functions.Identity()
    print("composed mean at 1.0:", float(np.asarray(mf(np.array([[1.0]]))).squeeze()))
    print("product mean at 2.0:", float(np.asarray(prod(np.array([[2.0]]))).squeeze()))

    # switched mean: last input column selects the mean function per datum
    smf = gpf.functions.SwitchedMeanFunction(
        [gpf.functions.Constant(-1.0), gpf.functions.Constant(+1.0)]
    )
    Xs = np.array([[0.3, 0.0], [0.3, 1.0]])
    print("switched mean:", np.asarray(smf(Xs)).squeeze())


if __name__ == "__main__":
    main()
