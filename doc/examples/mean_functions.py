"""Mean functions (mirrors the reference's getting_started/mean_functions
notebook, ``doc/sphinx/notebooks/getting_started/mean_functions.pct.py``).

GP models default to a zero mean; a mean function lets the model extrapolate
structure (here a linear trend) away from the data, and mean functions
compose with ``+`` and ``*``.
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
