"""Basic usage: exact GP regression (mirrors the reference's
getting_started/basic_usage notebook).

Build a GPR model on 1-D data, train hyperparameters with L-BFGS, predict,
and inspect the model.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(200, 30)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(60, 1) * 6
    Y = np.sin(X) + 0.15 * rng.randn(60, 1)

    model = gpf.models.GPR(
        (X, Y), kernel=gpf.kernels.SquaredExponential(), noise_variance=1.0
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    gpf.utilities.print_summary(model, fmt="simple")

    Xnew = np.linspace(0, 6, 20)[:, None]
    mean, var = model.predict_y(Xnew)
    print("predictive mean[:5]:", np.asarray(mean)[:5, 0].round(3))
    print("log marginal likelihood:", float(model.log_marginal_likelihood()))

    # fast repeated predictions through the cached posterior
    posterior = model.posterior()
    mean2, _ = posterior.predict_f(Xnew)
    assert np.allclose(np.asarray(mean), np.asarray(mean2), atol=1e-6)


if __name__ == "__main__":
    main()
