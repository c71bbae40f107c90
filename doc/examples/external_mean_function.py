"""A neural network as a GP mean function (mirrors the reference's
tailor/external-mean-function notebook).

Any callable built from ``Parameter`` leaves can serve as a
``MeanFunction``; its weights train jointly with the GP hyperparameters.
Useful when the prior mean has known-but-complex structure the kernel
should not have to explain.

Why this works with zero integration code: ``MeanFunction`` is just a
Module with ``__call__(X) -> [N, P]``. Because Modules are pytrees, the
MLP's weights appear in ``model.trainable_variables`` automatically and
flow through the same jit/grad machinery as kernel hyperparameters —
the Scipy L-BFGS call below optimizes {MLP weights, lengthscale,
variance, noise} as one vector. Under jit the tanh layers fuse into the
same XLA program as the kernel math.

When to reach for this vs alternatives:
* A parametric mean (even a small MLP) is worth it when you KNOW the
  shape family of the trend and want the GP to model only residuals —
  the example's quadratic-plus-wiggle data is the canonical case.
* Beware capacity: a large MLP mean can absorb the entire signal,
  leaving the GP with nothing (kernel variance -> 0) and erasing the
  calibrated uncertainty you wanted from a GP. Keep the mean small, or
  freeze it after pre-training.
* If you want the network INSIDE the covariance instead (feature
  extraction), put it in the kernel: see ``doc/examples/gp_nn.py``,
  which composes a kernel on learned features — a different trade-off
  (uncertainty then lives in feature space).

The final check reads the fitted mean function back and correlates it
with the true trend — the MLP must have absorbed the tanh backbone
(corr > 0.95), leaving the Matern32 only the short-scale residual; the
far-field prediction at x=10 then follows the MLP instead of reverting
to zero (the reversion mechanics are explained in
``doc/examples/mean_functions.py``).
"""
import numpy as np
import jax.numpy as jnp

import gpflow_tpu as gpf
from gpflow_tpu.base import Parameter, TensorType
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.functions import MeanFunction

MAXITER = reduce_in_tests(300, 25)


class MLPMean(MeanFunction):
    def __init__(self, hidden: int = 10):
        rng = np.random.RandomState(0)
        self.w1 = Parameter(rng.randn(1, hidden) * 1.0, name="w1")
        self.b1 = Parameter(np.zeros(hidden), name="b1")
        self.w2 = Parameter(rng.randn(hidden, 1) * 0.1, name="w2")
        self.b2 = Parameter(np.zeros(1), name="b2")

    def __call__(self, X: TensorType) -> jnp.ndarray:
        h = jnp.tanh(jnp.asarray(X) @ self.w1.value + self.b1.value)
        return h @ self.w2.value + self.b2.value


def main() -> None:
    rng = np.random.RandomState(2)
    X = np.sort(rng.uniform(-3, 3, (80, 1)), axis=0)
    # strong non-linear trend + short-scale residual
    trend = np.tanh(2 * X)
    Y = 3 * trend + 0.3 * np.sin(8 * X) + 0.05 * rng.randn(80, 1)

    model = gpf.models.GPR(
        (X, Y),
        kernel=gpf.kernels.Matern32(lengthscales=0.3),
        mean_function=MLPMean(),
        noise_variance=0.01,
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )

    # the MLP mean should have absorbed the trend
    mean_part = np.asarray(model.mean_function(X))
    corr = np.corrcoef(mean_part[:, 0], trend[:, 0])[0, 1]
    print("corr(MLP mean, true trend):", round(float(corr), 3))
    if MAXITER >= 300:
        assert corr > 0.95

    mu, _ = model.predict_f(np.array([[10.0]]))  # far extrapolation
    print("extrapolated mean at x=10:", round(float(np.asarray(mu).squeeze()), 2))
    gpf.utilities.print_summary(model, fmt="simple")


if __name__ == "__main__":
    main()
