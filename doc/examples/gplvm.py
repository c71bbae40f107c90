"""Dimensionality reduction with the Bayesian GPLVM (mirrors the reference's
GPLVM notebook): learn a 1-D latent space for 5-D observations."""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(150, 20)


def main() -> None:
    rng = np.random.RandomState(0)
    N, P, Q = 25, 5, 1
    t = np.linspace(0, 2 * np.pi, N)[:, None]
    Y = np.hstack(
        [np.sin(t), np.cos(t), np.sin(2 * t), np.cos(2 * t), t / 3]
    ) + 0.05 * rng.randn(N, P)

    model = gpf.models.BayesianGPLVM(
        Y,
        X_data_mean=0.1 * rng.randn(N, Q),
        X_data_var=0.5 * np.ones((N, Q)),
        kernel=gpf.kernels.SquaredExponential(lengthscales=np.ones(Q)),
        num_inducing_variables=10,
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    print("ELBO:", float(model.elbo()))
    latents = np.asarray(model.X_data_mean.value)[:, 0]
    corr = abs(np.corrcoef(latents, t[:, 0])[0, 1])
    print("correlation of learned latents with the true ordering:", round(corr, 3))


if __name__ == "__main__":
    main()
