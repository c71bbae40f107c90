"""Dimensionality reduction with the Bayesian GPLVM (mirrors the reference's
GPLVM notebook): learn a 1-D latent space for 5-D observations.

The model (``models/gplvm.py``; Titsias & Lawrence 2010)
--------------------------------------------------------
GP regression with the INPUTS unknown: each observed row Y_n in R^P is
explained by a latent coordinate x_n in R^Q (Q << P) pushed through a GP,

    x_n ~ N(0, I),    y_np = f_p(x_n) + noise,   f_p ~ GP(0, k)

i.e. nonlinear probabilistic PCA (with a linear kernel it IS probabilistic
PCA — pinned by ``tests/.../test_gplvm.py``). "Bayesian" means the latents
are not point-estimated: the model keeps q(x_n) = N(X_data_mean_n,
X_data_var_n) and integrates the kernel over it. That integral is why this
model exercises the ``expectations/`` framework: the ELBO needs the psi
statistics

    psi0 = E_q[ k(x, x) ],  psi1 = E_q[ k(x, Z) ],  psi2 = E_q[ k(x, Z)T k(x, Z) ]

which are closed-form for the SquaredExponential/Linear kernels
(``expectations/squared_exponentials.py``) and batch over N as single MXU
contractions on TPU.

Practical knobs:
* Initialize ``X_data_mean`` with PCA for real data (here random works —
  the toy manifold is easy); symmetries (sign/rotation of the latent
  space) mean only the SHAPE of the recovered manifold is identified,
  hence the |correlation| check below rather than a value comparison.
* ARD lengthscales (one per latent dim) are the model's dimension
  selector: after training on a too-large Q, dimensions with large
  lengthscales have been switched off — read them via
  ``print_summary(model)``.
* ``num_inducing_variables`` bounds cost exactly as in SGPR: the psi
  statistics are [N, M] / [M, M] objects, never [N, N].
"""
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
