"""Heteroskedastic regression: two latent GPs parameterize the mean and the
(log) noise scale (mirrors the reference's heteroskedastic notebook;
BASELINE config 5).

The model
---------
Ordinary GP regression assumes one global noise level. Here the noise
visibly grows with x, so we model BOTH moments with GPs:

    y | f1, f2  ~  N( f1(x),  g(f2(x))^2 ),    g = exp (the scale transform)

``HeteroskedasticTFPConditional`` (``likelihoods/multilatent.py``) is the
C=2 multilatent likelihood gluing this together: its ``conditional_
distribution`` maps the two latent columns to (loc, scale). Because the
likelihood now depends on two correlated Gaussians, variational
expectations use 2-D Gauss-Hermite quadrature over the diagonalized
(f1, f2) posterior (``quadrature/gauss_hermite.py`` NDiagGHQuadrature).

Model assembly — the three pieces must agree that there are 2 latents:
* ``SeparateIndependent`` kernel: each latent gets its own
  SquaredExponential (the mean function and the noise profile have no
  reason to share a lengthscale).
* ``SeparateIndependentInducingVariables``: each latent its own Z, so the
  noise GP can place capacity where the noise changes fastest.
* ``num_latent_gps=2`` on SVGP sizes q_mu/q_sqrt.

Training splits variational vs hyperparameters exactly as in
``doc/examples/classification.py`` (natgrad on q, Adam on the rest) —
for a non-Gaussian likelihood this is the recommended scheme.

What to look at in the output: the learned noise scale at x=0 vs x=4
should bracket the generating values 0.05 and 0.85; a homoskedastic model
would instead average them and over/under-estimate the predictive variance
at the two ends. TPU parity for this likelihood's quadrature path is
pinned at 6.3e-9 (``tests/tpu/test_tpu_parity.py``).
"""
import jax
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SeparateIndependentInducingVariables,
)

ITERATIONS = reduce_in_tests(120, 10)


def main() -> None:
    rng = np.random.RandomState(0)
    N = 150
    X = np.linspace(0, 4, N)[:, None]
    noise_scale = 0.05 + 0.2 * X[:, 0]
    Y = (np.sin(2 * X[:, 0]) + noise_scale * rng.randn(N))[:, None]

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SeparateIndependent(
            [gpf.kernels.SquaredExponential(), gpf.kernels.SquaredExponential()]
        ),
        likelihood=gpf.likelihoods.HeteroskedasticTFPConditional(),
        inducing_variable=SeparateIndependentInducingVariables(
            [InducingPoints(X[::10].copy()), InducingPoints(X[::10].copy())]
        ),
        num_latent_gps=2,
        num_data=N,
    )

    natgrad = gpf.optimizers.NaturalGradient(gamma=0.5)
    hyperparams = [p for p in model.trainable_parameters
                   if p is not model.q_mu and p is not model.q_sqrt]
    adam = optax.adam(0.01)

    def loss_fn(unc):
        old = [p._unconstrained for p in hyperparams]
        try:
            for p, u in zip(hyperparams, unc):
                p._unconstrained = u
            return -model.elbo((X, Y))
        finally:
            for p, o in zip(hyperparams, old):
                p._unconstrained = o

    vg = jax.jit(jax.value_and_grad(loss_fn))
    unc = tuple(p._unconstrained for p in hyperparams)
    state = adam.init(unc)
    for _ in range(ITERATIONS):
        natgrad.minimize(lambda: -model.elbo((X, Y)), [(model.q_mu, model.q_sqrt)])
        l, g = vg(unc)
        upd, state = adam.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(upd)))
        for p, u in zip(hyperparams, unc):
            p._unconstrained = u

    fmean, _ = model.predict_f(X)
    learned_scale = np.exp(np.asarray(fmean)[:, 1])
    print("ELBO:", float(model.elbo((X, Y))))
    print("learned noise scale at x=0 / x=4:",
          round(learned_scale[:10].mean(), 3), round(learned_scale[-10:].mean(), 3))


if __name__ == "__main__":
    main()
