"""Multi-output GPs: SharedIndependent and LinearCoregionalization SVGP.

Mirrors the reference's ``multioutput`` notebook.

The design space
----------------
A multi-output GP models P correlated outputs. Everything reduces to two
choices — how many LATENT processes L drive the outputs, and how outputs
mix them:

* SharedIndependent / SeparateIndependent (L = P, identity mixing): each
  output is its own GP; "shared" means one kernel's hyperparameters serve
  all outputs, "separate" means one kernel each. No output correlation is
  modelled, but the conditional factorises per output — the cheapest path
  (posteriors.IndependentPosteriorMultiOutput).
* LinearCoregionalization (L < P, learned mixing W [P, L]): outputs are
  linear combinations f(x) = W g(x) of L independent latent GPs — the
  classic semiparametric latent factor model. Output correlations come
  from W; inference runs in the cheap L-dimensional latent space
  (posteriors.LinearCoregionalizationPosterior routes the mixing AFTER
  the latent conditional, so the cost is L-, not P-, sized).

Matching inducing variables: SharedIndependentInducingVariables places one
set of inducing points for every latent process; SeparateIndependent...
gives each latent its own set (required when latent lengthscales differ, as
below). The covariances (Kuu/Kuf shapes) for every kernel x inducing-
variable combination are registered in covariances/multioutput/.

full_output_cov: predict_f(..., full_output_cov=True) returns the [N, P, P]
cross-output covariance (the W-induced correlations); the default returns
just the [N, P] marginals. The posterior-class selection grid (which
combination takes which fast path) is exhaustively tested in
tests/gpflow_tpu/posteriors/.

Scaling note: for latent-parallel training over a 2-D (data x latent)
device mesh — each device holding L/d of the [L, M, M] variational state —
see DataParallelTrainer(latent_axis=...) and SURVEY's dryrun path #3.
"""
import jax
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

ITERATIONS = reduce_in_tests(150, 10)
N, D, M, P, L = 150, 2, 20, 3, 2


def train(model, X, Y) -> float:
    params = model.trainable_parameters
    adam = optax.adam(0.05)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return -model.elbo((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    vg = jax.jit(jax.value_and_grad(loss_fn))
    unc = tuple(p._unconstrained for p in params)
    state = adam.init(unc)
    for _ in range(ITERATIONS):
        l, g = vg(unc)
        upd, state = adam.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(upd)))
    for p, u in zip(params, unc):
        p.assign_unconstrained(u)
    return float(model.elbo((X, Y)))


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, D) * 2
    G = np.hstack([np.sin(3 * X[:, :1]), np.cos(3 * X[:, 1:])])
    Y = G @ rng.randn(P, 2).T + 0.05 * rng.randn(N, P)

    shared = gpf.models.SVGP(
        kernel=gpf.kernels.SharedIndependent(gpf.kernels.SquaredExponential(), output_dim=P),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=SharedIndependentInducingVariables(InducingPoints(X[:M].copy())),
        num_latent_gps=P,
        num_data=N,
    )
    print("SharedIndependent ELBO:", train(shared, X, Y))

    coreg = gpf.models.SVGP(
        kernel=gpf.kernels.LinearCoregionalization(
            [gpf.kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(L)],
            W=rng.randn(P, L),
        ),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=SeparateIndependentInducingVariables(
            [InducingPoints(X[:M].copy() + 0.03 * i) for i in range(L)]
        ),
        num_latent_gps=L,
        num_data=N,
    )
    print("LinearCoregionalization ELBO:", train(coreg, X, Y))

    mean, var = coreg.predict_f(X[:5])
    print("multi-output prediction shape:", np.asarray(mean).shape)


if __name__ == "__main__":
    main()
