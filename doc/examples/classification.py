"""Binary classification with SVGP, Bernoulli likelihood, and natural
gradients (mirrors the reference's classification notebook + BASELINE
config 3).

What changes relative to regression
-----------------------------------
A Bernoulli likelihood ``p(y=1 | f) = invprobit(f)`` makes the posterior
over the latent function non-Gaussian, so nothing collapses in closed form:

* The model must carry an explicit Gaussian approximation
  ``q(u) = N(q_mu, q_sqrt q_sqrtT)`` over the inducing values — that is
  what ``SVGP`` is (``models/svgp.py``).
* The expected log likelihood term of the ELBO is a 1-D integral per datum,
  evaluated by Gauss-Hermite quadrature inside
  ``likelihoods.Bernoulli.variational_expectations`` — no sampling, fully
  deterministic and jit-compatible.

Why two optimizers
------------------
The ELBO is extraordinarily well-conditioned in the *natural* parameters of
``q(u)`` and badly conditioned in ``(q_mu, q_sqrt)`` directly. We therefore
split the parameters:

* ``NaturalGradient`` (gamma=0.3) takes exact natural-gradient steps on the
  variational pair — for a Gaussian likelihood a single gamma=1 step would
  land on the optimum; for Bernoulli a few large steps get very close.
* Adam handles the kernel hyperparameters and inducing locations Z, whose
  geometry is unknown.

Each loop iteration is therefore: (1) one natgrad step at fixed
hyperparameters, (2) one Adam step on the hyperparameters at (nearly)
optimal ``q``. This is the hyperparameter-learning scheme the reference's
``natgrad`` notebooks recommend, and it is usually several times faster in
iterations than Adam-on-everything (see
``doc/examples/natgrad_classification.py`` for a measured comparison).

TPU notes
---------
The hyperparameter step is compiled once (``jax.jit`` of a closure-grad via
the functionalize pattern); the natgrad step compiles its own fused update
internally (``optimizers/natgrad.py``). Both are single device dispatches,
so the Python loop costs two round-trips per iteration; for production
loops fuse further with ``lax.scan`` as in ``parallel/trainer.py``.
"""
import jax
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

ITERATIONS = reduce_in_tests(100, 15)


def main() -> None:
    # Toy 2-D problem: the Bayes decision boundary is sin(2 x0) + x1 = 0,
    # with labels drawn from the true Bernoulli probabilities (so even the
    # perfect model cannot reach 100% accuracy — the data are noisy).
    rng = np.random.RandomState(0)
    N = 300
    X = rng.randn(N, 2)
    p = 1 / (1 + np.exp(-(np.sin(2 * X[:, 0]) + X[:, 1])))
    Y = (rng.rand(N) < p).astype(float)[:, None]

    # M=32 inducing points initialized on the first data points. For
    # clustered real data prefer a k-means initialization; here the data
    # are standard normal so any spread-out subset works.
    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Bernoulli(),
        inducing_variable=X[:32].copy(),
        num_data=N,
    )

    # Split the parameters: natural gradients own (q_mu, q_sqrt), so mark
    # them non-trainable for the Adam side; `trainable_parameters` then
    # yields only kernel hyperparameters + Z.
    natgrad = gpf.optimizers.NaturalGradient(gamma=0.3)
    gpf.set_trainable(model.q_mu, False)
    gpf.set_trainable(model.q_sqrt, False)
    hyperparams = model.trainable_parameters
    adam = optax.adam(0.03)

    # The closure-gradient pattern (see doc/examples/parameters.py): jit
    # cannot trace Python-object attribute reads, so temporarily swap the
    # unconstrained leaves into the model, compute, then restore. The
    # traced function is pure in `unc` and compiles once.
    def hyper_loss(unc):
        old = [pp._unconstrained for pp in hyperparams]
        try:
            for pp, u in zip(hyperparams, unc):
                pp._unconstrained = u
            return -model.elbo((X, Y))
        finally:
            for pp, o in zip(hyperparams, old):
                pp._unconstrained = o

    value_and_grad = jax.jit(jax.value_and_grad(hyper_loss))
    unc = tuple(pp._unconstrained for pp in hyperparams)
    state = adam.init(unc)

    loss = lambda: -model.elbo((X, Y))
    for it in range(ITERATIONS):
        # (1) variational step: exact natural gradient on q(u)
        natgrad.minimize(loss, [(model.q_mu, model.q_sqrt)])
        # (2) hyperparameter step: Adam on kernel + Z at the updated q(u)
        l, g = value_and_grad(unc)
        updates, state = adam.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(updates)))
        for pp, u in zip(hyperparams, unc):
            pp._unconstrained = u

    print("final ELBO:", float(model.elbo((X, Y))))
    # predict_y pushes the latent posterior through the likelihood:
    # pmean is P(y=1 | x), so 0.5 is the decision threshold.
    pmean, _ = model.predict_y(X)
    acc = float(np.mean((np.asarray(pmean)[:, 0] > 0.5) == (Y[:, 0] > 0.5)))
    print("train accuracy:", acc)


if __name__ == "__main__":
    main()
