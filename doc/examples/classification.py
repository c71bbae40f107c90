"""Binary classification with SVGP, Bernoulli likelihood, and natural
gradients (mirrors the reference's classification notebook + BASELINE
config 3)."""
import jax
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

ITERATIONS = reduce_in_tests(100, 15)


def main() -> None:
    rng = np.random.RandomState(0)
    N = 300
    X = rng.randn(N, 2)
    p = 1 / (1 + np.exp(-(np.sin(2 * X[:, 0]) + X[:, 1])))
    Y = (rng.rand(N) < p).astype(float)[:, None]

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Bernoulli(),
        inducing_variable=X[:32].copy(),
        num_data=N,
    )

    # natural gradients on (q_mu, q_sqrt); Adam on hyperparameters + Z
    natgrad = gpf.optimizers.NaturalGradient(gamma=0.3)
    gpf.set_trainable(model.q_mu, False)
    gpf.set_trainable(model.q_sqrt, False)
    hyperparams = model.trainable_parameters
    adam = optax.adam(0.03)

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
        natgrad.minimize(loss, [(model.q_mu, model.q_sqrt)])
        l, g = value_and_grad(unc)
        updates, state = adam.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(updates)))
        for pp, u in zip(hyperparams, unc):
            pp._unconstrained = u

    print("final ELBO:", float(model.elbo((X, Y))))
    pmean, _ = model.predict_y(X)
    acc = float(np.mean((np.asarray(pmean)[:, 0] > 0.5) == (Y[:, 0] > 0.5)))
    print("train accuracy:", acc)


if __name__ == "__main__":
    main()
