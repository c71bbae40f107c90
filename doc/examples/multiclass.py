"""Multiclass classification with the RobustMax MultiClass likelihood
(mirrors the reference's multiclass notebook): C latent GPs, closed-form
variational expectations via the prob-is-largest Gauss-Hermite trick.
"""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

C = 3
N = reduce_in_tests(150, 45)
STEPS = reduce_in_tests(200, 10)


def main() -> None:
    rng = np.random.RandomState(0)
    # three noisy clusters on a circle
    centers = np.stack([[np.cos(a), np.sin(a)] for a in 2 * np.pi * np.arange(C) / C])
    labels = rng.randint(0, C, N)
    X = centers[labels] + 0.35 * rng.randn(N, 2)
    Y = labels.astype(float)[:, None]

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.MultiClass(C),  # RobustMax invlink
        inducing_variable=X[rng.choice(N, reduce_in_tests(24, 8), replace=False)].copy(),
        num_data=N,
        num_latent_gps=C,
    )

    import jax

    params = list(model.trainable_parameters)
    opt = optax.adam(0.05)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return model.training_loss((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    unc = tuple(p._unconstrained for p in params)
    state = opt.init(unc)

    @jax.jit
    def step(unc, state):
        loss, g = jax.value_and_grad(loss_fn)(unc)
        upd, state = opt.update(g, state, unc)
        return tuple(u + du for u, du in zip(unc, upd)), state, loss

    first = None
    for _ in range(STEPS):
        unc, state, loss = step(unc, state)
        if first is None:
            first = float(loss)
    for p, u in zip(params, unc):
        p.assign_unconstrained(u)

    # predict class probabilities: invlink over the latent posterior
    fmean, fvar = model.predict_f(X)
    probs = np.asarray(model.likelihood.predict_mean_and_var(X, fmean, fvar)[0])
    acc = float((probs.argmax(-1) == labels).mean())
    print(f"ELBO {first:.1f} -> {float(loss):.1f}; train accuracy {acc:.2f}")
    assert float(loss) < first
    assert probs.shape == (N, C)
    # per-class quadrature probabilities are each approximate; the sum is
    # close to (not exactly) one
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-2)


if __name__ == "__main__":
    main()
