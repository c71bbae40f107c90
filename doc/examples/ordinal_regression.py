"""Ordinal regression (mirrors the reference's ordinal_regression notebook):
ordered categorical observations via the Ordinal likelihood, whose bin edges
are trainable parameters.
"""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

N = reduce_in_tests(150, 40)
STEPS = reduce_in_tests(150, 10)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, 1) * 6
    f_true = np.sin(X) * 2
    # discretize into 4 ordered bins
    Y = np.digitize(f_true + 0.3 * rng.randn(N, 1), [-1.0, 0.0, 1.0]).astype(float)

    likelihood = gpf.likelihoods.Ordinal(np.array([-1.0, 0.0, 1.0]))
    model = gpf.models.VGP((X, Y), kernel=gpf.kernels.Matern52(), likelihood=likelihood)

    import jax

    params = list(model.trainable_parameters)
    opt = optax.adam(0.03)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return model.training_loss()
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
        first = float(loss) if first is None else first
    for p, u in zip(params, unc):
        p.assign_unconstrained(u)

    print(f"ELBO {first:.1f} -> {float(loss):.1f}")
    assert float(loss) < first

    # predicted most-likely bin tracks the latent function
    fmean, fvar = model.predict_f(X)
    ymean, _ = model.likelihood.predict_mean_and_var(X, fmean, fvar)
    pred_bin = np.clip(np.round(np.asarray(ymean)), 0, 3)
    acc = float((pred_bin == Y).mean())
    print(f"rounded-mean bin accuracy: {acc:.2f}")
    if STEPS >= 100:  # the CI-capped run has too few steps to converge
        assert acc > 0.5


if __name__ == "__main__":
    main()
