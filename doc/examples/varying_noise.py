"""GP regression with varying output noise (mirrors the reference's
advanced/varying_noise notebook,
``doc/sphinx/notebooks/advanced/varying_noise.pct.py``).

Three ways to give each data point its own noise level, all through the
``Gaussian`` likelihood's functional parameters:

1. noise scale as a learned ``Polynomial`` function of X,
2. per-group noise via ``SwitchedFunction`` over a group column,
3. fixed empirical noise through a custom ``Function``.

The mechanism (``utilities/parameter_or_function.py``): every ``Gaussian``
likelihood parameter (``variance`` or ``scale``) accepts EITHER a constant
Parameter OR any input-dependent ``Function``; internally everything
routes through ``variance_at(X) -> [N, 1]``, and the GPR marginal
likelihood simply uses a per-datum noise vector instead of sigma^2 I —
the Cholesky stays the same size, so input-dependent noise is free at
training time.

Choosing among the three (and the fourth):
* **Known noise structure, learnable magnitude** -> demo 1: a small
  parametric family (Polynomial in X) when you believe noise varies
  smoothly with the input. Beware flexibility: a high-degree noise
  polynomial can explain the residuals and flatten the GP.
* **Known groups** -> demo 2: a trailing group-index column +
  ``SwitchedFunction`` gives one learned noise level per group (two
  instruments, two labs, ...). This is the lightweight alternative to a
  full SwitchedLikelihood when only the noise differs.
* **Noise measured externally** -> demo 3: wrap the measured per-point
  values in a custom non-trainable Function (here: a lookup). Typical for
  data with reported error bars.
* **Noise to be inferred nonparametrically** -> not this file: put a
  second GP on the log-noise and use the heteroskedastic likelihood
  (``doc/examples/heteroskedastic.py``) — strictly more flexible, but
  needs variational inference instead of exact GPR.

The checks after each fit read the learned noise back through
``variance_at`` and compare against the generating process — the pattern
to copy when validating a noise model on real data.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(300, 25)
N = reduce_in_tests(200, 60)


def main() -> None:
    rng = np.random.default_rng(42)

    # --- demo 1: noise scale is a function of X -------------------------
    X = rng.uniform(0.0, 1.0, (N, 1))
    signal = (X - 0.5) ** 2 + 0.05
    Y = signal + 0.5 * signal * rng.standard_normal((N, 1))

    model = gpf.models.GPR(
        (X, Y),
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Gaussian(scale=gpf.functions.Polynomial(degree=2)),
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    # learned noise should be smaller near x=0.5 than at the boundary
    v_mid = float(model.likelihood.variance_at(np.array([[0.5]])).squeeze())
    v_edge = float(model.likelihood.variance_at(np.array([[0.0]])).squeeze())
    print("noise variance at 0.5 vs 0.0:", round(v_mid, 5), round(v_edge, 5))
    if MAXITER >= 300:
        assert v_mid < v_edge

    # --- demo 2: two groups with separate noise variances --------------
    group = (X[:, 0] > 0.5).astype(float)
    Yg = np.sin(6 * X) + np.where(group[:, None] > 0, 0.3, 0.02) * rng.standard_normal((N, 1))
    Xg = np.concatenate([X, group[:, None]], axis=1)  # last column = group index
    model = gpf.models.GPR(
        (Xg, Yg),
        kernel=gpf.kernels.SquaredExponential(active_dims=[0]),
        likelihood=gpf.likelihoods.Gaussian(
            variance=gpf.functions.SwitchedFunction(
                [gpf.functions.Constant(1.0), gpf.functions.Constant(1.0)]
            ),
            variance_lower_bound=1e-6,
        ),
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    v0 = float(model.likelihood.variance_at(np.array([[0.2, 0.0]])).squeeze())
    v1 = float(model.likelihood.variance_at(np.array([[0.2, 1.0]])).squeeze())
    print("group noise variances:", round(v0, 4), round(v1, 4))
    if MAXITER >= 300:
        assert v0 < v1

    # --- demo 3: fixed empirical noise via a custom Function -----------
    class FixedNoise(gpf.functions.Function):
        """Looks up a precomputed per-point variance from the group column."""

        def __init__(self, variances: np.ndarray) -> None:
            super().__init__()
            self.variances = np.asarray(variances, dtype=float)

        def __call__(self, X):
            import jax.numpy as jnp

            idx = jnp.asarray(X[..., -1], dtype=int)
            return jnp.asarray(self.variances)[idx][..., None]

    model = gpf.models.GPR(
        (Xg, Yg),
        kernel=gpf.kernels.SquaredExponential(active_dims=[0]),
        likelihood=gpf.likelihoods.Gaussian(variance=FixedNoise([0.02**2, 0.3**2])),
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    mean, var = model.predict_y(np.array([[0.2, 0.0], [0.2, 1.0]]))
    print("predict_y variances under fixed noise:", np.asarray(var).squeeze().round(4))
    assert float(var[0, 0]) < float(var[1, 0])


if __name__ == "__main__":
    main()
