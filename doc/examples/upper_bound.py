"""The marginal-likelihood upper bound (mirrors the reference's
theory/upper_bound notebook, ``doc/sphinx/notebooks/theory/upper_bound.pct.py``;
``SGPR.upper_bound`` is reference ``gpflow/models/sgpr.py:84-147``,
Titsias 2014).

``SGPR.elbo()`` lower-bounds and ``SGPR.upper_bound()`` upper-bounds the
exact log marginal likelihood, so together they SANDWICH it:

    elbo <= log p(Y) <= upper_bound

As inducing points are added both bounds tighten, and the gap between them
is a computable certificate of the sparse approximation's quality — when
it is small, the approximation provably captures the model evidence.
(``doc/theory/upper_bound.md`` derives the bound; the short version: the
upper bound replaces the trace penalty with a worst-case eigenvalue
correction, so it degrades — widens — rather than breaks when M is too
small.)

How to use the sandwich in practice, which is what this script sweeps:

* Fit SGPR at increasing M and print (elbo, upper) at each M. The first
  M where the gap is small relative to |elbo| is a PROOF that more
  inducing points cannot change the evidence materially — model
  selection can stop there without ever running exact GPR.
* The bracket is valid at FIXED hyperparameters (both bounds are
  functions of the same kernel/noise); compare bounds from the same
  model object, not across differently-trained models.
* Cost: ``upper_bound()`` is O(N M^2 + M^3), the same order as the ELBO
  itself — one extra logdet and a largest-eigenvalue correction — so
  evaluating it every few training iterations is affordable even on the
  benchmark's largest N.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(400, 40)


def snelson_like(n=100, rng=None):
    rng = rng or np.random.RandomState(1)
    X = np.sort(rng.uniform(0, 6, (n, 1)), axis=0)
    Y = np.sin(2 * X) + 0.3 * np.cos(5 * X) + 0.15 * rng.randn(n, 1)
    return X, Y


def main() -> None:
    X, Y = snelson_like()

    # exact marginal likelihood at fitted hyperparameters
    gpr = gpf.models.GPR((X, Y), kernel=gpf.kernels.SquaredExponential(lengthscales=0.8))
    gpf.optimizers.Scipy().minimize(
        gpr.training_loss, gpr.trainable_variables, options={"maxiter": MAXITER}
    )
    lml = float(gpr.log_marginal_likelihood())
    print(f"exact LML: {lml:.3f}")

    for M in (5, 10, 20, 50):
        Z0 = X[:: max(len(X) // M, 1)][:M].copy()
        m = gpf.models.SGPR(
            (X, Y),
            kernel=gpf.kernels.SquaredExponential(lengthscales=0.8),
            inducing_variable=Z0,
        )
        # keep hyperparameters at the exact fit; optimise only Z so the
        # bound sandwich is on the SAME model evidence
        m.kernel.variance.assign(gpr.kernel.variance.value)
        m.kernel.lengthscales.assign(gpr.kernel.lengthscales.value)
        m.likelihood.variance.assign(gpr.likelihood.variance.value)
        gpf.set_trainable(m.kernel, False)
        gpf.set_trainable(m.likelihood, False)
        gpf.optimizers.Scipy().minimize(
            m.training_loss, m.trainable_variables, options={"maxiter": MAXITER}
        )

        lower, upper = float(m.elbo()), float(m.upper_bound())
        gap = upper - lower
        print(f"M={M:3d}: elbo {lower:8.3f} <= LML {lml:8.3f} <= upper {upper:8.3f}"
              f"   (gap {gap:.3f})")
        # only the theorem is asserted (each M's Z optimisation is an
        # independent local optimum, so the GAP need not shrink monotonically)
        assert lower <= lml + 1e-3, "ELBO must lower-bound the exact LML"
        assert upper >= lml - 1e-3, "upper_bound must upper-bound the exact LML"

    print("elbo/upper_bound sandwich the exact marginal likelihood; "
          "the gap shrinks as M grows")


if __name__ == "__main__":
    main()
