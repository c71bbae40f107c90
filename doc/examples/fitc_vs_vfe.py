"""FITC vs VFE sparse approximations (mirrors the reference's
theory/FITCvsVFE notebook).

Both SGPR (VFE / Titsias bound) and GPRFITC approximate exact GPR with M
inducing points, but their objectives behave differently:

* VFE is a true lower bound on the marginal likelihood - it can only
  improve as inducing points are added, and with Z = X it recovers exact
  GPR exactly.
* FITC is not a bound; it can OVERESTIMATE the marginal likelihood and
  systematically underestimates the noise variance (Bauer et al. 2016).

``doc/theory/fitc_vs_vfe.md`` derives both objectives and explains WHY
each behaviour follows from a single structural difference — VFE pays an
explicit trace penalty for unexplained variance, while FITC gets to
reinterpret it as free input-dependent noise. The script below is the
executable version of that note's three claims, in order:

1. Z = X exactness for BOTH models (the trace term and the diagonal
   correction each vanish when Qff = Kff);
2. at M << N, VFE's ELBO stays a lower bound on the exact LML evaluated
   at VFE's own hyperparameters;
3. FITC's hallmark pathology: its trained noise variance comes out BELOW
   VFE's on the same data (the mechanism — trading constant noise for the
   heteroskedastic diag(Kff - Qff) term — is in the note).
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(300, 25)


def snelson_like(n=100, rng=None):
    rng = rng or np.random.RandomState(5)
    X = np.sort(rng.uniform(0, 6, (n, 1)), axis=0)
    Y = np.sin(2 * X) + 0.25 * np.cos(7 * X) + 0.1 * rng.randn(n, 1)
    return X, Y


def main() -> None:
    X, Y = snelson_like()
    N = len(X)

    def kern():
        return gpf.kernels.SquaredExponential(lengthscales=0.8)

    exact = gpf.models.GPR((X, Y), kernel=kern(), noise_variance=0.01)
    gpf.optimizers.Scipy().minimize(
        exact.training_loss, exact.trainable_variables, options={"maxiter": MAXITER}
    )
    lml = float(exact.log_marginal_likelihood())
    noise_exact = float(exact.likelihood.variance.value)
    print(f"exact GPR: LML {lml:.2f}, noise {noise_exact:.4f}")

    # with Z = X (all data as inducing points), VFE equals exact GPR...
    vfe_full = gpf.models.SGPR((X, Y), kernel=kern(), inducing_variable=X.copy())
    vfe_full.kernel.variance.assign(exact.kernel.variance.value)
    vfe_full.kernel.lengthscales.assign(exact.kernel.lengthscales.value)
    vfe_full.likelihood.variance.assign(exact.likelihood.variance.value)
    gpf.set_trainable(vfe_full.inducing_variable, False)
    elbo_full = float(vfe_full.elbo())
    print(f"VFE with Z=X: ELBO {elbo_full:.2f} (= exact LML)")
    assert abs(elbo_full - lml) < 0.02 * abs(lml) + 0.5

    # ...and FITC with Z=X is ALSO exact (Qff = Kff so the diagonal
    # correction vanishes); the differences below only appear at M < N
    fitc_full = gpf.models.GPRFITC((X, Y), kernel=kern(), inducing_variable=X.copy())
    fitc_full.kernel.variance.assign(exact.kernel.variance.value)
    fitc_full.kernel.lengthscales.assign(exact.kernel.lengthscales.value)
    fitc_full.likelihood.variance.assign(exact.likelihood.variance.value)
    fitc_ml = float(fitc_full.maximum_log_likelihood_objective())
    print(f"FITC with Z=X: objective {fitc_ml:.2f} (= exact LML)")
    assert abs(fitc_ml - lml) < 0.02 * abs(lml) + 0.5

    # sparse M=15: train both jointly (hyperparameters + Z)
    M = 15
    Z0 = X[:: N // M][:M].copy()

    vfe = gpf.models.SGPR((X, Y), kernel=kern(), inducing_variable=Z0.copy())
    gpf.optimizers.Scipy().minimize(
        vfe.training_loss, vfe.trainable_variables, options={"maxiter": MAXITER}
    )
    fitc = gpf.models.GPRFITC((X, Y), kernel=kern(), inducing_variable=Z0.copy())
    gpf.optimizers.Scipy().minimize(
        fitc.training_loss, fitc.trainable_variables, options={"maxiter": MAXITER}
    )

    elbo = float(vfe.elbo())
    fitc_obj = float(fitc.maximum_log_likelihood_objective())
    noise_vfe = float(vfe.likelihood.variance.value)
    noise_fitc = float(fitc.likelihood.variance.value)
    print(f"M={M}: VFE ELBO {elbo:.2f} (<= {lml:.2f}), noise {noise_vfe:.4f}")
    print(f"M={M}: FITC objective {fitc_obj:.2f}, noise {noise_fitc:.4f}")

    if MAXITER >= 300:
        # VFE remains a lower bound on the exact marginal likelihood
        assert elbo <= lml + 1e-3
        # FITC's hallmark pathology: noise variance biased low vs VFE
        assert noise_fitc < noise_vfe


if __name__ == "__main__":
    main()
