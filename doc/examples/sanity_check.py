"""Sanity check: model behaviours that should overlap, do (mirrors the
reference's theory/Sanity_check notebook,
``doc/sphinx/notebooks/theory/Sanity_check.pct.py``).

Several model classes coincide in special cases with a Gaussian likelihood:

* ``GPR`` — exact Gaussian-process regression (the ground truth here).
* ``VGP`` — a full-rank Gaussian variational approximation; a Gaussian
  approximation to a Gaussian posterior is exact at the optimum.
* ``SVGP`` with Z = X (whitened and non-whitened) — no sparsity is lost
  when every datum is an inducing point.
* ``SGPR`` with Z = X — the collapsed Titsias bound is tight at Z = X.
* ``GPRFITC`` with Z = X — Qff = Kff so the FITC correction vanishes.

Each approximation's objective must match the exact marginal likelihood,
and the posteriors must agree at test points.

Why this matters beyond a test
------------------------------
Every approximate model here is built from a DIFFERENT code path — VGP
optimises a whitened full-rank q over f(X) numerically, SVGP goes through
the inducing-point conditional (in two parameterisations), SGPR and
GPRFITC use their own collapsed closed forms — yet all five must land on
the same number, computed by a sixth path (GPR's Cholesky +
``multivariate_normal``). A bug in any one of the conditional engine, the
KL, the whitening algebra, or an objective would break a coincidence it
cannot fake. The reference keeps this notebook for exactly that reason,
and our test suite pins the same identities numerically
(``tests/integration/test_method_equivalence.py``); this example is the
readable version. The companion note ``doc/theory/sanity_check.md``
derives WHY each identity holds; ``fitc_vs_vfe.py`` shows what happens
when the coincidences break (Z != X, where FITC and VFE genuinely differ).

Reading the results: the closed-form models (SGPR, GPRFITC at Z=X) match
to machine precision with NO optimisation — the identity is algebraic.
The variational ones (VGP, SVGP) match only at their OPTIMUM, so they get
an L-BFGS run first, with kernel and noise frozen so every model sees the
same (kernel, noise) pair and only the posterior-approximation quality is
being compared. The non-whitened SVGP converges slowest: its loss surface
is preconditioned by Kuu itself, which is exactly the pathology whitening
(and natural gradients — natgrad_classification.py) exists to fix.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(1000, 100)


def make_data(n=30, rng=None):
    rng = rng or np.random.RandomState(0)
    X = rng.rand(n, 1) * 10
    Y = np.sin(X) + 0.9 * np.cos(X * 1.6) + rng.randn(*X.shape) * 0.4
    Xtest = rng.rand(10, 1) * 10
    return X, Y, Xtest


def main() -> None:
    X, Y, Xtest = make_data()

    def kern():
        return gpf.kernels.SquaredExponential(lengthscales=1.5)

    # ground truth: exact GPR, hyperparameters fixed so every model sees the
    # same (kernel, noise) and only the approximate-posterior quality varies
    gpr = gpf.models.GPR((X, Y), kernel=kern(), noise_variance=0.09)
    lml = float(gpr.log_marginal_likelihood())
    mu0, var0 = (np.asarray(a) for a in gpr.predict_f(Xtest))
    print(f"exact GPR       : LML {lml:.4f}")

    def check(name, model, objective, optimised=False):
        obj = float(objective)
        mu, var = (np.asarray(a) for a in model.predict_f(Xtest))
        print(f"{name:16s}: objective {obj:.4f}")
        # closed-form models (SGPR/GPRFITC at Z=X) match exactly with no
        # optimisation; the variational ones need the full iteration budget
        # (the non-whitened SVGP parametrization converges slowest), so
        # under CI's capped MAXITER we only print, as the reference
        # notebook does (pattern as in fitc_vs_vfe.py)
        if optimised and MAXITER < 1000:
            return
        assert abs(obj - lml) < 1e-4 * abs(lml) + 0.05, (name, obj, lml)
        np.testing.assert_allclose(mu, mu0, atol=3e-2)
        np.testing.assert_allclose(var, var0, atol=3e-2)

    # VGP: optimise ONLY the variational parameters to the Gaussian optimum
    vgp = gpf.models.VGP((X, Y), kernel=kern(), likelihood=gpf.likelihoods.Gaussian(0.09))
    gpf.set_trainable(vgp.kernel, False)
    gpf.set_trainable(vgp.likelihood, False)
    gpf.optimizers.Scipy().minimize(
        vgp.training_loss, vgp.trainable_variables, options={"maxiter": MAXITER}
    )
    check("VGP", vgp, vgp.elbo(), optimised=True)

    # SVGP with Z = X, whitened and non-whitened
    for whiten in (True, False):
        svgp = gpf.models.SVGP(
            kernel=kern(),
            likelihood=gpf.likelihoods.Gaussian(0.09),
            inducing_variable=X.copy(),
            whiten=whiten,
        )
        gpf.set_trainable(svgp.kernel, False)
        gpf.set_trainable(svgp.likelihood, False)
        gpf.set_trainable(svgp.inducing_variable, False)
        loss = svgp.training_loss_closure((X, Y))
        gpf.optimizers.Scipy().minimize(
            loss, svgp.trainable_variables, options={"maxiter": MAXITER}
        )
        check(f"SVGP white={whiten}", svgp, svgp.elbo((X, Y)), optimised=True)

    # SGPR with Z = X: collapsed bound is tight, no optimisation needed
    sgpr = gpf.models.SGPR((X, Y), kernel=kern(), inducing_variable=X.copy())
    sgpr.likelihood.variance.assign(0.09)
    check("SGPR", sgpr, sgpr.elbo())

    # GPRFITC with Z = X: Qff = Kff, the FITC model IS the exact GP
    fitc = gpf.models.GPRFITC((X, Y), kernel=kern(), inducing_variable=X.copy())
    fitc.likelihood.variance.assign(0.09)
    check("GPRFITC", fitc, fitc.maximum_log_likelihood_objective())

    print("all model behaviours overlap as theory requires")


if __name__ == "__main__":
    main()
