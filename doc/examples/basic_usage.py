"""Basic usage: exact GP regression, end to end.

Mirrors the reference's ``getting_started/basic_usage`` notebook as a
runnable walkthrough. Everything here executes in the test suite
(``tests/integration/test_examples.py``), so the prose can be trusted to
match the code.

The model
---------
A Gaussian process regression (GPR) model assumes

    f ~ GP(0, k(., .)),      y_n = f(x_n) + eps_n,   eps_n ~ N(0, sigma^2)

Because the likelihood is Gaussian, the posterior over f and the marginal
likelihood p(y) are available in closed form — no approximations. The cost
is one [N, N] Cholesky per objective evaluation, which is why GPR is the
right tool up to N ~ 10k and ``SGPR``/``SVGP`` (see sparse_regression.py and
large_data.py) take over beyond that.

What "training" means here
--------------------------
The latent function is integrated out exactly; the only things to fit are
the HYPERparameters (kernel variance, lengthscales, noise variance), by
maximising the log marginal likelihood

    log p(y | theta) = log N(y | 0, K_theta + sigma^2 I).

This objective automatically trades data fit against model complexity (the
log-determinant term) — the classic "Occam's razor" property, which is why
no validation set is needed for these few parameters.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

# reduce_in_tests: full budget when run by a human, a small budget under
# pytest (same mechanism as the reference's ci_utils; keeps the doc corpus
# executable in CI)
MAXITER = reduce_in_tests(200, 30)


def main() -> None:
    # --- 1. Data -----------------------------------------------------------
    # X must be [N, D] (one row per point, even for D=1); Y must be [N, P].
    # The shape-contract system (gpflow_tpu.utilities.shapes) raises a
    # ShapeError naming the offending argument if you pass [N] instead.
    rng = np.random.RandomState(0)
    X = rng.rand(60, 1) * 6
    Y = np.sin(X) + 0.15 * rng.randn(60, 1)

    # --- 2. Model ----------------------------------------------------------
    # Parameters are created with transforms: kernel.variance and
    # likelihood.variance live in positive space via a Softplus bijector, so
    # the optimizer works on unconstrained values and can never step to an
    # invalid (negative-variance) model.
    model = gpf.models.GPR(
        (X, Y), kernel=gpf.kernels.SquaredExponential(), noise_variance=1.0
    )

    # A model is a Module tree; print_summary walks it. Before training you
    # should see variance=1, lengthscales=1, noise=1 (the defaults).
    gpf.utilities.print_summary(model, fmt="simple")

    # --- 3. Train ----------------------------------------------------------
    # Scipy() wraps scipy's L-BFGS around a jit-compiled value_and_grad of
    # the objective: parameters are flattened into one vector (triangular
    # parameters packed tril-only), one XLA-compiled program evaluates loss
    # and gradient per line-search step. For ~3 hyperparameters L-BFGS
    # converges in tens of iterations — Adam is the wrong tool here.
    res = gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    print(f"L-BFGS converged={bool(res.success)} in {int(res.nit)} iterations")
    gpf.utilities.print_summary(model, fmt="simple")
    print("log marginal likelihood:", float(model.log_marginal_likelihood()))

    # --- 4. Predict --------------------------------------------------------
    # predict_f returns the posterior over the LATENT function f;
    # predict_y adds the observation noise — use it for error bars on data.
    Xnew = np.linspace(0, 6, 20)[:, None]
    fmean, fvar = model.predict_f(Xnew)
    ymean, yvar = model.predict_y(Xnew)
    assert np.all(np.asarray(yvar) >= np.asarray(fvar))  # noise only adds
    print("predictive mean[:5]:", np.asarray(ymean)[:5, 0].round(3))

    # predict_log_density scores held-out data under the predictive —
    # the right metric when you care about calibrated uncertainty, not
    # just point error.
    lpd = model.predict_log_density((Xnew, np.sin(Xnew)))
    print("mean log predictive density:", float(np.mean(np.asarray(lpd))))

    # --- 5. Serve ----------------------------------------------------------
    # model.predict_f re-derives the posterior from (X, Y) on every call.
    # For repeated predictions at a FIXED trained state, build the cached
    # posterior once: it precomputes the data-dependent factors (alpha,
    # Qinv) so each subsequent call is matmul-only — this is the fast path
    # for serving (see fast_predictions.py for the full story and
    # utilities.export_serving for shipping a StableHLO artifact).
    posterior = model.posterior()
    mean2, _ = posterior.predict_f(Xnew)
    assert np.allclose(np.asarray(fmean), np.asarray(mean2), atol=1e-6)

    # --- 6. Inspect / persist ----------------------------------------------
    # parameter_dict gives the flat {path: value} view used by checkpoints
    # (utilities.save_checkpoint) and by multiple_assign to restore.
    params = gpf.utilities.parameter_dict(model)
    print("parameter paths:", sorted(params)[:3], "...")


if __name__ == "__main__":
    main()
