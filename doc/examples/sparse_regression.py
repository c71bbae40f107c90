"""Sparse GP regression: SGPR's collapsed ELBO with the Titsias upper bound
bracketing the exact marginal likelihood, and CGLB tightening the bound with
conjugate gradients (optionally without ever building the [N, N] matrix).

Mirrors the reference's SGPR/CGLB notebooks, with the TPU-native extra:
``matrix_free_chunk`` streams the kernel matrix in chunks, so the exact-bound
objective runs at N far beyond device memory.

Why sparse, and what the bracket means
--------------------------------------
Exact GPR costs O(N^3) time / O(N^2) memory per objective. SGPR replaces it
with the collapsed Titsias bound over M << N inducing points — O(N M^2)
and never materializing [N, N] (``doc/theory/sgpr.md`` derives every
term). Because the ELBO is a *lower* bound and ``upper_bound()`` (Titsias'
complementary bound, ``doc/theory/upper_bound.md``) an *upper* one, the
pair brackets the exact marginal likelihood at the same hyperparameters:

    ELBO  <=  log p(y)  <=  upper

The printed bracket is the practical M-diagnostic: a tight bracket proves
M suffices — no exact run needed. NOTE the subtlety the assertion encodes:
the bracket holds at FIXED hyperparameters, so we re-evaluate the exact
LML at SGPR's learned kernel, not at the exact model's own optimum.

CGLB (``doc/theory/cglb.md``) then tightens the *lower* side at the same
M by running conjugate gradients on the full residual — with
``matrix_free_chunk`` each CG matvec streams kernel blocks of the given
chunk size through the MXU, so memory stays O(N * chunk) and N=50k fits
easily on one chip (0.34 s/objective measured, PERFORMANCE.md).

``compute_qu`` at the end extracts the optimal q(u) that SGPR collapsed
analytically — the warm start that makes SGPR -> SVGP migration (e.g. to
add minibatching or a non-Gaussian likelihood later) nearly free.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

N = reduce_in_tests(2_000, 200)
M = reduce_in_tests(64, 8)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, 1) * 6
    Y = np.sin(2 * X) + 0.2 * np.cos(5 * X) + 0.1 * rng.randn(N, 1)
    Z = X[rng.choice(N, M, replace=False)].copy()

    exact = gpf.models.GPR((X, Y), kernel=gpf.kernels.SquaredExponential())
    gpf.optimizers.Scipy().minimize(
        exact.training_loss, exact.trainable_variables, options={"maxiter": 100}
    )
    lml = float(exact.log_marginal_likelihood())

    sgpr = gpf.models.SGPR((X, Y), kernel=gpf.kernels.SquaredExponential(), inducing_variable=Z)
    gpf.optimizers.Scipy().minimize(
        sgpr.training_loss, sgpr.trainable_variables, options={"maxiter": 100}
    )
    elbo = float(sgpr.elbo())
    upper = float(sgpr.upper_bound())
    # the ELBO/upper bracket holds at FIXED hyperparameters: evaluate the
    # exact marginal likelihood at SGPR's learned kernel/noise
    exact_at_sgpr = gpf.models.GPR(
        (X, Y), kernel=sgpr.kernel, noise_variance=float(sgpr.likelihood.variance.value)
    )
    lml_at_sgpr = float(exact_at_sgpr.log_marginal_likelihood())
    print(f"optimized exact LML {lml:.2f}")
    print(f"SGPR bracket at its hypers: ELBO {elbo:.2f} <= LML {lml_at_sgpr:.2f} <= upper {upper:.2f}")
    assert elbo <= lml_at_sgpr + 1e-6 <= upper + 1e-4

    cglb = gpf.models.CGLB(
        (X, Y),
        kernel=gpf.kernels.SquaredExponential(),
        inducing_variable=Z.copy(),
        cg_tolerance=0.01,
        matrix_free_chunk=reduce_in_tests(512, 64),  # never builds [N, N]
    )
    gpf.optimizers.Scipy().minimize(
        cglb.training_loss, cglb.trainable_variables, options={"maxiter": 100}
    )
    cglb_bound = -float(cglb.training_loss())
    print(f"CGLB bound (matrix-free): {cglb_bound:.2f} (tighter than plain SGPR at same M)")

    # q(u) extracted from the collapsed SGPR solution, usable to warm-start SVGP
    q_mu, q_var = sgpr.compute_qu()
    print("SGPR optimal q(u): mean shape", q_mu.shape, "cov shape", q_var.shape)


if __name__ == "__main__":
    main()
