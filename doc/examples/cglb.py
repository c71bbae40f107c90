"""Conjugate Gradient Lower Bound (mirrors the reference's theory/cglb
notebook, ``doc/sphinx/notebooks/theory/cglb.pct.py``; ``CGLB`` is
reference ``gpflow/models/cglb.py``, Artemev et al. 2021).

CGLB replaces SGPR's trace penalty with the tighter Jensen correction
``N log(1 + tr(K - Q)/(sigma^2 N))`` and bounds the quadratic term
``-0.5 y^T (K + sigma^2 I)^-1 y`` with a preconditioned conjugate-gradient
estimate through an auxiliary vector v — so its objective sits BETWEEN the
SGPR ELBO and the exact GPR marginal likelihood, introducing less
hyperparameter bias than SGPR at the same inducing set.

Why a tighter bound changes the LEARNED MODEL, not just a number: you
optimise hyperparameters through the bound, so any gap that VARIES with
the hyperparameters tilts the optimum. SGPR's trace penalty
``tr(K - Q)/(2 sigma^2)`` explodes as the lengthscale shrinks (Q can no
longer track K), so SGPR systematically prefers smoother kernels and
larger noise than the evidence supports. The first section below measures
exactly this: over a grid of lengthscales, the maximum gap to the exact
objective — CGLB's is an order of magnitude smaller than SGPR's on the
same 10 inducing points. The full derivation of both terms (and why the
CG estimate is still a valid LOWER bound even when CG is stopped early —
the ``0.5 r^T Q^-1 r`` error term is itself bounded by the
preconditioner) is in ``doc/theory/cglb.md``.

Two practical details the walkthrough shows:

* **v is not a trainable.** The auxiliary vector is tuned by CG INSIDE
  each objective evaluation (warm-started from the previous one, wrapped
  in stop_gradient), so ``trainable_variables`` contains only kernel,
  noise, and Z — L-BFGS never sees an N-dimensional parameter. Setting
  ``v_grad_optimization=True`` flips v into a gradient-trained parameter
  instead, the paper's other variant.
* **Prediction has a knob.** ``predict_f(..., cg_tolerance=None)`` uses v
  as-is (SGPR-cost prediction); a tight tolerance refines the residual
  mean by more CG on [N, N] — accuracy paid for at serving time, not
  training time.

TPU-native extension demonstrated at the end: ``matrix_free_chunk`` runs
every K-matvec in row chunks with rematerialization (``jax.checkpoint``
re-builds the [N, chunk] blocks in the backward pass), so the [N, N]
kernel matrix is never materialized — exact-GP-bound training at N beyond
HBM. The chunked objective is verified IDENTICAL to the dense one below;
tools/exactgp_32k.py and PERFORMANCE.md carry the N=32k wall-clock story
on a real chip.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.kernels import SquaredExponential
from gpflow_tpu.models import CGLB, GPR, SGPR
from gpflow_tpu.optimizers import Scipy

MAXITER = reduce_in_tests(100, 15)
N_GRID = reduce_in_tests(20, 5)


def snelson_like(n=120, rng=None):
    rng = rng or np.random.RandomState(2)
    X = np.sort(rng.uniform(0, 6, (n, 1)), axis=0)
    Y = np.sin(2 * X) + 0.3 * np.cos(5 * X) + 0.15 * rng.randn(n, 1)
    return X, Y


def loss_with_changed_parameter(model, parameter, value):
    original = np.asarray(parameter.value).copy()
    parameter.assign(value)
    loss = float(model.training_loss())
    parameter.assign(original)
    return loss


def main() -> None:
    rng = np.random.RandomState(2)
    data = snelson_like(rng=rng)
    x, y = data
    m = 10
    iv = x[rng.choice(len(x), size=m, replace=False), :].copy()
    noise = 0.1

    gpr = GPR(data, kernel=SquaredExponential(), noise_variance=noise)
    sgpr = SGPR(data, kernel=SquaredExponential(), noise_variance=noise,
                inducing_variable=iv.copy())
    cglb = CGLB(data, kernel=SquaredExponential(), noise_variance=noise,
                inducing_variable=iv.copy(), cg_tolerance=1e-6, max_cg_iters=200)

    # --- objective landscape: CGLB hugs the exact objective much more
    # tightly than SGPR, i.e. it introduces less hyperparameter bias
    lengthscales = np.linspace(0.1, 3.0, N_GRID)
    max_gap_sgpr = 0.0
    max_gap_cglb = 0.0
    for ls in lengthscales:
        g = loss_with_changed_parameter(gpr, gpr.kernel.lengthscales, ls)
        s = loss_with_changed_parameter(sgpr, sgpr.kernel.lengthscales, ls)
        c = loss_with_changed_parameter(cglb, cglb.kernel.lengthscales, ls)
        # both are lower bounds on the evidence: loss = -bound >= -lml
        assert s >= g - 1e-6 and c >= g - 1e-6
        max_gap_sgpr = max(max_gap_sgpr, s - g)
        max_gap_cglb = max(max_gap_cglb, c - g)
    print(f"max |objective - exact| over lengthscales: "
          f"SGPR {max_gap_sgpr:.4f}, CGLB {max_gap_cglb:.4f}")
    assert max_gap_cglb < max_gap_sgpr

    # --- train as usual; v is tuned by CG inside the objective, so the
    # trainable variables do NOT include the auxiliary vector
    Scipy().minimize(cglb.training_loss, cglb.trainable_variables,
                     options={"maxiter": MAXITER})
    print(f"trained CGLB bound: {float(-cglb.training_loss()):.3f}")

    # --- prediction: cg_tolerance=None skips the CG refinement (v as-is,
    # SGPR-like prediction); a tight tolerance refines the residual mean
    xnew = np.linspace(x.min() - 1.0, x.max() + 1.0, 60).reshape(-1, 1)
    cglb.aux_vec.assign(np.zeros_like(np.asarray(cglb.aux_vec.value)))
    mean_no_cg, _ = cglb.predict_f(xnew, cg_tolerance=None)
    mean_cg, _ = cglb.predict_f(xnew, cg_tolerance=1e-6)
    shift = float(np.max(np.abs(np.asarray(mean_cg) - np.asarray(mean_no_cg))))
    print(f"max |mean shift| from CG refinement of v=0: {shift:.5f}")
    assert shift > 0.0  # the CG refinement moves the prediction

    # --- matrix-free mode (TPU-native extension): identical objective,
    # K-matvecs computed in row chunks, no [N, N] materialization
    cglb_mf = CGLB(data, kernel=SquaredExponential(), noise_variance=noise,
                   inducing_variable=iv.copy(), cg_tolerance=1e-6,
                   max_cg_iters=200, matrix_free_chunk=32)
    dense_obj = float(cglb.training_loss())
    cglb_mf.kernel.variance.assign(cglb.kernel.variance.value)
    cglb_mf.kernel.lengthscales.assign(cglb.kernel.lengthscales.value)
    cglb_mf.likelihood.variance.assign(cglb.likelihood.variance.value)
    cglb_mf.inducing_variable.Z.assign(cglb.inducing_variable.Z.value)
    mf_obj = float(cglb_mf.training_loss())
    print(f"dense objective {dense_obj:.6f} == matrix-free {mf_obj:.6f}")
    np.testing.assert_allclose(mf_obj, dense_obj, rtol=1e-6)


if __name__ == "__main__":
    main()
