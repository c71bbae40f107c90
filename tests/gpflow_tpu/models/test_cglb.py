"""CGLB matrix-free mode (TPU extension: chunked K matvecs, no [N, N])."""
import numpy as np

import gpflow_tpu


def test_matrix_free_cglb_matches_dense():
    """matrix_free_chunk must give the same objective, gradients, and
    predictions as the dense path (chunk not dividing N exercises padding)."""
    import jax
    from gpflow_tpu.models import CGLB

    rngc = np.random.RandomState(3)
    N, D, M = 90, 2, 10
    X = rngc.randn(N, D)
    Y = np.sin(X[:, :1]) + 0.1 * rngc.randn(N, 1)
    Z = X[:M].copy()

    def build(**kw):
        return CGLB(
            (X, Y),
            kernel=gpflow_tpu.kernels.SquaredExponential(),
            inducing_variable=Z,
            cg_tolerance=1e-8,
            **kw,
        )

    dense, mf = build(), build(matrix_free_chunk=32)
    np.testing.assert_allclose(
        float(mf.training_loss()), float(dense.training_loss()), rtol=1e-10
    )

    def grads(model):
        params = list(model.trainable_parameters)

        def f(unc):
            old = [p._unconstrained for p in params]
            try:
                for p, u in zip(params, unc):
                    p._unconstrained = u
                return model.training_loss()
            finally:
                for p, o in zip(params, old):
                    p._unconstrained = o

        return jax.grad(f)(tuple(p._unconstrained for p in params))

    for gd, gm in zip(grads(dense), grads(mf)):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gm), rtol=1e-8, atol=1e-10)

    Xnew = rngc.randn(7, D)
    md, vd = dense.predict_f(Xnew)
    mm, vm = mf.predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(md), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vd), rtol=1e-8)
