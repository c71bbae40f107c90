"""Multioutput conditional equivalence sweep (pattern from reference
``tests/gpflow/conditionals/test_multioutput.py``): the cheap/efficient
code paths must agree with their general/fallback counterparts.

* SharedIndependent(k, P) == SeparateIndependent([k] * P) when the kernels
  are identical.
* Shared/SeparateIndependentInducingVariables (efficient posteriors) ==
  Fallback wrappers (interdomain code path).
* LinearCoregionalization with W = I_P on P latents == SeparateIndependent.
"""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

rng = np.random.RandomState(8)
N, D, M, P = 7, 2, 5, 3

X = rng.randn(N, D)
Z = rng.randn(M, D)
Q_MU = rng.randn(M, P)
Q_SQRT = np.tril(rng.randn(P, M, M) * 0.2 + 1.4 * np.eye(M)[None])


def _shared_kernel():
    return kernels.SharedIndependent(
        kernels.SquaredExponential(lengthscales=0.9), output_dim=P
    )


def _separate_equal_kernels():
    return kernels.SeparateIndependent(
        [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)]
    )


def _assert_same(res_a, res_b, atol=1e-8):
    np.testing.assert_allclose(np.asarray(res_a[0]), np.asarray(res_b[0]), atol=atol)
    np.testing.assert_allclose(np.asarray(res_a[1]), np.asarray(res_b[1]), atol=atol)


@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("full_cov", [False, True])
def test_shared_equals_separate_with_equal_kernels(whiten, full_cov):
    iv = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    res_shared = conditional(
        X, iv, _shared_kernel(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_cov=full_cov
    )
    res_sep = conditional(
        X, iv, _separate_equal_kernels(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_cov=full_cov
    )
    _assert_same(res_shared, res_sep)


@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("fallback_cls, efficient_cls", [
    (FallbackSharedIndependentInducingVariables, SharedIndependentInducingVariables),
])
def test_efficient_equals_fallback_lcm_shared(whiten, fallback_cls, efficient_cls):
    """Fallback IVs dispatch only with IndependentLatent kernels (reference
    ``posteriors.py:1068-1076``); LinearCoregionalization is the concrete
    one. The fallback interdomain path must agree with the efficient
    g-space path."""
    W = rng.randn(P, P)
    def lcm():
        return kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=W
        )
    iv_eff = efficient_cls(InducingPoints(Z.copy()))
    iv_fb = fallback_cls(InducingPoints(Z.copy()))
    res_eff = conditional(X, iv_eff, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_fb = conditional(
        X, iv_fb, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_output_cov=False
    )
    _assert_same(res_eff, res_fb, atol=1e-7)


@pytest.mark.parametrize("whiten", [True, False])
def test_efficient_equals_fallback_lcm_separate(whiten):
    W = rng.randn(P, P)
    def lcm():
        return kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=W
        )
    iv_eff = SeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()) for _ in range(P)]
    )
    iv_fb = FallbackSeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()) for _ in range(P)]
    )
    res_eff = conditional(X, iv_eff, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_fb = conditional(
        X, iv_fb, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_output_cov=False
    )
    _assert_same(res_eff, res_fb, atol=1e-7)


@pytest.mark.parametrize("whiten", [True, False])
def test_coregionalization_identity_mixing_equals_separate(whiten):
    base = [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)]
    lcm = kernels.LinearCoregionalization(
        [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=np.eye(P)
    )
    iv = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    res_lcm = conditional(X, iv, lcm, Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_sep = conditional(
        X, iv, kernels.SeparateIndependent(base), Q_MU, q_sqrt=Q_SQRT, white=whiten
    )
    _assert_same(res_lcm, res_sep, atol=1e-7)


def test_fully_correlated_inducing_points_shape():
    """Plain InducingPoints x MultioutputKernel routes through the fully
    correlated [M*P] path (reference A.1 dispatch matrix)."""
    kernel = _shared_kernel()
    iv = InducingPoints(Z.copy())
    q_mu = rng.randn(M * P, 1)
    q_sqrt = np.tril(rng.randn(1, M * P, M * P) * 0.1 + np.eye(M * P)[None])
    mean, var = conditional(X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=True)
    assert mean.shape == (N, P)
    assert var.shape == (N, P)


# ---------------------------------------------------------------------------
# Low-level math-kernel sweeps (reference test_multioutput.py:360-487,893-969)
# ---------------------------------------------------------------------------

from gpflow_tpu.conditionals.util import (  # noqa: E402
    fully_correlated_conditional,
    fully_correlated_conditional_repeat,
    independent_interdomain_conditional,
)
from gpflow_tpu.config import default_float, default_jitter  # noqa: E402

L_SWEEP, M_SWEEP, N_SWEEP, P_SWEEP = 2, 3, 4, 3

_Q_SQRT_FACTORIES = [
    lambda LM, R: None,
    lambda LM, R: np.broadcast_to(np.eye(LM), (R, LM, LM)).copy(),
]


@pytest.mark.parametrize("R", [1, 2, 5])
@pytest.mark.parametrize("q_sqrt_factory", _Q_SQRT_FACTORIES, ids=["qNone", "qEye"])
@pytest.mark.parametrize("full_cov", [False, True])
@pytest.mark.parametrize("full_output_cov", [False, True])
@pytest.mark.parametrize("whiten", [False, True])
def test_fully_correlated_conditional_repeat_shapes(
    R, q_sqrt_factory, full_cov, full_output_cov, whiten
):
    """Shape grid of the [R]-repeat fully-correlated conditional (reference
    ``test_multioutput.py:368-410``)."""
    L, M_, N_, P_ = L_SWEEP, M_SWEEP, N_SWEEP, P_SWEEP
    LM = L * M_
    Kmm = np.ones((LM, LM)) + default_jitter() * np.eye(LM)
    Kmn = np.ones((LM, N_, P_))
    if full_cov and full_output_cov:
        Knn = np.ones((N_, P_, N_, P_))
        expected_v_shape = (R, N_, P_, N_, P_)
    elif not full_cov and full_output_cov:
        Knn = np.ones((N_, P_, P_))
        expected_v_shape = (R, N_, P_, P_)
    elif full_cov and not full_output_cov:
        Knn = np.ones((P_, N_, N_))
        expected_v_shape = (R, P_, N_, N_)
    else:
        Knn = np.ones((N_, P_))
        expected_v_shape = (R, N_, P_)
    f = np.ones((LM, R))
    q_sqrt = q_sqrt_factory(LM, R)

    m, v = fully_correlated_conditional_repeat(
        Kmn, Kmm, Knn, f,
        full_cov=full_cov, full_output_cov=full_output_cov,
        q_sqrt=q_sqrt, white=whiten,
    )
    assert m.shape == (R, N_, P_)
    assert v.shape == expected_v_shape
    assert np.isfinite(np.asarray(m)).all()
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("q_sqrt_factory", _Q_SQRT_FACTORIES, ids=["qNone", "qEye"])
@pytest.mark.parametrize("full_cov", [False, True])
@pytest.mark.parametrize("full_output_cov", [False, True])
@pytest.mark.parametrize("whiten", [False, True])
def test_fully_correlated_conditional_shapes(
    q_sqrt_factory, full_cov, full_output_cov, whiten
):
    """Shape grid of the single-function fully-correlated conditional
    (reference ``test_multioutput.py:447-486``)."""
    L, M_, N_, P_ = L_SWEEP, M_SWEEP, N_SWEEP, P_SWEEP
    LM = L * M_
    Kmm = np.ones((LM, LM)) + default_jitter() * np.eye(LM)
    Kmn = np.ones((LM, N_, P_))
    if full_cov and full_output_cov:
        Knn = np.ones((N_, P_, N_, P_))
        expected_v_shape = (N_, P_, N_, P_)
    elif not full_cov and full_output_cov:
        Knn = np.ones((N_, P_, P_))
        expected_v_shape = (N_, P_, P_)
    elif full_cov and not full_output_cov:
        Knn = np.ones((P_, N_, N_))
        expected_v_shape = (P_, N_, N_)
    else:
        Knn = np.ones((N_, P_))
        expected_v_shape = (N_, P_)
    f = np.ones((LM, 1))
    q_sqrt = q_sqrt_factory(LM, 1)

    m, v = fully_correlated_conditional(
        Kmn, Kmm, Knn, f,
        full_cov=full_cov, full_output_cov=full_output_cov,
        q_sqrt=q_sqrt, white=whiten,
    )
    assert m.shape == (N_, P_)
    assert v.shape == expected_v_shape


@pytest.mark.parametrize("whiten", [False, True])
def test_fully_correlated_conditional_repeat_whiten(whiten):
    """The white flag changes the projection matrix A: with a 1x1 Kmm the
    predicted mean is analytic (reference ``test_multioutput.py:413-444``)."""
    N_, P_ = 6, 3
    Lm = rng.randn(1, 1) ** 2 + 0.5
    Kmm = Lm * Lm + default_jitter()
    Kmn = np.ones((1, N_, P_))
    Knn = np.ones((N_, P_))
    f = rng.randn(1, 1)

    mean, _ = fully_correlated_conditional_repeat(Kmn, Kmm, Knn, f, white=whiten)

    if whiten:
        expected_mean = (f * Kmn) / np.sqrt(Kmm)
    else:
        expected_mean = (f * Kmn) / Kmm
    np.testing.assert_allclose(np.asarray(mean), expected_mean, rtol=1e-6)


@pytest.mark.parametrize("whiten", [False, True])
def test_independent_interdomain_conditional_whiten(whiten):
    """Same analytic 1x1 check for the interdomain conditional (reference
    ``test_multioutput.py:938-969``)."""
    N_, P_ = 6, 3
    Lm = rng.randn(1, 1, 1) ** 2 + 0.5
    Kmm = Lm * Lm + default_jitter()
    Kmn = np.ones((1, 1, N_, P_))
    Knn = np.ones((N_, P_))
    f = rng.randn(1, 1)

    mean, _ = independent_interdomain_conditional(Kmn, Kmm, Knn, f, white=whiten)

    if whiten:
        expected_mean = (f * Kmn) / np.sqrt(Kmm)
    else:
        expected_mean = (f * Kmn) / Kmm
    np.testing.assert_allclose(np.asarray(mean), expected_mean[0][0], rtol=1e-6)


def test_independent_interdomain_conditional_bug_regression():
    """Shape regression for interdomain conditionals with L != P and sliced
    input blocks (reference ``test_multioutput.py:893-935``, GPflow #818)."""
    from gpflow_tpu.kernels import SquaredExponential

    M_, N_, D_lat, L_, P_ = 7, 5, 3, 2, 3
    D_inp = D_lat * P_
    Xr = rng.randn(N_, D_inp)
    Zs = [rng.randn(M_, D_lat) for _ in range(L_)]
    k = SquaredExponential(lengthscales=np.ones(D_lat))

    Kmm = np.stack([np.asarray(k(Zl)) for Zl in Zs])  # [L, M, M]
    Kmm += default_jitter() * np.eye(M_)[None]
    Kmn = np.stack(
        [
            np.stack(
                [
                    np.asarray(k(Zl, Xr[:, i * D_lat : (i + 1) * D_lat]))
                    for i in range(P_)
                ]
            )
            for Zl in Zs
        ]
    )  # [L, P, M, N]
    Kmn = np.transpose(Kmn, (2, 0, 3, 1))  # [M, L, N, P]
    Knn = np.stack(
        [
            np.asarray(k(Xr[:, i * D_lat : (i + 1) * D_lat], full_cov=False))
            for i in range(P_)
        ]
    ).T  # [N, P]
    q_mu = np.zeros((M_, L_))
    q_sqrt = np.stack([np.eye(M_) for _ in range(L_)])  # [L, M, M]

    mean, var = independent_interdomain_conditional(
        Kmn, Kmm, Knn, q_mu, q_sqrt=q_sqrt, full_cov=False, full_output_cov=False
    )
    assert mean.shape == (N_, P_)
    assert var.shape == (N_, P_)
    assert np.isfinite(np.asarray(var)).all()


# ---------------------------------------------------------------------------
# Multioutput kernel semantics (reference test_multioutput.py:494-527)
# ---------------------------------------------------------------------------


def test_shapes_of_mok():
    kern_list = [kernels.SquaredExponential() for _ in range(2)]
    k1 = kernels.LinearCoregionalization(kern_list, W=rng.randn(P, 2))
    assert k1.num_latent_gps == 2
    k2 = kernels.SeparateIndependent(kern_list)
    assert k2.num_latent_gps == 2
    k3 = kernels.SharedIndependent(kernels.SquaredExponential(), 5)
    assert k3.num_latent_gps == 5


def test_mixed_mok_kgg():
    """Kff = W Kgg W^T for LinearCoregionalization (reference
    ``test_multioutput.py:515-526``)."""
    L_ = 2
    W = rng.randn(P, L_)
    kern_list = [kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(L_)]
    kernel = kernels.LinearCoregionalization(kern_list, W=W)

    Kgg = np.asarray(kernel.Kgg(X, X))  # [L, N, N]
    Kff = np.asarray(kernel.K(X, X))  # [N, P, N, P]
    Kff_inferred = np.einsum("lnm,pl,ql->npmq", Kgg, W, W)
    np.testing.assert_allclose(Kff, Kff_inferred, atol=1e-9)


# ---------------------------------------------------------------------------
# Model-level integration equivalences (reference test_multioutput.py:534-890)
#
# The reference builds SVGP variants with *different parameterizations of the
# same posterior*, optimizes each for 500 BFGS iterations, and compares at
# decimal=3.  In f64 the parameterizations are exactly equivalent at MATCHED
# parameter values, so we assert ELBO + all four predict_f(full_cov,
# full_output_cov) variants agree at ~1e-6 without any optimization — a
# stronger and much cheaper check.
# ---------------------------------------------------------------------------

from gpflow_tpu.likelihoods import Gaussian  # noqa: E402
from gpflow_tpu.models import SVGP  # noqa: E402

NTEST = 5
XS = np.linspace(-3, 3, NTEST * 2).reshape(NTEST, 2)
Y_DATA = np.hstack(
    [np.sin(X[:, :1] * (i + 1)) + 0.05 * rng.randn(N, 1) for i in range(P)]
)  # [N, P]


def _interleave_full_q_sqrt(q_sqrt_blocks: np.ndarray) -> np.ndarray:
    """[P, M, M] per-output lower-tri blocks -> [1, MP, MP] lower-tri cholesky
    of the equivalent fully-correlated covariance, in the row-major [M, P]
    flattening (latent index fastest) used by the fully-correlated path."""
    P_, M_, _ = q_sqrt_blocks.shape
    full = np.zeros((M_ * P_, M_ * P_))
    for p in range(P_):
        full[p :: P_, p :: P_] = q_sqrt_blocks[p]
    assert np.allclose(full, np.tril(full))
    return full[None]


def _predict_all(models, Xnew, full_cov, full_output_cov):
    ms, vs = [], []
    for model in models:
        m, v = model.predict_f(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
        ms.append(np.asarray(m))
        vs.append(np.asarray(v))
    return ms, vs


def _assert_consecutive_close(arrs, atol):
    for i in range(len(arrs) - 1):
        np.testing.assert_allclose(arrs[i], arrs[i + 1], atol=atol)


def check_equality_predictions(data, models, atol=1e-6):
    """ELBO + four predict_f variants equal across models, and the variance
    shapes mutually consistent within a model (reference
    ``test_multioutput.py:73-131``)."""
    elbos = [float(m.elbo(data)) for m in models]
    _assert_consecutive_close(elbos, atol=1e-5 * max(1.0, abs(elbos[0])))

    means_tt, vars_tt = _predict_all(models, XS, True, True)
    means_tf, vars_tf = _predict_all(models, XS, True, False)
    means_ft, vars_ft = _predict_all(models, XS, False, True)
    means_ff, vars_ff = _predict_all(models, XS, False, False)

    _assert_consecutive_close(means_tt + means_tf + means_ft + means_ff, atol)
    for var in (vars_tt, vars_tf, vars_ft, vars_ff):
        _assert_consecutive_close(var, atol)

    var_tt, var_tf, var_ft, var_ff = vars_tt[0], vars_tf[0], vars_ft[0], vars_ff[0]
    # [N, P, N, P] diagonals must match the three reduced shapes
    np.testing.assert_allclose(
        np.diagonal(var_tt, axis1=1, axis2=3), np.transpose(var_tf, [1, 2, 0]),
        atol=atol,
    )
    np.testing.assert_allclose(
        np.diagonal(var_tt, axis1=0, axis2=2), np.transpose(var_ft, [1, 2, 0]),
        atol=atol,
    )
    np.testing.assert_allclose(
        np.diagonal(np.diagonal(var_tt, axis1=0, axis2=2)), var_ff, atol=atol
    )


@pytest.mark.parametrize("whiten", [True, False])
def test_shared_independent_mok_model_equivalence(whiten):
    """Three parameterizations of P independent outputs with a shared kernel
    (reference ``test_multioutput.py:534-627``):
    1) SharedIndependent x InducingPoints (fully-correlated [MP] path),
    2) plain Kernel x InducingPoints (broadcast single-output path),
    3) SharedIndependent x SharedIndependentInducingVariables (efficient)."""
    q_mu_blocks = rng.randn(M, P)
    q_sqrt_blocks = np.stack(
        [np.tril(rng.randn(M, M) * 0.2) + np.eye(M) for _ in range(P)]
    )
    q_mu_full = q_mu_blocks.reshape(M * P, 1)
    q_sqrt_full = _interleave_full_q_sqrt(q_sqrt_blocks)
    data = (X, Y_DATA)

    model_1 = SVGP(
        _shared_kernel(), Gaussian(), InducingPoints(Z.copy()),
        q_mu=q_mu_full, q_sqrt=q_sqrt_full, whiten=whiten,
        num_latent_gps=P,
    )
    model_2 = SVGP(
        kernels.SquaredExponential(lengthscales=0.9), Gaussian(),
        InducingPoints(Z.copy()),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten,
        num_latent_gps=P,
    )
    model_3 = SVGP(
        _shared_kernel(), Gaussian(),
        SharedIndependentInducingVariables(InducingPoints(Z.copy())),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten,
        num_latent_gps=P,
    )
    check_equality_predictions(data, [model_1, model_2, model_3])


@pytest.mark.parametrize("whiten", [True, False])
def test_separate_independent_mok_model_equivalence(whiten):
    """SeparateIndependent kernels: inefficient fully-correlated [MP] path vs
    efficient shared-IV path (reference ``test_multioutput.py:630-694``)."""
    q_mu_blocks = rng.randn(M, P)
    q_sqrt_blocks = np.stack(
        [np.tril(rng.randn(M, M) * 0.2) + np.eye(M) for _ in range(P)]
    )
    data = (X, Y_DATA)

    def kern_list():
        return [
            kernels.SquaredExponential(variance=0.5 + 0.2 * i, lengthscales=1.2)
            for i in range(P)
        ]

    model_1 = SVGP(
        kernels.SeparateIndependent(kern_list()), Gaussian(),
        InducingPoints(Z.copy()),
        q_mu=q_mu_blocks.reshape(M * P, 1),
        q_sqrt=_interleave_full_q_sqrt(q_sqrt_blocks),
        whiten=whiten, num_latent_gps=P,
    )
    model_2 = SVGP(
        kernels.SeparateIndependent(kern_list()), Gaussian(),
        SharedIndependentInducingVariables(InducingPoints(Z.copy())),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten, num_latent_gps=P,
    )
    check_equality_predictions(data, [model_1, model_2])


@pytest.mark.parametrize("whiten", [True, False])
def test_separate_independent_mof_model_equivalence(whiten):
    """Separate inducing variables per output (reference
    ``test_multioutput.py:697-764``): shared-kernel/shared-IV vs
    separate-IV (identical copies) vs separate-kernel/separate-IV."""
    q_mu_blocks = rng.randn(M, P)
    q_sqrt_blocks = np.stack(
        [np.tril(rng.randn(M, M) * 0.2) + np.eye(M) for _ in range(P)]
    )
    data = (X, Y_DATA)

    model_1 = SVGP(
        _shared_kernel(), Gaussian(),
        SharedIndependentInducingVariables(InducingPoints(Z.copy())),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten, num_latent_gps=P,
    )
    model_2 = SVGP(
        _shared_kernel(), Gaussian(),
        SeparateIndependentInducingVariables(
            [InducingPoints(Z.copy()) for _ in range(P)]
        ),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten, num_latent_gps=P,
    )
    model_3 = SVGP(
        _separate_equal_kernels(), Gaussian(),
        SeparateIndependentInducingVariables(
            [InducingPoints(Z.copy()) for _ in range(P)]
        ),
        q_mu=q_mu_blocks, q_sqrt=q_sqrt_blocks, whiten=whiten, num_latent_gps=P,
    )
    check_equality_predictions(data, [model_1, model_2, model_3])


@pytest.mark.parametrize("whiten", [True, False])
def test_mixed_mok_with_eye_vs_independent_mok(whiten):
    """LinearCoregionalization with W=I_P on P latents == SharedIndependent,
    both on the fully-correlated InducingPoints path (reference
    ``test_multioutput.py:767-798``)."""
    q_mu_blocks = rng.randn(M, P)
    q_sqrt_blocks = np.stack(
        [np.tril(rng.randn(M, M) * 0.2) + np.eye(M) for _ in range(P)]
    )
    q_mu_full = q_mu_blocks.reshape(M * P, 1)
    q_sqrt_full = _interleave_full_q_sqrt(q_sqrt_blocks)
    data = (X, Y_DATA)

    model_1 = SVGP(
        _shared_kernel(), Gaussian(), InducingPoints(Z.copy()),
        q_mu=q_mu_full, q_sqrt=q_sqrt_full, whiten=whiten, num_latent_gps=P,
    )
    model_2 = SVGP(
        kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)],
            W=np.eye(P),
        ),
        Gaussian(), InducingPoints(Z.copy()),
        q_mu=q_mu_full, q_sqrt=q_sqrt_full, whiten=whiten, num_latent_gps=P,
    )
    check_equality_predictions(data, [model_1, model_2])


def test_multioutput_with_diag_q_sqrt():
    """q_diag=True with constant 2s == full q_sqrt of 2*I (reference
    ``test_multioutput.py:817-847``)."""
    L_ = 2
    W = rng.randn(P, L_)
    q_mu = rng.randn(M, L_)
    q_sqrt_diag = np.ones((M, L_)) * 2
    q_sqrt = np.broadcast_to(np.eye(M)[None], (L_, M, M)).copy() * 2

    def lcm():
        return kernels.LinearCoregionalization(
            [kernels.SquaredExponential() for _ in range(L_)], W=W
        )

    data = (X, Y_DATA)
    model_1 = SVGP(
        lcm(), Gaussian(),
        SharedIndependentInducingVariables(InducingPoints(Z.copy())),
        q_mu=q_mu, q_sqrt=q_sqrt_diag, q_diag=True, num_latent_gps=L_,
    )
    model_2 = SVGP(
        lcm(), Gaussian(),
        SharedIndependentInducingVariables(InducingPoints(Z.copy())),
        q_mu=q_mu, q_sqrt=q_sqrt, q_diag=False, num_latent_gps=L_,
    )
    check_equality_predictions(data, [model_1, model_2])


def test_mixed_kernel_separate_mof_deterministic():
    """Two identically-constructed LCM + separate-IV models agree exactly
    (reference ``test_multioutput.py:850-865``)."""
    L_ = 2
    W = rng.randn(P, L_)
    q_mu = rng.randn(M, L_)
    q_sqrt = np.stack([np.tril(rng.randn(M, M) * 0.2) + np.eye(M) for _ in range(L_)])

    def make():
        return SVGP(
            kernels.LinearCoregionalization(
                [kernels.SquaredExponential() for _ in range(L_)], W=W
            ),
            Gaussian(),
            SeparateIndependentInducingVariables(
                [InducingPoints(Z.copy()) for _ in range(L_)]
            ),
            q_mu=q_mu, q_sqrt=q_sqrt, num_latent_gps=L_,
        )

    check_equality_predictions((X, Y_DATA), [make(), make()], atol=1e-12)


def test_separate_independent_conditional_with_q_sqrt_none():
    """separate_independent conditional must accept q_sqrt=None (reference
    ``test_multioutput.py:868-890``, GPflow #1523)."""
    L_ = 2
    q_mu = rng.randn(M, L_)
    kernel = kernels.SeparateIndependent(
        [kernels.SquaredExponential() for _ in range(L_)]
    )
    iv = SeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()) for _ in range(L_)]
    )
    mean, var = conditional(
        X, iv, kernel, q_mu,
        full_cov=False, full_output_cov=False, q_sqrt=None, white=True,
    )
    assert mean.shape == (N, L_)
    assert var.shape == (N, L_)
    assert np.isfinite(np.asarray(var)).all()
