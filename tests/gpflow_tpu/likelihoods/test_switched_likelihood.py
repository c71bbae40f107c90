"""SwitchedLikelihood depth tests (pattern from reference
``tests/gpflow/likelihoods/test_switched_likelihood.py``): every statistic
must equal a manual per-partition computation with the constituent
likelihoods (our implementation replaces dynamic_partition/stitch with
one-hot masking — SURVEY.md A.5.3 — so this is the parity check for it)."""
import numpy as np
import pytest

from gpflow_tpu import likelihoods

rng = np.random.RandomState(9)
N = 12
X = rng.randn(N, 2)
F = rng.randn(N, 1)
Fmu = rng.randn(N, 1)
Fvar = np.exp(0.5 * rng.randn(N, 1))
Yval = rng.randn(N, 1)
IDX = rng.randint(0, 3, (N, 1)).astype(float)
Y = np.concatenate([Yval, IDX], axis=1)  # last column selects the likelihood


def _liks():
    return [
        likelihoods.Gaussian(0.1),
        likelihoods.Gaussian(0.5),
        likelihoods.StudentT(scale=0.7),
    ]


def _manual(method, *args):
    """Applies `method` of the selected sub-likelihood row by row."""
    liks = _liks()
    out = np.zeros(N)
    for n in range(N):
        lik = liks[int(IDX[n, 0])]
        fn = getattr(lik, method)
        out[n] = np.asarray(fn(*[a[n : n + 1] for a in args])).reshape(()).item()
    return out


def test_log_prob_matches_manual_partition():
    switched = likelihoods.SwitchedLikelihood(_liks())
    got = np.asarray(switched.log_prob(X, F, Y))
    expected = _manual("log_prob", X, F, Yval)
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_variational_expectations_matches_manual_partition():
    switched = likelihoods.SwitchedLikelihood(_liks())
    got = np.asarray(switched.variational_expectations(X, Fmu, Fvar, Y))
    expected = _manual("variational_expectations", X, Fmu, Fvar, Yval)
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_predict_log_density_matches_manual_partition():
    switched = likelihoods.SwitchedLikelihood(_liks())
    got = np.asarray(switched.predict_log_density(X, Fmu, Fvar, Y))
    expected = _manual("predict_log_density", X, Fmu, Fvar, Yval)
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_all_rows_one_likelihood_equals_plain():
    """All rows selecting index 1 must reproduce that likelihood exactly."""
    switched = likelihoods.SwitchedLikelihood(_liks())
    Y1 = np.concatenate([Yval, np.ones((N, 1))], axis=1)
    got = np.asarray(switched.variational_expectations(X, Fmu, Fvar, Y1))
    plain = np.asarray(
        likelihoods.Gaussian(0.5).variational_expectations(X, Fmu, Fvar, Yval)
    )
    np.testing.assert_allclose(got, plain, atol=1e-9)


def test_row_permutation_equivariance():
    switched = likelihoods.SwitchedLikelihood(_liks())
    perm = rng.permutation(N)
    base = np.asarray(switched.variational_expectations(X, Fmu, Fvar, Y))
    permuted = np.asarray(
        switched.variational_expectations(X[perm], Fmu[perm], Fvar[perm], Y[perm])
    )
    np.testing.assert_allclose(permuted, base[perm], atol=1e-9)


def test_switched_likelihood_with_vgp_trains():
    """VGP + SwitchedLikelihood optimizes without error (reference
    ``test_switched_likelihood.py:128-143``, GPflow issue #951)."""
    from gpflow_tpu import kernels, optimizers
    from gpflow_tpu.models import VGP

    r = np.random.RandomState(9)
    X = r.randn(12 + 15, 1)
    Y = r.randn(12 + 15, 1)
    idx = np.array([0] * 12 + [1] * 15)
    Y_aug = np.c_[Y, idx]
    assert Y_aug.shape == (27, 2)

    model = VGP(
        (X, Y_aug),
        kernel=kernels.Matern32(),
        likelihood=likelihoods.SwitchedLikelihood([likelihoods.StudentT(), likelihoods.StudentT()]),
    )
    before = float(model.training_loss())
    optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": 3}
    )
    after = float(model.training_loss())
    assert np.isfinite(after) and after <= before + 1e-9


def test_switched_likelihood_num_latent_gps_one_with_index_column():
    """num_latent_gps = Y.shape[1] - 1: the last Y column indexes the switch
    and must not count as a latent output (reference
    ``test_switched_likelihood.py:147-167``)."""
    from gpflow_tpu import kernels
    from gpflow_tpu.models import SVGP

    r = np.random.RandomState(10)
    x = r.randn(100, 1)
    y = np.hstack((r.randn(100, 1), r.randint(0, 3, (100, 1)).astype(float)))

    m = SVGP(
        kernel=kernels.Matern12(),
        inducing_variable=r.randn(4, 1),
        likelihood=likelihoods.SwitchedLikelihood([likelihoods.StudentT() for _ in range(3)]),
        num_latent_gps=1,
    )
    loss = float(m.training_loss((x, y)))
    assert np.isfinite(loss)


def test_switched_likelihood_invalid_index_poisons_loudly():
    """An index outside [0, K) must NaN its rows (the reference's
    dynamic_partition raises; silent 0 == log-probability 1 trained models
    to wrong answers — round-2 review)."""
    lik = likelihoods.SwitchedLikelihood(_liks())
    Ybad = Y.copy()
    Ybad[0, -1] = 5.0   # out of range
    Ybad[1, -1] = -1.0  # sentinel
    lp = np.asarray(lik.log_prob(X, F, Ybad))
    assert np.isnan(lp[0]) and np.isnan(lp[1])
    assert np.isfinite(lp[2:]).all()
    ve = np.asarray(lik.variational_expectations(X, Fmu, Fvar, Ybad))
    assert np.isnan(ve[0]) and np.isnan(ve[1]) and np.isfinite(ve[2:]).all()
