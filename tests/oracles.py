"""Shared dense-NumPy oracles for objective-parity tests.

Pure NumPy, deliberately computed via a different route (explicit Qff,
np.linalg.inv / slogdet, Woodbury) than the library's Cholesky pipelines.
Used by ``tests/gpflow_tpu/models/test_objective_oracles.py`` and
``tests/integration/test_baseline_configs.py``.
"""
import numpy as np
from scipy.special import erf

JITTER = 1e-6  # default_jitter()


# -- kernels ----------------------------------------------------------------


def rbf_np(X1, X2, var, ls):
    d = (X1[:, None, :] - X2[None, :, :]) / np.asarray(ls)
    return var * np.exp(-0.5 * np.sum(d**2, -1))


def matern52_np(X1, X2, var, ls):
    d = (X1[:, None, :] - X2[None, :, :]) / np.asarray(ls)
    r2 = np.maximum(np.sum(d**2, -1), 1e-36)  # stationaries.py r2 clip
    r = np.sqrt(5.0 * r2)
    return var * (1.0 + r + r**2 / 3.0) * np.exp(-r)


# -- densities / expectations ----------------------------------------------


def mvn_logpdf_cols(Ycols, cov):
    """sum_p log N(y_p | 0, cov) via dense inverse + slogdet."""
    n = cov.shape[0]
    sign, logdet = np.linalg.slogdet(cov)
    assert sign > 0
    cinv = np.linalg.inv(cov)
    quad = np.einsum("np,nm,mp->", Ycols, cinv, Ycols)
    return -0.5 * quad - 0.5 * Ycols.shape[1] * (logdet + n * np.log(2 * np.pi))


def inv_probit_np(x):
    eps = 1e-3  # matches likelihoods/utils.py:13
    return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) * (1 - 2 * eps) + eps


def gh_bernoulli_var_exp(fmu, fvar, y, n_gh=20):
    """Hand-rolled Gauss-Hermite E_q[log Bernoulli(y | probit(f))]."""
    z, w = np.polynomial.hermite.hermgauss(n_gh)
    f = fmu[..., None] + np.sqrt(2.0 * fvar)[..., None] * z
    p = inv_probit_np(f)
    logp = np.where(y[..., None] > 0.5, np.log(p), np.log(1 - p))
    return np.sum(logp @ w) / np.sqrt(np.pi)


def gh2_heteroskedastic_var_exp(fmu, fvar, y, n_gh=20):
    """Tensor-product 2-D GH oracle for the heteroskedastic Normal
    likelihood: f1 -> loc, exp(f2) -> scale (multilatent.py)."""
    z, w = np.polynomial.hermite.hermgauss(n_gh)
    total = 0.0
    W = np.outer(w, w) / np.pi
    for n in range(len(y)):
        f1 = fmu[n, 0] + np.sqrt(2.0 * fvar[n, 0]) * z  # [n_gh]
        f2 = fmu[n, 1] + np.sqrt(2.0 * fvar[n, 1]) * z
        logp = (
            -0.5 * np.log(2 * np.pi)
            - f2[None, :]
            - 0.5 * (y[n, 0] - f1[:, None]) ** 2 * np.exp(-2.0 * f2[None, :])
        )
        total += np.sum(W * logp)
    return total


def gauss_var_exp(fmu, fvar, y, noise):
    return np.sum(
        -0.5 * np.log(2 * np.pi * noise) - 0.5 * ((y - fmu) ** 2 + fvar) / noise
    )


# -- KL divergences ---------------------------------------------------------


def kl_white(q_mu, S_list):
    """sum_p KL(N(q_mu_p, S_p) || N(0, I))."""
    total = 0.0
    for p, S in enumerate(S_list):
        sign, logdet = np.linalg.slogdet(S)
        assert sign > 0
        total += 0.5 * (np.trace(S) + q_mu[:, p] @ q_mu[:, p] - len(S) - logdet)
    return total


def kl_nonwhite(q_mu, S_list, K):
    """sum_p KL(N(q_mu_p, S_p) || N(0, K))."""
    Kinv = np.linalg.inv(K)
    _, logdetK = np.linalg.slogdet(K)
    total = 0.0
    for p, S in enumerate(S_list):
        _, logdetS = np.linalg.slogdet(S)
        total += 0.5 * (
            np.trace(Kinv @ S)
            + q_mu[:, p] @ Kinv @ q_mu[:, p]
            - len(S)
            + logdetK
            - logdetS
        )
    return total


# -- model objectives -------------------------------------------------------


def gpr_nlml(X, Y, kern, noise):
    """Exact log marginal likelihood, dense route."""
    K = kern(X, X) + noise * np.eye(len(X))
    return mvn_logpdf_cols(Y, K)


def sgpr_elbo(X, Y, Z, kern, kdiag, noise):
    """Titsias 2009 collapsed bound: log N(Y|0, Qff+s2 I) - P tr(K-Q)/(2s2)."""
    kuu = kern(Z, Z) + JITTER * np.eye(len(Z))
    kuf = kern(Z, X)
    qff = kuf.T @ np.linalg.inv(kuu) @ kuf
    P = Y.shape[1]
    return mvn_logpdf_cols(Y, qff + noise * np.eye(len(X))) - P / (2 * noise) * (
        np.sum(kdiag) - np.trace(qff)
    )


def sgpr_upper_bound(X, Y, Z, kern, kdiag, noise):
    """Titsias 2014 upper bound, dense route (ref models/sgpr.py:84-147).

    Uses the push-through identity A.T (I + A A.T)^-1 A = Q (I + Q)^-1 to
    express the reference's Cholesky pipeline with dense inverses:
      const  = -N/2 log(2 pi s2)
      logdet = -1/2 logdet(I + Qff/s2)
      quad   = -1/2 e.T (I + Qff/cn)^{-1} e,  e = Y/sqrt(cn), cn = s2 + c,
      c      = tr(K) - tr(Qff)
    Single-output Y only."""
    assert Y.shape[1] == 1
    N = len(X)
    kuu = kern(Z, Z) + JITTER * np.eye(len(Z))
    kuf = kern(Z, X)
    qff = kuf.T @ np.linalg.inv(kuu) @ kuf
    c = np.sum(kdiag) - np.trace(qff)
    cn_var = noise + c
    const = -0.5 * N * np.log(2 * np.pi * noise)
    _, ld = np.linalg.slogdet(np.eye(N) + qff / noise)
    e = Y[:, 0] / np.sqrt(cn_var)
    quad = -0.5 * e @ np.linalg.inv(np.eye(N) + qff / cn_var) @ e
    return const - 0.5 * ld + quad


def svgp_q_moments(kuu, kuf, kdiag, q_mu, S_list, whiten):
    """Marginal q(f) moments at the data: (fmu [N,P], fvar [N,P])."""
    kuu_inv = np.linalg.inv(kuu)
    if whiten:
        L = np.linalg.cholesky(kuu)
        A = np.linalg.inv(L) @ kuf
    else:
        A = kuu_inv @ kuf
    fmu = A.T @ q_mu
    base_var = kdiag - np.sum((kuu_inv @ kuf) * kuf, axis=0)
    fvar = np.stack([base_var + np.sum(A * (S @ A), axis=0) for S in S_list], axis=1)
    return fmu, fvar


def q_sqrt_to_S(q_sqrt):
    """Model q_sqrt ([M,P] diag or [P,M,M] tril) -> list of dense S_p."""
    q_sqrt = np.asarray(q_sqrt)
    if q_sqrt.ndim == 2:
        return [np.diag(q_sqrt[:, p] ** 2) for p in range(q_sqrt.shape[1])]
    return [np.tril(q_sqrt[p]) @ np.tril(q_sqrt[p]).T for p in range(q_sqrt.shape[0])]
