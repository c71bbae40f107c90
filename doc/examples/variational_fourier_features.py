"""Variational Fourier features (mirrors the reference's
advanced/variational_fourier_features notebook): a CUSTOM inducing-variable
class plugged into the framework through its dispatch extension points.

Hensman, Durrande & Solin (JMLR 2018): the inducing variables are
projections of the GP onto a truncated Fourier basis on an interval
[a, b].  For Matern-1/2 and Matern-3/2 kernels, Kuu has closed
block-diagonal + low-rank structure and Kuf is the (tail-corrected)
Fourier basis evaluated at the data.

Why Fourier features instead of inducing POINTS
-----------------------------------------------
Classic inducing points summarise the GP by its VALUES at M pseudo-inputs;
how informative u is depends on where Z sits, and Z must be optimised.
Inter-domain inducing variables generalise this: u_m = <f, phi_m> for any
linear functional, and the WHOLE framework only ever touches u through two
quantities — Kuu = cov(u, u) and Kuf = cov(u, f(X)). Pick phi_m as Fourier
basis functions on [a, b] and three things happen (Hensman+ 2018):

* u_m summarises f GLOBALLY over the interval (no placement problem —
  the "locations" are frequencies, fixed by the basis),
* Kuf is just the basis evaluated at the data (cos/sin of omega_m (x-a),
  with closed-form exponential tails outside [a, b] — Table 1 of the
  paper, implemented in the ``Kuf_*_vff`` functions below), so building
  Kuf costs no kernel evaluations at all, and
* Kuu is diagonal-plus-rank-1 blockwise (eqs. 110-116), i.e. nearly free
  to factorise at large M.

The catch: those closed forms exist only for the Matern-1/2 and -3/2
(and -5/2) kernels in 1-D, which is why this lives in an example rather
than the core — and why the extension API matters more than the maths.

Demonstrated extension points (same registration story as the reference):
  * subclassing ``InducingVariables``,
  * ``covariances.Kuu.register`` / ``covariances.Kuf.register``,
after which SVGP, the conditional engine, and the posterior cache all work
unchanged — the main() below trains with the stock Scipy optimizer and
serves through the stock cached posterior, neither of which knows Fourier
features exist. Note ``whiten=False``: whitening multiplies by chol(Kuu),
which would densify exactly the structure VFF exists to exploit. (The
reference notebook additionally exploits the structured Kuu through a
custom posterior; here Kuu is assembled densely — M is small — and the
structure is kept in the build. On TPU the dense [2M-1, 2M-1] Kuu is an
MXU-friendly shape anyway; structure-exploiting solves only start to win
past M ~ 1000.)
"""
import numpy as np
import jax.numpy as jnp

import gpflow_tpu as gpf
from gpflow_tpu.base import Parameter, TensorLike
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.covariances import Kuf, Kuu
from gpflow_tpu.inducing_variables import InducingVariables
from gpflow_tpu.kernels import Matern12, Matern32

MAXITER = reduce_in_tests(500, 30)


class FourierFeatures1D(InducingVariables):
    """Truncated Fourier basis phi = [1, cos(w_1(x-a)), ..., sin(w_{M-1}(x-a))]
    on [a, b]; 2M-1 inducing variables total."""

    def __init__(self, a: float, b: float, M: int) -> None:
        self.a = Parameter(a, name="a")
        self.b = Parameter(b, name="b")
        self.M = M
        self.ms = np.arange(M)

    @property
    def num_inducing(self) -> int:
        return 2 * self.M - 1

    @property
    def shape(self):
        return (2 * self.M - 1, 1, 1)


def _omegas(iv: FourierFeatures1D) -> jnp.ndarray:
    return 2.0 * np.pi * jnp.asarray(iv.ms, float) / (iv.b.value - iv.a.value)


@Kuu.register(FourierFeatures1D, Matern12)
def Kuu_matern12_vff(iv: FourierFeatures1D, kernel: Matern12, jitter: float = 0.0):
    """Eqs. (110)-(113) of Hensman+ 2018, assembled densely:
    cos block = diag(d_cos) + v v^T, sin block = diag(d_sin)."""
    omegas = _omegas(iv)
    span = iv.b.value - iv.a.value
    lamb = 1.0 / kernel.lengthscales.value
    two_or_four = jnp.where(omegas == 0, 2.0, 4.0)
    d_cos = span * (lamb**2 + omegas**2) / lamb / kernel.variance.value / two_or_four
    v_cos = jnp.ones_like(d_cos) / jnp.sqrt(kernel.variance.value)
    cos_block = jnp.diag(d_cos) + v_cos[:, None] * v_cos[None, :]
    d_sin = (
        span * (lamb**2 + omegas[1:] ** 2) / lamb / kernel.variance.value / 4.0
    )
    M = iv.num_inducing
    out = jnp.zeros((M, M), d_cos.dtype)
    out = out.at[: iv.M, : iv.M].set(cos_block)
    out = out.at[iv.M :, iv.M :].set(jnp.diag(d_sin))
    return out + jitter * jnp.eye(M, dtype=out.dtype)


@Kuf.register(FourierFeatures1D, Matern12, TensorLike)
def Kuf_matern12_vff(iv: FourierFeatures1D, kernel: Matern12, X):
    """Fourier basis at X, with exponential tails outside [a, b] (Table 1)."""
    x = jnp.asarray(X)[:, 0]
    a, b = iv.a.value, iv.b.value
    omegas = _omegas(iv)
    Kuf_cos = jnp.cos(omegas[:, None] * (x[None, :] - a))
    Kuf_sin = jnp.sin(omegas[1:, None] * (x[None, :] - a))
    Kuf_sin = jnp.where((x < a) | (x > b), 0.0, Kuf_sin)
    ell = kernel.lengthscales.value
    left = jnp.exp(-jnp.abs(x - a) / ell)[None, :]
    right = jnp.exp(-jnp.abs(x - b) / ell)[None, :]
    Kuf_cos = jnp.where(x < a, left, Kuf_cos)
    Kuf_cos = jnp.where(x > b, right, Kuf_cos)
    return jnp.concatenate([Kuf_cos, Kuf_sin], axis=0)


@Kuu.register(FourierFeatures1D, Matern32)
def Kuu_matern32_vff(iv: FourierFeatures1D, kernel: Matern32, jitter: float = 0.0):
    """Eqs. (114)-(116): both blocks are diag + rank-1."""
    omegas = _omegas(iv)
    span = iv.b.value - iv.a.value
    var = kernel.variance.value
    lamb = np.sqrt(3.0) / kernel.lengthscales.value
    four_or_eight = jnp.where(omegas == 0, 4.0, 8.0)
    d_cos = span * (lamb**2 + omegas**2) ** 2 / lamb**3 / var / four_or_eight
    v_cos = jnp.ones_like(d_cos) / jnp.sqrt(var)
    cos_block = jnp.diag(d_cos) + v_cos[:, None] * v_cos[None, :]
    om_s = omegas[1:]
    d_sin = span * (lamb**2 + om_s**2) ** 2 / lamb**3 / var / 8.0
    v_sin = om_s / lamb / jnp.sqrt(var)
    sin_block = jnp.diag(d_sin) + v_sin[:, None] * v_sin[None, :]
    M = iv.num_inducing
    out = jnp.zeros((M, M), d_cos.dtype)
    out = out.at[: iv.M, : iv.M].set(cos_block)
    out = out.at[iv.M :, iv.M :].set(sin_block)
    return out + jitter * jnp.eye(M, dtype=out.dtype)


@Kuf.register(FourierFeatures1D, Matern32, TensorLike)
def Kuf_matern32_vff(iv: FourierFeatures1D, kernel: Matern32, X):
    x = jnp.asarray(X)[:, 0]
    a, b = iv.a.value, iv.b.value
    omegas = _omegas(iv)
    ell = kernel.lengthscales.value
    Kuf_cos = jnp.cos(omegas[:, None] * (x[None, :] - a))
    om_s = omegas[1:]
    Kuf_sin = jnp.sin(om_s[:, None] * (x[None, :] - a))

    def tail_cos(dx):
        arg = np.sqrt(3.0) * jnp.abs(dx) / ell
        return ((1 + arg) * jnp.exp(-arg))[None, :]

    Kuf_cos = jnp.where(x < a, tail_cos(x - a), Kuf_cos)
    Kuf_cos = jnp.where(x > b, tail_cos(x - b), Kuf_cos)

    def tail_sin(dx):
        arg = np.sqrt(3.0) * jnp.abs(dx) / ell
        return dx[None, :] * jnp.exp(-arg) * om_s[:, None]

    Kuf_sin = jnp.where(x < a, tail_sin(x - a), Kuf_sin)
    Kuf_sin = jnp.where(x > b, tail_sin(x - b), Kuf_sin)
    return jnp.concatenate([Kuf_cos, Kuf_sin], axis=0)


def main() -> None:
    rng = np.random.RandomState(42)
    N = 120
    X = rng.uniform(0.0, 6.0, (N, 1))
    Y = np.sin(2 * X) + 0.3 * np.cos(5 * X) + 0.15 * rng.randn(N, 1)

    kernel = Matern32(lengthscales=0.5)
    iv = FourierFeatures1D(a=-1.0, b=7.0, M=reduce_in_tests(20, 8))
    gpf.set_trainable(iv.a, False)
    gpf.set_trainable(iv.b, False)

    model = gpf.models.SVGP(
        kernel=kernel,
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=iv,
        whiten=False,
        num_data=N,
    )
    gpf.optimizers.Scipy().minimize(
        model.training_loss_closure((X, Y)),
        model.trainable_variables,
        options={"maxiter": MAXITER},
    )
    elbo = float(model.elbo((X, Y)))

    exact = gpf.models.GPR((X, Y), kernel=Matern32(lengthscales=0.5), noise_variance=0.15**2)
    gpf.optimizers.Scipy().minimize(
        exact.training_loss, exact.trainable_variables, options={"maxiter": MAXITER}
    )
    lml = float(exact.log_marginal_likelihood())
    print(f"VFF-SVGP ELBO {elbo:.2f} <= exact GPR LML {lml:.2f}")
    if MAXITER >= 500:
        assert elbo <= lml + 1e-3
        assert elbo > lml - 25.0  # tight-ish bound with 2M-1=39 features

    Xnew = np.linspace(0, 6, 10)[:, None]
    m_vff, v_vff = model.predict_f(Xnew)
    m_ex, _ = exact.predict_f(Xnew)
    err = float(np.max(np.abs(np.asarray(m_vff) - np.asarray(m_ex))))
    print("max |VFF mean - exact mean| on the grid:", round(err, 3))

    # the cached-posterior path also works for custom inducing variables
    post = model.posterior()
    m_cached, _ = post.predict_f(Xnew)
    assert np.allclose(np.asarray(m_vff), np.asarray(m_cached), atol=1e-6)
    print("cached posterior agrees with fused predict")


if __name__ == "__main__":
    main()
