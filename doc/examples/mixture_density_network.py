"""Mixture density network (mirrors the reference's
tailor/mixture_density_network notebook): the Module/Parameter system is a
general model-building toolkit, not just for GPs.

An MDN predicts a full conditional density p(y|x) as a mixture of M
Gaussians whose weights/means/scales are the outputs of a neural network.
All network weights are ``Parameter`` leaves, trained with the same Scipy
L-BFGS wrapper used for GP models.  Data is the classic inverse-sine
problem where p(y|x) is multimodal and a plain GP regression must fail.

Why multimodality breaks a GP, and what the MDN does instead: inverting
y = x + 0.3 sin(2 pi x) + noise gives, for one x, SEVERAL valid y
branches. Any model whose predictive is a single Gaussian per input
(every GP regression in this package) can only answer with the average
of the branches — a prediction in the empty space BETWEEN them. The MDN
outputs, per input, M mixture logits, M means, and M log-scales; its
loss is the exact negative log likelihood of the mixture

    -log sum_m softmax(logit_m) N(y | mu_m, sigma_m^2)

evaluated with logsumexp for stability. Branch structure survives
because nothing forces the density to be unimodal.

What this example is really demonstrating about the framework:
* ``Module``/``Parameter`` + ``Scipy`` form a general differentiable-
  model toolkit — nothing in the optimizer or pytree machinery knows
  this is not a GP (same closure-grad, same transforms, same
  ``print_summary``).
* L-BFGS on a neural network works here because the model is small and
  the NLL is smooth; for bigger networks switch to the optax path
  (``utilities.training_loop``) — the model object doesn't change.
* The final check reads the mixture parameters at x=0 and asserts at
  least two components carry weight > 0.05 with well-separated means —
  the qualitative multimodal behaviour no GP in this package can
  produce. (See ``likelihoods/multilatent.py`` for the in-GP route when
  the non-Gaussianity is mild heteroskedasticity instead.)
"""
import numpy as np
import jax
import jax.numpy as jnp

import gpflow_tpu as gpf
from gpflow_tpu.base import Parameter
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(1000, 40)


class MDN(gpf.Module):
    def __init__(self, num_mixtures: int = 5, hidden: int = 50):
        rng = np.random.RandomState(0)
        self.M = num_mixtures
        out = 3 * num_mixtures  # logits, means, log-scales
        self.w1 = Parameter(rng.randn(1, hidden) * np.sqrt(2.0), name="w1")
        self.b1 = Parameter(np.zeros(hidden), name="b1")
        self.w2 = Parameter(rng.randn(hidden, hidden) * np.sqrt(2.0 / hidden), name="w2")
        self.b2 = Parameter(np.zeros(hidden), name="b2")
        self.w3 = Parameter(rng.randn(hidden, out) * 0.01, name="w3")
        self.b3 = Parameter(np.zeros(out), name="b3")

    def eval_network(self, X):
        h = jnp.tanh(jnp.asarray(X) @ self.w1.value + self.b1.value)
        h = jnp.tanh(h @ self.w2.value + self.b2.value)
        o = h @ self.w3.value + self.b3.value
        logits, means, log_scales = jnp.split(o, 3, axis=-1)
        return (
            jax.nn.log_softmax(logits, axis=-1),
            means,
            jnp.maximum(jnp.exp(log_scales), 1e-4),
        )

    def log_density(self, X, Y):
        log_w, mu, sigma = self.eval_network(X)
        comp = (
            -0.5 * np.log(2 * np.pi)
            - jnp.log(sigma)
            - 0.5 * ((jnp.asarray(Y) - mu) / sigma) ** 2
        )
        return jax.scipy.special.logsumexp(log_w + comp, axis=-1)

    def training_loss(self):
        return -jnp.mean(self.log_density(self._X, self._Y))


def inverse_sine_data(n: int, rng) -> tuple:
    # y is the INPUT of a noisy sine, x the output: p(y|x) is multimodal
    y = rng.uniform(-10.5, 10.5, (n, 1))
    x = np.sin(0.75 * y) * 7.0 + y * 0.5 + rng.randn(n, 1)
    return x / 10.0, y / 10.0


def main() -> None:
    rng = np.random.RandomState(3)
    X, Y = inverse_sine_data(reduce_in_tests(500, 120), rng)

    model = MDN(num_mixtures=5, hidden=reduce_in_tests(50, 16))
    model._X, model._Y = X, Y  # data closed over by training_loss

    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    nll = float(model.training_loss())
    print(f"final mean NLL: {nll:.3f}")

    # at x=0 the conditional is multimodal: check the mixture uses >1 mode
    log_w, mu, sigma = model.eval_network(np.array([[0.0]]))
    w = np.exp(np.asarray(log_w)).squeeze()
    mu = np.asarray(mu).squeeze()
    active = w > 0.05
    spread = mu[active].max() - mu[active].min() if active.sum() > 1 else 0.0
    print("active modes:", int(active.sum()), "mean spread:", round(float(spread), 2))
    if MAXITER >= 1000:
        assert active.sum() >= 2, "conditional at x=0 should be multimodal"
        assert spread > 0.3

    # sample from the fitted conditional density
    key = jax.random.PRNGKey(0)
    comp = int(jax.random.categorical(key, jnp.asarray(log_w), axis=-1)[0])
    sample = mu[comp] + float(sigma.squeeze()[comp]) * rng.randn()
    print("one sample from p(y|x=0):", round(float(sample), 3))


if __name__ == "__main__":
    main()
