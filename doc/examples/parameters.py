"""Parameters and their optimisation (mirrors the reference's
getting_started/parameters_and_their_optimisation notebook).

Shows the Module/Parameter building blocks on their own: a custom model
built from ``gpflow_tpu.Module`` + ``Parameter``, transforms, priors,
fixing parameters, and optimisation with the Scipy wrapper.

The mental model (``gpflow_tpu/base.py``)
-----------------------------------------
A ``Parameter`` stores an UNCONSTRAINED leaf and shows you a CONSTRAINED
value:

    .value                 what the math sees (e.g. a positive lengthscale)
    ._unconstrained        what optimizers move (any real number)
    .transform             the bijector between them (Softplus by default
                           for positive parameters; None for free ones)

Optimizing in unconstrained space is what lets plain L-BFGS/Adam respect
positivity without projections or clipping — a step can never leave the
feasible set because the feasible set is the image of R^n.

``Module`` is a pytree: any attribute that is a Parameter (or a Module, or
a list of them) is discovered by traversal. That single fact powers
``trainable_variables``, ``print_summary``, checkpointing
(``utilities/traversal.py``) and the optimizers — there is no registration
API to call and nothing to forget.

Three more behaviors demonstrated below:
* ``assign`` goes through the transform (you assign the CONSTRAINED value)
  and rejects NaN loudly — silent NaNs in a kernel parameter otherwise
  surface as a cryptic Cholesky failure much later.
* ``set_trainable(p, False)`` removes p from ``trainable_variables``; the
  value stays, the optimizers simply no longer see it.
* attaching ``p.prior`` adds ``log p(theta)`` to
  ``log_posterior_density`` — the same model object then trains MAP
  instead of ML, and ``models/gpmc.py`` uses the identical mechanism for
  full MCMC.

JAX note: under jit, read ``.value`` inside the traced function via the
``functionalize`` helper (``base.py``) or the closure-grad pattern shown in
``doc/examples/classification.py`` — Parameters are host-resident Python
objects, not traced arrays (PERFORMANCE.md explains the why).
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(100, 20)


class LinearModel(gpf.Module):
    """y = slope * x + bias - a model built from raw Parameters."""

    def __init__(self, slope, bias):
        self.slope = gpf.Parameter(slope)
        self.bias = gpf.Parameter(bias)

    def predict(self, X):
        return self.slope.value * X + self.bias.value


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(40, 1)
    Y = 2.5 * X - 1.0 + 0.05 * rng.randn(40, 1)

    model = LinearModel(1.0, 0.0)
    gpf.utilities.print_summary(model, fmt="simple")

    # optimise the custom model with the Scipy wrapper
    def training_loss():
        import jax.numpy as jnp

        return jnp.mean((model.predict(jnp.asarray(X)) - jnp.asarray(Y)) ** 2)

    gpf.optimizers.Scipy().minimize(
        training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    print("fitted slope/bias:", float(model.slope.value), float(model.bias.value))
    if MAXITER >= 100:
        assert abs(float(model.slope.value) - 2.5) < 0.2

    # parameters of a GP model: transforms keep values positive
    gp = gpf.models.GPR((X, Y), kernel=gpf.kernels.Matern32())
    k = gp.kernel
    print("lengthscale transform:", k.lengthscales.transform.__class__.__name__)

    # assign: goes through the transform, validates finiteness
    k.lengthscales.assign(0.7)
    try:
        k.lengthscales.assign(np.nan)
    except ValueError as e:
        print("NaN assign rejected:", type(e).__name__)

    # fix a parameter: it disappears from trainable_variables
    n_before = len(list(gp.trainable_variables))
    gpf.set_trainable(gp.likelihood.variance, False)
    n_after = len(list(gp.trainable_variables))
    print("trainable leaves before/after fixing noise:", n_before, n_after)
    assert n_after == n_before - 1

    # priors turn the training loss into a log-posterior
    k.variance.prior = gpf.priors.LogNormal(0.0, 1.0)
    gpf.optimizers.Scipy().minimize(
        gp.training_loss, gp.trainable_variables, options={"maxiter": MAXITER}
    )
    print("MAP lengthscale:", round(float(k.lengthscales.value), 3))
    gpf.utilities.print_summary(gp, fmt="simple")


if __name__ == "__main__":
    main()
