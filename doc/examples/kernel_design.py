"""Designing a custom kernel (mirrors the reference's kernel_design
notebook): subclass Kernel, add Parameters, implement K/K_diag — composition,
active_dims slicing, jit, and training all work unchanged.

The contract a kernel must satisfy
----------------------------------
Only two methods are required (``kernels/base.py``):

* ``K(X, X2) -> [N, N2]`` — the full cross-covariance. ``X2=None`` means
  "X with itself" and MUST return the symmetric [N, N] matrix; callers
  rely on this to route the cheaper symmetric path.
* ``K_diag(X) -> [N]`` — just the diagonal of K(X, X). Implement it
  directly (here: sigma^2 * x) rather than taking ``diag(K(X))``: models
  call K_diag in their O(N) paths (SVGP/SGPR ELBOs, predict with
  full_cov=False) precisely to avoid the [N, N] product.

What the base class layers on top, for free:

* **Parameters and transforms**: ``Parameter(1.0, transform=positive())``
  gives an unconstrained optimization variable with the constraint applied
  on read — the Scipy/Adam/natgrad optimizers and ``print_summary`` all
  discover it by pytree traversal, no registration needed.
* **Composition**: ``Brownian() + Linear()`` builds a Sum kernel (and
  ``*`` a Product); sums/products flatten so deep compositions stay one
  flat op list under jit.
* **active_dims**: ``[0]`` slices column 0 out of the input before K sees
  it — how additive-over-dimensions models are assembled
  (k1 on dims [0] + k2 on dims [1]).

TPU notes: write K in terms of whole-array ops (here ``jnp.minimum`` of
broadcast column/row) — never a Python loop over rows. Anything expressible
this way jits and fuses; if the kernel is distance-based, subclass
``Stationary`` or ``IsotropicStationary`` instead and get the fused Pallas
distance-tile path (``ops/pallas_distance.py``) without writing any kernel
code yourself.
"""
import jax.numpy as jnp
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.base import Parameter, TensorType
from gpflow_tpu.bijectors import positive
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(100, 10)


class Brownian(gpf.kernels.Kernel):
    """k(x, x') = sigma^2 min(x, x') — the Brownian-motion kernel."""

    def __init__(self) -> None:
        super().__init__(active_dims=[0])
        self.variance = Parameter(1.0, transform=positive(), name="variance")

    def K(self, X: TensorType, X2: TensorType = None) -> jnp.ndarray:
        if X2 is None:
            X2 = X
        return self.variance * jnp.minimum(X, jnp.transpose(X2))  # [N, N2]

    def K_diag(self, X: TensorType) -> jnp.ndarray:
        return self.variance * jnp.reshape(X, (-1,))


def main() -> None:
    rng = np.random.RandomState(0)
    N = reduce_in_tests(100, 30)
    X = np.sort(rng.rand(N, 1), axis=0)
    Y = np.cumsum(0.3 * rng.randn(N, 1), axis=0) + 1.5 * X

    # custom kernel composes with built-ins through + and *
    kernel = Brownian() + gpf.kernels.Linear()
    model = gpf.models.GPR((X, Y), kernel=kernel, noise_variance=0.05)
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )

    lml = float(model.log_marginal_likelihood())
    mean, var = model.predict_f(np.linspace(0.01, 1, 20)[:, None])
    assert np.isfinite(np.asarray(mean)).all() and (np.asarray(var) >= 0).all()
    print(f"trained GPR with custom Brownian+Linear kernel; LML = {lml:.2f}")
    gpf.utilities.print_summary(model, fmt="simple")


if __name__ == "__main__":
    main()
