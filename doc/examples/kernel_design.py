"""Designing a custom kernel (mirrors the reference's kernel_design
notebook): subclass Kernel, add Parameters, implement K/K_diag — composition,
active_dims slicing, jit, and training all work unchanged.
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
