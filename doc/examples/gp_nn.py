"""Deep kernel learning: a GP on neural-network features (mirrors the
reference's tailor/gp_nn notebook, ``doc/sphinx/notebooks/tailor/gp_nn.pct.py``).

Why warp the inputs at all
--------------------------
A stationary kernel measures similarity by Euclidean distance, so it can
only represent functions whose characteristic scale is the same everywhere
in input space. The two-moons data below breaks that assumption: points on
opposite moons can be closer in R^2 than points on the same moon. Deep
kernel learning composes a learned feature map with a stationary kernel,

    k(x, x') = k_rbf(g_w(x), g_w(x')),

so the network g_w learns a representation in which the moons ARE
linearly separable and the GP supplies calibrated uncertainty on top —
the classic split of labour from Wilson et al. 2016 (AISTATS).

How it plugs into the framework (three extension points, all mirrored
from the reference):

1. **A custom kernel** — subclass ``Kernel``, implement ``K``/``K_diag``.
   The MLP weights are ordinary ``Parameter`` leaves of the kernel module,
   so they appear in ``model.trainable_parameters`` automatically and the
   whole stack (NN weights + GP hyperparameters + variational parameters)
   trains end-to-end through ONE jitted Adam loss. The reference needs a
   Keras model grafted onto a tf.Module for this; here it is just pytree
   composition.
2. **A custom inducing-variable type** — ``FeatureSpaceInducingPoints``
   marks that Z lives in the MLP's OUTPUT space. Inducing points in input
   space would be wasteful: the conditional only ever sees Z through
   Kuu/Kuf, and in feature space M points cover the (low-dimensional)
   manifold the network actually produces.
3. **Kuu/Kuf dispatch registrations** — the type pair
   (FeatureSpaceInducingPoints, KernelWithMLP) routes covariance
   construction so Kuu skips the MLP (Z is already a feature) while Kuf
   warps only the data side. Registration is resolved at trace time, so
   there is no dispatch cost inside the compiled step.

The same pattern scales to a CNN on images (swap ``mlp`` for any JAX
feature extractor) — the GP layer never changes.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

import gpflow_tpu as gpf
from gpflow_tpu.base import Parameter, TensorLike, TensorType
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.covariances import Kuf, Kuu
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.kernels import Kernel

STEPS = reduce_in_tests(400, 25)


class KernelWithMLP(Kernel):
    """k(x, y) = base_kernel(mlp(x), mlp(y)); the MLP warps inputs into a
    feature space where a stationary kernel is a better fit."""

    def __init__(self, input_dim: int, hidden: int, feature_dim: int, base_kernel: Kernel):
        super().__init__()
        rng = np.random.RandomState(0)
        s1 = np.sqrt(2.0 / input_dim)
        s2 = np.sqrt(2.0 / hidden)
        self.w1 = Parameter(rng.randn(input_dim, hidden) * s1, name="w1")
        self.b1 = Parameter(np.zeros(hidden), name="b1")
        self.w2 = Parameter(rng.randn(hidden, feature_dim) * s2, name="w2")
        self.b2 = Parameter(np.zeros(feature_dim), name="b2")
        self.base_kernel = base_kernel

    def mlp(self, X: TensorType) -> jax.Array:
        h = jnp.tanh(jnp.asarray(X) @ self.w1.value + self.b1.value)
        return h @ self.w2.value + self.b2.value

    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        F = self.mlp(X)
        F2 = None if X2 is None else self.mlp(X2)
        return self.base_kernel.K(F, F2)

    def K_diag(self, X: TensorType) -> jax.Array:
        return self.base_kernel.K_diag(self.mlp(X))


class FeatureSpaceInducingPoints(InducingPoints):
    """Z lives in MLP-output space, not input space."""


@Kuu.register(FeatureSpaceInducingPoints, KernelWithMLP)
def Kuu_feature_space(iv, kernel, jitter=0.0):
    # Z is already in feature space - delegate to the base kernel
    f = Kuu.registered_fn(InducingPoints, Kernel)
    return f(iv, kernel.base_kernel, jitter=jitter)


@Kuf.register(FeatureSpaceInducingPoints, KernelWithMLP, TensorLike)
def Kuf_feature_space(iv, kernel, X):
    return kernel.base_kernel.K(iv.Z.value, kernel.mlp(X))


def make_data(n: int = 200):
    """Two interleaved half-circles (two-moons), not linearly separable."""
    rng = np.random.RandomState(1)
    t = rng.rand(n // 2) * np.pi
    x0 = np.stack([np.cos(t), np.sin(t)], -1) + 0.1 * rng.randn(n // 2, 2)
    x1 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], -1) + 0.1 * rng.randn(n // 2, 2)
    X = np.concatenate([x0, x1]).astype(float)
    Y = np.concatenate([np.zeros((n // 2, 1)), np.ones((n // 2, 1))])
    return X, Y


def main() -> None:
    X, Y = make_data()
    N = len(X)
    feature_dim = 2

    kernel = KernelWithMLP(2, 16, feature_dim, gpf.kernels.SquaredExponential())
    # init Z from the UNTRAINED network's features over a data subset
    Z0 = np.asarray(kernel.mlp(X[:: N // 20]))
    iv = FeatureSpaceInducingPoints(Z0)

    model = gpf.models.SVGP(
        kernel=kernel,
        likelihood=gpf.likelihoods.Bernoulli(),
        inducing_variable=iv,
        num_data=N,
    )

    gpf.utilities.training_loop(
        model.training_loss_closure((X, Y)),
        var_list=model.trainable_parameters,
        maxiter=STEPS,
        learning_rate=0.01,
        compile=True,
    )
    print(f"ELBO after {STEPS} Adam steps: {-float(model.training_loss((X, Y))):.2f}")

    p, _ = model.predict_y(X)
    acc = float(np.mean((np.asarray(p) > 0.5) == (Y > 0.5)))
    print("train accuracy:", acc)
    if STEPS >= 400:
        assert acc > 0.9


if __name__ == "__main__":
    main()
