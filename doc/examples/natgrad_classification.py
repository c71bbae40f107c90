"""Natural gradients + Adam for non-conjugate (classification) SVGP, sharded.

Mirrors the reference's ``natural_gradients`` notebook. Read after
large_data.py.

Why natural gradients for (q_mu, q_sqrt)
----------------------------------------
The variational parameters of q(u) = N(q_mu, q_sqrt q_sqrt^T) parameterise
a DISTRIBUTION, and Euclidean gradient steps in (q_mu, q_sqrt) ignore that:
the same parameter step changes the distribution a lot where the variance
is small and barely at all where it is large, so plain Adam crawls on
exactly the parameters that matter most. The natural gradient
preconditions by the inverse Fisher information — a step of size gamma
moves the DISTRIBUTION by gamma, regardless of parameterisation.

Two classical facts the tests pin down
(tests/gpflow_tpu/test_natural_gradients.py):

* Conjugate (Gaussian) likelihood: ONE natgrad step with gamma=1 lands on
  the exact optimal q(u) — SVGP + natgrad reaches GPR/SGPR in one step.
* Non-conjugate (this example, Bernoulli): gamma ~ 0.1 with Adam on the
  hyperparameters converges in many fewer iterations than Adam-on-
  everything, because Adam never has to fight the variational geometry.

The implementation (optimizers/natgrad.py) computes the natural gradient
by a vjp through the expectation-parameter map plus a jvp through the
xi-transform — the JAX translation of the reference's nested forward/
backward GradientTape construction (Salimbeni et al. 2018, eq. 10).

The TPU twist
-------------
``DataParallelTrainer(natgrad_gamma=...)`` fuses the natgrad update on
(q_mu, q_sqrt) and the Adam update on everything else into ONE jitted,
sharded program — K steps per device dispatch, exactly like large_data.py.
Two robustness details are built in:

* A stochastic natgrad step can push the natural parameters out of the
  negative-definite cone (especially while Adam is simultaneously moving
  the kernel). The reference crashes there; this implementation REJECTS
  the step in-graph (branch-free jnp.where) and retries on the next batch
  — trainer.natgrad_rejections counts how often.
* In float32, run with GPFLOW_TPU_FAST_MATMUL unset or "high": raw-bf16
  matmuls corrupt the predictive-variance cancellation that quadrature
  likelihoods integrate over (PERFORMANCE.md precision tiers).

For maximum throughput there is also ``natgrad_fused=True`` — natgrad and
hyperparameter gradients from ONE shared backward pass (simultaneous
rather than sequential update; ~1.2-1.5x faster per step, same optimum).
"""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.parallel import DataParallelTrainer

N = reduce_in_tests(50_000, 1_000)
M = reduce_in_tests(256, 16)
B = reduce_in_tests(1024, 128)
CHUNKS = reduce_in_tests(8, 2)
K = reduce_in_tests(20, 3)  # steps per device dispatch


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.randn(N, 2)
    logit = np.sin(2 * X[:, :1]) + X[:, 1:2]
    Y = (rng.rand(N, 1) < 1 / (1 + np.exp(-logit))).astype(float)

    model = gpf.models.SVGP(
        kernel=gpf.kernels.Matern52(),
        likelihood=gpf.likelihoods.Bernoulli(),
        inducing_variable=X[rng.choice(N, M, replace=False)].copy(),
        num_data=N,
    )

    trainer = DataParallelTrainer(
        model,
        optimizer=optax.adam(1e-2),  # hyperparameters + inducing locations
        natgrad_gamma=0.1,  # natural-gradient step on (q_mu, q_sqrt)
    )

    first = last = None
    for c in range(CHUNKS):
        idx = rng.choice(N, (K, B))
        losses = np.asarray(trainer.run_steps((X[idx], Y[idx])))
        if first is None:
            first = float(losses[0])
        last = float(losses[-1])
        print(f"chunk {c}: loss {losses[0]:.1f} -> {losses[-1]:.1f}")

    trainer.finalize()  # write the trained parameters back into the model
    assert np.isfinite(last)
    print(f"ELBO improved: {first:.1f} -> {last:.1f}")
    print(gpf.utilities.print_summary(model, fmt="simple") or "")


if __name__ == "__main__":
    main()
