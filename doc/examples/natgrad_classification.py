"""Natural gradients + Adam for non-conjugate (classification) SVGP, sharded.

The canonical recipe (reference's natural_gradients notebook): a natural-
gradient step on the variational parameters (q_mu, q_sqrt) per iteration,
with Adam handling kernel hyperparameters and inducing locations. TPU-native
twist: ``DataParallelTrainer(natgrad_gamma=...)`` runs BOTH updates inside one
jit-compiled sharded program, so the whole loop is still K steps per device
dispatch. Non-finite natgrad steps (stochastic cone exits) are rejected
in-graph instead of NaN-ing the run.
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
