"""Scaling to large datasets: minibatch SVGP trained data-parallel over a
device mesh (mirrors the reference's large_data notebook, TPU-native:
batch dimension sharded, [M, M] inducing state replicated, K optimizer steps
per device dispatch via lax.scan)."""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.parallel import DataParallelTrainer, make_mesh

N = reduce_in_tests(100_000, 2_000)
M = reduce_in_tests(256, 16)
B = reduce_in_tests(1024, 128)
CHUNKS = reduce_in_tests(10, 2)
K = reduce_in_tests(20, 3)  # steps per device dispatch


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, 4).astype(np.float64) * 4
    w = rng.randn(4, 1)
    Y = np.sin(X @ w) + 0.1 * rng.randn(N, 1)

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(lengthscales=np.ones(4)),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=X[rng.choice(N, M, replace=False)].copy(),
        num_data=N,
    )

    trainer = DataParallelTrainer(model, optimizer=optax.adam(1e-2), mesh=make_mesh())

    def stacked(lo: int):
        idx = [((lo + i) * B) % (N - B) for i in range(K)]
        xs = np.stack([X[j : j + B] for j in idx])
        ys = np.stack([Y[j : j + B] for j in idx])
        return xs, ys

    first = last = None
    for c in range(CHUNKS):
        losses = trainer.run_steps(stacked(c * K))
        if first is None:
            first = float(np.asarray(losses)[0])
        last = float(np.asarray(losses)[-1])
    trainer.finalize()
    print(f"loss {first:.1f} -> {last:.1f} over {CHUNKS * K} steps")
    assert last < first


if __name__ == "__main__":
    main()
