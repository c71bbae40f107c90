"""Scaling to large datasets: minibatch SVGP on a device mesh.

Mirrors the reference's ``large_data`` notebook, rebuilt TPU-native. Read
this after basic_usage.py and sparse_regression.py.

Why SVGP for large N
--------------------
GPR is O(N^3); SGPR collapses the variational posterior analytically but
still touches ALL N rows per objective evaluation. SVGP (Hensman et al.
2013) keeps the posterior over M inducing values as explicit parameters
(q_mu, q_sqrt) and pays only O(B M^2 + M^3) per MINIBATCH of size B:

    ELBO = (N/B) * sum_batch E_q[log p(y_n | f_n)] - KL[q(u) || p(u)]

The (N/B) rescaling makes the minibatch ELBO an unbiased estimate of the
full one — so Adam on random batches optimizes the true objective in
expectation (tested in tests/gpflow_tpu/models/test_svgp.py).

The TPU execution model (what DataParallelTrainer does)
-------------------------------------------------------
Three things make this fast on accelerators, and all three live behind
``DataParallelTrainer`` rather than in your script:

1. **Data parallelism over a mesh.** The batch dimension is sharded over
   ``make_mesh()`` (all local devices); parameters and the [M, M] inducing
   state are replicated. XLA inserts one gradient all-reduce per step —
   you never write a collective. The same script runs on 1 chip or a pod
   slice; only the mesh changes.
2. **K steps per dispatch.** Each host->device round trip costs ~ms (tens
   of ms on remote-attached chips). ``run_steps`` scans K optimizer steps
   inside ONE compiled program (lax.scan), so dispatch overhead amortizes
   to nothing. Only the per-step scalar losses come back to host.
3. **Donated buffers.** Parameters and optimizer state are donated between
   steps — they live on device permanently; nothing is re-uploaded.

For the production-shaped variant where even batch UPLOAD matters, see
``DataParallelTrainer.stage_data`` + ``run_steps_sampled``: the full
training set is placed on device once and minibatch indices are drawn
in-graph inside the scan (zero per-step host traffic; this is what
tools/flagship_run.py uses to train N=1e6 in ~100 s on one v5e chip).
"""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.parallel import DataParallelTrainer, make_mesh

N = reduce_in_tests(100_000, 2_000)
M = reduce_in_tests(256, 16)     # inducing points: capacity of the posterior
B = reduce_in_tests(1024, 128)   # minibatch size: variance/step-cost tradeoff
CHUNKS = reduce_in_tests(10, 2)
K = reduce_in_tests(20, 3)       # optimizer steps fused into one dispatch


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, 4).astype(np.float64) * 4
    w = rng.randn(4, 1)
    Y = np.sin(X @ w) + 0.1 * rng.randn(N, 1)

    # Initialize Z from a random data subset — k-means refinement helps for
    # clustered inputs but random is a fine start; Z is trained with
    # everything else (it is just another Parameter).
    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(lengthscales=np.ones(4)),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=X[rng.choice(N, M, replace=False)].copy(),
        num_data=N,  # REQUIRED for the unbiased (N/B) minibatch scaling
    )

    trainer = DataParallelTrainer(model, optimizer=optax.adam(1e-2), mesh=make_mesh())

    # Batches are fed STACKED: X [K, B, D], Y [K, B, P] — one upload per
    # dispatch, sliced per-step inside the scan. A real input pipeline would
    # prefetch the next stack while the current one trains
    # (trainer.shard_stacked places a stack on device ahead of time).
    def stacked(lo: int):
        idx = [((lo + i) * B) % (N - B) for i in range(K)]
        xs = np.stack([X[j : j + B] for j in idx])
        ys = np.stack([Y[j : j + B] for j in idx])
        return xs, ys

    first = last = None
    for c in range(CHUNKS):
        losses = trainer.run_steps(stacked(c * K))  # ONE device call, K steps
        if first is None:
            first = float(np.asarray(losses)[0])
        last = float(np.asarray(losses)[-1])
    # finalize() writes the trained (device-resident) values back into the
    # model object, so model.predict_f / posterior() see the trained state.
    trainer.finalize()
    print(f"loss {first:.1f} -> {last:.1f} over {CHUNKS * K} steps")
    assert last < first

    # Mid-training checkpoints of the SHARDED state (params + optimizer
    # moments) use trainer.save_state / load_state; they restore onto a
    # mesh with a different device count and continue loss-identically —
    # see monitoring_and_checkpoints.py.

    # What to tune, in order of impact:
    #   * M — posterior capacity; RMSE stops improving once M covers the
    #     function's effective degrees of freedom.
    #   * B — larger batches cut gradient variance and feed the MXU better;
    #     on TPU prefer B a multiple of 1024 at these shapes.
    #   * Gaussian likelihood + natgrad: for conjugate likelihoods,
    #     NaturalGradient with gamma=1 solves q(u) EXACTLY per batch —
    #     see natgrad_classification.py for the recipe.


if __name__ == "__main__":
    main()
