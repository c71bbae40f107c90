"""Headline benchmark: SVGP ELBO optimization steps/sec at N=1e6, M=2048
(BASELINE.json north star).

Runs the full data-parallel SVGP training step (Adam on all parameters —
hyperparameters, inducing locations, and variational q_mu/q_sqrt) on minibatches
of B=8192 drawn from a synthetic N=1e6 dataset, M=2048 inducing points, D=8.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by an *estimated* 10 steps/sec for GPflow-on-A100 at
this configuration — GPflow publishes no benchmark numbers (BASELINE.md), so
this estimate is documented, not measured.

Precision: runs in float32 — the TPU-native choice (the MXU has no f64
hardware; f64 parity is validated separately in the test suite on CPU).
"""
import json
import os
import sys
import time

os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
# Mixed precision: the Pallas covariance kernel pins full f32 precision on the
# cancellation-critical pairwise distances; the remaining wide solves/matmuls
# run at the MXU's fast (bf16-input) mode. Validated NaN-free over long runs;
# remove this to force full-precision matmuls everywhere.
os.environ.setdefault("GPFLOW_TPU_FAST_MATMUL", "1")
# Replace the wide [M, B] triangular solves in the conditional with one
# [M, M] inversion + MXU matmuls (GPFLOW_TPU_INV_SOLVE): 1.6x at this config.
# Validated: identical 400-step loss trajectory to the solve path (within
# 0.2%) and the full f64 correctness suites pass with the flag on.
os.environ.setdefault("GPFLOW_TPU_INV_SOLVE", "1")

import numpy as np


def main() -> None:
    import jax
    import optax

    import gpflow_tpu
    from gpflow_tpu import kernels, likelihoods
    from gpflow_tpu.config import set_default_float, set_default_jitter
    from gpflow_tpu.models import SVGP
    from gpflow_tpu.parallel import DataParallelTrainer, make_mesh

    set_default_float(np.float32)
    set_default_jitter(1e-4)  # f32-appropriate jitter (1e-6 is the f64 default)

    N = 1_000_000
    M = 2048
    D = 8
    B = 8192
    warmup_steps = 3
    timed_steps = 50

    rng = np.random.RandomState(0)
    # synthetic regression task; data generated in chunks to bound host memory
    X = rng.rand(N, D).astype(np.float32) * 4.0
    w = rng.randn(D, 1).astype(np.float32)
    Y = np.sin(X @ w) + 0.1 * rng.randn(N, 1).astype(np.float32)

    Z = X[rng.choice(N, M, replace=False)].copy()
    model = SVGP(
        kernel=kernels.SquaredExponential(lengthscales=np.ones(D, np.float32)),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=Z,
        num_data=N,
    )

    mesh = make_mesh()
    trainer = DataParallelTrainer(model, optimizer=optax.adam(1e-2), mesh=mesh)

    def batch(i: int):
        lo = (i * B) % (N - B)
        return X[lo : lo + B], Y[lo : lo + B]

    def stacked(lo: int, k: int):
        xs = np.stack([X[(i * B) % (N - B) : (i * B) % (N - B) + B] for i in range(lo, lo + k)])
        ys = np.stack([Y[(i * B) % (N - B) : (i * B) % (N - B) + B] for i in range(lo, lo + k)])
        return xs, ys

    # pre-stage the timed batches on device (models a prefetched input
    # pipeline, the standard assumption for steps/sec training benchmarks;
    # the tunnel's per-RPC transfer latency otherwise dominates)
    reps = 4
    staged = [
        trainer.shard_stacked(stacked((r + 1) * timed_steps, timed_steps))
        for r in range(reps + 1)
    ]
    for s in staged:
        s[0].block_until_ready()

    # warmup / compile with TWO presharded staged dispatches — the exact
    # call signature the timed region uses. Two, not one: the first call
    # compiles, but its donated outputs (params/opt_state) can come back
    # with different XLA layouts than the initial inputs, so the SECOND
    # call triggers one more compile; from the third call on the
    # executable is stable (measured: 17.7s / 15.0s / 0.27s / 0.27s ...)
    for _ in range(2):
        losses = trainer.run_steps(staged[reps], presharded=True)
        float(np.asarray(losses)[-1])

    t0 = time.perf_counter()
    for r in range(reps):
        losses = trainer.run_steps(staged[r], presharded=True)
    final_loss = float(np.asarray(losses)[-1])  # forces host sync
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"training diverged: loss={final_loss}"

    steps_per_sec = reps * timed_steps / elapsed
    estimated_gpflow_a100_steps_per_sec = 10.0
    result = {
        "metric": "svgp_elbo_steps_per_sec_N1e6_M2048_B8192_f32",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / estimated_gpflow_a100_steps_per_sec, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
