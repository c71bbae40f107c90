"""Capture a jax.profiler trace of the flagship SVGP step (VERDICT r3 #1).

Runs the exact bench.py flagship config (N=1e6, M=2048, B=8192, D=8, f32,
Adam on everything), warms up the donated-layout recompile, then traces ONE
50-step `run_steps` dispatch. The resulting .xplane.pb is parsed by
tools/parse_xplane.py into an op-level device-time table.

Usage: python tools/profile_svgp.py [trace_dir]
"""
import os
import sys
import time

os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
os.environ.setdefault("GPFLOW_TPU_FAST_MATMUL", "1")
os.environ.setdefault("GPFLOW_TPU_INV_SOLVE", "1")

import numpy as np

N, M, D, B = 1_000_000, 2048, 8, 8192


def main() -> None:
    import jax
    import optax

    from gpflow_tpu import kernels, likelihoods
    from gpflow_tpu.models import SVGP
    from gpflow_tpu.parallel import DataParallelTrainer, make_mesh
    from gpflow_tpu.utilities.profiling import profile

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/svgp_trace"

    rng = np.random.RandomState(0)
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
    trainer = DataParallelTrainer(model, optimizer=optax.adam(1e-2), mesh=make_mesh())

    timed_steps = 50

    def stacked(lo: int, k: int):
        xs = np.stack([X[(i * B) % (N - B) : (i * B) % (N - B) + B] for i in range(lo, lo + k)])
        ys = np.stack([Y[(i * B) % (N - B) : (i * B) % (N - B) + B] for i in range(lo, lo + k)])
        return xs, ys

    staged = [trainer.shard_stacked(stacked((r + 1) * timed_steps, timed_steps)) for r in range(3)]
    for s in staged:
        s[0].block_until_ready()

    for r in range(2):  # two warm-up dispatches (donated-layout recompile)
        losses = trainer.run_steps(staged[r], presharded=True)
        float(np.asarray(losses)[-1])

    t0 = time.perf_counter()
    with profile(trace_dir):
        losses = trainer.run_steps(staged[2], presharded=True)
        float(np.asarray(losses)[-1])
    dt = time.perf_counter() - t0
    print(f"traced dispatch: {dt*1e3:.1f} ms for {timed_steps} steps "
          f"= {timed_steps/dt:.1f} steps/s (incl. trace overhead)")
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
