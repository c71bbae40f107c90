"""Batch-size scaling of the flagship SVGP step (PERFORMANCE.md).

The round-5 per-op roofline shows the step at its combined MXU+HBM+latency
floor at the north-star config (M=2048, B=8192): the [M, M] work
(cholesky + triangular inverse + chol VJP, ~0.95 ms) and the ~0.6 ms
sub-0.02 ms dispatch tail are batch-independent, so the honest lever for
throughput/MFU is amortizing them over a larger B. This probe measures
steps/s and MFU across B at fixed M on one chip — the committed table
backs PERFORMANCE.md's "the honest lever is batch size" claim with
numbers.

Usage (quiet chip):   python tools/batch_scaling.py [--batches 4096 8192 16384 32768]
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
os.environ.setdefault("GPFLOW_TPU_FAST_MATMUL", "1")
os.environ.setdefault("GPFLOW_TPU_INV_SOLVE", "1")

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the single source of truth for the FLOP model and chip peak — a fix to
# bench.py's accounting must not silently leave this table on an old model
from bench import _bf16_peak_flops, _svgp_step_flops as step_flops

M, D = 2048, 8
N = 1_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import jax
    import optax

    from gpflow_tpu import kernels, likelihoods
    from gpflow_tpu.models import SVGP
    from gpflow_tpu.parallel import DataParallelTrainer, make_mesh

    peak = _bf16_peak_flops()
    rng = np.random.RandomState(0)
    X = rng.rand(N, D).astype(np.float32) * 4.0
    w = rng.randn(D, 1).astype(np.float32)
    Y = np.sin(X @ w) + 0.1 * rng.randn(N, 1).astype(np.float32)
    Z = X[rng.choice(N, M, replace=False)].copy()

    rows = []
    for B in args.batches:
        model = SVGP(
            kernel=kernels.SquaredExponential(lengthscales=np.ones(D, np.float32)),
            likelihood=likelihoods.Gaussian(0.1),
            inducing_variable=Z.copy(),
            num_data=N,
        )
        trainer = DataParallelTrainer(model, optimizer=optax.adam(1e-2),
                                      mesh=make_mesh())
        k = args.steps

        def stacked(lo: int):
            idx = [((lo + i) * B) % (N - B) for i in range(k)]
            return (np.stack([X[j : j + B] for j in idx]),
                    np.stack([Y[j : j + B] for j in idx]))

        staged = [trainer.shard_stacked(stacked(r * k)) for r in range(3)]
        for s in staged:
            s[0].block_until_ready()
        for _ in range(2):  # compile + relayout warmup (PERFORMANCE.md)
            losses = trainer.run_steps(staged[2], presharded=True)
            float(np.asarray(losses)[-1])
        t0 = time.perf_counter()
        for r in range(2):
            losses = trainer.run_steps(staged[r], presharded=True)
        final = float(np.asarray(losses)[-1])
        dt = time.perf_counter() - t0
        assert np.isfinite(final)
        sps = 2 * k / dt
        flops = step_flops(M, B, D)
        row = {
            "B": B,
            "steps_per_sec": round(sps, 1),
            "ms_per_step": round(1000 / sps, 3),
            "points_per_sec": round(sps * B),
            "mfu": round(sps * flops / peak, 4) if peak else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        trainer.finalize()

    print("\n| B | ms/step | steps/s | points/s | MFU |")
    print("|---:|---:|---:|---:|---:|")
    for r in rows:
        print(f"| {r['B']} | {r['ms_per_step']} | {r['steps_per_sec']} | "
              f"{r['points_per_sec']:.2e} | {r['mfu']} |")


if __name__ == "__main__":
    main()
