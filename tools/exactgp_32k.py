"""Exact-GP-bound training at N=32k without an [N, N] matrix: matrix-free
CGLB convergence run on the attached TPU chip (VERDICT r4 #5 tail).

At N=32768 a dense f32 kernel matrix is 4.3 GiB and its NLML pullback
needs several more [N, N] temporaries — the dense GPR path stops being the
right tool past ~16k on a 16 GiB chip. The TPU-native route is CGLB with
``matrix_free_chunk``: every K-matvec (CG, the quadratic bound, prediction
residuals) streams [N, chunk] kernel blocks through the MXU with
``jax.checkpoint`` rematerialization in the backward, so training memory is
O(N*chunk + M^2) while the objective stays an exact-GP *bound* that
tightens to the true NLML as CG converges (reference ``cglb.py:30-282``;
Artemev et al. 2021).

Usage (quiet chip):   python tools/exactgp_32k.py [--n 32768] [--maxiter 40]

Prints a JSON summary and a markdown row for PERFORMANCE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
os.environ.setdefault("GPFLOW_TPU_INV_SOLVE", "1")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--m", type=int, default=1024, help="inducing points")
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--maxiter", type=int, default=40)
    ap.add_argument("--max-cg", type=int, default=100)
    # CG on (K + s2 I) with condition number ~ var/s2 is where raw-bf16
    # matvecs break first: the first 32k probe at the "1" tier let L-BFGS
    # drive s2 to its floor, after which the f32 bound evaluation returned
    # garbage (+1e11 "lower bound" > the LML, mathematically impossible).
    # bf16x3 is the measured-safe default here (same story as natgrad,
    # PERFORMANCE.md precision tiers).
    ap.add_argument("--fast", default="high", choices=["0", "1", "high"])
    # f32 likelihood floor: condition of (K + s2 I) is ~ var/s2; 1e-4 caps
    # it at ~1e4, comfortably inside f32 CG territory (true noise is 1e-2).
    ap.add_argument("--noise-floor", type=float, default=1e-4)
    args = ap.parse_args()
    # assign unconditionally: '--fast 0' must also OVERRIDE an inherited
    # GPFLOW_TPU_FAST_MATMUL from the shell, not silently keep it
    os.environ["GPFLOW_TPU_FAST_MATMUL"] = args.fast

    import jax

    from gpflow_tpu import kernels, likelihoods
    from gpflow_tpu.models import CGLB
    from gpflow_tpu.optimizers import Scipy

    print(f"devices: {jax.devices()}", flush=True)

    # Same synthetic recipe as bench.py's exact-GP workload, scaled up.
    rng = np.random.RandomState(1)
    X = rng.rand(args.n, args.d).astype(np.float32)
    Y = np.sin(X[:, :1] * 3).astype(np.float32) + 0.1 * rng.randn(args.n, 1).astype(
        np.float32
    )
    Xt = rng.rand(2048, args.d).astype(np.float32)
    Yt = np.sin(Xt[:, :1] * 3).astype(np.float32) + 0.1 * rng.randn(2048, 1).astype(
        np.float32
    )
    Z = X[rng.permutation(args.n)[: args.m]].copy()

    model = CGLB(
        (X, Y),
        kernel=kernels.SquaredExponential(lengthscales=np.ones(args.d, np.float32)),
        inducing_variable=Z,
        likelihood=likelihoods.Gaussian(
            0.1, variance_lower_bound=args.noise_floor
        ),
        matrix_free_chunk=args.chunk,
        max_cg_iters=args.max_cg,
    )

    # --- single-evaluation timings (jitted, post-compile) ---------------
    loss = model.training_loss_closure(compile=True)
    t0 = time.perf_counter()
    v0 = float(loss())  # includes compile
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v0), f"objective non-finite: {v0}"
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        v = loss()
    float(v)
    obj_ms = 1000 * (time.perf_counter() - t0) / n_calls

    # --- L-BFGS convergence through the fused Scipy boundary ------------
    opt = Scipy()
    closure = model.training_loss_closure(compile=False)
    variables = model.trainable_variables
    opt.minimize(closure, variables, options={"maxiter": 0})  # compile only
    t0 = time.perf_counter()
    # nonfinite_penalty: at N=32k an aggressive line-search trial point can
    # round B = AA^T + I indefinite in f32 (Cholesky -> NaN); the guard
    # rejects the trial instead of letting L-BFGS-B abort ABNORMAL.
    res = opt.minimize(
        closure,
        variables,
        options={"maxiter": args.maxiter},
        nonfinite_penalty=1e15,
    )
    train_s = time.perf_counter() - t0

    # --- prediction quality on held-out data ----------------------------
    mu, var = model.predict_y(Xt)
    mu, var = np.asarray(mu), np.asarray(var)
    rmse = float(np.sqrt(np.mean((mu - Yt) ** 2)))
    nlpd = float(
        np.mean(0.5 * np.log(2 * np.pi * var) + 0.5 * (Yt - mu) ** 2 / var)
    )

    # Validity net: the CGLB objective is a LOWER bound on the evidence and
    # SGPR's Titsias-2014 upper_bound (inherited by CGLB) an UPPER bound —
    # at the trained hyperparameters the sandwich must close. The first 32k
    # probe (raw-bf16 CG matvecs, no noise floor) violated this by 7 orders
    # of magnitude; any precision regression here trips this assert.
    upper = float(model.upper_bound())

    out = {
        "n": args.n,
        "m": args.m,
        "chunk": args.chunk,
        "fast": args.fast,
        "upper_bound": round(upper, 1),
        "lbfgs_status": int(res.status),
        "lbfgs_message": str(res.message),
        "compile_s": round(compile_s, 1),
        "objective_ms": round(obj_ms, 1),
        "lbfgs_s": round(train_s, 1),
        "lbfgs_nit": int(res.nit),
        "lbfgs_nfev": int(res.nfev),
        "s_per_eval": round(train_s / max(res.nfev, 1), 3),
        "elbo0": round(-v0, 1),
        "elbo_final": round(-float(res.fun), 1),
        "test_rmse": round(rmse, 4),
        "test_nlpd": round(nlpd, 3),
        "noise_variance": round(float(model.likelihood.variance.value), 5),
    }
    print(json.dumps(out), flush=True)
    print(
        f"| {args.n} | {args.m} | {args.chunk} | {out['objective_ms']} ms | "
        f"{out['lbfgs_s']} s / {out['lbfgs_nit']} it ({out['s_per_eval']} s/eval) | "
        f"{out['elbo0']} -> {out['elbo_final']} | {out['test_rmse']} | "
        f"{out['test_nlpd']} |"
    )
    assert float(res.fun) < v0, "L-BFGS failed to improve the CGLB bound"
    assert out["elbo_final"] <= upper + 0.01 * abs(upper) + 1.0, (
        f"CGLB lower bound {out['elbo_final']} exceeds the Titsias upper "
        f"bound {upper}: the bound evaluation is numerically invalid"
    )


if __name__ == "__main__":
    main()
