"""Fast predictions with cached posteriors (mirrors the reference's
fast_predictions notebook): ``model.posterior()`` precomputes (alpha, Qinv)
once, after which every prediction is matmul-only — measured ~7x faster than
the fused recompute-everything path on TPU (PERFORMANCE.md: 30M points/s at
M=2048).

What is cached and why it is enough
-----------------------------------
Every GP predictive mean/variance has the two-tensor form

    mean(x*) = K*u . alpha                 alpha  [M, C]
    var(x*)  = K** - K*u . Qinv . K*uT     Qinv   [C, M, M]

where only K*u depends on the test point. ``model.posterior()``
(``posteriors.py``) folds everything else — Kuu, its Cholesky, whitening,
q_sqrt — into (alpha, Qinv) once. After that, a prediction is two matmuls
feeding the MXU directly: no Cholesky, no triangular solve, nothing
O(M^3) on the serving path. The same abstraction covers every model
(GPR/SGPR/SVGP/VGP; ``get_posterior_class`` dispatch), which is why
``benchmark/`` times ``posterior_prediction_time`` separately from
``prediction_time``.

The PrecomputeCacheType enum controls the cache's lifecycle:
* ``TENSOR`` (used here, and the serving default): cache as concrete
  device arrays — fastest calls, but STALE after a parameter update;
  refresh explicitly with ``update_cache`` (demonstrated below).
* ``NOCACHE``: recompute inside every call — what ``model.predict_f``
  does; correct under parameter changes, used during training.
* ``VARIABLE``: cache in mutable buffers that in-place ``update_cache``
  refreshes without retracing jitted callers.

Serving note: ``utilities/serving.py`` exports exactly this cached
posterior as a StableHLO artifact with bucketed static shapes — the
30M points/s number in PERFORMANCE.md is this path, streamed.
"""
import time

import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.posteriors import PrecomputeCacheType

N = reduce_in_tests(2_000, 200)
M = reduce_in_tests(128, 16)
REPS = reduce_in_tests(50, 3)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(N, 2) * 4
    Y = np.sin(X @ np.array([[1.0], [0.5]])) + 0.1 * rng.randn(N, 1)

    model = gpf.models.SVGP(
        kernel=gpf.kernels.SquaredExponential(),
        likelihood=gpf.likelihoods.Gaussian(0.1),
        inducing_variable=X[rng.choice(N, M, replace=False)].copy(),
        num_data=N,
    )

    Xtest = rng.rand(1024, 2) * 4

    # fused: rebuilds Kuu, its Cholesky, and the projection every call
    t0 = time.perf_counter()
    for _ in range(REPS):
        mean_fused, var_fused = model.predict_f(Xtest)
    float(np.asarray(mean_fused).sum())
    fused_t = (time.perf_counter() - t0) / REPS

    # cached: precompute once, predict with matmuls only
    posterior = model.posterior(PrecomputeCacheType.TENSOR)
    posterior.predict_f(Xtest)  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        mean_cached, var_cached = posterior.predict_f(Xtest)
    float(np.asarray(mean_cached).sum())
    cached_t = (time.perf_counter() - t0) / REPS

    np.testing.assert_allclose(
        np.asarray(mean_cached), np.asarray(mean_fused), rtol=1e-5, atol=1e-7
    )
    print(f"fused:  {fused_t * 1e3:.2f} ms/call")
    print(f"cached: {cached_t * 1e3:.2f} ms/call")

    # after updating parameters, refresh the cache
    model.kernel.lengthscales.assign(model.kernel.lengthscales.numpy() * 1.1)
    posterior.update_cache(PrecomputeCacheType.TENSOR)
    posterior.predict_f(Xtest)
    print("cache refreshed after a parameter update")


if __name__ == "__main__":
    main()
