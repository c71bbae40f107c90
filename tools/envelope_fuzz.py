"""Real-TPU assertions for the documented fast-path error envelopes
(VERDICT r3 #9): the GPFLOW_TPU_FAST_MATMUL precision tiers (CPU ignores
matmul precision hints, so these claims ONLY exist on the MXU), the
INV_SOLVE f32 envelope, and the f32 cached-Qinv conditioning ceiling.

Run via tests/tpu/test_tpu_envelopes.py, or directly:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/envelope_fuzz.py
Exits 0 when every claim holds.
"""
import os

os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")

import numpy as np


def check(name: str, ok: bool, detail: str) -> bool:
    print(f"{'OK ' if ok else 'FAIL'} {name}: {detail}")
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    failures = 0

    # ------------------------------------------------------------------
    # 1. FAST_MATMUL precision tiers at M=2048 (PERFORMANCE.md table):
    #    'high' (3-pass bf16) within ~1e-5 relative of 'highest';
    #    '1' (raw bf16 inputs) within ~1e-2 (bf16 has ~3 decimal digits).
    # ------------------------------------------------------------------
    M = 2048
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, M).astype(np.float32))
    b = jnp.asarray(rng.randn(M, M).astype(np.float32))

    def mm(precision):
        return jax.jit(lambda x, y: jnp.matmul(x, y, precision=precision))(a, b)

    exact = np.asarray(mm(jax.lax.Precision.HIGHEST), dtype=np.float64)
    scale = np.abs(exact) + np.sqrt(M)  # element scale for iid N(0,1) dots
    rel_high = float(np.max(np.abs(np.asarray(mm(jax.lax.Precision.HIGH)) - exact) / scale))
    rel_fast = float(np.max(np.abs(np.asarray(mm(jax.lax.Precision.DEFAULT)) - exact) / scale))
    # claims (PERFORMANCE.md precision-tier table): 'high' ~1e-5 TYPICAL
    # error — the MAX over 4M elements measures ~5e-5; bf16 ~1e-2 typical,
    # max ~2e-2. Asserted at the measured-max envelopes.
    rms_high = float(np.sqrt(np.mean(((np.asarray(mm(jax.lax.Precision.HIGH)) - exact) / scale) ** 2)))
    failures += not check("fast_matmul 'high' tier @ M=2048",
                          rel_high <= 1e-4 and rms_high <= 1e-5,
                          f"max rel err {rel_high:.2e} (<=1e-4), rms {rms_high:.2e} (<=1e-5)")
    failures += not check("fast_matmul '1' (bf16) tier @ M=2048",
                          rel_fast <= 3e-2, f"max rel err {rel_fast:.2e} (<= 3e-2)")
    failures += not check("tiers are ordered", rel_high < rel_fast,
                          f"high {rel_high:.2e} < bf16 {rel_fast:.2e}")

    # ------------------------------------------------------------------
    # 2. INV_SOLVE f32 envelope across a conditioning sweep: the inverse-
    #    based projection tracks the solve-based one within ~cond(K)*eps32.
    # ------------------------------------------------------------------
    from gpflow_tpu.conditionals.util import base_conditional, inv_solve

    eps32 = float(np.finfo(np.float32).eps)
    for cond in (1e2, 1e4, 1e5):
        m, n, r = 256, 1024, 1
        Q, _ = np.linalg.qr(rng.randn(m, m))
        eigs = np.logspace(0, -np.log10(cond), m)
        Kmm = jnp.asarray(((Q * eigs) @ Q.T).astype(np.float32))
        Kmn = jnp.asarray(rng.randn(m, n).astype(np.float32))
        Knn = jnp.asarray((np.abs(rng.randn(n)) + 1.0).astype(np.float32))
        f = jnp.asarray(rng.randn(m, r).astype(np.float32))
        with inv_solve(False):
            mean_s, var_s = jax.jit(
                lambda *t: base_conditional(*t))(Kmn, Kmm, Knn, f)
        with inv_solve(True):
            mean_i, var_i = jax.jit(
                lambda *t: base_conditional(*t))(Kmn, Kmm, Knn, f)
        env = cond * eps32 * 100
        dv = float(jnp.max(jnp.abs(var_i - var_s))) / (float(jnp.max(jnp.abs(var_s))) + 1.0)
        dm = float(jnp.max(jnp.abs(mean_i - mean_s))) / (float(jnp.max(jnp.abs(mean_s))) + 1.0)
        failures += not check(f"inv_solve f32 envelope @ cond {cond:.0e}",
                              dv <= env and dm <= env,
                              f"var rel {dv:.2e}, mean rel {dm:.2e} (env {env:.2e})")

    # ------------------------------------------------------------------
    # 3. f32 cached-Qinv ceiling: near the jitter-floor conditioning the
    #    cached variance may drift up to ~1e-3 vs fused (posteriors.py
    #    docstring) — assert the ceiling AND that a well-conditioned Kuu
    #    stays ~eps32-clean.
    # ------------------------------------------------------------------
    import gpflow_tpu
    from gpflow_tpu import kernels

    def posterior_err(spread: float):
        m = 64
        Z = np.linspace(0, spread, m)[:, None].astype(np.float32)
        X = (rng.rand(256, 1) * max(spread, 1.0)).astype(np.float32)
        model = gpflow_tpu.models.SVGP(
            kernel=kernels.SquaredExponential(),
            likelihood=gpflow_tpu.likelihoods.Gaussian(0.1),
            inducing_variable=Z, num_data=len(X),
        )
        model.q_mu.assign(rng.randn(m, 1).astype(np.float32) * 0.3)
        model.q_sqrt.assign(
            (np.tril(rng.randn(1, m, m)) * 0.05 + np.eye(m) * 0.3).astype(np.float32))
        from gpflow_tpu.covariances import Kuu

        K = np.asarray(Kuu(model.inducing_variable, model.kernel,
                           jitter=gpflow_tpu.default_jitter()), dtype=np.float64)
        cond = float(np.linalg.cond(K))
        posterior = model.posterior()
        _, var_c = posterior.predict_f(X)
        _, var_f = posterior.fused_predict_f(X)
        return cond, float(np.max(np.abs(np.asarray(var_c) - np.asarray(var_f))))

    # f32 at HIGHEST precision (the library default): the cached-vs-fused
    # variance delta follows the cond(Kuu)^2 * eps32 envelope — note that at
    # f32 even cond ~1e2 yields ~1e-3 ABSOLUTE drift (1e2^2 * 1.2e-7), which
    # is why accuracy-critical f32 serving should use fused_predict_f or f64
    # (posteriors.py module docstring).
    from gpflow_tpu.covariances import Kuu as Kuu_fn

    eps32 = float(np.finfo(np.float32).eps)
    sweep = []
    for spread in (200.0, 1.0, 0.05):
        cond, err = posterior_err(spread)
        env = 50.0 * max(cond, 1.0) ** 2 * eps32 + 1e-6
        sweep.append((cond, err, env))
        failures += not check(
            f"cached-Qinv f32 envelope @ cond {cond:.1e}",
            err <= min(env, 1e-2),
            f"err {err:.2e} (cond^2*eps32 envelope {env:.2e}, hard cap 1e-2)")
    conds = [c for c, _, _ in sweep]
    failures += not check(
        "cached-Qinv sweep coverage", max(conds) / max(min(conds), 1.0) > 1e2,
        f"cond range {min(conds):.1e}..{max(conds):.1e}")

    print(f"\n{'ALL ENVELOPES HOLD' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
