"""Real-TPU float32 smoke sweep: every model family's training loss AND
gradients must be finite at moderate scale (N=2048, M=256), plus prediction
paths. Run on the TPU host:

    cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/tools/tpu_smoke.py

All lines must end in OK. This is the fast end-to-end check that the f32
numerics guards (dtype-aware jitter, precision pinning, PSD projections)
hold on real hardware — CPU tests cannot catch TPU-specific rounding.
"""
import os
import sys
os.environ.setdefault("GPFLOW_TPU_DISABLE_X64", "1")
os.environ.setdefault("GPFLOW_FLOAT", "float32")
import numpy as np, jax, jax.numpy as jnp
import gpflow_tpu as gpf
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import (GPR, SGPR, GPRFITC, VGP, VGPOpperArchambeau,
                               SVGP, CGLB, GPMC, SGPMC)

rng = np.random.RandomState(0)
N, D, M = 2048, 4, 256
X = rng.randn(N, D).astype(np.float32)
Y = (np.sin(X[:, :1]) + 0.1 * rng.randn(N, 1)).astype(np.float32)
Yb = (rng.rand(N, 1) < 0.5).astype(np.float32)
Z = X[rng.choice(N, M, replace=False)].copy()
k = lambda: kernels.SquaredExponential(lengthscales=np.ones(D, np.float32))

Ns = 512  # smaller N for O(N^2)/O(N^3) models
Xs, Ys, Ybs = X[:Ns], Y[:Ns], Yb[:Ns]

_FAILURES = []


def check(name, model, batch=None):
    try:
        loss_fn = (lambda: model.training_loss(batch)) if batch is not None else model.training_loss
        params = list(model.trainable_parameters)
        def f(unc):
            old = [p._unconstrained for p in params]
            try:
                for p, u in zip(params, unc):
                    p._unconstrained = u
                return loss_fn()
            finally:
                for p, o in zip(params, old):
                    p._unconstrained = o
        unc = tuple(p._unconstrained for p in params)
        loss, grads = jax.jit(jax.value_and_grad(f))(unc)
        ok = np.isfinite(float(loss)) and all(bool(jnp.isfinite(g).all()) for g in grads)
        print(f"{name:>22}: loss={float(loss):14.2f} finite={'OK' if ok else '*** FAIL ***'}")
        if not ok:
            _FAILURES.append(name)
    except Exception as e:
        print(f"{name:>22}: EXCEPTION {type(e).__name__}: {e}")
        _FAILURES.append(name)

check("GPR", GPR((Xs, Ys), kernel=k()))
check("SGPR", SGPR((X, Y), kernel=k(), inducing_variable=Z.copy()))
check("GPRFITC", GPRFITC((X, Y), kernel=k(), inducing_variable=Z.copy()))
check("VGP gaussian", VGP((Xs, Ys), kernel=k(), likelihood=likelihoods.Gaussian(0.1)))
check("VGP bernoulli", VGP((Xs, Ybs), kernel=k(), likelihood=likelihoods.Bernoulli()))
check("VGPOpperArchambeau", VGPOpperArchambeau((Xs, Ybs), kernel=k(), likelihood=likelihoods.Bernoulli()))
check("SVGP gaussian", SVGP(kernel=k(), likelihood=likelihoods.Gaussian(0.1), inducing_variable=Z.copy(), num_data=N), batch=(X, Y))
check("SVGP bernoulli", SVGP(kernel=k(), likelihood=likelihoods.Bernoulli(), inducing_variable=Z.copy(), num_data=N), batch=(X, Yb))
check("SVGP studentt", SVGP(kernel=k(), likelihood=likelihoods.StudentT(), inducing_variable=Z.copy(), num_data=N), batch=(X, Y))
check("SVGP poisson", SVGP(kernel=k(), likelihood=likelihoods.Poisson(), inducing_variable=Z.copy(), num_data=N), batch=(X, np.abs(np.round(Y*3)).astype(np.float32)))
check("SVGP ordinal", SVGP(kernel=k(), likelihood=likelihoods.Ordinal(np.array([-0.5, 0.5], np.float32)), inducing_variable=Z.copy(), num_data=N), batch=(X, np.clip(np.round(Y+1), 0, 2).astype(np.float32)))
check("SVGP beta", SVGP(kernel=k(), likelihood=likelihoods.Beta(), inducing_variable=Z.copy(), num_data=N), batch=(X, np.clip(np.abs(Y), 0.05, 0.95).astype(np.float32)))
check("CGLB", CGLB((X, Y), kernel=k(), inducing_variable=Z.copy(), cg_tolerance=1.0, max_cg_iters=20))
check("CGLB matrix-free", CGLB((X, Y), kernel=k(), inducing_variable=Z.copy(), cg_tolerance=1.0, max_cg_iters=20, matrix_free_chunk=512))
check("GPMC", GPMC((Xs, Ybs), kernel=k(), likelihood=likelihoods.Bernoulli()))
check("SGPMC", SGPMC((X, Yb), kernel=k(), likelihood=likelihoods.Bernoulli(), inducing_variable=Z.copy()))


# prediction paths
Xt = rng.randn(512, D).astype(np.float32)
for name, m in {
    "GPR": GPR((Xs, Ys), kernel=k()),
    "SGPR": SGPR((X, Y), kernel=k(), inducing_variable=Z.copy()),
    "SVGP": SVGP(kernel=k(), likelihood=likelihoods.Gaussian(0.1), inducing_variable=Z.copy(), num_data=N),
}.items():
    fm, fv = jax.jit(lambda xt, m=m: m.predict_f(xt))(Xt)
    ok = bool(jnp.isfinite(fm).all() and jnp.isfinite(fv).all() and (fv > 0).all())
    print(f"{name + ' predict':>22}: fvar_min={float(jnp.min(fv)):.3e} finite={'OK' if ok else '*** FAIL ***'}")
    if not ok:
        _FAILURES.append(name + " predict")


# --- multioutput, sampling, uncertain inputs, HMC ---
P, L = 2, 2
Xmo = X[:1024]; Ymo = (np.sin(Xmo[:, :2]) + 0.1 * rng.randn(1024, P)).astype(np.float32)
from gpflow_tpu.kernels import SharedIndependent, SeparateIndependent, LinearCoregionalization
from gpflow_tpu.inducing_variables import (
    SharedIndependentInducingVariables, SeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables, InducingPoints)


def check_mo(name, model, batch):
    params = list(model.trainable_parameters)
    def f(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return model.training_loss(batch)
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o
    loss, grads = jax.jit(jax.value_and_grad(f))(tuple(p._unconstrained for p in params))
    ok = np.isfinite(float(loss)) and all(bool(jnp.isfinite(g).all()) for g in grads)
    fm, fv = jax.jit(lambda xt: model.predict_f(xt))(Xmo[:256])
    okp = bool(jnp.isfinite(fm).all() and jnp.isfinite(fv).all())
    print(f"{name:>28}: loss={float(loss):12.2f} grads={'OK' if ok else 'FAIL'} predict={'OK' if okp else 'FAIL'}")
    if not (ok and okp):
        _FAILURES.append(name)

check_mo("SVGP SharedIndependent",
      SVGP(kernel=SharedIndependent(k(), output_dim=P),
           likelihood=likelihoods.Gaussian(0.1),
           inducing_variable=SharedIndependentInducingVariables(InducingPoints(Z.copy())),
           num_data=1024, num_latent_gps=P), (Xmo, Ymo))
check_mo("SVGP SeparateIndependent",
      SVGP(kernel=SeparateIndependent([k() for _ in range(P)]),
           likelihood=likelihoods.Gaussian(0.1),
           inducing_variable=SeparateIndependentInducingVariables([InducingPoints(Z.copy()) for _ in range(P)]),
           num_data=1024, num_latent_gps=P), (Xmo, Ymo))
W = rng.randn(P, L).astype(np.float32)
W2 = rng.randn(P, L).astype(np.float32)
check_mo("SVGP LinearCoregionalization",
      SVGP(kernel=LinearCoregionalization([k() for _ in range(L)], W=W),
           likelihood=likelihoods.Gaussian(0.1),
           inducing_variable=SeparateIndependentInducingVariables([InducingPoints(Z.copy()) for _ in range(L)]),
           num_data=1024, num_latent_gps=L), (Xmo, Ymo))
# NOTE: Fallback IVs pair with IndependentLatent kernels (reference parity:
# (SharedIndependent, FallbackShared) is unregistered in the reference too)
check_mo("SVGP FallbackShared+LinCoreg",
      SVGP(kernel=LinearCoregionalization([k() for _ in range(L)], W=W2),
           likelihood=likelihoods.Gaussian(0.1),
           inducing_variable=FallbackSharedIndependentInducingVariables(InducingPoints(Z.copy())),
           num_data=1024, num_latent_gps=L), (Xmo, Ymo))

# sampling + uncertain conditional + HMC
m = SVGP(kernel=k(), likelihood=likelihoods.Gaussian(0.1), inducing_variable=Z.copy(), num_data=1024)
s = m.predict_f_samples(X[:64], num_samples=5)
_samples_ok = bool(jnp.isfinite(s).all())
print("predict_f_samples finite:", _samples_ok, s.shape)
if not _samples_ok:
    _FAILURES.append("predict_f_samples")

from gpflow_tpu.conditionals import uncertain_conditional
Xmu = X[:64]
Xvar = jnp.broadcast_to(0.05 * jnp.eye(D, dtype=jnp.float32), (64, D, D))
um, uv = uncertain_conditional(Xmu, Xvar, m.inducing_variable, m.kernel,
                               m.q_mu.value, m.q_sqrt.value, mean_function=None,
                               full_output_cov=False, white=True)
_uc_ok = bool(jnp.isfinite(um).all() and jnp.isfinite(uv).all())
print("uncertain_conditional finite:", _uc_ok)
if not _uc_ok:
    _FAILURES.append("uncertain_conditional")

from gpflow_tpu.optimizers import SamplingHelper, run_hmc
gm = GPMC((X[:256], (rng.rand(256,1)<0.5).astype(np.float32)), kernel=k(), likelihood=likelihoods.Bernoulli())
gm.kernel.variance.prior = gpf.priors.LogNormal(0.0, 1.0)
gm.kernel.lengthscales.prior = gpf.priors.LogNormal(-1.0, 1.0)
helper = SamplingHelper(gm.log_posterior_density, gm.trainable_parameters)
samples, logps = run_hmc(helper.target_log_prob_fn, helper.current_state,
                         num_samples=20, num_burnin_steps=10,
                         step_size=0.01, num_leapfrog_steps=5)
_hmc_ok = all(bool(jnp.isfinite(si).all()) for si in samples) and bool(
    jnp.isfinite(logps).all()
)
print("HMC samples finite:", _hmc_ok)
if not _hmc_ok:
    _FAILURES.append("hmc")

if _FAILURES:
    print("SMOKE FAILURES:", _FAILURES)
    sys.exit(1)
print("TPU SMOKE: ALL OK")
