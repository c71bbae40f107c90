"""Fully Bayesian inference with MCMC: GPMC + the built-in HMC sampler.

Mirrors the reference's ``mcmc`` notebook.

What GPMC samples, and why it is whitened
-----------------------------------------
Variational models (VGP/SVGP) fit ONE Gaussian q and point-estimate the
hyperparameters. GPMC instead samples the full joint posterior
p(f, theta | y) for a non-Gaussian likelihood — the gold standard when you
need hyperparameter uncertainty or the posterior is non-Gaussian enough
that a Gaussian q misrepresents it.

Sampling f directly mixes terribly: its prior covariance K couples all N
values, so the sampler would need K-aware step sizes. GPMC therefore
parameterises the WHITENED vector v ~ N(0, I) with f = L v + m(X), where
L L^T = K (models/gpmc.py). The prior on v is isotropic — HMC's single
step size fits every direction — and kernel hyperparameters can move
without invalidating the current v (the classic "whitening"
reparameterisation for GP samplers).

How the pieces map to code
--------------------------
* Every sampled hyperparameter needs a PRIOR (set below); unconstrained
  sampling applies the log-Jacobian correction of each parameter's
  transform automatically (SamplingHelper wraps log_posterior_density).
* run_hmc (optimizers/mcmc.py) is a lax.scan'd leapfrog HMC — the whole
  chain is ONE compiled program on the accelerator. Burn-in uses
  dual-averaging step-size adaptation (the role the reference fills with
  tfp.mcmc.SimpleStepSizeAdaptation).
* Correctness oracle: on a CONJUGATE problem the sampled posterior must
  match the analytic GPR posterior — tests/gpflow_tpu/optimizers/ pins
  exactly that (mean/variance of the chain vs closed form).

Reading the output: each constrained chain below is the marginal posterior
of one hyperparameter; wide spreads are the point of the exercise — they
are what the variational point estimate throws away. For predictions,
average model.predict_y over MANY samples (here we use the last sample
only, to keep the example fast).
"""
import jax
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests
from gpflow_tpu.optimizers import SamplingHelper
from gpflow_tpu.optimizers.mcmc import run_hmc

NUM_SAMPLES = reduce_in_tests(200, 20)
BURNIN = reduce_in_tests(200, 20)


def main() -> None:
    rng = np.random.RandomState(0)
    N = 80
    X = rng.rand(N, 1) * 4
    Y = (np.sin(3 * X) > 0.0).astype(float)

    model = gpf.models.GPMC(
        (X, Y),
        kernel=gpf.kernels.Matern32(),
        likelihood=gpf.likelihoods.Bernoulli(),
    )
    # every sampled parameter needs a prior
    model.kernel.variance.prior = gpf.priors.LogNormal(0.0, 1.0)
    model.kernel.lengthscales.prior = gpf.priors.LogNormal(-1.0, 1.0)

    helper = SamplingHelper(model.log_posterior_density, model.trainable_parameters)
    samples, log_probs = run_hmc(
        helper.target_log_prob_fn,
        helper.current_state,
        num_samples=NUM_SAMPLES,
        num_burnin_steps=BURNIN,
        step_size=0.03,
        num_leapfrog_steps=8,
        # dual-averaging step-size adaptation during burn-in — the analog of
        # the reference notebook's tfp.mcmc.SimpleStepSizeAdaptation
        adapt_step_size=True,
        key=jax.random.PRNGKey(42),
    )
    constrained = helper.convert_to_constrained_values(samples)
    names = [p.name for p in model.trainable_parameters]
    for name, chain in zip(names, constrained):
        arr = np.asarray(chain)
        if arr.ndim == 1:
            print(f"{name}: posterior mean {arr.mean():.3f} +- {arr.std():.3f}")
    print("final log posterior:", float(np.asarray(log_probs)[-1]))

    # posterior predictive from the last sample
    helper.assign_values([s[-1] for s in samples])
    pmean, _ = model.predict_y(X)
    acc = float(np.mean((np.asarray(pmean)[:, 0] > 0.5) == (Y[:, 0] > 0.5)))
    print("posterior-sample accuracy:", acc)


if __name__ == "__main__":
    main()
