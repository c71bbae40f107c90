"""Coregionalized regression (mirrors the reference's coregionalisation
notebook): two correlated outputs observed at different inputs, modeled with
a Coregion kernel over an output-index column and a SwitchedLikelihood
holding one noise level per output.

The trick: outputs as an input column
-------------------------------------
Multi-output data where each output is observed at ITS OWN inputs does not
fit the [N, P] layout — here output 1 has N1 points on [0,1] and output 2
has N2 points on [0,0.5]. The intrinsic-coregionalization model flattens
everything into one augmented dataset:

    X_aug = [x, output_index],    Y_aug = [y, output_index]

and factorizes the kernel over the two columns:

    k((x,i), (x',j)) = k_base(x, x') * B[i, j],
    B = W W^T + diag(kappa)   (the Coregion kernel, rank-1 W here)

``active_dims`` does the routing: the Matern32 sees column 0 (the real
input), Coregion sees column 1 (the index), and the ``*`` composition
multiplies them. B is the learned between-output covariance — read the
correlation off its off-diagonal (printed below).

The index column on Y drives ``SwitchedLikelihood``: row n is scored by
likelihood ``Y[n, -1]``, giving each output its own noise parameter. (Our
Switched implementation evaluates every sub-likelihood on the full batch
with masked substitution instead of the reference's dynamic_partition —
jit needs static shapes; see ``likelihoods/base.py``.)

Why this beats two independent GPs: the outputs share statistical
strength. Output 2 is only observed on [0, 0.5], but because training
learns B[0,1] > 0, its predictions on (0.5, 1] are informed by output 1's
data there — that is what the final finite-prediction check gestures at.
For many outputs or shared inducing points, graduate to the multioutput
kernel framework (``doc/examples/multioutput.py``), which is the
MXU-batched generalization of this construction.
"""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

N1 = reduce_in_tests(60, 20)
N2 = reduce_in_tests(40, 15)
MAXITER = reduce_in_tests(200, 20)


def main() -> None:
    rng = np.random.RandomState(0)
    X1 = rng.rand(N1, 1)
    X2 = rng.rand(N2, 1) * 0.5
    Y1 = np.sin(6 * X1) + 0.1 * rng.randn(N1, 1)
    Y2 = np.sin(6 * X2 + 0.7) + 0.05 * rng.randn(N2, 1)

    # augment inputs/outputs with the output index as a trailing column
    X = np.vstack([np.hstack([X1, np.zeros_like(X1)]), np.hstack([X2, np.ones_like(X2)])])
    Y = np.vstack([np.hstack([Y1, np.zeros_like(Y1)]), np.hstack([Y2, np.ones_like(Y2)])])

    base = gpf.kernels.Matern32(active_dims=[0])
    coreg = gpf.kernels.Coregion(output_dim=2, rank=1, active_dims=[1])
    kernel = base * coreg
    likelihood = gpf.likelihoods.SwitchedLikelihood(
        [gpf.likelihoods.Gaussian(0.1), gpf.likelihoods.Gaussian(0.1)]
    )

    model = gpf.models.VGP((X, Y), kernel=kernel, likelihood=likelihood)
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )

    B = coreg.output_covariance()
    print("learned output covariance B = W W^T + diag(kappa):")
    print(np.asarray(B))
    # the two outputs are positively correlated by construction
    corr = float(B[0, 1] / np.sqrt(B[0, 0] * B[1, 1]))
    print(f"output correlation: {corr:.2f}")

    Xtest = np.hstack([np.linspace(0, 1, 50)[:, None], np.ones((50, 1))])
    mean, var = model.predict_f(Xtest)
    assert np.isfinite(np.asarray(mean)).all() and np.isfinite(np.asarray(var)).all()
    print("output-2 predictions finite over [0, 1] (trained only on [0, 0.5])")


if __name__ == "__main__":
    main()
