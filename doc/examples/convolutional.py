"""Convolutional GP classification on a synthetic image task (mirrors the
reference's convolutional notebook: van der Wilk et al. 2017).

The Convolutional kernel sums a base-kernel response over image patches;
InducingPatches live in patch space, so M inducing *patches* summarize all
patch positions of all images. Task: classify whether a bright square appears
in the upper-left or lower-right of a small image.

The construction, layer by layer (``kernels/convolutional.py``,
``covariances/kuus.py``/``kufs.py``):

* An image x is unrolled into its P overlapping patches
  x^[1..P] (here 4x4 = 16 patches of 3x3). The latent function is a sum
  of one shared patch-response function g over positions:
      f(x) = sum_p g(x^[p]),   g ~ GP(0, k_base)
  so k(x, x') = sum_{p,q} k_base(x^[p], x'^[q]) — translation structure
  with far fewer effective parameters than a generic kernel on R^36.
* ``InducingPatches`` Z live in PATCH space (R^9, not image space):
  Kuf[m, n] = sum_p k_base(z_m, x_n^[p]) — one inducing patch covaries
  with every position of every image. M patches therefore summarize
  N x P patch observations; the example's final check reads the learned
  patches back as 3x3 tiles.
* On TPU the patch extraction is one reshape/gather and the (M x NP)
  base-kernel block is a single fused Pallas/MXU evaluation reshaped to
  [M, N, P] and summed over P — no Python loop over positions.

This is the GP analog of a single conv layer + global average pooling.
Per-position ``weights`` (a [P] Parameter, ones by default) recover the
reference's weighted variant: training them drops translation invariance
when position matters — here position IS the label, which even the
uniform sum separates because the patch response itself differs. Deeper
stacks are out of scope (that is deep-GP territory).
"""
import numpy as np
import optax

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

H = W = 6
PATCH = 3
N = reduce_in_tests(200, 60)
M = reduce_in_tests(32, 8)
STEPS = reduce_in_tests(150, 10)


def make_data(rng: np.random.RandomState):
    X = rng.rand(N, H * W) * 0.2
    Y = np.zeros((N, 1))
    for i in range(N):
        if rng.rand() < 0.5:
            r = c = 0
            Y[i] = 1.0
        else:
            r = c = H - PATCH
        img = X[i].reshape(H, W)
        img[r : r + PATCH, c : c + PATCH] += 0.8
    return X, Y


def main() -> None:
    rng = np.random.RandomState(0)
    X, Y = make_data(rng)

    kernel = gpf.kernels.Convolutional(
        gpf.kernels.SquaredExponential(), image_shape=(H, W), patch_shape=(PATCH, PATCH)
    )
    # initialize inducing patches from the data's own patches
    patches = np.asarray(kernel.get_patches(X[: M]))  # [M, P, S]
    Z = np.unique(patches.reshape(-1, PATCH * PATCH), axis=0)
    Z = Z[rng.choice(len(Z), M, replace=len(Z) < M)]

    model = gpf.models.SVGP(
        kernel=kernel,
        likelihood=gpf.likelihoods.Bernoulli(),
        inducing_variable=gpf.inducing_variables.InducingPatches(Z),
        num_data=N,
    )

    import jax

    params = list(model.trainable_parameters)
    opt = optax.adam(0.05)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return model.training_loss((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    unc = tuple(p._unconstrained for p in params)
    state = opt.init(unc)

    @jax.jit
    def step(unc, state):
        loss, g = jax.value_and_grad(loss_fn)(unc)
        upd, state = opt.update(g, state, unc)
        return tuple(u + du for u, du in zip(unc, upd)), state, loss

    first = None
    for i in range(STEPS):
        unc, state, loss = step(unc, state)
        if first is None:
            first = float(loss)
    for p, u in zip(params, unc):
        p.assign_unconstrained(u)

    pred = np.asarray(model.predict_y(X)[0])
    acc = float(((pred > 0.5) == (Y > 0.5)).mean())
    print(f"ELBO {first:.1f} -> {float(loss):.1f}; train accuracy {acc:.2f}")
    assert float(loss) < first


if __name__ == "__main__":
    main()
