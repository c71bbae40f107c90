"""Saving and loading models (mirrors the reference's
getting_started/saving_and_loading notebook,
``doc/sphinx/notebooks/getting_started/saving_and_loading.pct.py``).

Three mechanisms, matching the reference's three:

1. parameter dicts: ``read_values`` / ``multiple_assign`` (manual transfer),
2. checkpoints: ``save_checkpoint`` / ``load_checkpoint`` (orbax/npz),
3. deployment: ``freeze`` + a jitted predict function (the saved_model
   analogue - parameters become constants baked into a compiled callable).

Choosing between them
---------------------
All three rest on the same traversal (``utilities/traversal.py``): a model
is a pytree of Parameters addressed by attribute paths like
``.kernel.lengthscales``. What differs is what travels and who can read it:

* **Parameter dicts** carry VALUES only, keyed by path — use them to move
  learned hyperparameters between model *variants* (e.g. warm-starting an
  SVGP from a trained SGPR) or to snapshot/restore within a process. The
  receiving model must already exist with matching paths; this is the
  lightest and most hackable format (a plain dict of arrays).
* **Checkpoints** are the training-loop format: atomic on-disk snapshots
  (orbax when available, npz fallback) that also hold optimizer state if
  you pass it. Restore requires reconstructing the model (checkpoints
  store leaves, not code) — exactly like the reference's tf.train
  Checkpoint. The distributed trainer's elastic variant can restore a
  checkpoint saved on 8 devices onto 4 (``parallel/trainer.py``,
  dryrun path #8).
* **freeze + jit** is for in-process deployment: parameters become
  constants inside one compiled callable — no Parameter machinery, no
  accidental training, fastest dispatch.
* **StableHLO export** (step 4, the TPU-native saved_model analog) is for
  OUT-of-process serving: the artifact is compiler IR loadable with jax
  alone — no gpflow_tpu on the serving host, batch dim symbolic (or
  bucketed static shapes when Pallas kernels must survive — see
  ``utilities/serving.py``).

Gotcha worth internalizing: all mechanisms round-trip the UNCONSTRAINED
leaves, so transform choices (e.g. a custom positive lower bound) are part
of the model code, not the artifact — reconstruct the model with the same
transforms or the restored values will be reinterpreted.
"""
import tempfile

import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.ci_utils import reduce_in_tests

MAXITER = reduce_in_tests(100, 15)


def make_model(X, Y):
    return gpf.models.GPR((X, Y), kernel=gpf.kernels.Matern52(), noise_variance=0.05)


def main() -> None:
    rng = np.random.RandomState(0)
    X = rng.rand(50, 1) * 3
    Y = np.cos(2 * X) + 0.1 * rng.randn(50, 1)

    model = make_model(X, Y)
    gpf.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables, options={"maxiter": MAXITER}
    )
    Xnew = np.linspace(0, 3, 7)[:, None]
    mean_ref, _ = model.predict_f(Xnew)

    # 1. parameter dicts ------------------------------------------------
    values = gpf.utilities.read_values(model)
    print("parameter dict keys:", sorted(values)[:3], "...")
    clone = make_model(X, Y)
    gpf.utilities.multiple_assign(clone, values)
    mean_clone, _ = clone.predict_f(Xnew)
    assert np.allclose(np.asarray(mean_ref), np.asarray(mean_clone), atol=1e-10)
    print("parameter-dict transfer: predictions identical")

    # 2. checkpoints ----------------------------------------------------
    with tempfile.TemporaryDirectory(prefix="gp-save-") as d:
        gpf.utilities.save_checkpoint(f"{d}/ckpt", model)
        fresh = make_model(X, Y)
        gpf.utilities.load_checkpoint(f"{d}/ckpt", fresh)
        mean_fresh, _ = fresh.predict_f(Xnew)
        assert np.allclose(np.asarray(mean_ref), np.asarray(mean_fresh), atol=1e-10)
        print("checkpoint round-trip: predictions identical")

    # 3. deployment: freeze + jit --------------------------------------
    import jax

    frozen = gpf.utilities.freeze(model)
    predict = jax.jit(lambda x: frozen.predict_f(x)[0])
    mean_frozen = predict(Xnew)
    assert np.allclose(np.asarray(mean_ref), np.asarray(mean_frozen), atol=1e-10)
    # frozen models expose no trainable leaves - safe to ship
    assert not list(frozen.trainable_variables)
    print("frozen + jitted predict: predictions identical, no trainables")

    # 4. deployment artifact: StableHLO serving export ------------------
    # (the tf.saved_model analog: parameters baked in as constants, batch
    # dim symbolic, lowered for cpu AND tpu; loading needs only jax)
    with tempfile.TemporaryDirectory() as d:
        gpf.utilities.export_serving(model, d, input_dim=X.shape[1])
        served = gpf.utilities.load_serving(d)
        mean_served, _ = served.predict_f(Xnew)
        assert np.allclose(np.asarray(mean_ref), np.asarray(mean_served), atol=1e-9)
        # symbolic batch: any N at call time
        assert np.asarray(served.predict_y(Xnew[:3])[0]).shape == (3, 1)
        print("StableHLO serving artifact: predictions identical, any batch size")


if __name__ == "__main__":
    main()
