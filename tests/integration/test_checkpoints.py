"""Checkpoint round-trip (reference test strategy §4.8:
tests/integration/test_model_serialization.py analog — orbax/npz instead of
tf.train.Checkpoint)."""
import numpy as np

from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import SVGP
from gpflow_tpu.utilities import load_checkpoint, save_checkpoint

rng = np.random.RandomState(0)


def _model():
    return SVGP(
        kernel=kernels.SquaredExponential(lengthscales=np.array([1.5, 0.5])),
        likelihood=likelihoods.Gaussian(0.2),
        inducing_variable=rng.randn(6, 2),
        num_data=20,
    )


def test_checkpoint_roundtrip(tmp_path):
    m = _model()
    X = rng.randn(5, 2)
    before = np.asarray(m.predict_f(X)[0])

    save_checkpoint(str(tmp_path / "ckpt"), m)

    # perturb everything, then restore
    m.kernel.lengthscales.assign([9.0, 9.0])
    m.likelihood.variance.assign(3.0)
    m.q_mu.assign(np.ones_like(m.q_mu.numpy()))
    assert not np.allclose(np.asarray(m.predict_f(X)[0]), before)

    load_checkpoint(str(tmp_path / "ckpt"), m)
    np.testing.assert_allclose(np.asarray(m.predict_f(X)[0]), before, rtol=1e-10)
    np.testing.assert_allclose(m.kernel.lengthscales.numpy(), [1.5, 0.5])


def test_checkpoint_partial_load_into_fresh_model(tmp_path):
    m = _model()
    m.kernel.lengthscales.assign([2.5, 3.5])
    save_checkpoint(str(tmp_path / "ckpt2"), m)

    fresh = _model()
    load_checkpoint(str(tmp_path / "ckpt2"), fresh)
    np.testing.assert_allclose(fresh.kernel.lengthscales.numpy(), [2.5, 3.5])
