"""StableHLO serving exports (the reference's tf.saved_model analog;
see gpflow_tpu/utilities/serving.py)."""
import numpy as np
import pytest

import gpflow_tpu as gpf
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.utilities import export_serving, load_serving

rng = np.random.RandomState(37)
N, D, M = 20, 3, 6
X = rng.randn(N, D)
Y = np.sin(X[:, :1]) + 0.05 * rng.randn(N, 1)
XT = rng.randn(7, D)


def _gpr():
    return gpf.models.GPR((X, Y), kernel=kernels.Matern52(), noise_variance=0.01)


def _svgp():
    m = gpf.models.SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=X[:M].copy(),
    )
    m.q_mu.assign(rng.randn(M, 1))
    return m


@pytest.mark.parametrize("make_model", [_gpr, _svgp], ids=["GPR", "SVGP"])
def test_roundtrip_matches_model(tmp_path, make_model):
    m = make_model()
    export_serving(m, str(tmp_path), input_dim=D)
    served = load_serving(str(tmp_path))
    assert set(served.methods) == {"predict_f", "predict_y"}

    mu_s, var_s = served.predict_f(XT)
    mu_m, var_m = m.predict_f(XT)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_m), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_m), atol=1e-9)

    muy_s, vary_s = served.predict_y(XT)
    muy_m, vary_m = m.predict_y(XT)
    np.testing.assert_allclose(np.asarray(muy_s), np.asarray(muy_m), atol=1e-9)
    np.testing.assert_allclose(np.asarray(vary_s), np.asarray(vary_m), atol=1e-9)


def test_symbolic_batch_dimension(tmp_path):
    export_serving(_gpr(), str(tmp_path), input_dim=D, methods=("predict_mean",))
    served = load_serving(str(tmp_path))
    for n in (1, 5, 64):
        out = np.asarray(served.predict_mean(rng.randn(n, D)))
        assert out.shape == (n, 1)


def test_artifact_is_frozen(tmp_path):
    """The artifact bakes parameters in: mutating the source model afterwards
    must not change served outputs."""
    m = _gpr()
    export_serving(m, str(tmp_path), input_dim=D, methods=("predict_f",))
    served = load_serving(str(tmp_path))
    before = np.asarray(served.predict_f(XT)[0])
    m.kernel.lengthscales.assign(0.1)
    np.testing.assert_allclose(np.asarray(served.predict_f(XT)[0]), before, atol=0)


def test_metadata(tmp_path):
    export_serving(_gpr(), str(tmp_path), input_dim=D)
    served = load_serving(str(tmp_path))
    assert served.metadata["input_dim"] == D
    assert served.metadata["model_class"] == "GPR"
    assert "tpu" in served.metadata["platforms"]


def test_unknown_method_raises(tmp_path):
    with pytest.raises(ValueError, match="Unknown serving method"):
        export_serving(_gpr(), str(tmp_path), input_dim=D, methods=("predict_nope",))


def test_static_batch_size_export(tmp_path):
    export_serving(_gpr(), str(tmp_path), input_dim=D, methods=("predict_f",), batch_size=4)
    served = load_serving(str(tmp_path))
    assert served.metadata["batch_size"] == 4
    mu, _ = served.predict_f(rng.randn(4, D))
    assert np.asarray(mu).shape == (4, 1)
    # pair with bucketize for arbitrary N
    from gpflow_tpu.utilities import bucketize

    predict = bucketize(served.predict_f, buckets=[4])
    mu3, _ = predict(rng.randn(3, D))
    assert np.asarray(mu3).shape == (3, 1)


def test_export_restores_pallas_setting(tmp_path):
    from gpflow_tpu.ops import pallas_distance as pd
    from gpflow_tpu.ops import set_pallas_enabled

    set_pallas_enabled(True)
    try:
        export_serving(_gpr(), str(tmp_path), input_dim=D, methods=("predict_f",))
        assert pd._state["enabled"] is True
    finally:
        set_pallas_enabled(None)


def test_bucketed_export_pads_slices_and_chunks(tmp_path):
    """Bucketed artifacts (VERDICT r2 #6): one fixed-shape lowering per
    bucket; the loader pads to the smallest bucket >= N, slices outputs
    back, and serves N > max bucket in chunks — all matching the model."""
    m = _svgp()
    written = export_serving(m, str(tmp_path), input_dim=D, bucket_sizes=[4, 8])
    assert set(written) == {
        "predict_f@4", "predict_f@8", "predict_y@4", "predict_y@8",
    }
    served = load_serving(str(tmp_path))
    assert served.metadata["bucket_sizes"] == [4, 8]

    for n in (1, 3, 4, 5, 8, 11, 23):  # inside buckets, exact, chunked
        Xt = rng.randn(n, D)
        mu_s, var_s = served.predict_f(Xt)
        mu_m, var_m = m.predict_f(Xt)
        assert np.asarray(mu_s).shape == (n, 1)
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_m), atol=1e-9)
        np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_m), atol=1e-9)
        muy_s, vary_s = served.predict_y(Xt)
        muy_m, vary_m = m.predict_y(Xt)
        np.testing.assert_allclose(np.asarray(muy_s), np.asarray(muy_m), atol=1e-9)
        np.testing.assert_allclose(np.asarray(vary_s), np.asarray(vary_m), atol=1e-9)


def test_bucketed_export_validation(tmp_path):
    m = _svgp()
    with pytest.raises(ValueError, match="not both"):
        export_serving(m, str(tmp_path), input_dim=D, batch_size=4, bucket_sizes=[4])
    with pytest.raises(ValueError, match="positive"):
        export_serving(m, str(tmp_path), input_dim=D, bucket_sizes=[0, 4])
