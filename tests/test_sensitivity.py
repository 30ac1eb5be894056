"""SensitivityAnalyzer: exact Jacobians through the compiled model.

Validated against central finite differences of the same program — the
autodiff Jacobian must match to the FD truncation error, at a fraction of
the cost (one jacfwd pass vs 2D forward runs).
"""

import numpy as np
import pytest

from rscm_tpu.calibrate import CompiledModelRunner, SensitivityAnalyzer
from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries

YEARS = np.arange(2000.0, 2041.0)


def _build():
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(YEARS))
        .with_component(
            TwoLayer(
                lambda0=1.2, a=0.0, efficacy=1.0, eta=0.7,
                heat_capacity_surface=8.0, heat_capacity_deep=100.0,
            )
        )
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries.from_values(np.full(len(YEARS), 3.7), YEARS),
        )
        .with_initial_values(
            {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
        )
        .build()
    )


@pytest.fixture(scope="module")
def analyzer():
    runner = CompiledModelRunner(
        _build(),
        param_map={"lambda0": "TwoLayer.lambda0", "eta": "TwoLayer.eta"},
        output_variables=["Surface Temperature"],
    )
    return SensitivityAnalyzer(runner)


def test_jacobian_matches_finite_differences(analyzer):
    import jax

    theta = np.array([1.2, 0.7])
    jac = analyzer.jacobian(theta)["Surface Temperature"]
    assert jac.shape == (len(YEARS), 1, 2)

    fn = jax.jit(analyzer.runner.trajectories_fn())
    eps = 1e-6
    for j in range(2):
        tp, tm = theta.copy(), theta.copy()
        tp[j] += eps
        tm[j] -= eps
        fd = (
            np.asarray(fn(tp)["Surface Temperature"])
            - np.asarray(fn(tm)["Surface Temperature"])
        ) / (2 * eps)
        np.testing.assert_allclose(jac[..., j], fd, rtol=1e-5, atol=1e-8)


def test_jacobian_signs_are_physical(analyzer):
    """More feedback (lambda0) must cool every late-century year; more
    ocean exchange (eta) must also damp surface warming."""
    jac = analyzer.jacobian([1.2, 0.7])["Surface Temperature"]
    late = jac[5:, 0, :]
    assert np.all(late[:, 0] < 0)  # d T / d lambda0 < 0
    assert np.all(late[:, 1] < 0)  # d T / d eta < 0


def test_elasticities_dimensionless(analyzer):
    elas = analyzer.elasticities([1.2, 0.7])["Surface Temperature"]
    assert elas.shape == (len(YEARS), 1, 2)
    late = elas[5:, 0, :]
    assert np.all(np.isfinite(late))
    # equilibrium temperature ~ F/lambda -> elasticity wrt lambda0 -> -1;
    # after 40 years the response is partway there
    assert -1.2 < late[-1, 0] < -0.3
    # the t=0 row (T == 0) must be NaN, not inf
    assert np.all(np.isnan(elas[0, 0, :]))


def test_requires_compiled_runner():
    from rscm_tpu.calibrate import DefaultModelRunner

    runner = DefaultModelRunner(
        ["lambda0"], ["Surface Temperature"], lambda theta: _build()
    )
    with pytest.raises(TypeError, match="CompiledModelRunner"):
        SensitivityAnalyzer(runner)
