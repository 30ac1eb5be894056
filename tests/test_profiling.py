"""Profiling/diagnostics utilities."""

import numpy as np

from rscm_tpu.core import Component, Input, ModelBuilder, Output, TimeAxis, Timeseries
from rscm_tpu.utils.profiling import cost_analysis, diagnose_nans


def test_diagnose_nans_finds_first_offender():
    class Poison(Component, register=False):
        x = Input("X", unit="1")
        y = Output("Y", unit="1")

        def solve_ctx(self, ctx, inputs, st):
            v = inputs.x.get()
            # goes non-finite from t >= 2002
            out = v if ctx.t_current < 2002.0 else float("nan")
            return self.Outputs(y=out), st

    class Downstream(Component, register=False):
        y = Input("Y", unit="1")
        z = Output("Z", unit="1")

        def solve_ctx(self, ctx, inputs, st):
            return self.Outputs(z=inputs.y.get() * 2.0), st

    years = np.arange(2000.0, 2006.0)
    model = (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(Poison())
        .with_component(Downstream())
        .with_exogenous_variable("X", Timeseries.from_values(np.ones(6), years))
        .build()
    )
    findings = diagnose_nans(model)
    assert findings
    assert findings[0]["component"] == "Poison"
    assert findings[0]["variable"] == "Y"
    assert findings[0]["time"] == 2002.0
    # downstream contamination also recorded, after the source
    assert any(f["component"] == "Downstream" for f in findings)


def test_cost_analysis_reports_flops():
    from rscm_tpu.components import TwoLayer

    years = np.arange(2000.0, 2010.0)
    model = (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(
            TwoLayer(lambda0=1.0, a=0.0, efficacy=1.0, eta=0.7,
                     heat_capacity_surface=8.0, heat_capacity_deep=100.0)
        )
        .with_exogenous_variable(
            "Effective Radiative Forcing", Timeseries.from_values(np.ones(10), years)
        )
        .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
        .build()
    )
    analysis = cost_analysis(model)
    assert analysis is None or "flops" in analysis
