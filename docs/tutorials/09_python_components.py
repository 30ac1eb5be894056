"""
Tutorial 9 — Writing components.

Counterpart of the reference's ``docs/notebooks/component_python.py`` and
``component_rust.md``: the two ways to add physics —

1. a **traceable Component** (declarative Inputs/Outputs/States/Parameters,
   math through ``rscm_tpu.core.xmath``) that runs on both the host path
   and inside the compiled ``lax.scan`` program, vmappable and
   differentiable; this is the counterpart of a reference *Rust* component;
2. a **PythonComponent** wrapper for arbitrary host-only Python (the
   model then falls back to the eager float64 executor automatically) —
   the counterpart of the reference's user-defined Python components.

Run:  python docs/tutorials/09_python_components.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
from rscm_tpu.core import xmath as xm
from rscm_tpu.core.component import Component, Input, Output, Parameter, State
from rscm_tpu.core.python_component import PythonComponent


# ----------------------------------------------------------------------------
# 1. A traceable component: exponential relaxation toward a forced
#    equilibrium.  Declarations generate typed Inputs/Outputs classes; use
#    `xm.*` for math so the same code runs eagerly (numpy) and traced
#    (jax.numpy).  States read their own value at the step start
#    (`at_start`) and write the step-end value.
# ----------------------------------------------------------------------------
class Relaxer(Component, register=False):
    """dT/dt = (forcing/lambda - T) / tau, solved with a semi-implicit step."""

    forcing = Input("Forcing", unit="W/m^2")
    temperature = State("Temperature", unit="K")

    lambda0 = Parameter(default=1.0, unit="W/m^2/K")
    tau = Parameter(default=5.0, unit="yr")

    def solve_ctx(self, ctx, inputs, internal_state):
        dt = ctx.t_next - ctx.t_current
        t_now = inputs.temperature.at_start()
        equilibrium = inputs.forcing.get() / self.lambda0
        # semi-implicit: unconditionally stable for any dt/tau
        t_next = (t_now + dt / self.tau * equilibrium) / (1.0 + dt / self.tau)
        # xmath example: saturate with a smooth cap (identical host/traced)
        t_next = xm.minimum(t_next, 100.0)
        return self.Outputs(temperature=t_next), internal_state


years = np.arange(2000.0, 2041.0)
forcing = Timeseries.from_values(np.full(len(years), 3.0), years)


def build(component, py=False):
    b = ModelBuilder().with_time_axis(TimeAxis.from_values(years))
    b = b.with_py_component(component) if py else b.with_component(component)
    return (
        b.with_exogenous_variable("Forcing", forcing)
        .with_initial_values({"Temperature": 0.0})
        .build()
    )


compiled = build(Relaxer(lambda0=1.2, tau=8.0))
compiled.run()  # traced into the fused scan program
host = build(Relaxer(lambda0=1.2, tau=8.0))
host.run(compiled=False)

t_c = compiled.timeseries().get_data("Temperature").values()[:, 0]
t_h = host.timeseries().get_data("Temperature").values()[:, 0]
np.testing.assert_allclose(t_c, t_h, rtol=1e-5, atol=1e-5)
print(f"Relaxer equilibrates toward {3.0 / 1.2:.2f} K: T[2040] = {t_c[-1]:.3f}")

# ----------------------------------------------------------------------------
# 2. Because the component is traceable, ensembles and gradients are free.
# ----------------------------------------------------------------------------
from rscm_tpu.parallel import EnsembleRunner

runner = EnsembleRunner(build(Relaxer(lambda0=1.2, tau=8.0)))
out = runner.run(
    params=runner.batched_params({"Relaxer.tau": np.array([2.0, 8.0, 32.0])}),
    out_vars=["Temperature"],
)
t20 = np.asarray(out["Temperature"])[:, 20, 0]
print("T after 20 yr for tau=2/8/32:", np.round(t20, 3))
assert t20[0] > t20[1] > t20[2]  # slower oceans lag further behind

# ----------------------------------------------------------------------------
# 3. A host-only Python component: any object with definitions()+solve().
#    Wrap it in PythonComponent; `run()` detects the untraceable node and
#    falls back to the host executor (a warning-free, documented fallback).
# ----------------------------------------------------------------------------
class LookupTable(Component, register=False):
    """Physics as an arbitrary Python lookup — not traceable."""

    temp_in = Input("Temperature", unit="K")
    damage = Output("Damage Index", unit="1")

    TABLE = {0: 0.0, 1: 0.05, 2: 0.2, 3: 0.5}

    def solve(self, t_current, t_next, inputs):
        t = inputs.temp_in.at_start()
        key = min(int(t), 3) if t is not None else 0
        return self.Outputs(damage=self.TABLE[key])


model = (
    ModelBuilder()
    .with_time_axis(TimeAxis.from_values(years))
    .with_component(Relaxer(lambda0=1.2, tau=8.0))
    .with_py_component(PythonComponent.build(LookupTable()))
    .with_exogenous_variable("Forcing", forcing)
    .with_initial_values({"Temperature": 0.0})
    .build()
)
model.run()  # auto-falls back to the host path
damage = model.timeseries().get_data("Damage Index").values()[:, 0]
print("damage index at 2040:", damage[-1])
assert damage[-1] > 0.0
print("OK")
