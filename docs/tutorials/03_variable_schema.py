"""
Tutorial 3 — Variable schemas.

Counterpart of the reference's ``docs/notebooks/variable_schema.py``:
declaring units and grids up front, automatic unit conversion between
components, aggregate variables, and the errors a schema catches.

Run:  python docs/tutorials/03_variable_schema.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.core.component import Component, Input, Output
from rscm_tpu.core.errors import IncompatibleUnitsError

years = np.arange(2000.0, 2010.0)
ta = TimeAxis.from_values(years)


# ----------------------------------------------------------------------------
# 1. Two toy components that disagree on units: the producer emits MtC/yr,
#    the consumer wants GtC/yr.
# ----------------------------------------------------------------------------
# NB: write compound mass units *without* a space — "MtC / yr".  Adjacency
# means multiplication in the unit grammar (as in the reference), so
# "Mt C / yr" parses as megatonnes × carbon = dimension M^2.
class EmitterMt(Component, register=False):
    out = Output("Emissions|X", unit="MtC / yr")

    def solve_ctx(self, ctx, inputs, internal_state):
        return self.Outputs(out=1000.0), internal_state  # 1000 MtC/yr


class ConsumerGt(Component, register=False):
    inp = Input("Emissions|X", unit="GtC / yr")
    doubled = Output("Doubled|X", unit="GtC / yr")

    def solve_ctx(self, ctx, inputs, internal_state):
        return self.Outputs(doubled=2.0 * self.inp_value(inputs)), internal_state

    @staticmethod
    def inp_value(inputs):
        return inputs.inp.get()


# ----------------------------------------------------------------------------
# 2. With a schema declaring the storage unit, the mismatch becomes a
#    *conversion*: the factor (1000 Mt = 1 Gt) is folded into the execution
#    plan at build time — zero cost in the compiled program.
# ----------------------------------------------------------------------------
schema = VariableSchema()
schema.add_variable("Emissions|X", "MtC / yr")
schema.add_variable("Doubled|X", "GtC / yr")

model = (
    ModelBuilder()
    .with_time_axis(ta)
    .with_schema(schema)
    .with_component(EmitterMt())
    .with_component(ConsumerGt())
    .build()
)
model.run(compiled=False)
doubled = model.timeseries().get_data("Doubled|X").values()[:, 0]
assert abs(doubled[1] - 2.0) < 1e-12  # 1000 MtC/yr == 1 GtC/yr, doubled
print("unit conversion folded into the plan: 1000 MtC/yr -> doubled =", doubled[1])

# ----------------------------------------------------------------------------
# 3. Dimensionally incompatible units are a build-time error.
# ----------------------------------------------------------------------------
class ConsumerKelvin(Component, register=False):
    inp = Input("Emissions|X", unit="K")
    out2 = Output("Nonsense", unit="K")

    def solve_ctx(self, ctx, inputs, internal_state):
        return self.Outputs(out2=0.0), internal_state


try:
    (
        ModelBuilder()
        .with_time_axis(ta)
        .with_schema(schema)
        .with_component(EmitterMt())
        .with_component(ConsumerKelvin())
        .build()
    )
    raise AssertionError("expected IncompatibleUnitsError")
except IncompatibleUnitsError as e:
    print("incompatible units rejected:", str(e)[:80], "...")

# ----------------------------------------------------------------------------
# 4. Aggregates: schema-defined variables computed from contributors each
#    step (Sum / Mean / weighted), NaN-skipping like the reference.
# ----------------------------------------------------------------------------
schema2 = VariableSchema()
schema2.add_variable("Forcing|A", "W/m^2")
schema2.add_variable("Forcing|B", "W/m^2")
schema2.add_aggregate("Forcing", "W/m^2", "Sum", ["Forcing|A", "Forcing|B"])

model2 = (
    ModelBuilder()
    .with_time_axis(ta)
    .with_schema(schema2)
    .with_exogenous_variable(
        "Forcing|A", Timeseries.from_values(np.full(len(years), 1.0), years)
    )
    .with_exogenous_variable(
        "Forcing|B", Timeseries.from_values(np.full(len(years), 0.5), years)
    )
    .build()
)
model2.run(compiled=False)
total = model2.timeseries().get_data("Forcing").values()[:, 0]
assert abs(total[1] - 1.5) < 1e-12
print("aggregate Forcing = A + B =", total[1])
print("OK")
