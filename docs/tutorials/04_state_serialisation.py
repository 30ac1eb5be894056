"""
Tutorial 4 — State serialisation, checkpoint and resume.

Counterpart of the reference's ``docs/notebooks/state_serialisation.py``:
a model's full state (timeseries collection, step index, per-component
internal state) serialises to a dict or TOML text; a fresh model resumes
from it and produces the identical tail.

Run:  python docs/tutorials/04_state_serialisation.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
from rscm_tpu.core.model.runtime import Model

years = np.arange(2000.0, 2021.0)
erf = Timeseries.from_values(np.linspace(0.0, 4.0, len(years)), years)

PARAMS = dict(
    lambda0=1.0, a=0.0, efficacy=1.0, eta=0.7,
    heat_capacity_surface=8.0, heat_capacity_deep=100.0,
)


def build():
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(TwoLayer(**PARAMS))
        .with_exogenous_variable("Effective Radiative Forcing", erf)
        .with_initial_values(
            {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
        )
        .build()
    )


# ----------------------------------------------------------------------------
# 1. Run to completion once for the reference trajectory.
# ----------------------------------------------------------------------------
full = build()
full.run(compiled=False)
ref = full.timeseries().get_data("Surface Temperature").values()[:, 0]

# ----------------------------------------------------------------------------
# 2. Step a second model halfway, snapshot it, and restore into a third.
#    `to_dict` captures the collection, the step index, and each
#    component's internal state; `restore` loads them back.
# ----------------------------------------------------------------------------
half = build()
for _ in range(10):
    half.step()
snapshot = half.to_dict()
print("snapshot keys:", sorted(snapshot))

resumed = build()
resumed.restore(snapshot)
assert not resumed.finished()
resumed.run(compiled=False)  # completes the remaining steps
tail = resumed.timeseries().get_data("Surface Temperature").values()[:, 0]
np.testing.assert_allclose(tail, ref, rtol=0, atol=0)  # bit-identical
print("resume after 10 steps reproduces the full run bit-for-bit")

# ----------------------------------------------------------------------------
# 3. TOML round-trip: the same snapshot as human-readable text (the
#    counterpart of the reference's to_toml/from_toml), including the
#    component graph, so `Model.from_toml` rebuilds without the builder.
# ----------------------------------------------------------------------------
half2 = build()
for _ in range(10):
    half2.step()
text = half2.to_toml()
print("TOML checkpoint:", len(text), "chars; first line:", text.splitlines()[0])

restored = Model.from_toml(text)
restored.run(compiled=False)
tail2 = restored.timeseries().get_data("Surface Temperature").values()[:, 0]
np.testing.assert_allclose(tail2, ref, rtol=0, atol=0)
print("from_toml-reconstructed model reproduces the full run bit-for-bit")
print("OK")
