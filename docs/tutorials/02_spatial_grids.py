"""
Tutorial 2 — Spatial grids.

Counterpart of the reference's ``docs/notebooks/grid_variables.py``:
scalar / hemispheric / four-box grids, grid transforms, and the
coarsening rules enforced between components.

Run:  python docs/tutorials/02_spatial_grids.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.core import TimeAxis
from rscm_tpu.core.spatial import (
    FourBoxGrid,
    FourBoxRegion,
    HemisphericGrid,
    ScalarGrid,
)
from rscm_tpu.core.timeseries import GridTimeseries

# ----------------------------------------------------------------------------
# 1. Grids carry area weights.  The MAGICC standard four-box grid splits
#    the planet into Northern/Southern × Ocean/Land (order NO, NL, SO, SL).
# ----------------------------------------------------------------------------
four_box = FourBoxGrid.magicc_standard()
print("four-box weights:", four_box.weights)
assert abs(sum(four_box.weights) - 1.0) < 1e-12

# ----------------------------------------------------------------------------
# 2. A gridded timeseries is a (time, region) array.  Region columns follow
#    the grid's region order.
# ----------------------------------------------------------------------------
years = np.arange(2000.0, 2005.0)
ta = TimeAxis.from_values(years)
values = np.column_stack(
    [
        np.linspace(1.0, 2.0, 5),   # Northern Ocean
        np.linspace(1.5, 3.0, 5),   # Northern Land (land warms faster)
        np.linspace(0.8, 1.6, 5),   # Southern Ocean
        np.linspace(1.2, 2.4, 5),   # Southern Land
    ]
)
ts = GridTimeseries(values, ta, four_box, "K")

# Named-region access:
print("2004 Northern Land:", ts.at(4, FourBoxRegion.NorthernLand))

# ----------------------------------------------------------------------------
# 3. Transforms go fine -> coarse only (a scalar cannot be split into four
#    boxes without extra information).  The transform is a constant matrix,
#    so under tracing it is a single fused matmul.
# ----------------------------------------------------------------------------
hemispheric = ts.transform_to(HemisphericGrid())
north = hemispheric.values()[:, 0]
# northern hemisphere = weight-blended NO/NL
w = four_box.weights
expected_north = (
    w[FourBoxRegion.NorthernOcean] * values[:, 0]
    + w[FourBoxRegion.NorthernLand] * values[:, 1]
) / (w[FourBoxRegion.NorthernOcean] + w[FourBoxRegion.NorthernLand])
np.testing.assert_allclose(north, expected_north, rtol=1e-12)

global_mean = ts.transform_to(ScalarGrid()).values()[:, 0]
np.testing.assert_allclose(global_mean, values @ np.asarray(w), rtol=1e-12)
print("2004 global mean:", global_mean[-1])

# ----------------------------------------------------------------------------
# 4. The reverse direction is rejected.
# ----------------------------------------------------------------------------
scalar_ts = GridTimeseries(np.ones((5, 1)), ta, ScalarGrid(), "K")
try:
    scalar_ts.transform_to(four_box)
    raise AssertionError("expected coarsening-rule rejection")
except Exception as e:
    print("scalar -> four-box rejected:", type(e).__name__)

# ----------------------------------------------------------------------------
# 5. Custom weights are allowed (they must sum to 1).
# ----------------------------------------------------------------------------
custom = FourBoxGrid.with_weights([0.25, 0.25, 0.40, 0.10])
print("custom grid global mean at 2000:",
      GridTimeseries(values, ta, custom, "K").aggregate_global().values()[0, 0])
print("OK")
