"""``rscm._lib.core.state`` — slices, state values, windows."""

from rscm_tpu.core.state import (  # noqa: F401
    FourBoxSlice,
    FourBoxWindow,
    HemisphericSlice,
    HemisphericWindow,
    ScalarWindow,
    StateValue,
    VariableSource,
)

# Reference window types (reference user-facing ergonomics)
from rscm._windows import (  # noqa: E402,F401
    FourBoxTimeseriesWindow,
    HemisphericTimeseriesWindow,
    TimeseriesWindow,
)

__all__ = [
    "FourBoxSlice",
    "FourBoxTimeseriesWindow",
    "FourBoxWindow",
    "HemisphericSlice",
    "HemisphericTimeseriesWindow",
    "HemisphericWindow",
    "ScalarWindow",
    "StateValue",
    "TimeseriesWindow",
    "VariableSource",
]
