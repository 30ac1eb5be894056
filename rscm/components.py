"""Generic component builders (reference surface of ``rscm.components``)."""

from rscm_tpu.components import (
    CarbonCycleBuilder,
    CO2ERFBuilder,
    FourBoxOceanHeatUptakeBuilder,
)

__all__ = ["CarbonCycleBuilder", "CO2ERFBuilder", "FourBoxOceanHeatUptakeBuilder"]
