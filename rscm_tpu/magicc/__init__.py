"""
MAGICC7-derived component library.

Mirror of ``crates/rscm-magicc``: a near-complete reimplementation of the
MAGICC7 simple climate model as components on the rscm_tpu engine —

- Forcing: GhgForcing (CO2/CH4/N2O, IPCCTAR + OLBL methods), OzoneForcing,
  AerosolDirect, AerosolIndirect
- Chemistry: CH4Chemistry, N2OChemistry, HalocarbonChemistry
- Carbon: TerrestrialCarbon, OceanCarbon, CO2Budget
- Climate: ClimateUDEB (4-box atmosphere + upwelling-diffusion ocean)
- Beyond the reference: Permafrost (module_12) and SeaLevelRise
  (module_14) — both documented upstream but never implemented there

Each component cites the reference Rust implementation (itself traceable to
the Fortran MAGICC7 line references in ``docs/modules/``).
"""

from .forcing.ghg import ForcingMethod, GhgForcing, GhgForcingBuilder
from .chemistry.ch4 import CH4Chemistry, CH4ChemistryBuilder
from .chemistry.n2o import N2OChemistry, N2OChemistryBuilder
from .chemistry.halocarbon import (
    HalocarbonChemistry,
    HalocarbonChemistryBuilder,
    HALOCARBON_SPECIES,
)
from .forcing.ozone import OzoneForcing, OzoneForcingBuilder
from .forcing.aerosol_direct import AerosolDirect, AerosolDirectBuilder
from .forcing.aerosol_indirect import AerosolIndirect, AerosolIndirectBuilder
from .carbon.terrestrial import TerrestrialCarbon, TerrestrialCarbonBuilder
from .carbon.ocean import OceanCarbon, OceanCarbonBuilder
from .carbon.budget import CO2Budget, CO2BudgetBuilder
from .carbon.permafrost import (
    CH4ChemistryWithPermafrost,
    CO2BudgetWithPermafrost,
    Permafrost,
    PermafrostBuilder,
)
from .climate.udeb import ClimateUDEB, ClimateUDEBBuilder
from .slr import SeaLevelRise, SeaLevelRiseBuilder

__all__ = [
    "AerosolDirect",
    "AerosolDirectBuilder",
    "AerosolIndirect",
    "AerosolIndirectBuilder",
    "CH4Chemistry",
    "CH4ChemistryBuilder",
    "CH4ChemistryWithPermafrost",
    "CO2Budget",
    "CO2BudgetBuilder",
    "CO2BudgetWithPermafrost",
    "ClimateUDEB",
    "ClimateUDEBBuilder",
    "ForcingMethod",
    "GhgForcing",
    "GhgForcingBuilder",
    "HALOCARBON_SPECIES",
    "HalocarbonChemistry",
    "HalocarbonChemistryBuilder",
    "N2OChemistry",
    "N2OChemistryBuilder",
    "OceanCarbon",
    "OceanCarbonBuilder",
    "OzoneForcing",
    "OzoneForcingBuilder",
    "Permafrost",
    "PermafrostBuilder",
    "SeaLevelRise",
    "SeaLevelRiseBuilder",
    "TerrestrialCarbon",
    "TerrestrialCarbonBuilder",
]
