"""Config system (reference surface of ``rscm.config``)."""

import sys

from rscm_tpu.config import *  # noqa: F401,F403
from rscm_tpu.config import __all__ as _all
from rscm_tpu.config import models  # noqa: F401
import rscm_tpu.config.models
import rscm_tpu.config.models.magicc
import rscm_tpu.config.models.two_layer

# Register submodule aliases so `import rscm.config.<submodule>` works for
# every path the reference package exposes (mirror of the reference's
# package layout, python/rscm/config/).
import rscm_tpu.config.base
import rscm_tpu.config.builder
import rscm_tpu.config.docs
import rscm_tpu.config.exceptions
import rscm_tpu.config.loader
import rscm_tpu.config.models.magicc.legacy
import rscm_tpu.config.models.magicc.parameters
import rscm_tpu.config.parameters
import rscm_tpu.config.registry
import rscm_tpu.config.validation

for _sub in (
    "base",
    "builder",
    "docs",
    "exceptions",
    "loader",
    "models",
    "models.magicc",
    "models.magicc.legacy",
    "models.magicc.parameters",
    "models.two_layer",
    "parameters",
    "registry",
    "validation",
):
    _mod = rscm_tpu.config
    for _part in _sub.split("."):
        _mod = getattr(_mod, _part)
    sys.modules[__name__ + "." + _sub] = _mod

__all__ = list(_all) + ["models"]
