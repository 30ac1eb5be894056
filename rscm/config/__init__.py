"""Config system (reference surface of ``rscm.config``)."""

import sys

from rscm_tpu.config import *  # noqa: F401,F403
from rscm_tpu.config import __all__ as _all
from rscm_tpu.config import models  # noqa: F401
import rscm_tpu.config.models
import rscm_tpu.config.models.magicc
import rscm_tpu.config.models.two_layer

# Register submodule aliases so `import rscm.config.models.magicc` works
# (mirror of the reference's sys.modules wiring, python/mod.rs:47-115).
sys.modules[__name__ + ".models"] = rscm_tpu.config.models
sys.modules[__name__ + ".models.magicc"] = rscm_tpu.config.models.magicc
sys.modules[__name__ + ".models.two_layer"] = rscm_tpu.config.models.two_layer

__all__ = list(_all) + ["models"]
