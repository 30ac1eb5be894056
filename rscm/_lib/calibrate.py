"""``rscm._lib.calibrate`` — calibration primitives."""

from rscm.calibrate import *  # noqa: F401,F403
from rscm.calibrate import __all__  # noqa: F401
