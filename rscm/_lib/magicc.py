"""``rscm._lib.magicc`` — MAGICC component builders."""

from rscm.magicc import *  # noqa: F401,F403
from rscm.magicc import __all__  # noqa: F401
