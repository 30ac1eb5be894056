"""``rscm._lib.components`` — basic component builders."""

from rscm.components import *  # noqa: F401,F403
from rscm.components import __all__  # noqa: F401
