from .registry import ORACLES, QUERIES  # noqa: F401
from . import registry_ext  # noqa: F401  (registers extension queries)
