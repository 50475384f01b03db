from .registry import ORACLES, QUERIES  # noqa: F401
from . import registry_ext  # noqa: F401  (registers extension queries)
from . import registry_pipeline  # noqa: F401  (registers training-pipeline queries)
from . import registry_rel  # noqa: F401  (registers relational-extension queries)
from . import registry_stream  # noqa: F401  (registers streaming queries)
from .registry_stream import BENCH_SKIP  # noqa: F401
