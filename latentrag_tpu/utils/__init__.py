from .config import (
    CANONICAL_AE_TYPES,
    Config,
    apply_overrides,
    canonical_ae_type,
    load_config,
    to_dict,
)
from .dotenv import load_dotenv
from .logging_utils import init_logger
from .prng import KeySeq, set_seed
from .timing import StatsTracker, Stopwatch, device_stopwatch, percentiles, stopwatch

__all__ = [
    "CANONICAL_AE_TYPES",
    "Config",
    "apply_overrides",
    "canonical_ae_type",
    "load_config",
    "to_dict",
    "init_logger",
    "KeySeq",
    "set_seed",
    "StatsTracker",
    "Stopwatch",
    "device_stopwatch",
    "percentiles",
    "stopwatch",
]
