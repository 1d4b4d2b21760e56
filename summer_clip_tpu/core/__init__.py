"""Core runtime: config composition, logging/metrics/timing, determinism."""

from summer_clip_tpu.core.config import (  # noqa: F401
    ConfigNode, ConfigList, compose, load_config, instantiate, instantiate_all,
    load_obj, type_full_name, to_container, to_yaml, main, open_dict, merge,
)
from summer_clip_tpu.core.log_utils import (  # noqa: F401
    LoggingManager, ConsoleLogger, JsonlLogger, NullExpLogger, StreamingMeans,
    Timer, TimeLog, make_logger, setup_json_logging,
)
from summer_clip_tpu.core.rng import set_random_state, RngStream, new_key  # noqa: F401
