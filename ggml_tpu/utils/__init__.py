from .trace import time_us, timer, trace_annotation, profile_to  # noqa: F401
from .log import get_logger, set_log_level  # noqa: F401
