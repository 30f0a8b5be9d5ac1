from demv_spark.streaming.monitor import (
    disparity_monitor,
    event_rate_monitor,
    session_window_rollup,
    windowed_group_census,
)

__all__ = [
    "disparity_monitor",
    "event_rate_monitor",
    "session_window_rollup",
    "windowed_group_census",
]
