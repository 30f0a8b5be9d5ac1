from demv_spark.streaming.dedup_stream import streaming_dedup_maintainer
from demv_spark.streaming.dsir_stream import (
    dsir_state_weights,
    streaming_dsir_maintainer,
)
from demv_spark.streaming.monitor import (
    disparity_monitor,
    event_rate_monitor,
    session_window_rollup,
    windowed_group_census,
)
from demv_spark.streaming.stateful import running_drift_monitor

__all__ = [
    "disparity_monitor",
    "dsir_state_weights",
    "event_rate_monitor",
    "running_drift_monitor",
    "session_window_rollup",
    "streaming_dedup_maintainer",
    "streaming_dsir_maintainer",
    "windowed_group_census",
]
