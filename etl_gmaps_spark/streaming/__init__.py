from etl_gmaps_spark.streaming.replay import InjectedCrash, Replayer, ReplayMetrics  # noqa: F401
from etl_gmaps_spark.streaming.stateful import (  # noqa: F401
    ROCKSDB_STATE_CONF,
    enable_rocksdb_state,
    streaming_lww_gate,
)
from etl_gmaps_spark.streaming.stream_replay import run_availablenow  # noqa: F401
