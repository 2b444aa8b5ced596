from etl_gmaps_spark.streaming.replay import InjectedCrash, Replayer, ReplayMetrics  # noqa: F401
