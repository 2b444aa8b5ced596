from etl_gmaps_spark.operators.lww import lww_winners, batch_replay  # noqa: F401
