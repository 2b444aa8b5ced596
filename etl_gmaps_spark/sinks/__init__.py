from etl_gmaps_spark.sinks.export import stringify_nested, write_csv, write_json

__all__ = ["stringify_nested", "write_csv", "write_json"]
