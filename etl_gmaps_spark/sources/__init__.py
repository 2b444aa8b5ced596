from etl_gmaps_spark.sources.changelog import read_changelog, read_pending  # noqa: F401
from etl_gmaps_spark.sources.files import read_query_lines, read_csv_with_drift  # noqa: F401
