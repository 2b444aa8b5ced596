from etl_gmaps_spark.functions.geo import haversine_km, plus_code  # noqa: F401
from etl_gmaps_spark.functions.hours import (  # noqa: F401
    canonical_hours_string,
    canonical_map_string,
    day_name_expr,
    hours_map,
    popular_times_map,
)
from etl_gmaps_spark.functions.text import (  # noqa: F401
    clean_na,
    concat_address,
    day_name,
    extract_emails,
    join_array,
    eligible_for_email,
    normalize_phone,
    strip_security_prefix,
    url_decode,
    valid_email,
    valid_entry,
)
