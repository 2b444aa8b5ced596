from etl_gmaps_spark.functions.geo import haversine_km, plus_code  # noqa: F401
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
)
