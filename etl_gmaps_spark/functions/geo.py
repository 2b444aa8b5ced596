"""Geo functions (SURVEY.md F1/F2, W3/P7).

haversine stays a pure Column expression — whole-stage codegen, no UDF
(reference computes it per-row in Go, gmaps/entry.go:98-117)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
OLC_ALPHABET = "23456789CFGHJMPQRVWX"


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km. All-args Column expression
    (reference gmaps/entry.go:98-117)."""
    lat1, lon1, lat2, lon2 = (
        c if isinstance(c, Column) else F.lit(float(c)) for c in (lat1, lon1, lat2, lon2)
    )
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def plus_code(lat: Column, lon: Column) -> Column:
    """Open Location Code, standard 10-digit code + '+' separator
    (reference gmaps/multiple.go:75 calls the OLC lib). Base-20 digit
    extraction per the public OLC spec, kept as a Column expression —
    no UDF, stays in codegen."""
    # integer-scaled digit extraction (units of 1/8000 deg, the 10-digit
    # grid) — one float multiply, no per-digit error accumulation
    lat_v = F.floor(
        F.least(F.greatest(lat + 90.0, F.lit(0.0)), F.lit(179.9999999)) * 8000
    ).cast("long")
    lon_v = F.floor((((lon + 180.0) % 360.0 + 360.0) % 360.0) * 8000).cast("long")
    parts = []
    for i in range(5):
        div = 160000 // (20**i)
        lat_d = (lat_v / div).cast("long") % 20
        lon_d = (lon_v / div).cast("long") % 20
        parts.append(F.substring(F.lit(OLC_ALPHABET), (lat_d + 1).cast("int"), 1))
        parts.append(F.substring(F.lit(OLC_ALPHABET), (lon_d + 1).cast("int"), 1))
    return F.concat(*parts[:8], F.lit("+"), *parts[8:])
