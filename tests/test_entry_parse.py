"""P1/P2: positional JSON path projection with panic-recover."""

from __future__ import annotations

from etl_gmaps_spark.operators.entry_parse import get_nth, parse_entries


def test_get_nth_null_safety():
    obj = [0, ["Cafe X", ["coffee shop"]], [4.5, 120], [52.5, 13.4]]
    assert get_nth(obj, 1, 0) == "Cafe X"
    assert get_nth(obj, 1, 1, 0) == "coffee shop"
    assert get_nth(obj, 2, 1) == 120
    assert get_nth(obj, 9, 9) is None  # short array → zero value
    assert get_nth(obj, 0, 0) is None  # non-array → zero value
    assert get_nth(None, 1) is None


def test_parse_entries_with_recover(spark):
    rows = [
        (1, '[0, ["Cafe X", ["coffee shop"]], [4.5, 120], [52.5, 13.4]]'),
        (2, '[0, ["Bar Y", []], [3.9], null]'),  # partial: missing paths → nulls
        (3, "{not json"),  # panic row → recovered
    ]
    df = spark.createDataFrame(rows, "id long, raw string")
    out = {r["id"]: r for r in parse_entries(df, keep_cols=["id"]).collect()}
    assert out[1]["title"] == "Cafe X" and out[1]["category"] == "coffee shop"
    assert out[1]["rating"] == 4.5 and out[1]["review_count"] == 120
    assert out[1]["lat"] == 52.5 and out[1]["_error"] is None
    assert out[2]["title"] == "Bar Y" and out[2]["category"] is None
    assert out[2]["review_count"] is None and out[2]["lat"] is None
    assert out[3]["title"] is None and out[3]["_error"] is not None
