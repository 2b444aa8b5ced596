"""Full nested Entry projection (SURVEY.md P2 complete): golden-blob
test mirroring the reference's Test_EntryFromJSON (gmaps/entry_test.go:
28-176) — every positional path of EntryFromJSON (entry.go:263-425)
exercised from one synthetic blob, plus the extra-reviews page parse
(extractReviews, entry.go:246-260)."""

from __future__ import annotations

import json

from etl_gmaps_spark.operators.entry_parse import (
    FULL_ENTRY_SCHEMA,
    entry_from_json,
    extract_reviews,
    parse_full_entries,
)


def golden_blob() -> str:
    """A blob with a value at every EntryFromJSON path (positions per
    gmaps/entry.go:263-425, relative to darray = jd[6])."""
    d = [None] * 184
    d[4] = [None, None, "$$", ["https://rev/1"], None, None, None, 4.2, 396]
    d[7] = ["https://ex.com"]
    d[9] = [None, None, 34.5, 33.25]
    d[10] = "0xabc"
    d[11] = "Kipriakon"
    d[13] = ["Restaurant", "Bar"]
    d[18] = "Kipriakon, Old port 3042"
    d[27] = "https://maps/1"
    d[30] = "Asia/Nicosia"
    d[32] = [None, [None, "A fine place"]]
    d[34] = [
        None,
        [["Monday", ["12:30-10pm"]], ["Friday", ["1-11pm", "11-12pm"]]],
        None,
        None,
        [None, None, None, None, "Closed"],
    ]
    d[38] = ["https://menu/1", "menusrc"]
    d[46] = [["https://res/1", "ressrc"], ["", "dropped"]]
    d[57] = [None, "Owner Ann", "own1"]
    d[72] = [[None, [None, None, None, None, None, None, ["https://img/t.jpg"]]]]
    # primary order_online layout: (75,0,1,2)
    d[75] = [[None, [None, None, [[["osrc"], [None, None, ["https://order/1"]]]]]]]
    d[84] = [[[1, [[8, 35], [12, 70]]]]]
    d[100] = [
        None,
        [
            [
                "ab1",
                "Amenities",
                [
                    [None, "Wifi", [None, [[1]]]],
                    [None, "", [None, [[1]]]],  # empty name -> dropped
                    [None, "Parking", [None, [[0]]]],
                ],
            ]
        ],
    ]
    d[171] = [[[None, None, "All", [[None, None, None, None, None, None, ["https://img/0.jpg"]]]]]]
    d[175] = [None, None, None, [5, 4, 3, 2, 1]]
    d[178] = [["+1-555-0001"]]
    d[183] = [
        None,
        ["Borough", "1 Main St", None, "Limassol", "3042", "LS", "CY"],
        [None, None, ["M2CR+6X"]],
    ]
    root = [None] * 26
    root[6] = d
    # cid path jd[25][3][0][13][0][0][1] (entry.go:323)
    root[25] = [None, None, None, [[None] * 13 + [[[[None, "16519582940102929223"]]]]]]
    return json.dumps(root)


def test_entry_from_json_every_path():
    e = entry_from_json(golden_blob())
    assert e["link"] == "https://maps/1"
    assert e["title"] == "Kipriakon"
    assert e["categories"] == ["Restaurant", "Bar"]
    assert e["category"] == "Restaurant"
    # TrimPrefix(title+",") + TrimSpace (entry.go:312-314)
    assert e["address"] == "Old port 3042"
    assert e["open_hours"] == {"Monday": ["12:30-10pm"], "Friday": ["1-11pm", "11-12pm"]}
    assert e["popular_times"] == {"Monday": {8: 35, 12: 70}}
    assert e["web_site"] == "https://ex.com"
    assert e["phone"] == "+1-555-0001"
    assert e["plus_code"] == "M2CR+6X"
    assert e["review_count"] == 396
    assert e["review_rating"] == 4.2
    assert e["reviews_per_rating"] == {1: 5, 2: 4, 3: 3, 4: 2, 5: 1}
    assert e["latitude"] == 34.5 and e["longitude"] == 33.25
    assert e["status"] == "Closed"
    assert e["description"] == "A fine place"
    assert e["reviews_link"] == "https://rev/1"
    assert e["thumbnail"] == "https://img/t.jpg"
    assert e["timezone"] == "Asia/Nicosia"
    assert e["price_range"] == "$$"
    assert e["data_id"] == "0xabc"
    assert e["cid"] == "16519582940102929223"
    assert e["images"] == [{"title": "All", "image": "https://img/0.jpg"}]
    # empty-link entry dropped (getLinkSource filter, entry.go:488-493)
    assert e["reservations"] == [{"link": "https://res/1", "source": "ressrc"}]
    assert e["order_online"] == [{"link": "https://order/1", "source": "osrc"}]
    assert e["menu"] == {"link": "https://menu/1", "source": "menusrc"}
    assert e["owner"] == {
        "id": "own1",
        "name": "Owner Ann",
        "link": "https://www.google.com/maps/contrib/own1",
    }
    assert e["complete_address"] == {
        "borough": "Borough",
        "street": "1 Main St",
        "city": "Limassol",
        "postal_code": "3042",
        "state": "LS",
        "country": "CY",
    }
    # empty-name option dropped (entry.go:404-406)
    assert e["about"] == [
        {
            "id": "ab1",
            "name": "Amenities",
            "options": [
                {"name": "Wifi", "enabled": True},
                {"name": "Parking", "enabled": False},
            ],
        }
    ]
    # EntryFromJSON leaves UserReviews empty (entry.go:422)
    assert e["user_reviews"] == []


def test_order_online_fallback_layout():
    root = json.loads(golden_blob())
    # rewrite 75 into the FALLBACK layout (75,0,0,2), entry.go:355-359
    root[6][75] = [[[None, None, [[["fsrc"], [None, None, ["https://order/f"]]]]], None]]
    e = entry_from_json(json.dumps(root))
    assert e["order_online"] == [{"link": "https://order/f", "source": "fsrc"}]


def test_extract_reviews_security_prefix_and_paths():
    def review_el(name, rating, desc, y, m, day, imgs):
        # parseReviews paths (entry.go:427-471), relative to el=row[0]:
        # name (1,4,5,0), pic (1,4,5,1), rating (2,0,0), desc (2,15,0,0),
        # time (2,2,0,1,21,6,8), images (2,2,0,1,21,7,j)
        x = [None] * 6
        x[5] = [name, "pp%20x"]
        el1 = [None] * 5
        el1[4] = x
        t6 = [None] * 9
        t6[8] = [y, m, day]
        inner21 = [None] * 8
        inner21[6] = t6
        inner21[7] = ["xx" + i for i in imgs]
        w = [None] * 22
        w[21] = inner21
        el2 = [None] * 16
        el2[0] = [rating]
        el2[2] = [[None, w]]
        el2[15] = [[desc]]
        el = [None] * 3
        el[1] = el1
        el[2] = el2
        return [el]

    page = [None, None, [review_el("Ann", 5, "great", 2023, 11, 14, ["img1"])]]
    raw = ")]}'" + json.dumps(page)
    out = extract_reviews(raw)
    assert out == [
        {
            "name": "Ann",
            "profile_picture": "pp x",  # decodeURL analog (entry.go:436)
            "rating": 5,
            "description": "great",
            "images": ["img1"],
            "when": "2023-11-14",
        }
    ]
    # empty-name review dropped (entry.go:455-457)
    page2 = [None, None, [review_el("", 4, "skip", 2023, 1, 1, [])]]
    assert extract_reviews(")]}'" + json.dumps(page2)) == []


def test_parse_full_entries_spark_nested_types(spark):
    rows = [("a", golden_blob()), ("b", "{not json")]
    df = spark.createDataFrame(rows, "id string, raw string")
    out = parse_full_entries(df, raw_col="raw", keep_cols=["id"])
    # the schema is REAL nested Spark types, not JSON strings
    by_name = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert by_name["open_hours"] == "map<string,array<string>>"
    assert by_name["popular_times"] == "map<string,map<int,int>>"
    assert by_name["about"].startswith("array<struct<id:string,name:string,options:array<struct<")
    got = {r["id"]: r for r in out.collect()}
    assert got["a"]["_error"] is None
    assert got["a"]["open_hours"]["Friday"] == ["1-11pm", "11-12pm"]
    assert got["a"]["popular_times"]["Monday"][12] == 70
    assert got["a"]["owner"]["link"] == "https://www.google.com/maps/contrib/own1"
    # recover path: null row + _error, batch survives
    assert got["b"]["_error"] is not None and got["b"]["title"] is None
