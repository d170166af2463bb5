from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgosm_flex_spark.functions import scalars, tags as tagf


def run_scalar(spark, fn, tag_dicts):
    df = spark.createDataFrame(
        pd.DataFrame({"tags": [list(d.items()) for d in tag_dicts]}),
        schema="tags array<struct<key:string,value:string>>",
    ).select(F.map_from_entries("tags").alias("tags"))
    return [r["out"] for r in df.select(fn(F.col("tags")).alias("out")).collect()]


def run_value(spark, fn, values):
    df = spark.createDataFrame(pd.DataFrame({"v": values}), schema="v string")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_parse_to_meters(spark):
    # documented cases: helpers.lua:75-105
    got = run_value(spark, scalars.parse_to_meters, ["1800", "1955 m", "8001 ft", "garbage", None, "100 km"])
    assert got[0] == 1800.0
    assert got[1] == 1955.0
    assert got[2] == pytest.approx(8001 * 0.3048)
    assert got[3] is None and got[4] is None and got[5] is None


def test_parse_speed(spark):
    # documented cases: helpers.lua:108-131
    got = run_value(spark, scalars.parse_speed, ["30", "55 mph", "garbage", None, "23.5"])
    assert got[0] == 30.0
    assert got[1] == float(int(55 * 1.60934))  # floor(88.51) = 88
    assert got[2] is None and got[3] is None
    assert got[4] == 23.5


def test_parse_oneway_direction_type(spark):
    # osm2pgsql 'direction' semantics (road.lua:19,40): yes/true/1 -> 1,
    # -1 -> -1, everything else (no, reversible, garbage, absent) -> 0
    got = run_value(
        spark, scalars.parse_oneway,
        ["yes", "true", "1", "-1", "no", "false", "0", "reversible",
         "alternating", "garbage", None],
    )
    assert got == [1, 1, 1, -1, 0, 0, 0, 0, 0, 0, 0]


def test_parse_layer_and_admin(spark):
    assert run_value(spark, scalars.parse_layer_value, ["2", "x", None]) == [2, 0, 0]
    assert run_value(spark, scalars.parse_admin_level, ["4", "x", None]) == [4, None, None]


def test_major_road(spark):
    got = run_value(spark, scalars.major_road, ["motorway", "trunk_link", "residential", None])
    assert got == [True, True, False, False]


def test_get_name_priority(spark):
    cases = [
        {"name": "A", "short_name": "B"},
        {"short_name": "B", "alt_name": "C"},
        {"alt_name": "C"},
        {"loc_name": "D"},
        {"old_name": "E"},
        {"name:xx": "F", "highway": "x"},
        {"SOMETHING:NAME": "G"},
        {"highway": "x"},
    ]
    got = run_scalar(spark, scalars.get_name, cases)
    assert got == ["A", "B", "C", "D", "E", "F", "G", ""]


def test_get_name_language(spark):
    got = run_scalar(
        spark, lambda c: scalars.get_name(c, language="en"), [{"name": "X", "name:en": "Y"}]
    )
    assert got == ["Y"]


def test_get_ref_priority(spark):
    cases = [
        {"local_ref": "L", "ref": "R"},
        {"route_ref": "RT"},
        {"nat_ref": "N"},
        {"ref": "R"},
        {"alt_ref": "A"},
        {"old_ref": "O"},
        {},
    ]
    got = run_scalar(spark, scalars.get_ref, cases)
    assert got == ["L", "RT", "N", "R", "A", "O", None]


def test_get_address(spark):
    # semantics: helpers.lua:381-438
    cases = [
        {"addr:housenumber": "100", "addr:street": "Main St", "addr:city": "DC",
         "addr:state": "MD", "addr:postcode": "20500"},
        {"addr:street": "Main St", "addr:city": "DC"},
        {"addr:housenumber": "100"},
        {"addr:postcode": "20500"},
        {},
    ]
    got = run_scalar(spark, scalars.get_address, cases)
    assert got == [
        "100 Main St, DC, MD, 20500",
        "Main St, DC",
        "100",
        "20500",
        "",
    ]


def test_routable_flags(spark):
    cases = [
        {"highway": "footway"},
        {"highway": "motorway"},
        {"highway": "residential"},
        {"highway": "residential", "access": "private"},
        {"highway": "path", "foot": "no"},
        {"highway": "cycleway"},
        {"bicycle": "designated"},
        {"highway": "motorway", "motor_vehicle": "no"},
        {"motor_vehicle": "permissive"},
        {},
    ]
    foot = run_scalar(spark, scalars.routable_foot, cases)
    cycle = run_scalar(spark, scalars.routable_cycle, cases)
    motor = run_scalar(spark, scalars.routable_motor, cases)
    assert foot == [True, False, True, False, False, False, False, False, False, False]
    # note case 4 ({"highway": "path", "foot": "no"}): cycle deny-list only
    # checks access/bicycle (helpers.lua:314-318), so path stays cycle-routable
    assert cycle == [False, False, True, False, True, True, True, False, False, False]
    assert motor == [False, True, True, False, False, False, False, False, True, False]


def test_osm_url(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["N", "W", "R"], "osm_id": [1, 2, -3]}),
        schema="g string, osm_id long",
    )
    got = [r["u"] for r in df.select(scalars.osm_url(F.col("g"), F.col("osm_id")).alias("u")).collect()]
    assert got == [
        "https://www.openstreetmap.org/node/1",
        "https://www.openstreetmap.org/way/2",
        "https://www.openstreetmap.org/relation/-3",
    ]


def test_caption_roundtrip(spark):
    caption = "lon=-77.03 lat=38.90 highway=residential name=Main%20Street maxspeed=55%20mph odbl=yes"
    df = tagf.with_tags(
        spark.createDataFrame(pd.DataFrame({"caption": [caption]}))
    )
    row = df.collect()[0]
    assert row["lon"] == pytest.approx(-77.03)
    assert row["lat"] == pytest.approx(38.90)
    assert row["tags"]["name"] == "Main Street"
    assert row["tags"]["maxspeed"] == "55 mph"
    assert "lon" not in row["tags"]
    cleaned = df.select(tagf.clean_tags(F.col("tags")).alias("c")).collect()[0]["c"]
    assert "odbl" not in cleaned and "highway" in cleaned


def test_clean_tags_empty_skip(spark):
    df = tagf.with_tags(
        spark.createDataFrame(
            pd.DataFrame({"caption": ["lon=0 lat=0 source=x odbl=y", "lon=0 lat=0 shop=deli"]})
        )
    )
    kept = df.filter(tagf.has_tags_after_clean(F.col("tags"))).count()
    assert kept == 1


def test_with_lonlat_matches_with_tags(spark):
    """with_lonlat (the geotag fast path) must agree with the full parse on
    every caption shape the corpus can produce, plus adversarial edges."""
    captions = [
        "lon=-77.03 lat=38.90 highway=residential name=Main%20Street",
        "highway=residential lon=1.5 lat=-2.25",          # geotag not first
        "lon=0 lat=0",                                    # bare geotag
        "highway=residential name=x",                     # no geotag at all
        "melon=3 lat=7 lon=9",                            # key-suffix collision
        "lon= lat=",                                      # empty values
        "lon=abc lat=1",                                  # non-numeric lon
        "lon=4e-3 lat=-0.0",                              # exotic numerics
        "a=b lon=5.5",                                    # lat missing
        None,                                             # NULL caption
        "",                                               # empty caption
        "lonx=1 xlat=2",                                  # near-miss keys
        "lon=-77.1%20 lat=38.9",   # trailing escaped space: unescape+trim
        "lon=%20-77.1 lat=1",      # leading escaped space
        "lon=1%202 lat=3",         # interior escaped space → NULL both paths
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": [str(i) for i in range(len(captions))],
                      "caption": captions})
    )
    full = tagf.with_tags(df).select("image_id", "lon", "lat")
    fast = tagf.with_lonlat(df).select("image_id", "lon", "lat")
    mism = (
        full.withColumnRenamed("lon", "l1").withColumnRenamed("lat", "t1")
        .join(fast.withColumnRenamed("lon", "l2").withColumnRenamed("lat", "t2"),
              "image_id")
        .filter("(l1 <=> l2) = false or (t1 <=> t2) = false")
        .count()
    )
    assert mism == 0
    # and on the real fixture corpus
    from pgosm_flex_spark import fixtures

    imgs = fixtures.images_df(spark, 2000, with_pixels=False)
    full = tagf.with_tags(imgs).select("image_id", "lon", "lat")
    fast = tagf.with_lonlat(imgs).select("image_id", "lon", "lat")
    mism = (
        full.withColumnRenamed("lon", "l1").withColumnRenamed("lat", "t1")
        .join(fast.withColumnRenamed("lon", "l2").withColumnRenamed("lat", "t2"),
              "image_id")
        .filter("(l1 <=> l2) = false or (t1 <=> t2) = false")
        .count()
    )
    assert mism == 0
