"""Pages fixture + geocode + extract-text invariant (BASELINE input_hint)."""

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.functions.geocode import MERC_LAT, geocode
from tilekiln_spark.functions.tileids import merc_x, merc_y, tileid, tileid_zxy
from tilekiln_spark.sources.pages import extract_text, layer_polygons, pages
from tilekiln_spark.tiles.core import HALF_WORLD


def test_pages_schema_and_determinism(spark):
    p = pages(spark, 500)
    assert [f.name for f in p.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in p.schema.fields}
    assert types == {
        "url": "string", "warc_ts": "timestamp", "html": "binary",
        "text": "string", "lang": "string",
    }
    # deterministic: two generations identical, and urls unique
    a = p.orderBy("url").collect()
    b = pages(spark, 500, partitions=7).orderBy("url").collect()
    assert a == b
    assert p.select("url").distinct().count() == 500


def test_extract_text_byte_identical(spark):
    # BASELINE input_hint: byte-identical extracted text per url
    p = pages(spark, 2000)
    mismatches = p.filter(extract_text(F.col("html")) != F.col("text")).count()
    assert mismatches == 0
    # also byte-level (binary compare, not string compare)
    bin_mismatch = p.filter(
        F.encode(extract_text(F.col("html")), "utf-8") != F.encode(F.col("text"), "utf-8")
    ).count()
    assert bin_mismatch == 0


def test_geocode_deterministic_and_bounded(spark):
    p = pages(spark, 1000).select("url", geocode(F.col("url")).alias("g"))
    stats = p.select(
        F.min("g.lon"), F.max("g.lon"), F.min("g.lat"), F.max("g.lat")
    ).head()
    assert -180.0 <= stats[0] and stats[1] < 180.0
    assert -MERC_LAT <= stats[2] and stats[3] <= MERC_LAT
    # deterministic across runs/partitionings
    a = p.orderBy("url").collect()
    b = (
        pages(spark, 1000, partitions=13)
        .select("url", geocode(F.col("url")).alias("g"))
        .orderBy("url")
        .collect()
    )
    assert a == b


def test_geocode_host_clustering(spark):
    # pages of one host cluster within the jitter window (+/-2 deg lon)
    p = pages(spark, 1000).select("url", geocode(F.col("url")).alias("g"))
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    spread = (
        p.groupBy(host.alias("host"))
        .agg((F.max("g.lat") - F.min("g.lat")).alias("dlat"))
        .agg(F.max("dlat"))
        .head()[0]
    )
    assert spread <= 2.0 + 1e-9


def test_geocode_expr_bounded_clustered(spark):
    from tilekiln_spark.functions.geocode import geocode_expr

    p = pages(spark, 1000).select("url", geocode_expr(F.col("url")).alias("g"))
    stats = p.select(F.min("g.lon"), F.max("g.lon"), F.min("g.lat"), F.max("g.lat")).head()
    assert -180.0 <= stats[0] and stats[1] < 180.0
    assert -MERC_LAT <= stats[2] and stats[3] <= MERC_LAT
    # deterministic and host-clustered like the pandas path
    assert p.orderBy("url").collect() == (
        pages(spark, 1000, partitions=9)
        .select("url", geocode_expr(F.col("url")).alias("g"))
        .orderBy("url").collect()
    )
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    spread = (
        p.groupBy(host.alias("host"))
        .agg((F.max("g.lat") - F.min("g.lat")).alias("dlat"))
        .agg(F.max("dlat")).head()[0]
    )
    assert spread <= 2.0 + 1e-9
    # zero Python in the plan
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_skew_fixture(spark):
    # 80% of pages on 3 dense hosts (FIXTURES.md §1)
    p = pages(spark, 10000)
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    top3 = (
        p.groupBy(host.alias("h")).count().orderBy(F.desc("count")).limit(3)
        .agg(F.sum("count")).head()[0]
    )
    assert top3 == 8000


def test_tileid_udfs_roundtrip(spark):
    from tilekiln_spark.tiles.core import zxy_to_tileid

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 0), (2, 0, 0), (2, 1, 0), (14, 1234, 4321)],
        "zoom long, x long, y long",
    )
    rows = (
        df.withColumn("tid", tileid("zoom", "x", "y"))
        .withColumn("back", tileid_zxy(F.col("tid")))
        .collect()
    )
    for r in rows:
        assert r.tid == zxy_to_tileid(r.zoom, r.x, r.y)
        assert (r.back.zoom, r.back.x, r.back.y) == (r.zoom, r.x, r.y)
    # goldens through the Spark surface
    assert [r.tid for r in rows[:4]] == [0, 1, 5, 6]


def test_mercator_columns(spark):
    df = spark.createDataFrame([(0.0, 0.0), (180.0, 0.0), (0.0, MERC_LAT)], "lon double, lat double")
    r = df.select(merc_x("lon").alias("x"), merc_y("lat").alias("y")).collect()
    assert r[0].x == pytest.approx(0.0) and r[0].y == pytest.approx(0.0, abs=1e-6)
    assert r[1].x == pytest.approx(HALF_WORLD)
    # mercator top edge ~ HALF_WORLD (reference constant is truncated, so tol)
    assert r[2].y == pytest.approx(HALF_WORLD, rel=1e-6)


def test_layer_polygons_deterministic(spark):
    a = layer_polygons(spark, 20).collect()
    b = layer_polygons(spark, 20).collect()
    assert a == b
    assert {r.layer for r in a} == {"water", "admin", "country_names"}
    for r in a:
        # ring bbox consistent with stored bbox
        assert min(r.ring_xs) == pytest.approx(r.xmin)
        assert max(r.ring_ys) == pytest.approx(r.ymax)
        assert r.way_area > 0
