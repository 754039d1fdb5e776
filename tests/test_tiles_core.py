"""Tile kernel goldens, ported 1:1 from the reference suite
(reference tests/test_tile.py, tests/test_tilerange.py, tests/test_definition.py:141-150)."""

import numpy as np
import pytest

from tilekiln_spark.tiles.core import (
    Tile,
    Tilerange,
    coordinate_area,
    coordinate_length,
    layer_frominput,
    tile_area,
    tile_length,
    tileid_to_zxy,
    tileid_to_zxy_np,
    zxy_to_tileid,
    zxy_to_tileid_np,
)


class TestTile:
    def test_properties(self):
        t = Tile(3, 2, 1)
        assert t.zoom == 3
        assert t.x == 2
        assert t.y == 1

    def test_envelope_margin(self):
        # reference tests/test_tile.py:13-18 checks margin 8/4096 == 0.001953125
        assert 8 / 4096 == 0.001953125
        t = Tile(3, 2, 1)
        unbuf = t.envelope(0)
        buf = t.envelope(8 / 4096)
        length = tile_length(3)
        assert buf[0] == pytest.approx(unbuf[0] - 0.001953125 * length)
        assert buf[2] == pytest.approx(unbuf[2] + 0.001953125 * length)

    def test_eq(self):
        assert Tile(3, 2, 1) == Tile(3, 2, 1)
        assert Tile(3, 2, 1) != Tile(3, 1, 1)
        assert len({Tile(0, 0, 0), Tile(1, 0, 0), Tile(1, 0, 0)}) == 2

    def test_tileid_goldens(self):
        # reference tests/test_tile.py:28-36
        assert Tile(0, 0, 0).tileid == 0
        assert Tile.from_tileid(0) == Tile(0, 0, 0)
        assert Tile(1, 0, 0).tileid == 1
        assert Tile.from_tileid(1) == Tile(1, 0, 0)
        assert Tile(2, 0, 0).tileid == 5
        assert Tile.from_tileid(5) == Tile(2, 0, 0)
        assert Tile(2, 1, 0).tileid == 6
        assert Tile.from_tileid(6) == Tile(2, 1, 0)

    def test_fromstring(self):
        assert Tile.from_string("0/0/0") == Tile(0, 0, 0)
        assert Tile.from_string("1/0/0") == Tile(1, 0, 0)
        assert Tile.from_string("1/1/0") == Tile(1, 1, 0)
        assert Tile.from_string("1/0/1") == Tile(1, 0, 1)
        for bad in ("0/0", "0/0/0/0", "a/b/c"):
            with pytest.raises(ValueError):
                Tile.from_string(bad)

    def test_tilelayer(self):
        # reference tests/test_tile.py:48-55
        assert layer_frominput("0/0/0,lyr1") == {Tile(0, 0, 0): {"lyr1"}}
        assert layer_frominput("0/0/0,lyr1\n") == {Tile(0, 0, 0): {"lyr1"}}
        assert layer_frominput("0/0/0,lyr1\n1/0/0,lyr2\n0/0/0,lyr2") == {
            Tile(0, 0, 0): {"lyr1", "lyr2"},
            Tile(1, 0, 0): {"lyr2"},
        }


class TestTilerange:
    def test_length(self):
        # reference tests/test_tilerange.py:7-12 (lazy at 4**30)
        assert len(Tilerange(0, 0)) == 1
        assert len(Tilerange(0, 1)) == 5
        assert len(Tilerange(30, 30)) == 4**30
        assert len(Tilerange(0, 1)) == 5

    def test_items(self):
        # reference tests/test_tilerange.py:14-32 — golden z1 Hilbert order
        for tile in Tilerange(0, 0):
            assert tile == Tile(0, 0, 0)
        it1 = iter(Tilerange(0, 1))
        assert next(it1) == Tile(0, 0, 0)
        assert next(it1) == Tile(1, 0, 0)
        assert next(it1) == Tile(1, 0, 1)
        assert next(it1) == Tile(1, 1, 1)
        assert next(it1) == Tile(1, 1, 0)
        with pytest.raises(StopIteration):
            next(it1)
        it2 = iter(Tilerange(0, 30))
        assert next(it2) == Tile(0, 0, 0)


class TestVectorizedCodec:
    def test_roundtrip_matches_scalar(self):
        rng = np.random.default_rng(42)
        z = rng.integers(0, 16, 2000)
        n = (1 << z).astype(np.int64)
        x = (rng.random(2000) * n).astype(np.int64)
        y = (rng.random(2000) * n).astype(np.int64)
        tid = zxy_to_tileid_np(z, x, y)
        scalar = np.array([zxy_to_tileid(int(a), int(b), int(c)) for a, b, c in zip(z, x, y)])
        np.testing.assert_array_equal(tid, scalar)
        z2, x2, y2 = tileid_to_zxy_np(tid)
        np.testing.assert_array_equal(z2, z)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)

    def test_full_zoom_coverage_z3(self):
        # every tile at z<=3 roundtrips and ids are a contiguous permutation
        ids = []
        for z in range(4):
            for x in range(1 << z):
                for y in range(1 << z):
                    ids.append(zxy_to_tileid(z, x, y))
                    assert tileid_to_zxy(ids[-1]) == (z, x, y)
        assert sorted(ids) == list(range(len(ids)))

    def test_errors(self):
        with pytest.raises(ValueError):
            zxy_to_tileid(1, 2, 0)
        with pytest.raises(ValueError):
            zxy_to_tileid(-1, 0, 0)
        with pytest.raises(ValueError):
            tileid_to_zxy(-1)


class TestEnvelopeMath:
    def test_goldens(self):
        # reference tests/test_definition.py:141-150
        assert round(tile_length(2), 2) == 10018754.17
        assert tile_area(2) == pytest.approx(100375435118892.39, abs=1.0)
        assert coordinate_length(2, 1024) == 9783.939619140625
        assert coordinate_area(2, 1024) == pytest.approx(95725474.4709896)

    def test_envelope_tiles_partition_world(self):
        # z1 tiles tile the world exactly
        from tilekiln_spark.tiles.core import HALF_WORLD

        e = Tile(1, 0, 0).envelope(0)
        assert e == pytest.approx((-HALF_WORLD, 0.0, 0.0, HALF_WORLD))
        e = Tile(1, 1, 1).envelope(0)
        assert e == pytest.approx((0.0, -HALF_WORLD, HALF_WORLD, 0.0))


def test_tile_pyramid_rollup(spark):
    """Ancestor aggregation: every tile feeds each ancestor up to z0; the
    x>>k / y>>k key math matches the slippy-map parent rule."""
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.tileids import tile_pyramid_rollup

    tiles = spark.createDataFrame(
        [(3, 0, 0, 10), (3, 1, 1, 20), (3, 7, 7, 40)],
        "zoom int, x long, y long, n_bytes long",
    )
    out = tile_pyramid_rollup(
        tiles,
        {"n_tiles": F.count("*"), "total_bytes": F.sum("n_bytes")},
    )
    got = {(r.zoom, r.x, r.y): (r.n_tiles, r.total_bytes) for r in out.collect()}
    assert got[(0, 0, 0)] == (3, 70)
    assert got[(1, 0, 0)] == (2, 30) and got[(1, 1, 1)] == (1, 40)
    assert got[(2, 0, 0)] == (2, 30) and got[(2, 3, 3)] == (1, 40)
    assert got[(3, 7, 7)] == (1, 40)
    # 3 input tiles at z3, 2 distinct ancestors at z2, 2 at z1, 1 at z0
    assert len(got) == 3 + 2 + 2 + 1


def test_tile_pyramid_rollup_min_zoom_and_plan(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.tileids import tile_pyramid_rollup

    tiles = spark.createDataFrame(
        [(4, 5, 9, 1)], "zoom int, x long, y long, n_bytes long"
    )
    out = tile_pyramid_rollup(
        tiles, {"n_tiles": F.count("*")}, min_zoom=2
    )
    got = sorted((r.zoom, r.x, r.y) for r in out.collect())
    assert got == [(2, 1, 2), (3, 2, 4), (4, 5, 9)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both plans
    # one exchange (the rollup groupBy), partial agg before it
    assert final.count("Exchange hashpartitioning") == 1
    assert "partial_count" in final


def test_tile_pyramid_rollup_excludes_shallower_tiles(spark):
    """Tiles above min_zoom have no ancestors in range — excluded, not
    wrapped into fake rows (review fix)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.tileids import tile_pyramid_rollup

    tiles = spark.createDataFrame(
        [(1, 1, 1, 5), (3, 4, 4, 7)], "zoom int, x long, y long, n_bytes long"
    )
    out = tile_pyramid_rollup(tiles, {"total": F.sum("n_bytes")}, min_zoom=2)
    got = {(r.zoom, r.x, r.y): r.total for r in out.collect()}
    assert got == {(2, 2, 2): 7, (3, 4, 4): 7}   # the z1 tile contributes nothing
