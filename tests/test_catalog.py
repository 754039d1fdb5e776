"""Cross-tileset catalog parity (reference storage.py:82-156, A14)."""

import pytest

from tilekiln_spark.config.errors import (
    ConfigLayerError,
    DefinitionError,
    RuntimeError as TkRuntimeError,
    TilesetMissing,
)
from tilekiln_spark.config.model import Config
from tilekiln_spark.storage.catalog import Catalog

CFG_A = """
metadata: {id: tsa}
vector_layers:
  water:
    fields: {}
    sql:
    - {minzoom: 0, maxzoom: 4, file: w.b}
"""
CFG_B = """
metadata: {id: tsb}
vector_layers:
  admin:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 6, file: a.b}
  roads:
    fields: {}
    sql:
    - {minzoom: 3, maxzoom: 6, file: a.b}
"""


@pytest.fixture
def catalog(spark, tmp_path):
    c = Catalog(spark, str(tmp_path))
    c.create_tileset(Config(CFG_A, {"w.b": "water"}))
    c.create_tileset(Config(CFG_B, {"a.b": "admin"}))
    return c


def test_list_and_fetch(catalog):
    assert catalog.get_tileset_ids() == ["tsa", "tsb"]
    ts = catalog.get_tileset("tsb")
    assert ts.layers == ["admin", "roads"]
    assert (ts.minzoom, ts.maxzoom) == (2, 6)
    assert catalog.get_layer_ids("tsa") == ["water"]
    names = {t.id for t in catalog.get_tilesets()}
    assert names == {"tsa", "tsb"}


def test_missing_raises(catalog):
    with pytest.raises(TilesetMissing):
        catalog.get_tileset("nope")
    with pytest.raises(TilesetMissing):
        catalog.get_layer_ids("nope")
    with pytest.raises(TilesetMissing):
        catalog.remove_tileset("nope")
    # TilesetMissing is a RuntimeError in the reference taxonomy
    assert issubclass(TilesetMissing, TkRuntimeError)
    assert issubclass(DefinitionError, ConfigLayerError)


def test_remove_and_metadata_df(catalog):
    catalog.remove_tileset("tsa")
    assert catalog.get_tileset_ids() == ["tsb"]
    rows = catalog.metadata_df().collect()
    assert [r.id for r in rows] == ["tsb"]
    assert rows[0].layers == ["admin", "roads"]


def test_metrics_union(catalog, spark):
    ts = catalog.get_tileset("tsa")
    ts.store.update_metrics()
    catalog.get_tileset("tsb").store.update_metrics()
    m = catalog.metrics()
    ids = {r.id for r in m.select("id").distinct().collect()}
    assert ids == {"tsa", "tsb"}


def test_prometheus_exposition(catalog):
    from tilekiln_spark.storage.catalog import prometheus_exposition

    ts = catalog.get_tileset("tsa")
    ts.store.update_metrics()
    text = prometheus_exposition(catalog.metrics())
    lines = text.strip().splitlines()
    # family order + TYPE/HELP headers match the reference collector's yields
    assert lines[0] == "# HELP tilekiln_stored_count Tiles in tilekiln storage"
    assert lines[1] == "# TYPE tilekiln_stored_count gauge"
    assert "# TYPE tilekiln_stored_bytes_sum gauge" in lines
    assert "# TYPE tilekiln_stored_bytes gauge" in lines
    # tsa has stats -> count gauge rows for each zoom in its range
    counts = [ln for ln in lines if ln.startswith("tilekiln_stored_count{")]
    assert counts and all('tileset="tsa"' in ln for ln in counts)
    # quantile labels use the exact percentile points
    assert any('quantile="0.5"' in ln for ln in lines)
    assert any('quantile="0.999"' in ln for ln in lines)
    # empty metrics frame -> headers only, no samples
    empty = prometheus_exposition(None)
    assert "tilekiln_stored_count{" not in empty
    assert empty.startswith("# HELP tilekiln_stored_count")
