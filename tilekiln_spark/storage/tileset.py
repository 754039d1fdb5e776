"""Tileset facade: Config + TileStore (reference tilekiln/tileset.py:15-80).

Ties a tileset's config-derived schema to its store, with the reference's
zoom-range guard (ZoomNotDefined before any work, tileset.py:71-79) and the
save/fetch entry points the serving layer would call."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tilekiln_spark.config.errors import ZoomNotDefined
from tilekiln_spark.config.model import Config
from tilekiln_spark.storage.tilestore import TileStore


class Tileset:
    def __init__(self, store: TileStore, id: str, layers: list[str], minzoom: int, maxzoom: int, tilejson: str):
        self.store = store
        self.id = id
        self.layers = layers
        self.minzoom = minzoom
        self.maxzoom = maxzoom
        self.tilejson = tilejson

    @classmethod
    def from_config(cls, spark: SparkSession, root: str, config: Config, url: str = "") -> "Tileset":
        """Create storage for a config (reference tileset.py:26-35)."""
        store = TileStore(spark, root, config.id)
        tj = config.tilejson(url)
        store.create(config.layer_names(), config.minzoom, config.maxzoom, tj)
        return cls(store, config.id, config.layer_names(), config.minzoom, config.maxzoom, tj)

    @classmethod
    def from_id(cls, spark: SparkSession, root: str, id: str) -> "Tileset":
        """Load an existing tileset from storage metadata (tileset.py:38-46)."""
        store = TileStore(spark, root, id)
        m = store.metadata()
        return cls(store, m["id"], m["layers"], m["minzoom"], m["maxzoom"], m["tilejson"])

    def _check_zoom(self, zoom: int):
        if zoom < self.minzoom or zoom > self.maxzoom:
            raise ZoomNotDefined(f"zoom {zoom} outside [{self.minzoom}, {self.maxzoom}]")

    def get_tile(self, zoom: int, x: int, y: int):
        self._check_zoom(zoom)
        return self.store.get_tile(zoom, x, y)

    def save_tiles(self, tiles: DataFrame) -> int:
        return self.store.save_tiles(tiles)

    def update_metadata(self, config: Config, url: str = ""):
        """Reference tileset.py update path -> metadata upsert quirk (A8)."""
        self.minzoom, self.maxzoom = config.minzoom, config.maxzoom
        self.tilejson = config.tilejson(url)
        self.store.set_metadata(config.minzoom, config.maxzoom, self.tilejson)
