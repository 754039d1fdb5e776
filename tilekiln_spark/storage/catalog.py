"""Cross-tileset catalog — parity with the reference Storage's metadata-table
scans (reference tilekiln/storage.py:82-156): list tilesets, fetch one by id
(TilesetMissing when absent), list a tileset's layers, create/remove.

The reference keeps one `tilekiln.metadata` table; here the catalog is the
set of per-tileset metadata.json rows under one storage root (on a real
cluster: one Iceberg metadata table, partition per tileset).  `metadata_df`
exposes the same rows as a DataFrame for catalog queries, and `metrics`
unions every tileset's stats frame (the Prometheus-gauge source, A17).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from tilekiln_spark.config.errors import TilesetMissing
from tilekiln_spark.config.model import Config
from tilekiln_spark.storage.tileset import Tileset
from tilekiln_spark.storage.tilestore import TileStore


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- scans (reference storage.py:82-156) --------------------------------

    def _ids(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, d, "metadata.json"))
        )

    def get_tileset_ids(self) -> list[str]:
        """reference storage.py:102-113."""
        return self._ids()

    def get_tilesets(self) -> list[Tileset]:
        """reference storage.py:82-100."""
        return [Tileset.from_id(self.spark, self.root, i) for i in self._ids()]

    def get_tileset(self, id: str) -> Tileset:
        """reference storage.py:115-141: TilesetMissing when absent."""
        if id not in self._ids():
            raise TilesetMissing(id)
        return Tileset.from_id(self.spark, self.root, id)

    def get_layer_ids(self, id: str) -> list[str]:
        """reference storage.py:143-156."""
        return self.get_tileset(id).layers

    # -- lifecycle -----------------------------------------------------------

    def create_tileset(self, config: Config, url: str = "") -> Tileset:
        return Tileset.from_config(self.spark, self.root, config, url)

    def remove_tileset(self, id: str) -> None:
        """reference storage.py:68-80: metadata row + tile table + stats."""
        if id not in self._ids():
            raise TilesetMissing(id)
        TileStore(self.spark, self.root, id).drop()

    # -- catalog as data ------------------------------------------------------

    def metadata_df(self) -> DataFrame:
        """All tileset metadata rows as one DataFrame (the reference's
        metadata-table SELECT shape)."""
        rows = []
        for i in self._ids():
            with open(os.path.join(self.root, i, "metadata.json")) as f:
                m = json.load(f)
            rows.append(
                (m["id"], bool(m.get("active", True)), list(m["layers"]),
                 int(m["minzoom"]), int(m["maxzoom"]), m["tilejson"])
            )
        return self.spark.createDataFrame(
            rows,
            "id string, active boolean, layers array<string>, "
            "minzoom int, maxzoom int, tilejson string",
        )

    def metrics(self) -> DataFrame | None:
        """Union of per-tileset stats frames (reference storage.py metrics(),
        the Prometheus collector's source; A17)."""
        out: DataFrame | None = None
        for i in self._ids():
            p = os.path.join(self.root, i, "tile_stats.parquet")
            if not os.path.exists(p):
                continue
            df = self.spark.read.parquet(p)
            out = df if out is None else out.unionByName(df)
        return out


def prometheus_exposition(metrics: DataFrame | None) -> str:
    """Render a stats frame (Catalog.metrics / TileStore.update_metrics) in
    the Prometheus text exposition format, emitting exactly the gauge
    families the reference's collector yields — ``tilekiln_stored_count``,
    ``tilekiln_stored_bytes_sum`` and per-quantile ``tilekiln_stored_bytes``
    with (tileset, zoom[, quantile]) labels, in the reference's yield order
    (reference tilekiln/prometheus.py:27-57).  The frame is tileset x zoom
    sized (tiny), so the collect is a metadata read, not a data scan; a
    scrape endpoint would serve this string as-is every poll interval."""
    rows = [] if metrics is None else sorted(
        metrics.collect(), key=lambda r: (r.id, r.zoom)
    )

    def fam(name: str, help_: str) -> list[str]:
        return [f"# HELP {name} {help_}", f"# TYPE {name} gauge"]

    def fmt(v: float) -> str:
        f = float(v)
        return str(int(f)) if f == int(f) else repr(f)

    out = fam("tilekiln_stored_count", "Tiles in tilekiln storage")
    for r in rows:
        out.append(
            f'tilekiln_stored_count{{tileset="{r.id}",zoom="{r.zoom}"}} '
            f"{fmt(r.num_tiles)}"
        )
    out += fam("tilekiln_stored_bytes_sum", "Total size of tiles")
    for r in rows:
        out.append(
            f'tilekiln_stored_bytes_sum{{tileset="{r.id}",zoom="{r.zoom}"}} '
            f"{fmt(r.size)}"
        )
    out += fam("tilekiln_stored_bytes", "Tile percentiles")
    for r in rows:
        for q, v in zip(r.percentile_points, r.percentile_values):
            # quantile label is str(float): the reference collector labels
            # with str(point) on float points, so the boundary percentiles
            # render "0.0"/"1.0" — Prometheus label matching is string-exact,
            # so fmt()'s integral-collapse ("0"/"1") would break dashboards
            # written against the reference exposition
            out.append(
                f'tilekiln_stored_bytes{{tileset="{r.id}",zoom="{r.zoom}",'
                f'quantile="{str(float(q))}"}} {fmt(v)}'
            )
    return "\n".join(out) + "\n"
