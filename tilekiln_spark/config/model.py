"""Tileset configuration model: YAML -> Config/LayerConfig/Definition.

Semantics mirror the reference's config system (reference tilekiln/config.py:11-144,
tilekiln/definition.py:19-77) with one architectural difference: a Definition does
not compile a Jinja2 SQL template into a PostGIS query string — it names a
*DataFrame builder* (registered in tilekiln_spark.operators.tiling) and exposes
`render_params(tile)`, the exact substitution set the reference would feed the
template (zoom, x, y, bbox, extent, buffer, tile_length, tile_area,
coordinate_length, coordinate_area — reference definition.py:57-69).  The builder
consumes those params and produces a Spark logical plan; Catalyst takes it from
there.

Validation and TileJSON output are behavior-identical to the reference:
- layer names reject ", ', \\ (reference config.py:44-51)
- min/max zoom = min/max over layers (reference config.py:58-63)
- TileJSON 3.0.0 with sorted keys, None values stripped, indent 4
  (reference config.py:65-97; goldens tests/test_config.py:28-37,78-113)
"""

from __future__ import annotations

from typing import Mapping

import json
import yaml

from tilekiln_spark.config.errors import ConfigError, ConfigYAMLError, DefinitionError
from tilekiln_spark.tiles.core import (
    Tile,
    coordinate_area,
    coordinate_length,
    tile_area,
    tile_length,
)

DEFAULT_EXTENT = 4096  # reference definition.py:8
DEFAULT_BUFFER = 0     # reference definition.py:9


class Definition:
    """One zoom-band of a layer (reference tilekiln/definition.py:19-77)."""

    def __init__(self, id: str, definition_yaml: Mapping, templates: Mapping[str, str]):
        self.id = id
        try:
            self.minzoom = definition_yaml["minzoom"]
        except KeyError:
            raise DefinitionError(f"Layer {id} is missing minzoom on a definition") from None
        try:
            self.maxzoom = definition_yaml["maxzoom"]
        except KeyError:
            raise DefinitionError(f"Layer {id} is missing maxzoom on a definition") from None

        self.extent = definition_yaml.get("extent", DEFAULT_EXTENT)
        self.buffer = definition_yaml.get("buffer", DEFAULT_BUFFER)

        filename = definition_yaml["file"]
        if filename not in templates:
            raise DefinitionError(f"Layer {id} is missing file {filename}")
        # The "template" body is either a restricted .sql.jinja2 template
        # (compiled to a Spark plan — tilekiln_spark.config.sqlt; the
        # reference path, definition.py:42-77) or the NAME of a registered
        # DataFrame builder (first non-empty line / filename stem).
        from tilekiln_spark.config.sqlt import CompiledTemplate, looks_like_sql

        self.source = templates[filename]
        body = self.source.strip()
        if looks_like_sql(body):
            self.builder = "__sql__"
            self.compiled: CompiledTemplate | None = CompiledTemplate(self.source)
        else:
            self.builder = body.splitlines()[0].strip() if body else _stem(filename)
            self.compiled = None

    def render_params(self, tile: Tile) -> dict:
        """The substitution set the reference feeds its template
        (reference definition.py:57-69).  bbox is the buffered envelope tuple
        (xmin, ymin, xmax, ymax) instead of an ST_TileEnvelope SQL string."""
        assert tile.zoom >= self.minzoom
        assert tile.zoom <= self.maxzoom
        z = tile.zoom
        return {
            "zoom": z,
            "x": tile.x,
            "y": tile.y,
            "bbox": tile.envelope(self.buffer / self.extent),
            "unbuffered_bbox": tile.envelope(0),
            "extent": self.extent,
            "buffer": self.buffer,
            "tile_length": tile_length(z),
            "tile_area": tile_area(z),
            "coordinate_length": coordinate_length(z, self.extent),
            "coordinate_area": coordinate_area(z, self.extent),
        }


    def render_sql(self, tile: Tile) -> str:
        """The exact PostGIS SQL string the reference would issue for this
        tile (reference definition.py:48-77): template rendered with the
        concrete tile's variables (bbox as ST_TileEnvelope with the
        buffer/extent margin), wrapped in the WITH mvtgeom .. ST_AsMVT
        envelope.  Debugging/migration surface only — the engine executes
        the compiled Spark plan, never this string."""
        import jinja2

        params = self.render_params(tile)
        margin = self.buffer / self.extent
        params["bbox"] = (
            f"ST_TileEnvelope({tile.zoom}, {tile.x}, {tile.y}, margin=>{margin})"
        )
        params["unbuffered_bbox"] = (
            f"ST_TileEnvelope({tile.zoom}, {tile.x}, {tile.y}, margin=>0)"
        )
        inner = (
            jinja2.Environment(undefined=jinja2.StrictUndefined)
            .from_string(self.source)
            .render(**params)
            .strip()
        )
        return (
            f"WITH mvtgeom AS -- {self.id}/{tile.zoom}/{tile.x}/{tile.y}\n(\n"
            + inner
            + f"\n)\nSELECT ST_AsMVT(mvtgeom.*, '{self.id}', {self.extent})\n"
            + "FROM mvtgeom;"
        )


def _stem(filename: str) -> str:
    base = filename.split("/")[-1]
    for suffix in (".sql.jinja2", ".jinja2", ".sql", ".yaml", ".yml"):
        if base.endswith(suffix):
            return base[: -len(suffix)]
    return base


class LayerConfig:
    """Per-layer config: fields + zoom-disjoint definitions
    (reference tilekiln/config.py:113-144)."""

    def __init__(self, id: str, layer_yaml: Mapping, templates: Mapping[str, str]):
        self.id = id
        self.description = layer_yaml.get("description")
        self.fields = layer_yaml.get("fields", {})
        self.geometry_type = set(layer_yaml.get("geometry_type", []))
        self._definitions: set[Definition] = {
            Definition(id, d, templates) for d in layer_yaml.get("sql", [])
        }
        self.minzoom = min({d.minzoom for d in self._definitions})
        self.maxzoom = max({d.maxzoom for d in self._definitions})

    def definition_for(self, zoom: int) -> Definition | None:
        """First definition whose [minzoom, maxzoom] contains zoom, else None
        (reference config.py:132-144)."""
        if zoom > self.maxzoom or zoom < self.minzoom:
            return None
        for d in self._definitions:
            if d.minzoom <= zoom <= d.maxzoom:
                return d
        return None


class Config:
    """Tileset config (reference tilekiln/config.py:11-110)."""

    def __init__(self, yaml_string: str, templates: Mapping[str, str] | None = None):
        templates = templates or {}
        try:
            config = yaml.safe_load(yaml_string)
        except yaml.parser.ParserError:
            raise ConfigYAMLError("Unable to parse config YAML") from None

        try:
            metadata = config["metadata"]
        except Exception:
            raise ConfigYAMLError("No metadata found in config") from None
        try:
            self.id = metadata["id"]
        except Exception:
            raise ConfigYAMLError("id not found in config metadata") from None
        if not isinstance(self.id, str) or self.id is None:
            raise ConfigYAMLError("metadata.id is not a string") from None

        self.name = metadata.get("name")
        self.description = metadata.get("description")
        self.attribution = metadata.get("attribution")
        self.version = metadata.get("version")
        self.bounds = metadata.get("bounds")
        self.center = metadata.get("center")
        self._layers: dict[str, LayerConfig] = {}
        try:
            for id, layer in config.get("vector_layers", {}).items():
                if '"' in id:
                    raise ConfigError(f'Illegal character " found in layer name: f{id}')
                if "'" in id:
                    raise ConfigError(f"Illegal character ' found in layer name: f{id}")
                if "\\" in id:
                    raise ConfigError(f"Illegal character \\ found in layer name: f{id}")
                lc = LayerConfig(id, layer, templates)
                self._layers[lc.id] = lc
        except Exception:
            raise ConfigError("Unable to process vector_layers") from None

        if self._layers:
            self.minzoom = min(layer.minzoom for layer in self._layers.values())
            self.maxzoom = max(layer.maxzoom for layer in self._layers.values())
        else:
            self.minzoom = None
            self.maxzoom = None

    def layer_query(self, layer: str, tile: Tile) -> str | None:
        """reference config.py:102-103: rendered SQL for one layer at a tile
        (KeyError for unknown layers, None outside the layer's zooms)."""
        d = self._layers[layer].definition_for(tile.zoom)
        return None if d is None else d.render_sql(tile)

    def layer_queries(self, tile: Tile) -> dict:
        """reference config.py:105-110: {layer: SQL | None} for a tile."""
        return {name: self.layer_query(name, tile) for name in self._layers}

    def tilejson(self, url: str) -> str:
        """TileJSON 3.0.0 string, golden-compatible with reference config.py:65-97."""
        result = {
            "tilejson": "3.0.0",
            "tiles": [f"{url}/{self.id}" + "/{z}/{x}/{y}.mvt"],
            "attribution": self.attribution,
            "bounds": self.bounds,
            "center": self.center,
            "description": self.description,
            "maxzoom": self.maxzoom,
            "minzoom": self.minzoom,
            "name": self.name,
            "scheme": "xyz",
        }
        vector_layers = [
            {
                "id": layer.id,
                "fields": layer.fields,
                "description": layer.description,
                "minzoom": layer.minzoom,
                "maxzoom": layer.maxzoom,
            }
            for layer in self._layers.values()
        ]
        result["vector_layers"] = [
            {k: v for k, v in layer.items() if v is not None} for layer in vector_layers
        ]
        return json.dumps(
            {k: v for k, v in result.items() if v is not None}, sort_keys=True, indent=4
        )

    def layer_names(self) -> list[str]:
        return list(self._layers.keys())

    @property
    def layers(self) -> dict[str, LayerConfig]:
        return dict(self._layers)

    def layer_plan(self, layer: str, tile: Tile):
        """(builder name, render params) for a layer at a tile, or None when the
        layer has no definition at this zoom (reference config.py:105-110 returns
        None -> empty-layer short-circuit, kiln.py:36-38)."""
        d = self._layers[layer].definition_for(tile.zoom)
        if d is None:
            return None
        return d.builder, d.render_params(tile)

    def layer_plans(self, tile: Tile) -> dict:
        return {name: self.layer_plan(name, tile) for name in self._layers}


def load_config(path: str) -> Config:
    """Load a config YAML + sibling builder files, like reference
    tilekiln/__init__.py:9-17 (reads templates relative to the config dir)."""
    import os

    with open(path) as f:
        yaml_string = f.read()
    parsed = yaml.safe_load(yaml_string)
    templates: dict[str, str] = {}
    base = os.path.dirname(os.path.abspath(path))
    for layer in (parsed.get("vector_layers") or {}).values():
        for d in layer.get("sql", []):
            fn = d.get("file")
            if fn is None:
                continue
            fp = os.path.join(base, fn)
            if os.path.exists(fp):
                with open(fp) as tf:
                    templates[fn] = tf.read()
    return Config(yaml_string, templates)
