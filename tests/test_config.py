"""Config system goldens, ported from reference tests/test_config.py and
tests/test_definition.py (TileJSON strings, zoom dispatch, validation)."""

import pytest

from tilekiln_spark.config.errors import ConfigError, ConfigYAMLError, DefinitionError
from tilekiln_spark.config.model import Config, Definition
from tilekiln_spark.tiles.core import Tile


class TestConfig:
    def test_empty_properties(self):
        c = Config('{"metadata": {"id":"foo"}}')
        assert c.id == "foo"
        assert c.name is None
        assert c.description is None
        assert c.attribution is None
        assert c.version is None
        assert c.bounds is None
        assert c.center is None
        assert c.minzoom is None
        assert c.maxzoom is None
        # golden TileJSON (reference tests/test_config.py:28-37)
        assert (
            c.tilejson("bar")
            == """{
    "scheme": "xyz",
    "tilejson": "3.0.0",
    "tiles": [
        "bar/foo/{z}/{x}/{y}.mvt"
    ],
    "vector_layers": []
}"""
        )

    FULL = (
        """{"metadata": {"id":"id", """
        """"name": "name", """
        """"description":"description", """
        """"attribution":"attribution", "version": "1.0.0","""
        """"bounds": [-180, -85, 180, 85], "center": [0, 0]},"""
        """"vector_layers": {"building":{"""
        """"description": "buildings","""
        """"fields":{"foo": "bar"},"""
        """"sql": [{"minzoom":13, "maxzoom":14, "file": "blank.sql.jinja2"}]}}}"""
    )

    def test_full_properties(self):
        c = Config(self.FULL, {"blank.sql.jinja2": ""})
        assert c.id == "id"
        assert c.name == "name"
        assert c.description == "description"
        assert c.attribution == "attribution"
        assert c.version == "1.0.0"
        assert c.bounds == [-180, -85, 180, 85]
        assert c.center == [0, 0]
        assert c.minzoom == 13
        assert c.maxzoom == 14
        assert list(c.layer_names()) == ["building"]
        # zoom dispatch: plan exists inside range, None outside
        # (reference tests/test_config.py:206-222)
        assert c.layer_plan("building", Tile(13, 0, 0)) is not None
        assert c.layer_plan("building", Tile(12, 0, 0)) is None
        assert c.layer_plan("building", Tile(0, 0, 0)) is None
        assert c.layer_plans(Tile(13, 0, 0))["building"] == c.layer_plan(
            "building", Tile(13, 0, 0)
        )
        # empty template body -> builder falls back to filename stem
        builder, params = c.layer_plan("building", Tile(13, 0, 0))
        assert builder == "blank"
        assert params["extent"] == 4096 and params["buffer"] == 0

    def test_full_tilejson_golden(self):
        # reference tests/test_config.py:78-113
        c = Config(self.FULL, {"blank.sql.jinja2": ""})
        assert (
            c.tilejson("foo")
            == """{
    "attribution": "attribution",
    "bounds": [
        -180,
        -85,
        180,
        85
    ],
    "center": [
        0,
        0
    ],
    "description": "description",
    "maxzoom": 14,
    "minzoom": 13,
    "name": "name",
    "scheme": "xyz",
    "tilejson": "3.0.0",
    "tiles": [
        "foo/id/{z}/{x}/{y}.mvt"
    ],
    "vector_layers": [
        {
            "description": "buildings",
            "fields": {
                "foo": "bar"
            },
            "id": "building",
            "maxzoom": 14,
            "minzoom": 13
        }
    ]
}"""
        )

    def test_yaml_errors(self):
        # reference tests/test_config.py:165-178
        with pytest.raises(ConfigYAMLError):
            Config("{}")
        with pytest.raises(ConfigYAMLError):
            Config('{"metadata": {}}')
        with pytest.raises(ConfigYAMLError):
            Config('{"metadata": {"id": 4}}')

    def test_illegal_layer_names(self):
        # reference config.py:44-51, tests/test_config.py:180-192
        for bad in ('a"b', "a'b", "a\\\\b"):
            cfg = (
                '{"metadata": {"id":"x"}, "vector_layers": {"%s": '
                '{"sql": [{"minzoom":0,"maxzoom":1,"file":"t"}]}}}' % bad
            )
            with pytest.raises(ConfigError):
                Config(cfg, {"t": ""})


class TestDefinition:
    def test_defaults(self):
        # reference tests/test_definition.py:31-38 (extent 4096, buffer 0)
        d = Definition("lyr", {"minzoom": 0, "maxzoom": 4, "file": "t"}, {"t": "water"})
        assert d.extent == 4096
        assert d.buffer == 0
        assert d.builder == "water"

    def test_missing_keys(self):
        with pytest.raises(DefinitionError):
            Definition("lyr", {"maxzoom": 4, "file": "t"}, {"t": ""})
        with pytest.raises(DefinitionError):
            Definition("lyr", {"minzoom": 0, "file": "t"}, {"t": ""})
        with pytest.raises(DefinitionError):
            Definition("lyr", {"minzoom": 0, "maxzoom": 4, "file": "nope"}, {})

    def test_render_params_goldens(self):
        # reference tests/test_definition.py:141-150 substitution set at z2
        d = Definition(
            "lyr",
            {"minzoom": 0, "maxzoom": 4, "extent": 1024, "buffer": 8, "file": "t"},
            {"t": "water"},
        )
        p = d.render_params(Tile(2, 1, 0))
        assert p["zoom"] == 2 and p["x"] == 1 and p["y"] == 0
        assert round(p["tile_length"], 2) == 10018754.17
        assert p["tile_area"] == pytest.approx(100375435118892.39, abs=1.0)
        assert p["coordinate_length"] == 9783.939619140625
        assert p["coordinate_area"] == pytest.approx(95725474.4709896)
        # buffered bbox wider than unbuffered by buffer/extent * tile_length
        margin = (8 / 1024) * p["tile_length"]
        assert p["bbox"][0] == pytest.approx(p["unbuffered_bbox"][0] - margin)
        assert p["bbox"][3] == pytest.approx(p["unbuffered_bbox"][3] + margin)

    def test_zoom_assertion(self):
        d = Definition("lyr", {"minzoom": 2, "maxzoom": 4, "file": "t"}, {"t": ""})
        with pytest.raises(AssertionError):
            d.render_params(Tile(1, 0, 0))
