"""Error taxonomy, parity with reference tilekiln/errors.py:

Exception (base)
|_ Error
   |_ ConfigError
   |  |_ ConfigYAMLError
   |  |_ ConfigLayerError
   |     |_ DefinitionError
   |_ RuntimeError
      |_ ZoomNotDefined
      |_ LayerNotDefined
      |_ TilesetMissing
"""


class Error(Exception):
    pass


class ConfigError(Error):
    pass


class ConfigYAMLError(ConfigError):
    """YAML invalid, missing, or wrong types (reference errors.py:19-22)."""


class ConfigLayerError(ConfigError):
    """Layer-level config errors (reference errors.py:25-26)."""


class DefinitionError(ConfigLayerError):
    pass


class RuntimeError(Error):  # noqa: A001 - mirrors the reference's name
    pass


class ZoomNotDefined(RuntimeError):
    """Tile zoom outside the tileset's [minzoom, maxzoom]
    (reference tilekiln/tileset.py:71-79)."""


class LayerNotDefined(RuntimeError):
    """Layer name not present in tileset metadata
    (reference tilekiln/storage.py:274-277)."""


class TilesetMissing(RuntimeError):
    """Tileset id absent from the catalog metadata table
    (reference tilekiln/storage.py:132-135, errors.py:43-44)."""
