"""Error taxonomy, parity with reference tilekiln/errors.py."""


class Error(Exception):
    pass


class ConfigError(Error):
    pass


class ConfigYAMLError(ConfigError):
    pass


class DefinitionError(ConfigError):
    pass


class ZoomNotDefined(Error):
    """Tile zoom outside the tileset's [minzoom, maxzoom]
    (reference tilekiln/tileset.py:71-79)."""


class LayerNotDefined(Error):
    """Layer name not present in tileset metadata
    (reference tilekiln/storage.py:274-277)."""
