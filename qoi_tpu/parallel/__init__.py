from . import sharding, tiled  # noqa: F401
