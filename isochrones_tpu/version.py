"""Import-path compat: reference ``isochrones/version.py``."""

from . import __version__

__all__ = ["__version__"]
