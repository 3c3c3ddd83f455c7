"""External catalog queries (Lx).

Rebuild of ``isochrones/query/`` (``Query`` query/query.py:9-39, ``Catalog``
query/catalog.py:8-111, Vizier catalogs query/vizier.py). Dependency-light:
sky math is pure numpy (the reference required astropy.SkyCoord), tables are
pandas DataFrames, and the network layer (astroquery.Vizier) is optional and
injectable — tests run against fake tables.
"""

from .query import EmptyQueryError, Query
from .catalog import Catalog
from .vizier import Gaia, TwoMASS, Tycho2, VizierCatalog, WISE

__all__ = [
    "Query", "EmptyQueryError", "Catalog", "VizierCatalog",
    "TwoMASS", "Tycho2", "WISE", "Gaia",
]
